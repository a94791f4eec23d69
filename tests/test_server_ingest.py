"""Live ingest on the serving index: add/remove without a restart.

Milvus serves insert and search concurrently (reference
ImageEmbeddingSystem.py:100-137 writes while image_search.py reads); the
SearchServer now exposes the same contract in-process."""

import threading

import numpy as np
import pytest
from PIL import Image

from image_retrieval_tpu.app.server import SearchServer
from image_retrieval_tpu.config import IndexConfig
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.models.encoder import FakeEncoder


def _write_images(folder, names, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for n in names:
        p = str(folder / f"{n}.png")
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


@pytest.fixture()
def stack(tmp_path):
    enc = FakeEncoder(dim=512)
    idx = ShardedVectorIndex(dim=512, config=IndexConfig(capacity_step=64))
    base = _write_images(tmp_path, [f"base{i}" for i in range(6)])
    idx.insert(base, enc.encode_images(base))
    return enc, idx, tmp_path


def test_add_images_visible_to_searches(stack):
    enc, idx, tmp = stack
    new = _write_images(tmp, ["new0", "new1"], seed=7)
    with SearchServer(enc, idx) as server:
        ok, failed = server.add_images(new)
        assert (ok, failed) == (2, 0)
        # the new rows are immediately searchable: query WITH the new
        # image's own embedding must return it as the top hit
        hits = server.search_similar(new[0], top_k=1, exclude_self=False)
        assert hits[0]["path"] == new[0]
        assert server.stats["ingested"] == 2
    assert idx.live_count == 8


def test_add_images_skips_undecodable(stack):
    enc, idx, tmp = stack
    bad = tmp / "broken.png"
    bad.write_bytes(b"not an image")
    good = _write_images(tmp, ["ok0"], seed=9)
    with SearchServer(enc, idx) as server:
        ok, failed = server.add_images([str(bad)] + good)
    assert (ok, failed) == (1, 1)
    assert good[0] in idx.paths


def test_remove_images_disappear_from_results(stack):
    enc, idx, tmp = stack
    victim = idx.paths[0]
    with SearchServer(enc, idx) as server:
        # victim is its own best match before removal
        before = server.search_similar(victim, top_k=3, exclude_self=False)
        assert before[0]["path"] == victim
        assert server.remove_images([victim]) == 1
        after = server.search_similar(victim, top_k=3, exclude_self=False)
        assert all(h["path"] != victim for h in after)
    assert idx.live_count == 5


def test_concurrent_search_during_ingest(stack):
    enc, idx, tmp = stack
    new = _write_images(tmp, [f"burst{i}" for i in range(8)], seed=3)
    errors = []
    with SearchServer(enc, idx, max_wait_ms=1) as server:
        stop = threading.Event()

        def searcher():
            try:
                while not stop.is_set():
                    hits = server.search("some object", top_k=3)
                    assert len(hits) == 3
            except Exception as e:  # pragma: no cover
                errors.append(e)

        t = threading.Thread(target=searcher)
        t.start()
        try:
            for p in new:
                server.add_images([p])
            server.remove_images(new[:2])
        finally:
            stop.set()
            t.join(timeout=30)
    assert not errors, errors[:1]
    assert idx.live_count == 6 + 8 - 2


def test_ann_candidates_filter_tombstones(stack):
    """Rows deleted AFTER an IVF build must not surface via stale ANN
    candidate ids (pre-existing hole closed alongside live ingest)."""
    from image_retrieval_tpu.index.ivf import IVFIndex

    enc, idx, tmp = stack
    # grow the gallery enough for a meaningful IVF
    more = _write_images(tmp, [f"m{i}" for i in range(20)], seed=11)
    idx.insert(more, enc.encode_images(more))
    ann = IVFIndex.from_index(idx, nlist=4, nprobe=4)
    victim = idx.paths[0]
    with SearchServer(enc, idx, ann=ann) as server:
        server.remove_images([victim])
        hits = server.search_similar(victim, top_k=5, exclude_self=False)
        assert all(h["path"] != victim for h in hits)


def test_ann_add_keeps_new_rows_searchable(stack):
    from image_retrieval_tpu.index.ivf import IVFIndex

    enc, idx, tmp = stack
    more = _write_images(tmp, [f"m{i}" for i in range(20)], seed=12)
    idx.insert(more, enc.encode_images(more))
    ann = IVFIndex.from_index(idx, nlist=4, nprobe=2)
    new = _write_images(tmp, ["fresh"], seed=13)
    with SearchServer(enc, idx, ann=ann) as server:
        server.add_images(new)
        # tail rows are swept exactly — recall 1.0 for the new row even
        # at nprobe < nlist
        hits = server.search_similar(new[0], top_k=1, exclude_self=False)
        assert hits[0]["path"] == new[0]
