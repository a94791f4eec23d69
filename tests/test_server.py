"""Micro-batching search server: concurrency, batching, parity."""

import threading

import numpy as np
import pytest

from image_retrieval_tpu.app.server import SearchServer
from image_retrieval_tpu.config import IndexConfig
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.models.encoder import FakeEncoder


@pytest.fixture(scope="module")
def serving_stack(rng=None):
    rng = np.random.default_rng(3)
    enc = FakeEncoder(dim=512)
    idx = ShardedVectorIndex(dim=512, config=IndexConfig(capacity_step=64))
    texts = [f"object number {i} in color {c}" for i in range(20)
             for c in ("red", "green", "blue")]
    embs = enc.encode_texts(texts)
    idx.insert([f"img_{t.replace(' ', '_')}.jpg" for t in texts], embs)
    return enc, idx


def test_single_query_matches_direct(serving_stack):
    enc, idx = serving_stack
    with SearchServer(enc, idx) as server:
        got = server.search("object number 3 in color red", top_k=5)
    q = enc.encode_texts(["object number 3 in color red"])[0]
    qn = q / np.linalg.norm(q)
    vals, ids = idx.search(qn, top_k=5)
    want = [{"path": idx.paths[int(i)], "score": float(v)} for v, i in zip(vals, ids)]
    assert [r["path"] for r in got] == [r["path"] for r in want]


def test_concurrent_queries_batched(serving_stack):
    enc, idx = serving_stack
    queries = [f"object number {i} in color green" for i in range(16)]
    results = {}
    with SearchServer(enc, idx, max_batch=16, max_wait_ms=50) as server:
        def worker(q):
            results[q] = server.search(q, top_k=3)

        threads = [threading.Thread(target=worker, args=(q,)) for q in queries]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = dict(server.stats)
    assert len(results) == 16
    assert all(len(v) == 3 for v in results.values())
    assert stats["requests"] == 16
    assert stats["batches"] < 16  # actually micro-batched
    # each result matches its own direct search
    for q, got in list(results.items())[:3]:
        e = enc.encode_texts([q])[0]
        vals, ids = idx.search(e / np.linalg.norm(e), top_k=3)
        assert [r["path"] for r in got] == [idx.paths[int(i)] for i in ids]


def test_mixed_top_k(serving_stack):
    enc, idx = serving_stack
    with SearchServer(enc, idx, max_wait_ms=20) as server:
        out = []
        threads = [
            threading.Thread(target=lambda k=k: out.append((k, server.search("blue", top_k=k))))
            for k in (1, 5, 9)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    for k, res in out:
        assert len(res) == k


def test_bad_metric_fails_only_its_request(serving_stack):
    enc, idx = serving_stack
    with SearchServer(enc, idx, max_wait_ms=30) as server:
        out = {}
        def good():
            out["good"] = server.search("red object", top_k=2)
        def bad():
            try:
                server.search("red object", top_k=2, metric="no_such_metric")
                out["bad"] = "no error"
            except Exception:
                out["bad"] = "raised"
        ts = [threading.Thread(target=good), threading.Thread(target=bad)]
        for t in ts: t.start()
        for t in ts: t.join()
    assert out["bad"] == "raised"
    assert len(out["good"]) == 2  # unaffected


def test_search_many_coalesces_and_orders(serving_stack):
    """search_many enqueues all queries before waiting: results come back
    in input order and the batch shares micro-batches (batches counter
    grows by far fewer than len(queries))."""
    enc, idx = serving_stack
    with SearchServer(enc, idx, max_batch=32, max_wait_ms=50) as server:
        before = server.stats["batches"]
        queries = [f"object number {i}" for i in range(12)]
        outs = server.search_many(queries, top_k=2)
        used = server.stats["batches"] - before
    assert len(outs) == 12
    assert all(len(o) == 2 for o in outs)
    assert used < 12  # coalesced, not one sweep per query
    # order preserved: same result as the equivalent single search
    with SearchServer(enc, idx, max_wait_ms=10) as server2:
        solo = server2.search(queries[5], top_k=2)
    assert [r["path"] for r in outs[5]] == [r["path"] for r in solo]


def test_stop_fails_queued_requests_fast(serving_stack):
    """Requests still in the queue when the server stops get a fast error
    instead of hanging until their timeout."""
    import queue as q

    enc, idx = serving_stack
    server = SearchServer(enc, idx)
    server.start()
    server._stop.set()           # stop the loop
    server._thread.join(timeout=5)
    server._thread = None
    from image_retrieval_tpu.app.server import _Request

    req = _Request(query="late", top_k=1)
    server._queue.put(req)       # enqueued after the loop exited
    server.stop()                # must drain and fail it
    assert req.done.is_set()
    assert isinstance(req.error, RuntimeError)


def test_trainer_rejects_unfused_int8_config():
    import pytest as _pytest

    from image_retrieval_tpu.config import vit_b32_serving, ModelConfig
    import dataclasses

    from image_retrieval_tpu.train.trainer import CLIPTrainer

    bad = dataclasses.replace(ModelConfig(), int8_matmuls=True)
    with _pytest.raises(ValueError):
        CLIPTrainer(cfg=bad)


def test_histogram_encoder_chunks_oversize_batches():
    import numpy as np

    from image_retrieval_tpu.models.histogram import HistogramEncoder

    enc = HistogramEncoder(bins_per_channel=4)
    rng = np.random.default_rng(0)
    px = rng.normal(size=(300, 8, 8, 3)).astype(np.float32)
    big = enc.encode_pixels(px)               # > largest bucket: chunks
    small = np.concatenate(
        [enc.encode_pixels(px[:256]), enc.encode_pixels(px[256:])]
    )
    assert big.shape == (300, 64)
    np.testing.assert_allclose(big, small, atol=1e-6)


def test_enqueue_after_stop_fails_fast(serving_stack):
    enc, idx = serving_stack
    server = SearchServer(enc, idx)
    server.start()
    server.stop()
    import time
    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="server stopped"):
        server.search("anything", top_k=3, timeout=30.0)
    assert time.perf_counter() - t0 < 5.0  # fail fast, not timeout
    with pytest.raises(RuntimeError, match="server stopped"):
        server.search_many(["a", "b"], top_k=3, timeout=30.0)


def test_search_similar_rides_the_batch(serving_stack, tmp_path):
    """Image-query requests share the micro-batch sweeps with text ones;
    the query's own gallery row is excluded by default."""
    from PIL import Image

    enc, idx = serving_stack
    img = tmp_path / "q.jpg"
    Image.new("RGB", (32, 32), (120, 40, 40)).save(img)
    with SearchServer(enc, idx) as server:
        got = server.search_similar(str(img), top_k=5)
        assert len(got) == 5
        # parity with a direct index search on the same embedding
        q = enc.encode_images([str(img)])[0]
        qn = q / np.linalg.norm(q)
        vals, ids = idx.search(qn, top_k=5)
        want = [idx.paths[int(i)] for i in ids]
        assert [r["path"] for r in got] == want
        # pixels input works too
        px = np.asarray(Image.open(img).convert("RGB"), np.float32) / 255.0
        got_px = server.search_similar(px, top_k=3)
        assert len(got_px) == 3
        with pytest.raises(ValueError, match="pixels"):
            server.search_similar(np.zeros((4, 4)), top_k=3)


def test_search_similar_excludes_own_row(tmp_path):
    """A query path that IS an indexed row drops itself, and the rest of
    the ranking is unchanged (the top-up candidate fills the tail)."""
    from PIL import Image

    enc = FakeEncoder(dim=512)
    idx = ShardedVectorIndex(dim=512, config=IndexConfig(capacity_step=64))
    paths = []
    for i in range(8):
        p = str(tmp_path / f"g{i}.jpg")
        Image.new("RGB", (32, 32), (30 * i % 255, 80, 200 - 20 * i)).save(p)
        paths.append(p)
    idx.insert(paths, enc.encode_images(paths))
    target = paths[3]
    with SearchServer(enc, idx) as server:
        q = enc.encode_images([target])[0]
        qn = q / np.linalg.norm(q)
        vals, ids = idx.search(qn, top_k=6)
        direct = [idx.paths[int(i)] for i in ids]
        assert direct[0] == target  # sanity: self ranks first
        got = server.search_similar(target, top_k=5)
        assert all(r["path"] != target for r in got)
        assert [r["path"] for r in got] == [p for p in direct if p != target][:5]
        with_self = server.search_similar(target, top_k=5, exclude_self=False)
        assert with_self[0]["path"] == target


def test_approx_select_overrides(serving_stack):
    """approx_select plumbing (VERDICT r4 item 4): server-wide default and
    per-request override both reach the index selector; on a small gallery
    the approx candidate set equals the exact one, so results must match."""
    enc, idx = serving_stack
    q = "object number 7 in color blue"
    with SearchServer(enc, idx) as server:
        exact = server.search(q, top_k=5)
        per_req = server.search(q, top_k=5, approx=True)
    with SearchServer(enc, idx, approx_select=True) as server:
        default_on = server.search(q, top_k=5)
        forced_off = server.search(q, top_k=5, approx=False)
    for got in (per_req, default_on, forced_off):
        assert [r["path"] for r in got] == [r["path"] for r in exact]
        np.testing.assert_allclose(
            [r["score"] for r in got], [r["score"] for r in exact],
            rtol=1e-5, atol=1e-6)
    assert idx.config.approx_select is False  # server flag never mutates it


def test_index_search_approx_kwarg(serving_stack):
    """ShardedVectorIndex.search(approx=...) per-call override."""
    enc, idx = serving_stack
    q = enc.encode_texts(["object number 1 in color red"])[0]
    qn = q / np.linalg.norm(q)
    v_exact, i_exact = idx.search(qn, top_k=5)
    v_approx, i_approx = idx.search(qn, top_k=5, approx=True)
    np.testing.assert_array_equal(i_exact, i_approx)
    np.testing.assert_allclose(v_exact, v_approx, rtol=1e-6)


def test_approx_ignored_on_ann_path(serving_stack, caplog):
    """The ANN candidate path ignores the selector: a mixed approx=0/1
    batch must coalesce into ONE group (no split sweep), and configuring
    both ann and approx_select warns (r5 review finding)."""
    import logging

    from image_retrieval_tpu.index.ivf import IVFIndex

    enc, idx = serving_stack
    ann = IVFIndex.from_index(idx, nlist=4, nprobe=4)
    with caplog.at_level(logging.WARNING):
        server = SearchServer(enc, idx, ann=ann, approx_select=True)
    assert any("approx_select has no effect" in r.message
               for r in caplog.records)
    q = "object number 5 in color green"
    with server:
        a = server.search(q, top_k=5, approx=True)
        b = server.search(q, top_k=5, approx=False)
    assert [r["path"] for r in a] == [r["path"] for r in b]
