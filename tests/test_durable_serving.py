"""Durability through the SERVING stack (verdict r3 item 2).

Milvus makes every acknowledged client insert durable server-side (WAL +
volume, reference docker-compose.yml:11-12; flush() barrier at
ImageEmbeddingSystem.py:137). These tests prove the same contract for
OUR serving surfaces — SearchServer live ingest and the ImageSearchApp
facade — not just the bare index (tests/test_journal.py covers that).
Crash = dropping the objects without save() and reopening the directory.
"""

import numpy as np
import pytest
from PIL import Image

from image_retrieval_tpu.app.pipeline import ImageSearchApp
from image_retrieval_tpu.app.server import SearchServer
from image_retrieval_tpu.config import Config, IndexConfig
from image_retrieval_tpu.index.vector_index import ShardedVectorIndex
from image_retrieval_tpu.models.encoder import FakeEncoder


def _write_images(folder, names, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for n in names:
        p = str(folder / f"{n}.png")
        Image.fromarray(
            (rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


class CountingEncoder(FakeEncoder):
    """FakeEncoder that counts how many images it actually encodes —
    restart tests assert the recovery path encodes NOTHING."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.images_encoded = 0

    def encode_images(self, paths):
        self.images_encoded += len(paths)
        return super().encode_images(paths)

    def encode_pixels(self, pixels):  # the loader's decode->encode path
        self.images_encoded += len(pixels)
        return super().encode_pixels(pixels)


# -- SearchServer crash/recovery ---------------------------------------------


def test_server_restart_keeps_acknowledged_inserts(tmp_path):
    """Kill and reopen the SERVER mid-ingest: every add_images() that
    returned must survive; no save() is ever called."""
    enc = FakeEncoder(dim=512)
    jdir = str(tmp_path / "j")
    cfg = IndexConfig(embedding_dim=512, capacity_step=64)
    idx = ShardedVectorIndex.open(jdir, config=cfg)
    base = _write_images(tmp_path, [f"base{i}" for i in range(4)])
    new = _write_images(tmp_path, ["live0", "live1", "live2"], seed=7)

    server = SearchServer(enc, idx)
    server.start()
    idx.insert(base, enc.encode_images(base))
    idx.flush()
    ok, failed = server.add_images(new)  # acknowledged => must be durable
    assert (ok, failed) == (3, 0)
    server.stop()
    del server, idx  # crash: no save(), no checkpoint()

    re_idx = ShardedVectorIndex.open(jdir, config=cfg)
    assert re_idx.live_count == 7
    with SearchServer(enc, re_idx) as server2:
        hits = server2.search_similar(new[1], top_k=1, exclude_self=False)
    assert hits[0]["path"] == new[1]


def test_server_restart_keeps_acknowledged_deletes(tmp_path):
    enc = FakeEncoder(dim=512)
    jdir = str(tmp_path / "j")
    cfg = IndexConfig(embedding_dim=512, capacity_step=64)
    idx = ShardedVectorIndex.open(jdir, config=cfg)
    paths = _write_images(tmp_path, [f"im{i}" for i in range(6)])
    idx.insert(paths, enc.encode_images(paths))
    idx.flush()

    with SearchServer(enc, idx) as server:
        assert server.remove_images([paths[0], paths[3]]) == 2
    del idx  # crash

    re_idx = ShardedVectorIndex.open(jdir, config=cfg)
    assert re_idx.live_count == 4
    live = re_idx.live_mask()
    alive = {p for p, a in zip(re_idx.paths, live) if a}
    assert paths[0] not in alive and paths[3] not in alive


# -- facade (ImageSearchApp) crash/recovery ----------------------------------


def _app(enc, jdir):
    app = ImageSearchApp(encoder=enc, journal_dir=jdir)
    app.config.index = IndexConfig(embedding_dim=512, capacity_step=64)
    return app


def test_facade_restart_recovers_without_reencoding(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # keep new_embeddings.npz out of the repo
    imgs = _write_images(tmp_path, [f"a{i}" for i in range(5)])
    jdir = str(tmp_path / "j")

    enc1 = CountingEncoder(dim=512)
    app1 = _app(enc1, jdir)
    app1.process_images(imgs)
    res1 = app1.search_images("a red thing", top_k=3)
    assert enc1.images_encoded == 5 and len(res1) == 3
    del app1  # crash: no save()

    enc2 = CountingEncoder(dim=512)
    app2 = _app(enc2, jdir)
    app2.process_images(imgs)  # same folder after restart
    assert enc2.images_encoded == 0  # rows recovered, nothing re-encoded
    res2 = app2.search_images("a red thing", top_k=3)
    assert [r["path"] for r in res2] == [r["path"] for r in res1]


def test_facade_restart_delta_inserts_only_new(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    old = _write_images(tmp_path, ["o0", "o1", "o2"])
    jdir = str(tmp_path / "j")
    enc = CountingEncoder(dim=512)
    app = _app(enc, jdir)
    app.process_images(old)
    assert app._ensure_index().live_count == 3
    del app

    new = _write_images(tmp_path, ["n0", "n1"], seed=5)
    enc2 = CountingEncoder(dim=512)
    app2 = _app(enc2, jdir)
    app2.process_images(old + new)
    idx = app2._ensure_index()
    assert enc2.images_encoded == 2  # only the genuinely new images
    assert idx.live_count == 5  # and no duplicated recovered rows
    assert sorted(idx.paths) == sorted(old + new)


def test_facade_checkpoint_bounds_replay(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    imgs = _write_images(tmp_path, [f"c{i}" for i in range(4)])
    jdir = str(tmp_path / "j")
    app = _app(FakeEncoder(dim=512), jdir)
    app.process_images(imgs)
    app.checkpoint()  # seals the log into a snapshot
    del app

    app2 = _app(CountingEncoder(dim=512), jdir)
    app2.process_images(imgs)
    assert app2._ensure_index().live_count == 4


# -- CLI surface --------------------------------------------------------------


def test_cli_search_journal_dir_roundtrip(tmp_path, monkeypatch, capsys):
    """`--journal-dir` reaches the facade from the CLI: a second run over
    the same folder serves from the recovered index."""
    from image_retrieval_tpu.app.cli import make_parser

    monkeypatch.chdir(tmp_path)
    folder = tmp_path / "imgs"
    folder.mkdir()
    _write_images(folder, [f"x{i}" for i in range(3)])
    jdir = str(tmp_path / "j")
    argv = ["search", "--folder", str(folder), "--fake-encoder",
            "--journal-dir", jdir, "a query", "--top-k", "2"]
    args = make_parser().parse_args(argv)
    assert args.fn(args) == 0
    assert (tmp_path / "j").exists()
    args2 = make_parser().parse_args(argv)
    assert args2.fn(args2) == 0
    out = capsys.readouterr().out
    assert out.count("x") >= 2  # hits printed on both runs


# -- Milvus-shim empty partitions (verdict r3 item 8 / COMPAT.md §15) ---------


def test_empty_partition_survives_restart(tmp_path):
    from image_retrieval_tpu.index.compat import Collection

    jdir = str(tmp_path / "j")
    coll = Collection("imgs", dim=32, journal_dir=jdir)
    coll.create_partition("humans")  # never gets a row
    coll.create_partition("cats")
    rng = np.random.default_rng(0)
    coll.insert([["p0", "p1"], rng.normal(size=(2, 32)).astype(np.float32)],
                partition_name="cats")
    coll.flush()
    del coll  # crash

    re = Collection("imgs", dim=32, journal_dir=jdir)
    assert re.has_partition("humans")  # Milvus persists empty partitions
    assert re.has_partition("cats")
    re.drop_partition("humans")
    del re

    re2 = Collection("imgs", dim=32, journal_dir=jdir)
    assert not re2.has_partition("humans")
    assert re2.has_partition("cats")
