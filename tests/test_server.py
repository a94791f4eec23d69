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
