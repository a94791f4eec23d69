"""Concurrent mutate-while-search safety on the sharded index.

Milvus serves concurrent insert/search server-side (reference C13,
ImageEmbeddingSystem.py:35-66); in-process the same contract is an RLock
over the index's public surface (vector_index._locked) — without it a
compact() mid-search swaps the host buffers and device arrays underneath
the sweep. The hammer here drives searches from several threads while a
writer inserts, deletes, and compacts; correctness = no exceptions, every
result indexes a live row, and the final state is exactly the surviving
rows."""

import threading

import numpy as np
import pytest

from image_retrieval_tpu.config import IndexConfig
from image_retrieval_tpu.index.vector_index import ShardedVectorIndex


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_concurrent_search_insert_delete_compact(dtype):
    rng = np.random.default_rng(11)
    d = 64
    idx = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype=dtype))
    base = rng.normal(size=(256, d)).astype(np.float32)
    idx.insert([f"base{i}" for i in range(256)], base)

    errors = []
    stop = threading.Event()

    def searcher():
        q = rng.normal(size=(2, d)).astype(np.float32)
        try:
            while not stop.is_set():
                vals, ids = idx.search(q, top_k=5)
                # every hit must be a live row with a real path
                for row in np.asarray(ids).ravel():
                    assert 0 <= int(row) < len(idx.paths)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for gen in range(6):
            extra = rng.normal(size=(64, d)).astype(np.float32)
            idx.insert([f"g{gen}_{i}" for i in range(64)], extra)
            idx.delete([f"g{gen}_{i}" for i in range(0, 64, 2)])
            idx.compact()
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors[:1]
    # final state: 256 base rows + 32 survivors per generation
    assert idx.live_count == 256 + 6 * 32
    # and search still agrees with a numpy oracle on the live rows
    q = rng.normal(size=(d,)).astype(np.float32)
    vals, ids = idx.search(q, top_k=5)
    live = idx.reconstruct_original_embeddings(limit=idx.live_count)
    emb = np.stack([e for _p, e in live])
    qn = q / np.linalg.norm(q)
    cos = (emb / np.linalg.norm(emb, axis=1, keepdims=True)) @ qn
    oracle = set(np.argsort(-cos)[:5].tolist())
    assert len(oracle & set(int(i) for i in np.asarray(ids).ravel())) >= 4


def test_lock_is_reentrant_for_compound_ops(tmp_path):
    rng = np.random.default_rng(3)
    idx = ShardedVectorIndex(dim=32, config=IndexConfig(embedding_dim=32))
    idx.insert(["a", "b"], rng.normal(size=(2, 32)).astype(np.float32))
    idx.delete(["a"])
    idx.save(str(tmp_path / "g"))  # save -> compact under the same lock
    re = ShardedVectorIndex.load_from(str(tmp_path / "g"))
    assert re.paths == ["b"]
