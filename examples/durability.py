"""Durability walkthrough: the write-ahead journal (Milvus WAL analog).

The reference's Milvus server persists inserts through a WAL + sealed
segments on a volume (docker-compose.yml:11-12) and exposes `flush()` as
the client's durability barrier (ImageEmbeddingSystem.py:137). The
TPU-native index gives the same contract in-process via an opt-in journal
directory (index/journal.py). Runs self-contained on any backend:

    python examples/durability.py

What it shows, in order:
  1. open a journaled index, insert, flush  — durable without save()
  2. "crash" (drop the object), reopen      — state replays from the log
  3. checkpoint()                           — log sealed into a snapshot
  4. the same flow through the pymilvus-style shim (Collection)
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from image_retrieval_tpu.config import IndexConfig
from image_retrieval_tpu.index.vector_index import ShardedVectorIndex


def main():
    workdir = tempfile.mkdtemp(prefix="ir_journal_")
    jdir = os.path.join(workdir, "gallery_journal")
    rng = np.random.default_rng(0)
    dim = 64

    # 1. open + insert + flush: durable with no explicit save()
    idx = ShardedVectorIndex.open(
        jdir, config=IndexConfig(embedding_dim=dim, dtype="int8"))
    emb = rng.normal(size=(100, dim)).astype(np.float32)
    idx.insert([f"img_{i:03d}.jpg" for i in range(100)], emb)
    idx.delete(["img_007.jpg"])
    idx.flush()  # fsync barrier — everything above survives a crash
    q = rng.normal(size=(dim,)).astype(np.float32)
    before = idx.search(q, top_k=5)
    print(f"live rows before crash: {idx.live_count}")

    # 2. crash: the process dies here (we just drop the object).
    del idx

    recovered = ShardedVectorIndex.open(jdir)
    after = recovered.search(q, top_k=5)
    same = np.array_equal(np.asarray(before[1]), np.asarray(after[1]))
    print(f"recovered rows: {recovered.live_count}  "
          f"(top-5 identical: {same})")
    assert same and recovered.live_count == 99

    # 3. seal the log: snapshot published atomically, log truncated
    recovered.checkpoint()
    log_bytes = os.path.getsize(os.path.join(jdir, "ops.jsonl"))
    print(f"after checkpoint: log={log_bytes} bytes, "
          f"snapshot={open(os.path.join(jdir, 'CURRENT')).read()}")

    # 4. the same contract through the Milvus-style shim
    from image_retrieval_tpu.index.compat import Collection

    jdir2 = os.path.join(workdir, "collection_journal")
    col = Collection("demo", dim=dim, journal_dir=jdir2)
    col.create_partition("fresh")
    col.insert([["a.jpg", "b.jpg"],
                rng.normal(size=(2, dim)).astype(np.float32)],
               partition_name="fresh")
    col.flush()
    from image_retrieval_tpu.index import compat
    compat._REGISTRY.clear()  # simulate a new process
    col2 = Collection("demo", dim=dim, journal_dir=jdir2)
    print(f"shim reopen: {col2.num_entities} entities, "
          f"partitions={col2.partitions}")
    assert col2.num_entities == 2 and "fresh" in col2.partitions

    shutil.rmtree(workdir)
    print("durability walkthrough OK")


if __name__ == "__main__":
    main()
