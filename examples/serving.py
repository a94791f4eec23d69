"""Production-serving walkthrough: micro-batched server, IVF candidates,
batched sweeps, quantized galleries, and delete/compact lifecycle.

Runs self-contained with the deterministic encoder:

    python examples/serving.py

Covers the serving surfaces beyond examples/quickstart.py's vertical:
  1. micro-batching SearchServer (concurrent requests share gallery sweeps)
  2. two-phase IVF candidates + exact rerank (--ann ivf semantics)
  3. batched query lists via TextImageSearcher.search_batch
  4. int8 gallery storage (4x less HBM per sweep)
  5. Milvus-style delete -> tombstone -> compact lifecycle
"""

import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from image_retrieval_tpu.app.search import TextImageSearcher
from image_retrieval_tpu.app.server import SearchServer
from image_retrieval_tpu.config import IndexConfig
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.index.ivf import IVFIndex
from image_retrieval_tpu.models.encoder import FakeEncoder


def main():
    rng = np.random.default_rng(0)
    n, dim = 5000, 64
    enc = FakeEncoder(dim=dim)

    # Gallery: int8 storage (per-row norm-preserving scales; cosine runs
    # int8 -> bf16 on the MXU with the scale applied to the output row)
    index = ShardedVectorIndex(
        dim=dim, config=IndexConfig(capacity_step=512, dtype="int8")
    )
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    index.insert([f"img_{i:05d}.jpg" for i in range(n)], emb)
    print(f"[1] indexed {len(index)} vectors (int8 storage)")

    # Warm the search executables for the buckets the server will hit —
    # queries snap to the bucket ladder (1, 8, 32, ...), so warming only a
    # single query compiles just the bucket-1 executable and the server's
    # first micro-batch would still sit through a fresh remote compile
    index.search(emb[0], top_k=3)           # bucket 1 (interactive)
    index.search(emb[:8], top_k=3)          # bucket 8 (micro-batches)

    # Micro-batching server: concurrent callers share gallery sweeps
    with SearchServer(enc, index, max_batch=32) as server:
        results, threads = {}, []

        def ask(q):
            results[q] = server.search(q, top_k=3, timeout=120.0)

        for i in range(8):
            t = threading.Thread(target=ask, args=(f"query number {i}",))
            threads.append(t)
            t.start()
        for t in threads:
            t.join()
        print(f"[2] served {server.stats['requests']} concurrent requests in "
              f"{server.stats['batches']} micro-batches")

    # Two-phase ANN serving: IVF candidates -> exact rerank
    ann = IVFIndex.from_index(index, nlist=64, nprobe=8)
    with SearchServer(enc, index, ann=ann) as ann_server:
        hits = ann_server.search("a red car", top_k=5)
        print(f"[3] IVF-served top-5: {[h['path'] for h in hits]}")

    # Batched query lists: one sweep serves the whole list
    searcher = TextImageSearcher(enc, index)
    batch_hits = searcher.search_batch([f"batch query {i}" for i in range(16)],
                                       top_k=3)
    print(f"[4] batched 16 queries -> {sum(len(h) for h in batch_hits)} hits "
          "in one sweep")

    # Lifecycle: tombstone deletes, compact reclaims
    victim = index.paths[7]
    index.delete([victim])
    _, ids = index.search(emb[7], top_k=1)
    assert index.paths[int(ids[0])] != victim
    reclaimed = index.compact()
    print(f"[5] deleted {victim!r} (never served again), compact reclaimed "
          f"{reclaimed} row(s); live={index.live_count}")


if __name__ == "__main__":
    main()
