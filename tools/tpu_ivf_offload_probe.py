"""Offloaded (beyond-HBM) IVF at 8M x 512 int8: measured transfer economics.

The streamed EXACT tier moves the whole gallery per sweep — 4 GB at 8M
rows, 143 s per 64-query batch on this dev tunnel's 0.057 GB/s put path
(bench_results/streaming_probe.json; ~0.25 s at PCIe 16 GB/s). The
offloaded IVF tier (`IVFIndex.offload()`) moves only the batch's unique
PROBED slabs. This probe measures, on a real 8M build:

  * resident search() wall-clock per 64-query batch (the baseline)
  * offloaded search() wall-clock for two query mixes:
      - spread: 64 queries on 64 distinct clusters (worst-case overlap)
      - focused: 64 queries around 8 centers (production-like overlap)
  * bytes actually moved (unique clusters x lmax x D) per batch
  * recall@10 vs the resident index (identical by construction; asserted)

Build is the measured 8M operating point (nlist=4096, train_size=512k,
int8) and is SAVED to .ivf_cache/ivf8m_n4096.npz (gitignored) so re-probes
skip the ~35 min k-means; pass --rebuild to force.

Run:  python tools/tpu_ivf_offload_probe.py [--rows 8] [--quick]
Writes bench_results/ivf_offload_probe.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.tpu_embed_probe import _enable_cache
from tools.tpu_ivf8m_probe import D, K, make_rows, rec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESPATH = os.path.join(REPO, "bench_results", "ivf_offload_probe.json")
CACHE = os.path.join(REPO, ".ivf_cache")


def wall_ms(fn, warm=1, reps=3):
    """Wall-clock (host) per call — the right metric for the offloaded
    path, whose cost is host gather + transfer + device, serialized."""
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=8, help="Mrows")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    from image_retrieval_tpu.index.ivf import IVFIndex

    n = (1 << 16) if args.quick else int(args.rows * (1 << 20))
    nlist = 64 if args.quick else 4096
    rng = np.random.default_rng(0)
    out = []

    os.makedirs(CACHE, exist_ok=True)
    cache_path = os.path.join(CACHE, f"ivf{n >> 20}m_n{nlist}.npz")
    g, centers = make_rows(n, True, rng)
    if os.path.exists(cache_path) and not args.rebuild:
        t0 = time.time()
        ivf = IVFIndex.load(cache_path)
        rec(out, RESPATH, name="load", path=cache_path,
            load_s=round(time.time() - t0, 1), nlist=ivf.nlist,
            lmax=ivf._lmax)
    else:
        t0 = time.time()
        ivf = IVFIndex(nlist=nlist, nprobe=8, seed=0, dtype="int8")
        ivf.build(g, balance=1.5, replicas=1,
                  train_size=min(512 << 10, n))
        rec(out, RESPATH, name="build", nlist=nlist, lmax=ivf._lmax,
            build_s=round(time.time() - t0, 1))
        t0 = time.time()
        ivf.save(cache_path)
        rec(out, RESPATH, name="save", save_s=round(time.time() - t0, 1),
            mb=round(os.path.getsize(cache_path) / 1e6))

    # query mixes (clustered model, unit)
    def norm(q):
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    spread = norm(centers[rng.integers(0, len(centers), 64)]
                  + (0.5 / np.sqrt(D)) * rng.normal(size=(64, D)).astype(np.float32))
    base8 = centers[rng.integers(0, len(centers), 8)]
    focused = norm(np.repeat(base8, 8, axis=0)
                   + (0.5 / np.sqrt(D)) * rng.normal(size=(64, D)).astype(np.float32))

    nprobe = 8
    res = {}
    for tag, qs in (("spread", spread), ("focused", focused)):
        ms = wall_ms(lambda qs=qs: ivf.search(qs, top_k=K, nprobe=nprobe))
        res[tag] = ivf.search(qs, top_k=K, nprobe=nprobe)
        rec(out, RESPATH, name=f"resident_{tag}", batch=64, nprobe=nprobe,
            wall_ms=round(ms, 1), ms_per_query=round(ms / 64, 3))

    ivf.offload()
    for tag, qs in (("spread", spread), ("focused", focused)):
        # bytes moved = unique probed clusters x lmax x D (int8) + scales/ids
        from image_retrieval_tpu.index.ivf import _probe_ids

        _, probe = _probe_ids(jnp.asarray(qs), ivf._centroids, nprobe)
        uniq = np.unique(np.asarray(probe))
        moved_mb = len(uniq) * ivf._lmax * (D + 8) / 1e6
        ms = wall_ms(lambda qs=qs: ivf.search(qs, top_k=K, nprobe=nprobe))
        ov, oi = ivf.search(qs, top_k=K, nprobe=nprobe)
        same = all(
            set(a.tolist()) == set(b.tolist()) for a, b in zip(oi, res[tag][1])
        )
        rec(out, RESPATH, name=f"offloaded_{tag}", batch=64, nprobe=nprobe,
            wall_ms=round(ms, 1), ms_per_query=round(ms / 64, 3),
            unique_clusters=int(len(uniq)), moved_mb=round(moved_mb, 1),
            matches_resident=bool(same))

    # context: the streamed-exact tier at this scale moves the whole packed
    # gallery per sweep
    rec(out, RESPATH, name="context_streamed_exact", rows=n,
        full_stream_mb=round(n * D / 1e6),
        note="see bench_results/streaming_probe.json for measured "
             "streamed-exact sweeps (transfer-bound)")
    print("done", flush=True)


if __name__ == "__main__":
    main()
