"""Scale-tier walkthrough: the serving engine for every gallery size.

Runs self-contained on any backend (CPU included; an 8-device virtual mesh
via XLA_FLAGS=--xla_force_host_platform_device_count=8 exercises the
sharded tiers):

    python examples/scale_tiers.py

The tiers, smallest to largest (measured operating points and crossovers in
ARCHITECTURE.md; all share one result contract):

  1. HBM-resident exact      — default to ~27M int8 rows/chip; recall 1.0
  2. HBM-resident IVF        — >=~4M clustered rows, sub-0.1 ms/query at
                               recall ~0.96 (auto: SearchConfig nlist=0)
  3. projection screen       — int8 sketch sweep -> exact rerank; rebuild
                               after mutations is one matmul (vs an IVF
                               k-means), no cluster structure assumed
  4. int4 capacity tier      — nibble-packed device rows (~2x resident
                               rows/chip, ~54M on v5e); two-phase search
                               (int4 screen -> exact int8 rerank from the
                               host copy), cosine-only
  5. mesh-sharded exact/IVF  — rows (or cluster slabs) sharded over chips,
                               k-sized ICI merges; transparent via the mesh
  6. offloaded IVF           — slabs in host RAM, only PROBED slabs move
                               per query batch (beyond-HBM ANN)
  7. streamed exact          — whole gallery chunks double-buffered from
                               host RAM (beyond-HBM, recall 1.0; int4
                               galleries stream packed: half the bytes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex
    from image_retrieval_tpu.index.ivf import IVFIndex, recommended_ivf

    rng = np.random.default_rng(0)
    n, d = 20_000, 64
    centers = rng.normal(size=(64, d)).astype(np.float32) * 3
    emb = (centers[rng.integers(0, 64, n)]
           + rng.normal(size=(n, d)).astype(np.float32) * 0.5)
    queries = (centers[:4]
               + rng.normal(size=(4, d)).astype(np.float32) * 0.3)
    paths = [f"img{i}.jpg" for i in range(n)]

    # 0) the planner: turns a corpus size into the measured-best tier
    #    (index/plan.py — every crossover cites a hardware capture).
    #    Latency-hungry multi-M resident plans flip approx_select
    #    (approximate candidate SET, true scores, 5.8x batched at 16M).
    from image_retrieval_tpu.index.plan import plan_index

    for rows in (1_000_000, 16_000_000, 60_000_000):
        p = plan_index(rows, dim=512)
        print(f"[0] plan {rows:>11,} rows -> {p.tier} "
              f"(approx_select={p.index.approx_select}, "
              f"est {p.est_batched_ms_per_query} ms/query batched)")

    # 1) HBM-resident exact: the default engine (int8 storage: 4x less HBM)
    idx = ShardedVectorIndex(dim=d, config=IndexConfig(dtype="int8"))
    idx.insert(paths, emb)
    ev, ei = idx.search(queries, top_k=10)
    print(f"[1] resident exact: top hit {paths[int(ei[0, 0])]} "
          f"(score {ev[0, 0]:.3f})")

    # 2) HBM-resident IVF: explicit, or auto via recommended_ivf /
    #    SearchConfig(nlist=0) once the gallery crosses the measured
    #    crossover (~4M rows; this demo forces it at 20k)
    print(f"    auto operating point at 8M rows: {recommended_ivf(8 << 20)}")
    ivf = IVFIndex.from_index(idx, nlist=64, nprobe=8)
    av, ai = ivf.search(queries, top_k=10)
    recall = len(set(ai[0].tolist()) & set(ei[0].tolist())) / 10
    print(f"[2] resident IVF (nlist=64, nprobe=8): recall@10 {recall:.2f} "
          f"scanning ~{8 * ivf._lmax / n:.0%} of rows")

    # 3) projection screen: phase-1 int8 sketch sweep (HBM reads scale as
    #    sketch_dims/D), phase-2 exact rerank of the candidate pool. Same
    #    candidate contract as IVF; rebuilds in seconds after mutations.
    from image_retrieval_tpu.index.screen import ScreenedSearch

    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=128)
    cv, ci = scr.search(queries, top_k=10)
    s_recall = len(set(ci[0].tolist()) & set(ei[0].tolist())) / 10
    print(f"[3] projection screen (ds=16, C=128): recall@10 {s_recall:.2f}, "
          f"phase-1 reads {16 / d:.0%} of the exact sweep's bytes")

    # 4) int4 capacity tier: device rows nibble-packed (half of int8's
    #    HBM), search two-phase — the packed screen's top rerank_c rows
    #    rerank EXACTLY against the host int8 copy, so scores match the
    #    int8 index for the same rows.
    i4 = ShardedVectorIndex(
        dim=d, config=IndexConfig(dtype="int4", rerank_c=128))
    i4.insert(paths, emb)
    qv, qi = i4.search(queries, top_k=10)
    i4_recall = len(set(qi[0].tolist()) & set(ei[0].tolist())) / 10
    print(f"[4] int4 two-phase: recall@10 {i4_recall:.2f} vs int8, device "
          f"rows at {d // 2}/{d} bytes (2x resident capacity)")

    # 4b) int4 LATENCY mode (rerank_device=True): the int8 rows ALSO live
    #     on device, so the exact rerank fuses into the screen dispatch —
    #     one fetch per search, and the screen sweeps half the int8
    #     bytes (16M x 512 measured: 30.2 ms vs the int8 sweep's 57-61 ms
    #     per 64-query batch; int4_prod_probe.json). Needs the Pallas
    #     paired layout (dim % 512 == 0) — at this demo's d=64 it would
    #     fall back to the host rerank, so shown at dim=512.
    d5, n5 = 512, 2048
    emb5 = rng.normal(size=(n5, d5)).astype(np.float32)
    lat = ShardedVectorIndex(
        dim=d5, config=IndexConfig(embedding_dim=d5, dtype="int4",
                                   rerank_c=128, capacity_step=2048,
                                   rerank_device=True))
    lat.insert([f"r{i}" for i in range(n5)], emb5)
    i8ref = ShardedVectorIndex(
        dim=d5, config=IndexConfig(embedding_dim=d5, dtype="int8"))
    i8ref.insert([f"r{i}" for i in range(n5)], emb5)
    q5 = rng.normal(size=(4, d5)).astype(np.float32)
    lv, li = lat.search(q5, top_k=10)
    rv, ri = i8ref.search(q5, top_k=10)
    lat_rec = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                       for a, b in zip(li, ri)])
    print(f"[4b] int4 latency mode (fused device rerank): recall@10 "
          f"{lat_rec:.2f} vs int8, ONE dispatch per search at half the "
          f"int8 sweep bytes (1.5x int8 HBM)")

    # 5) mesh-sharded: all engines ride the index's mesh transparently.
    #    ShardedVectorIndex shards rows over the data axis at insert;
    #    from_index attaches the same mesh to the IVF (cluster-granular);
    #    the screen's sketch shards alongside the gallery rows.
    ndev = len(jax.devices())
    where = (ivf._mesh is not None
             and ivf._mesh.shape[ivf._mesh_axis] > 1)
    print(f"[5] mesh: {ndev} device(s); exact rows sharded, "
          f"IVF cluster-sharded={where}")

    # 6) offloaded IVF: beyond-HBM ANN. Slabs live in host RAM; a search
    #    moves only the query batch's unique probed slabs to the device.
    off = IVFIndex.from_index(idx, nlist=64, nprobe=8).offload()
    ov, oi = off.search(queries, top_k=10)
    assert set(oi[0].tolist()) == set(ai[0].tolist())
    moved = 8 * off._lmax * d  # worst-case bytes per single query (int8)
    print(f"[6] offloaded IVF: identical results, <= {moved / 1e6:.1f} MB "
          f"moved per query vs {n * d / 1e6:.1f} MB full-gallery stream")

    # 7) streamed exact: the whole-gallery beyond-HBM fallback (recall 1.0
    #    for adversarially unclustered data). Threshold-gated in config.
    sidx = ShardedVectorIndex(
        dim=d, config=IndexConfig(dtype="int8", stream_threshold_bytes=1)
    )
    sidx.insert(paths, emb)
    sv, si = sidx.search(queries, top_k=10)
    assert list(si[0]) == list(ei[0])
    print(f"[7] streamed exact: streamed={sidx._stream is not None}, "
          "results identical to resident")


if __name__ == "__main__":
    main()
