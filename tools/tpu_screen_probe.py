"""Projection-screened two-phase search: recall/latency on the real TPU.

Grid over sketch width ds and candidate pool C at 1M (and optionally 8M)
x 512 int8 rows, clustered + unclustered (same data models as the IVF
probes — tools/tpu_ivf8m_probe.py documents the noise-norm scaling).
Ground truth is the production exact int8 sweep on the SAME index, so
recall isolates the sketch's candidate loss.

The sweep-phase bound: the exact int8 sweep is HBM-bound, so phase 1 at
width ds reads ds/512 of its bytes; phase 2 adds Q*C*D gathered bytes
(tiny). The question the probe answers: where does (ds, C) land on
recall vs speedup, and does it beat the exact sweep's 0.90 ms single /
~0.02 ms/query batched at 1M?

Run:  python tools/tpu_screen_probe.py [--rows 1] [--quick]
Writes bench_results/screen_probe.json
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
from tools.tpu_ivf8m_probe import make_rows, rec

D = 512
K = 10
NQ = 256


def one_vs_two_ms(run):
    """Median one-vs-two dispatch difference (bench.py device_seconds
    methodology: cancels the tunnel's drifting fetch RTT).

    Tag discipline: warms on tag 0, then consumes tags 3r+1..3r+3 per
    sample (max 9) so no dispatch reuses the immediately preceding tag —
    a warm input re-dispatched right away could be replay-cached and
    collapse the one-dispatch leg to ~RTT. Callers' input pools may cycle
    (i % poolsize) but should cover >= 4 distinct tags; 10 is ideal."""
    _ = jax.device_get(run(0))
    ts = []
    for r in range(3):
        a = run(3 * r + 1)
        t0 = time.perf_counter(); _ = jax.device_get(a); t1 = time.perf_counter()
        b = run(3 * r + 2)
        c = run(3 * r + 3)
        t2 = time.perf_counter(); _ = jax.device_get(c); t3 = time.perf_counter()
        del b
        ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=1, help="Mrows")
    ap.add_argument("--quick", action="store_true", help="tiny CPU sanity run")
    ap.add_argument("--only", choices=("clu", "unc"), default=None)
    ap.add_argument("--grid", default=None,
                    help="override the (ds:c[:method]) grid, e.g. "
                         "'128:128,128:512:random' — for targeted 8M runs")
    ap.add_argument("--no-streamed", action="store_true",
                    help="skip the streamed-screen section")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env var alone does not "
                         "stop the axon plugin — CLAUDE.md)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    out = []
    respath = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "screen_probe.json")

    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex
    from image_retrieval_tpu.index.screen import ScreenedSearch, _screened_topc

    n = int(args.rows * (1 << 20)) if not args.quick else (1 << 15)
    rng = np.random.default_rng(0)

    halves = {"clu": (True,), "unc": (False,)}.get(args.only, (True, False))
    for clustered in halves:
        tag_d = "clu" if clustered else "unc"
        g, centers = make_rows(n, clustered, rng)
        if clustered:
            qidx = rng.integers(0, len(centers), NQ)
            queries = centers[qidx] + (0.5 / np.sqrt(D)) * rng.normal(
                size=(NQ, D)).astype(np.float32)
        else:
            queries = rng.normal(size=(NQ, D)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)

        idx = ShardedVectorIndex(
            dim=D, config=IndexConfig(dtype="int8", capacity_step=1 << 20))
        step = 1 << 20
        for s in range(0, n, step):
            e = min(s + step, n)
            idx.insert([str(i) for i in range(s, e)], g[s:e])
        del g
        idx.load()

        # ground truth + exact baseline timing through the production path
        _, gt_ids = idx.search(queries, top_k=K)
        qs64 = [queries[i * 64: (i + 1) * 64] for i in range(4)]

        from image_retrieval_tpu.parallel.collectives import sharded_search_topk

        def run_exact(i, qs=qs64):
            qdev, _, _ = idx._prep_queries(qs[i % 4])
            return sharded_search_topk(
                qdev, idx._gallery, idx._valid, idx._mags, K,
                "cosine_similarity", None, idx._scales,
                mesh=idx.mesh, axis=idx.axis)[0]

        ms64 = one_vs_two_ms(run_exact)
        ms1 = one_vs_two_ms(lambda i: run_exact(i, qs=[q[None] for q in queries[:4]]))
        rec(out, respath, name=f"exact_int8_{tag_d}", rows=n,
            batch64_ms=round(ms64, 3), ms_per_query=round(ms64 / 64, 4),
            single_ms=round(ms1, 3))

        if args.grid:
            grid = []
            for spec in args.grid.split(","):
                parts = spec.split(":")
                grid.append((int(parts[0]), int(parts[1]),
                             parts[2] if len(parts) > 2 else "pca"))
        elif args.quick:
            grid = [(64, 128, "pca")]
        else:
            grid = [
                (64, 128, "pca"),
                (128, 128, "pca"),
                (128, 512, "pca"),
                (256, 128, "pca"),
                (128, 128, "random"),
            ]
        for ds, c, method in grid:
            t0 = time.time()
            scr = ScreenedSearch.from_index(
                idx, sketch_dims=ds, candidates=c, method=method)
            build_s = time.time() - t0
            _, si = scr.search(queries, top_k=K)
            recall = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(si, gt_ids)
            ]))

            qu = queries
            proj = scr.proj

            def run_scr(i, qs=qs64, p1b=scr.p1_block):
                q = qs[i % 4]
                qdev, _, _ = idx._prep_queries(q)
                qsdev, _, _ = idx._prep_queries(q @ proj)
                return _screened_topc(
                    qsdev, qdev, scr._sketch, scr._sk_scales,
                    idx._gallery, idx._valid, idx._scales,
                    min(c, idx.capacity), True,
                    mesh=idx.mesh, slice_axis=None, data_axis=idx.axis,
                    p1_block=p1b)[0]

            sms64 = one_vs_two_ms(run_scr)
            sms1 = one_vs_two_ms(
                lambda i: run_scr(i, qs=[q[None] for q in qu[:4]]))
            rec(out, respath, name=f"screen_{tag_d}_ds{ds}_c{c}_{method}",
                ds=ds, candidates=c, method=method,
                recall_at_10=round(recall, 4),
                batch64_ms=round(sms64, 3), ms_per_query=round(sms64 / 64, 4),
                single_ms=round(sms1, 3), build_s=round(build_s, 2),
                speedup_b64=round(ms64 / max(sms64, 1e-9), 2),
                speedup_1q=round(ms1 / max(sms1, 1e-9), 2))
            if (ds, c) == (128, 128):
                # head-to-head: direct full-width phase-1 top_k (the
                # pre-r3c form) vs the default blocked running merge
                dms64 = one_vs_two_ms(lambda i: run_scr(i, p1b=1 << 30))
                dms1 = one_vs_two_ms(
                    lambda i: run_scr(i, qs=[q[None] for q in qu[:4]],
                                      p1b=1 << 30))
                rec(out, respath,
                    name=f"screen_{tag_d}_ds{ds}_c{c}_{method}_p1direct",
                    batch64_ms=round(dms64, 3),
                    ms_per_query=round(dms64 / 64, 4),
                    single_ms=round(dms1, 3))
            del scr

        # streamed screen: the same gallery forced beyond-HBM. The path
        # includes host gathers + puts, so time whole search() calls
        # (wall clock, warm) — the honest number for a host-in-the-loop
        # engine; report bytes moved per batch for the transfer story.
        if not args.quick and not args.no_streamed:
            sidx = ShardedVectorIndex(
                dim=D, config=IndexConfig(
                    dtype="int8", capacity_step=1 << 20,
                    stream_threshold_bytes=1,
                ))
            g2 = idx._host_gallery[: idx.count]  # reuse quantized rows
            sc2 = idx._host_scales[: idx.count]
            sidx._grow_to(idx.count)
            sidx._host_gallery[: idx.count] = g2
            sidx._host_scales[: idx.count] = sc2
            sidx._host_mags[: idx.count] = idx._host_mags[: idx.count]
            sidx._host_valid[: idx.count] = True
            sidx.paths = list(idx.paths)
            sidx.count = idx.count
            sidx._device_dirty = True
            # g2/sc2 are VIEWS into idx's buffers — drop them too or
            # `del idx` frees nothing and the probe holds two galleries
            del g2, sc2, idx
            t0 = time.time()
            scr = ScreenedSearch.from_index(
                sidx, sketch_dims=128, candidates=128)
            build_s = time.time() - t0
            assert scr.streamed
            _, si = scr.search(queries, top_k=K)
            recall = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(si, gt_ids)
            ]))
            _ = scr.search(qs64[0], top_k=K)  # warm both jits
            ts = []
            for r in range(5):
                t0 = time.perf_counter()
                _ = scr.search(qs64[r % 4], top_k=K)
                ts.append(time.perf_counter() - t0)
            wall64 = float(np.median(ts)) * 1e3
            rec(out, respath, name=f"screen_streamed_{tag_d}_ds128_c128",
                recall_at_10=round(recall, 4),
                batch64_wall_ms=round(wall64, 2),
                ms_per_query=round(wall64 / 64, 4),
                build_s=round(build_s, 2),
                bytes_per_batch=64 * 128 * (D + 4),
                exact_stream_bytes_per_sweep=n * D)
            del scr, sidx
        else:
            del idx

    print("done", flush=True)


if __name__ == "__main__":
    main()
