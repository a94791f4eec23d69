"""Single-read int8 fused-scorer rematch: XLA vs Pallas v1 vs v2 on TPU.

VERDICT r2 ("the Pallas retrieval bound is unclaimed"): the XLA int8
all-metric scorer reads the gallery twice (MXU dot fusion + elementwise
L1 sweep fusion) and measures 1.40 ms/query at 1M x 512, against a ~0.6 ms
single-read HBM bound; the r2 Pallas single-read kernel measured 5.8 ms.

This probe tests the r3 hypothesis (ARCHITECTURE.md ceiling analysis):
with live L1 the floor is the VPU sweep, not HBM, so the v1 kernel lost to
its own VPU waste (f32 casts + per-query matvec reductions), not to the
second read. v2 (ops/pallas_kernels.py::fused_optimized_scores_int8_pallas_v2)
strips the sweep to sub+abs+accumulate in bf16.

Measures, at 1M x 512 (bench.py's exact conditions — Q=1 per sweep,
weights (1,1,1,0,0.5)):
  * XLA int8 scorer (production baseline)
  * Pallas v1 (r2 kernel, one config — regression anchor)
  * Pallas v2 over block_n in {1024, 2048, 4096, 8192}
  * all of the above with the sweep dead ((1,0,1,0,0.5)) — calibrates
    Mosaic's bandwidth-bound dot against XLA's when both read once
  * v2 at Q=4 (shared-read amortization the XLA path cannot do)

Run:  python tools/tpu_scorer_probe.py [--quick]
Writes bench_results/scorer_probe.json
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
from tools.tpu_screen_probe import one_vs_two_ms

D = 512
K = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny shapes")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env var alone does not "
                         "stop the axon plugin — CLAUDE.md)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=None, help="rows override")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    from image_retrieval_tpu.ops.metrics import fused_optimized_scores_int8
    from image_retrieval_tpu.ops.pallas_kernels import (
        fused_optimized_scores_int8_pallas,
        fused_optimized_scores_int8_pallas_v2,
    )

    n = args.n or (1 << 14 if args.quick else 1 << 20)
    nscan = 2 if args.quick else 8  # sweeps per dispatch, amortizes overhead
    respath = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "scorer_probe.json")

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_gallery(k):
        g = jax.random.normal(k, (n, D), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        grid = jnp.maximum(jnp.max(jnp.abs(g), axis=1), 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(g / grid[:, None]), -127, 127).astype(jnp.int8)
        qn8 = jnp.linalg.norm(q8.astype(jnp.float32), axis=1)
        sc = 1.0 / jnp.where(qn8 > 0, qn8, 1.0)
        mag = jax.random.uniform(jax.random.fold_in(k, 1), (n,), jnp.float32,
                                 0.5, 2.0)
        return q8, sc, mag

    g8, sc, mags = make_gallery(key)
    _ = jax.device_get(g8[0, 0])
    print(f"gallery ready: {n} x {D} int8", flush=True)

    def scan_runner(score_fn, nq, extras=()):
        """One dispatch = lax.scan of nscan sweeps, each scoring an
        (nq, D) query block + top-k (bench.py's per-query scan shape).
        `extras` (e.g. the 1 GB shadow gallery) ride as jit ARGUMENTS —
        a closure capture would ship them through the remote compiler
        as constants (CLAUDE.md)."""
        @jax.jit
        def run(g, s, m, qs, *ex):
            def step(_, q):
                scores = score_fn(q, g, s, m, *ex)
                return None, jax.lax.top_k(scores, K)
            return jax.lax.scan(step, None, qs)[1]

        pool = [jax.device_put(np.random.default_rng(7 + i).standard_normal(
            (nscan, nq, D)).astype(np.float32)) for i in range(10)]
        _ = jax.device_get(pool[-1][0, 0, 0])
        return lambda i: run(g8, sc, mags, pool[i], *extras)

    out = {"n": n, "d": D, "nscan": nscan}
    results = []

    CASES = []
    for wname, w in (("live_l1", (1.0, 1.0, 1.0, 0.0, 0.5)),
                     ("dead_sweep", (1.0, 0.0, 1.0, 0.0, 0.5))):
        CASES.append((f"xla_{wname}_q1", lambda q, g, s, m, w=w:
                      fused_optimized_scores_int8(q, g, s, m, w), 1))
        CASES.append((f"pallas_v1_{wname}_q1_b2048", lambda q, g, s, m, w=w:
                      fused_optimized_scores_int8_pallas(
                          q, g, s, m, w, block_n=2048), 1))
        blocks = (2048,) if args.quick else (1024, 2048, 4096, 8192)
        for bn in blocks:
            CASES.append((f"pallas_v2_{wname}_q1_b{bn}",
                          lambda q, g, s, m, w=w, bn=bn:
                          fused_optimized_scores_int8_pallas_v2(
                              q, g, s, m, w, block_n=bn), 1))
    # pre-dequantized bf16 shadow for the L1 sweep (bit-identical; trades
    # 2x sweep-read bytes for one less VPU op/element — ops/metrics.py
    # make_l1_shadow). Only meaningful with the sweep live.
    from image_retrieval_tpu.ops.metrics import (
        fused_optimized_scores_int8_shadow,
        make_l1_shadow,
    )

    shadow = jax.jit(make_l1_shadow)(g8, sc, mags)
    _ = jax.device_get(shadow[0, 0])
    CASES.append(("xla_shadow_live_l1_q1", lambda q, g, s, m, sh:
                  fused_optimized_scores_int8_shadow(
                      q, g, s, m, sh, (1.0, 1.0, 1.0, 0.0, 0.5)), 1,
                  (shadow,)))
    # shared-read amortization at Q=4 (per-query ms = total / 4)
    CASES.append(("xla_live_l1_q4", lambda q, g, s, m:
                  fused_optimized_scores_int8(q, g, s, m,
                                              (1.0, 1.0, 1.0, 0.0, 0.5)), 4))
    CASES.append(("pallas_v2_live_l1_q4_b2048", lambda q, g, s, m:
                  fused_optimized_scores_int8_pallas_v2(
                      q, g, s, m, (1.0, 1.0, 1.0, 0.0, 0.5), block_n=2048), 4))

    for name, fn, nq, *rest in CASES:
        try:
            t0 = time.time()
            runner = scan_runner(fn, nq, extras=rest[0] if rest else ())
            ms = one_vs_two_ms(runner) / nscan / nq
            results.append({"case": name, "per_query_ms": round(ms, 4),
                            "compile_s": round(time.time() - t0, 1)})
            print(f"{name}: {ms:.4f} ms/query", flush=True)
        except Exception as e:  # Mosaic rejections etc. — record, continue
            results.append({"case": name, "error": str(e)[:300]})
            print(f"{name}: ERROR {str(e)[:120]}", flush=True)

    out["results"] = results
    os.makedirs(os.path.dirname(respath), exist_ok=True)
    with open(respath, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {respath}", flush=True)


if __name__ == "__main__":
    main()
