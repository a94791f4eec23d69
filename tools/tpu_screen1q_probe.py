"""Single-query latency, scan-amortized: exact int8 sweep vs screen tier.

The screen_probe's single_ms readings use one-vs-two differencing on ONE
sub-RTT dispatch — at 0.3–3 ms of device time against ~30–45 ms of drifting
tunnel RTT several samples clamp to the 1e-9 floor (screen_probe.json rows
with single_ms 0.0 / absurd speedup_1q). This probe instead amortizes a
lax.scan of NQ=64 DISTINCT single-query passes inside one dispatch
(bench.py's cosine_p50 methodology) and differences the whole scan — the
per-iteration noise floor drops 64x.

Cases at --rows Mrows (clustered + unclustered, the IVF probes' data
models): exact int8 sweep (production _masked_shard_scores math, plain jnp
form) and the screened two-phase at (ds=128, C=128) pca + random.

Run:  python tools/tpu_screen1q_probe.py [--rows 1]
Writes bench_results/screen1q_probe.json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tools.tpu_embed_probe import _enable_cache
from tools.tpu_ivf8m_probe import make_rows, rec
from tools.tpu_screen_probe import one_vs_two_ms

D = 512
K = 10
NQ = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=1, help="Mrows")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env var alone does not "
                         "stop the axon plugin — CLAUDE.md)")
    ap.add_argument("--only", choices=("clu", "unc"), default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    out = []
    respath = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "screen1q_probe.json")

    from image_retrieval_tpu.index.screen import (
        _fit_projection,
        _phase1_local_topc,
        _quantize_rows_int8,
        _RESIDENT_P1_BLOCK,
    )
    from image_retrieval_tpu.ops.topk import exact_topk

    n = int(args.rows * (1 << 20)) if not args.quick else (1 << 15)
    rng = np.random.default_rng(0)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    del mesh1  # single-shard math is plain jnp below; no collective needed

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

        g8, sc8 = jax.jit(_quantize_rows_int8)(jnp.asarray(g))
        g8 = jax.device_put(g8)
        _ = jax.device_get(g8[0, 0])
        del g

        # ---- exact int8 sweep, 64 independent single-query passes ----------
        @jax.jit
        def exact_scan(g, s, qs):
            def step(_, q):
                dots = jnp.dot(
                    q[None].astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32,
                ) * s[None, :]
                return None, jax.lax.top_k(dots, K)
            return jax.lax.scan(step, None, qs)[1]

        qpool = [jnp.asarray(queries + 1e-6 * i) for i in range(10)]
        ms = one_vs_two_ms(
            lambda i: exact_scan(g8, sc8, qpool[i % 10])
        )
        rec(out, respath, name=f"exact_int8_1q_{tag_d}", rows=n,
            scan64_ms=round(ms, 3), ms_per_query=round(ms / NQ, 4))

        gt = np.asarray(jax.device_get(exact_scan(g8, sc8, qpool[0])[1]))[:, 0]

        # ---- screened two-phase, same scan shape ---------------------------
        for method in ("pca", "random"):
            ds, c = 128, 128
            if method == "pca":
                x = np.asarray(jax.device_get(g8), np.float32) * np.asarray(
                    jax.device_get(sc8))[:, None]
                # chunked host second moment (1 core: BLAS does the work)
                cov = np.zeros((D, D), np.float64)
                step_r = 1 << 20
                for s0 in range(0, n, step_r):
                    xc = x[s0:s0 + step_r]
                    cov += xc.T @ xc
                del x
                proj = _fit_projection(D, ds, "pca", 0, cov)
            else:
                proj = _fit_projection(D, ds, "random", 0, None)
            pj = jnp.asarray(proj)

            @jax.jit
            def sketch_of(g, s, p):
                xdq = g.astype(jnp.float32) * s[:, None]
                return _quantize_rows_int8(
                    jnp.dot(xdq, p, preferred_element_type=jnp.float32))

            sk, sks = sketch_of(g8, sc8, pj)
            _ = jax.device_get(sk[0, 0])
            valid = jnp.ones((n,), jnp.bool_)

            @jax.jit
            def screen_scan(g, s, sk, sks, v, p, qs):
                def step(_, q):
                    q1 = q[None]
                    p1v, cidx = _phase1_local_topc(
                        (q1 @ p).astype(jnp.bfloat16), sk, sks, v,
                        min(c, n), _RESIDENT_P1_BLOCK,
                    )
                    rows = jnp.take(g, cidx, axis=0)
                    r = jnp.einsum(
                        "qd,qcd->qc",
                        q1.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ) * jnp.take(s, cidx, axis=0)
                    r = jnp.where(
                        jnp.take(v, cidx, axis=0) & jnp.isfinite(p1v),
                        r, -jnp.inf)
                    vals, ii = exact_topk(r, min(c, n), descending=True)
                    gidx = jnp.take_along_axis(cidx, ii, axis=1)
                    return None, (vals[:, :K], gidx[:, :K])
                return jax.lax.scan(step, None, qs)[1]

            ms_s = one_vs_two_ms(
                lambda i: screen_scan(g8, sc8, sk, sks, valid, pj,
                                      qpool[i % 10])
            )
            si = np.asarray(jax.device_get(
                screen_scan(g8, sc8, sk, sks, valid, pj, qpool[0])[1]
            ))[:, 0]
            recall = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(si, gt)
            ]))
            rec(out, respath,
                name=f"screen_1q_{tag_d}_ds{ds}_c{c}_{method}",
                scan64_ms=round(ms_s, 3), ms_per_query=round(ms_s / NQ, 4),
                recall_at_10=round(recall, 4),
                speedup_vs_exact=round(ms / max(ms_s, 1e-9), 2))
            del sk, sks
        del g8, sc8, qpool

    print("done", flush=True)


if __name__ == "__main__":
    main()
