"""Single-query fused multi-metric: chasing the single-read bound.

The production int8 scorer (`fused_optimized_scores_int8`) measures 1.40 ms
per query at 1M x 512 vs a ~0.6 ms single-read bound; ARCHITECTURE.md
attributes the gap to XLA compiling the MXU dot and the elementwise L1
sweep as SEPARATE fusions — two reads of the 0.5 GB int8 gallery. A Pallas
single-read kernel measured 5.8 ms (Mosaic matvec codegen).

This probe tries the remaining formulation: keep everything in ONE
elementwise+reduce fusion by computing the dot on the VPU inside the same
(Q, N, D) sweep that produces L1 — no MXU dot, so XLA has no reason to
split the read. Two variants:
  v_derive: dot derived from the already-materialized diff tensor
            (<diff, q> = m*sc*<g8,q> - ||q||^2, one extra multiply-reduce
            over values already in registers)
  v_direct: dot as its own g8*q multiply-reduce (multi-output fusion over
            the shared g8 read)
Plus the production baseline re-measured in the same session, and the
same three at Q=4 to see where the MXU starts winning.

Run: python tools/tpu_fused1q_probe.py
Writes bench_results/fused1q_probe.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_embed_probe import _enable_cache

N, D, K = 1 << 20, 512, 10
WEIGHTS = (1.0, 1.0, 1.0, 0.0, 0.5)  # reference optimum: w_inf dead
RESPATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_results", "fused1q_probe.json",
)


def singlepass_scores(q, g8, sc, m, weights, derive_dot):
    """All live metric terms from ONE (Q, N, D) elementwise sweep.

    Norm-preserving scales (sc * g8 is exactly unit) keep the angle/L2
    identities of fused_optimized_scores_int8; the dot moves off the MXU
    onto the VPU so it can fuse with the L1 reduction."""
    w_angle, w_l1, w_l2, w_inf, w_mag = weights
    q = q.astype(jnp.float32)
    d = q.shape[-1]
    qb = q.astype(jnp.bfloat16)
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)  # (Q, 1)
    row_scale = (sc * m).astype(jnp.bfloat16)  # (N,)
    diff = (
        g8.astype(jnp.bfloat16)[None, :, :] * row_scale[None, :, None]
        - qb[:, None, :]
    )  # (Q, N, D)
    l1 = jnp.sum(jnp.abs(diff), axis=-1, dtype=jnp.float32) / d  # (Q, N)
    if derive_dot:
        # <diff, q> = m*sc*<g8, q> - ||q||^2  =>  m*<unit, q> = <diff,q>+qn^2
        dq = jnp.sum(diff * qb[:, None, :], axis=-1, dtype=jnp.float32)
        mdots = dq + qn**2  # (Q, N) = m * <unit row, q>
        udots = mdots / m[None, :]
    else:
        raw = jnp.sum(
            g8.astype(jnp.bfloat16)[None, :, :] * qb[:, None, :],
            axis=-1, dtype=jnp.float32,
        )
        udots = raw * sc[None, :]
        mdots = udots * m[None, :]
    score = jnp.float32(w_angle) * jnp.where(qn > 0, udots / jnp.where(qn > 0, qn, 1.0), 0.0)
    score = score - jnp.float32(w_l1) * l1
    sq = jnp.maximum(m[None, :] ** 2 - 2.0 * mdots + qn**2, 0.0)
    score = score - jnp.float32(w_l2) * (jnp.sqrt(sq) / jnp.sqrt(jnp.float32(d)))
    if not (isinstance(w_inf, float) and w_inf == 0.0):
        score = score - jnp.float32(w_inf) * jnp.max(jnp.abs(diff), axis=-1).astype(jnp.float32)
    score = score - jnp.float32(w_mag) * jnp.abs(m[None, :] - qn)
    return score


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    from image_retrieval_tpu.ops.metrics import fused_optimized_scores_int8

    rng = np.random.default_rng(0)
    g = rng.normal(size=(N, D)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    am = np.maximum(np.abs(g).max(axis=1), 1e-12)
    grid = (am / 127.0).astype(np.float32)
    g8 = np.clip(np.rint(g / grid[:, None]), -127, 127).astype(np.int8)
    qn8 = np.linalg.norm(g8.astype(np.float32), axis=1)
    sc = (1.0 / np.where(qn8 > 0, qn8, 1.0)).astype(np.float32)
    mags = rng.uniform(5.0, 15.0, N).astype(np.float32)

    dg8 = jax.device_put(g8)
    dsc = jax.device_put(jnp.asarray(sc))
    dm = jax.device_put(jnp.asarray(mags))
    _ = jax.device_get(dg8[0, 0])

    out = []

    def rec(**kw):
        out.append(kw)
        with open(RESPATH, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(kw), flush=True)

    # ---- numerics: single-pass vs production on a 4k slice (f64 host ref)
    qs_small = rng.normal(size=(4, D)).astype(np.float32)
    base = np.asarray(
        fused_optimized_scores_int8(
            jnp.asarray(qs_small), dg8[:4096], dsc[:4096], dm[:4096], WEIGHTS
        )
    )
    for name, dd in (("derive", True), ("direct", False)):
        got = np.asarray(
            jax.jit(singlepass_scores, static_argnames=("weights", "derive_dot"))(
                jnp.asarray(qs_small), dg8[:4096], dsc[:4096], dm[:4096],
                weights=WEIGHTS, derive_dot=dd,
            )
        )
        err = float(np.abs(got - base).max())
        rel = float(np.abs(got - base).max() / np.abs(base).max())
        rec(name=f"parity_{name}", max_abs_err=round(err, 5),
            max_rel_err=round(rel, 6))

    # ---- timing: scan over NQ single queries per dispatch, one-vs-two diff
    def timed(scan_fn, make_qs, nq, repeats=3):
        pool = [make_qs(jax.random.PRNGKey(100 + i)) for i in range(3 * repeats + 1)]
        _ = jax.device_get(pool[-1][0, 0, 0])
        _ = jax.device_get(scan_fn(pool[0]))  # compile+warm
        ts = []
        tag = 1
        for _r in range(repeats):
            a = scan_fn(pool[tag]); tag += 1
            t0 = time.perf_counter(); _ = jax.device_get(a); t1 = time.perf_counter()
            b = scan_fn(pool[tag]); tag += 1
            c = scan_fn(pool[tag]); tag += 1
            t2 = time.perf_counter(); _ = jax.device_get(c); t3 = time.perf_counter()
            del b
            ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
        return float(np.median(ts)) / nq * 1e3  # ms per query-group item

    for qrows in (1, 4):
        nq = 64 // qrows
        make_qs = jax.jit(
            lambda key, nq=nq, qrows=qrows: jax.random.normal(
                key, (nq, qrows, D), jnp.float32
            )
        )

        @jax.jit
        def prod_scan(qs):
            def step(_, q):
                s = fused_optimized_scores_int8(q, dg8, dsc, dm, WEIGHTS)
                return None, jax.lax.top_k(s, K)
            return jax.lax.scan(step, None, qs)[1]

        ms = timed(prod_scan, make_qs, nq)
        rec(name=f"production_q{qrows}", ms_per_dispatch_item=round(ms, 4),
            ms_per_query=round(ms / qrows, 4))

        for vname, dd in (("derive", True), ("direct", False)):
            @jax.jit
            def sp_scan(qs, dd=dd):
                def step(_, q):
                    s = singlepass_scores(q, dg8, dsc, dm, WEIGHTS, dd)
                    return None, jax.lax.top_k(s, K)
                return jax.lax.scan(step, None, qs)[1]

            ms = timed(sp_scan, make_qs, nq)
            rec(name=f"singlepass_{vname}_q{qrows}",
                ms_per_dispatch_item=round(ms, 4),
                ms_per_query=round(ms / qrows, 4))

    print("done", flush=True)


if __name__ == "__main__":
    main()
