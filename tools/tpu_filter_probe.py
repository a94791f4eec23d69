"""Filtered-search cost probe: substantiate "filtering costs nothing".

ARCHITECTURE.md claims attribute filtering is mask substitution: the expr
mask replaces the tombstone mask inside the SAME masked-scan jit, so a
filtered steady-state query costs exactly the unfiltered sweep, and the
one-time costs are a host-side vectorized eval plus one (N,) bool ship.
This probe measures each piece at bench.py's conditions (1M x 512 int8
cosine top-10, scan-amortized one-vs-two-dispatch timing):

  1. host_eval_ms      — parse + vectorized numpy eval of a compound expr
                         ("color == 'red' and views >= 100") over N rows
  2. mask_ship_ms      — host->device transfer of the (N,) bool mask
                         (one-vs-two over put+consume, RTT cancelled)
  3. masked 1q ms      — the index's masked scan with (a) all-true mask
                         (tombstone-free baseline), (b) ~33% filter,
                         (c) ~3% selective filter — all the SAME jit
  4. bare 1q ms        — no-mask scan (bench.py's cosine_int8 cell) for
                         the mask-application overhead delta
  5. 64q batched       — masked vs bare QPS

Run:  python tools/tpu_filter_probe.py [--quick] [--cpu]
Writes bench_results/filter_probe.json
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
NQ = 16  # scan iterations per dispatch (1 query each)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny shapes")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env var alone does not "
                         "stop the axon plugin — CLAUDE.md)")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    _enable_cache()
    backend = jax.devices()[0].platform
    n = args.n or (65_536 if (args.quick or backend != "tpu") else 1_000_000)
    out = {"backend": backend, "n": n, "d": D, "k": K, "nq_per_scan": NQ}

    # -- gallery (device RNG, int8 norm-preserving like the index) -----------
    @jax.jit
    def make_gallery(key):
        g = jax.random.normal(key, (n, D), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        grid = jnp.maximum(jnp.max(jnp.abs(g), axis=1), 1e-12) / 127.0
        g8 = jnp.clip(jnp.round(g / grid[:, None]), -127, 127).astype(jnp.int8)
        qn = jnp.linalg.norm(g8.astype(jnp.float32), axis=1)
        return g8, (1.0 / jnp.where(qn > 0, qn, 1.0)).astype(jnp.float32)

    g8, sc = make_gallery(jax.random.PRNGKey(0))
    _ = jax.device_get(g8[0, 0])

    make_queries = jax.jit(
        lambda key: jax.random.normal(key, (NQ, 1, D), jnp.float32)
    )
    qs_pool = [make_queries(jax.random.PRNGKey(100 + i)) for i in range(10)]
    _ = jax.device_get(qs_pool[-1][0, 0, 0])

    # -- 1. host mask eval (AttributeStore vectorized path) ------------------
    from image_retrieval_tpu.index.filters import AttributeStore, parse_filter

    rng = np.random.default_rng(7)
    st = AttributeStore()
    st.kinds = {"color": "str", "views": "num"}
    st.vocab = {"color": {c: i for i, c in enumerate(
        ["red", "green", "blue", "cyan", "gray", "pink"])}}
    st.columns = {
        "color": rng.integers(0, 6, n).astype(np.int32),
        "views": rng.integers(0, 1000, n).astype(np.float64),
    }
    st.rows = n
    expr = "color == 'red' and views >= 100"
    sel_expr = "color == 'red' and views >= 970"
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        mask = st.evaluate(parse_filter(expr), n)
        ts.append(time.perf_counter() - t0)
    out["host_eval_ms"] = round(float(np.median(ts)) * 1e3, 3)
    sel_mask = st.evaluate(parse_filter(sel_expr), n)
    out["mask_density"] = round(float(mask.mean()), 4)
    out["sel_mask_density"] = round(float(sel_mask.mean()), 4)

    # -- 2. mask ship (put + consume, RTT-cancelled) --------------------------
    consume = jax.jit(lambda m: jnp.sum(m))
    mask_pool = [rng.random(n) < 0.33 for _ in range(10)]
    out["mask_ship_ms"] = round(
        one_vs_two_ms(lambda i: consume(jax.device_put(mask_pool[i % 10]))), 3)

    # -- 3/4. masked vs bare scan (the index's math) ---------------------------
    @jax.jit
    def cos8_scan_masked(g, s, v, qs):
        def step(_, q):
            qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
            dots = jnp.dot(qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
            dots = jnp.where(v[None, :], dots * s[None, :], -jnp.inf)
            return None, jax.lax.top_k(dots, K)
        return jax.lax.scan(step, None, qs)[1]

    @jax.jit
    def cos8_scan_bare(g, s, qs):
        def step(_, q):
            qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
            dots = jnp.dot(qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
            return None, jax.lax.top_k(dots * s[None, :], K)
        return jax.lax.scan(step, None, qs)[1]

    all_true = jax.device_put(np.ones(n, bool))
    mask_dev = jax.device_put(mask)
    sel_dev = jax.device_put(sel_mask)
    _ = jax.device_get(jnp.sum(sel_dev))

    for name, run in (
        ("bare_1q_ms", lambda i: cos8_scan_bare(g8, sc, qs_pool[i % 10])[0]),
        ("masked_alltrue_1q_ms",
         lambda i: cos8_scan_masked(g8, sc, all_true, qs_pool[i % 10])[0]),
        ("masked_filter_1q_ms",
         lambda i: cos8_scan_masked(g8, sc, mask_dev, qs_pool[i % 10])[0]),
        ("masked_selective_1q_ms",
         lambda i: cos8_scan_masked(g8, sc, sel_dev, qs_pool[i % 10])[0]),
    ):
        out[name] = round(one_vs_two_ms(run) / NQ, 4)
        print(f"{name}: {out[name]} ms", flush=True)

    # -- 5. batched 64q -------------------------------------------------------
    nqb = 64
    make_qb = jax.jit(
        lambda key: jax.random.normal(key, (nqb, D), jnp.float32))
    qb_pool = [make_qb(jax.random.PRNGKey(500 + i)) for i in range(10)]
    _ = jax.device_get(qb_pool[-1][0, 0])

    @jax.jit
    def cos8_batch_masked(g, s, v, q2):
        qn = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
        dots = jnp.dot(qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                       preferred_element_type=jnp.float32)
        return jax.lax.top_k(jnp.where(v[None, :], dots * s[None, :],
                                       -jnp.inf), K)

    @jax.jit
    def cos8_batch_bare(g, s, q2):
        qn = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
        dots = jnp.dot(qn.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                       preferred_element_type=jnp.float32)
        return jax.lax.top_k(dots * s[None, :], K)

    tb = one_vs_two_ms(lambda i: cos8_batch_bare(g8, sc, qb_pool[i % 10])[0])
    tm = one_vs_two_ms(
        lambda i: cos8_batch_masked(g8, sc, mask_dev, qb_pool[i % 10])[0])
    out["batched64_bare_ms"] = round(tb, 3)
    out["batched64_masked_ms"] = round(tm, 3)
    out["batched_qps_bare"] = round(nqb / (tb / 1e3), 1)
    out["batched_qps_masked"] = round(nqb / (tm / 1e3), 1)

    # correctness spot check: masked results all satisfy the filter
    vals, ids = jax.device_get(
        cos8_scan_masked(g8, sc, sel_dev, qs_pool[0]))
    ids = np.asarray(ids).reshape(-1, K)
    finite = np.isfinite(np.asarray(vals).reshape(-1, K))
    assert sel_mask[ids[finite]].all(), "masked scan returned excluded rows"
    out["correctness"] = "selective-mask results all satisfy the filter"

    path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "filter_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
