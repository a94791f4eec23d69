"""TPU probe: is the EXACT int8 sweep at 16M selection-bound, and can
tiling fix it without giving up exactness?

Motivation (r4): the int4 screen's 431 ms regression turned out to be
exact lax.top_k over the (64, 16M) plane (int4_isolate_probe.json:
6.2 ms/query for k=128 on RANDOM scores, and 1.58 ms/query even at k=10 —
more than the int8 sweep's total!). The resident int8 sweep runs 57-61 ms
per 64-query batch at 16M = ~260 GB/s counting the score plane — 3x below
the 1M-scale rate. Hypothesis: the same selection cliff. Candidate fixes
measured here, all EXACT (bitwise-identical result sets):

  baseline_fused      dot + lax.top_k(k=10) over the full plane (current
                      sharded_search_topk shape)
  tiled_scan          lax.scan over 2M-row tiles: dot + top_k per tile +
                      running merge (ops/int4.py screen_int4_topc pattern;
                      per-tile selection is in the cheap narrow regime)
  approx_sel          lax.approx_max_k(k=10) over the full plane — NOT
                      exact (recall ~0.95-0.99); measured as the bound on
                      what selection could cost
  approx128_rerank    approx_max_k(k=128) -> exact top-10 of the returned
                      (true) values — exact iff the true top-10 survive
                      the approx-128 screen; containment measured

Output: bench_results/int8_tiled_probe.json (resumable).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 512
NQ = 64
K = 10
N = 1 << 24
TILE = 1 << 21

OUT_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "bench_results", "int8_tiled_probe.json")
out = {"d": D, "nq": NQ, "k": K, "rows": N, "tile": TILE, "cases": {}}
if os.path.exists(OUT_PATH):
    try:
        with open(OUT_PATH) as _f:
            out["cases"].update(json.load(_f).get("cases", {}))
    except Exception:
        pass


def rec(name, **kw):
    out["cases"][name] = kw
    print(json.dumps({name: kw}), flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def have(name):
    c = out["cases"].get(name)
    return c is not None and "error" not in c


def device_seconds(enqueue, fetch, repeats=3):
    _ = fetch(enqueue(0))
    ts = []
    tag = 1
    for _r in range(repeats):
        a = enqueue(tag); tag += 1
        t0 = time.perf_counter(); _ = fetch(a); t1 = time.perf_counter()
        b = enqueue(tag); tag += 1
        c2 = enqueue(tag); tag += 1
        t2 = time.perf_counter(); _ = fetch(c2); t3 = time.perf_counter()
        del b
        ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
    return float(np.median(ts))


def main():
    from tools.int4_gallery_cache import get_gallery

    print("device:", jax.devices()[0], flush=True)
    g8h, s8h, _pk, _s4 = get_gallery(N, want_int8=True)
    g8 = jax.device_put(np.asarray(g8h))
    s8 = jax.device_put(np.asarray(s8h))
    _ = jax.device_get(g8[0, 0])
    rng = np.random.default_rng(21)
    qpool = [jnp.asarray(
        (lambda q: q / np.linalg.norm(q, axis=1, keepdims=True))(
            rng.normal(size=(NQ, D)).astype(np.float32)))
        for _ in range(10)]

    def dots_of(qs, g, sc):
        return jax.lax.dot_general(
            qs.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sc[None, :]

    @jax.jit
    def baseline(g, sc, qs):
        return jax.lax.top_k(dots_of(qs, g, sc), K)

    @jax.jit
    def tiled(g, sc, qs):
        nb = N // TILE

        def step(carry, i):
            off = i * TILE
            gt = jax.lax.dynamic_slice_in_dim(g, off, TILE, 0)
            st = jax.lax.dynamic_slice_in_dim(sc, off, TILE, 0)
            tv, ti = jax.lax.top_k(dots_of(qs, gt, st), K)
            vals, ids = carry
            mv, mi = jax.lax.top_k(jnp.concatenate([vals, tv], axis=1), K)
            ids = jnp.take_along_axis(
                jnp.concatenate([ids, ti.astype(jnp.int32) + off], axis=1),
                mi, axis=1)
            return (mv, ids), None

        init = (jnp.full((NQ, K), -jnp.inf, jnp.float32),
                jnp.zeros((NQ, K), jnp.int32))
        (vals, ids), _ = jax.lax.scan(step, init, jnp.arange(nb))
        return vals, ids

    @jax.jit
    def approx_sel(g, sc, qs):
        return jax.lax.approx_max_k(dots_of(qs, g, sc), K,
                                    recall_target=0.95)

    @jax.jit
    def approx128_rerank(g, sc, qs):
        av, ai = jax.lax.approx_max_k(dots_of(qs, g, sc), 128,
                                      recall_target=0.95)
        tv, ti = jax.lax.top_k(av, K)
        return tv, jnp.take_along_axis(ai, ti, axis=1)

    cases = [("baseline_fused", baseline), ("tiled_scan", tiled),
             ("approx_sel", approx_sel),
             ("approx128_rerank", approx128_rerank)]
    for name, fn in cases:
        if have(name):
            continue
        try:
            sec = device_seconds(
                lambda i, fn=fn: fn(g8, s8, qpool[i % len(qpool)]),
                lambda r: jax.device_get(r[0][0, 0]))
            rec(name, sweep_ms=round(sec * 1e3, 3),
                ms_per_query=round(sec / NQ * 1e3, 4),
                eff_gbps=round(N * D / sec / 1e9, 1))
        except Exception as e:
            rec(name, error=repr(e)[:500])

    if not have("prod_approx_select_16M"):
        # through ShardedVectorIndex.search with config.approx_select —
        # the shipped surface (CLI --approx-select). The exact-baseline
        # ids are taken FIRST and the probe's 8 GB device copy freed
        # before the index syncs its own (two 16M int8 galleries do not
        # co-reside in HBM).
        try:
            from image_retrieval_tpu.config import IndexConfig
            from image_retrieval_tpu.index.vector_index import (
                ShardedVectorIndex,
            )

            _bv, bi = jax.device_get(baseline(g8, s8, qpool[0]))
            g8.delete(); s8.delete()

            idx = ShardedVectorIndex(
                dim=D, config=IndexConfig(embedding_dim=D, dtype="int8",
                                          approx_select=True))
            print("injecting 16M rows (approx_select index)...", flush=True)
            idx._grow_to(N)
            np.copyto(idx._host_gallery[:N], g8h)
            np.copyto(idx._host_scales[:N], s8h)
            idx._host_valid[:N] = True
            idx.count = N
            idx.attrs.append(None, N)
            idx._device_dirty = True
            qnp = [np.asarray(q, np.float32) for q in qpool[:6]]
            _ = idx.search(qnp[0], top_k=K)  # warm/compile (+sync)
            walls = []
            for r in range(5):
                t0 = time.perf_counter()
                _ = idx.search(qnp[r % len(qnp)], top_k=K)
                walls.append(time.perf_counter() - t0)
            w = float(np.median(walls))
            _, ai = idx.search(qnp[0], top_k=K)
            rec_at10 = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(bi, np.asarray(ai))]))
            rec("prod_approx_select_16M", wall_ms=round(w * 1e3, 2),
                qps_wall=round(NQ / w, 1),
                recall_at_10=round(rec_at10, 4),
                note="full index.search wall incl. one tunnel fetch RTT")
            del idx
        except Exception as e:
            rec("prod_approx_select_16M", error=repr(e)[:500])

    if not have("exactness"):
        try:
            bv, bi = jax.device_get(baseline(g8, s8, qpool[0]))
            tv, ti = jax.device_get(tiled(g8, s8, qpool[0]))
            tiled_equal = bool(
                np.array_equal(np.sort(bi, 1), np.sort(np.asarray(ti), 1)))
            a128v, a128i = jax.device_get(approx128_rerank(g8, s8, qpool[0]))
            contain = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(bi, np.asarray(a128i))]))
            av, ai = jax.device_get(approx_sel(g8, s8, qpool[0]))
            a10 = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(bi, np.asarray(ai))]))
            rec("exactness", tiled_identical_sets=tiled_equal,
                approx128_rerank_recall_at_10=round(contain, 4),
                approx_k10_recall_at_10=round(a10, 4))
        except Exception as e:
            rec("exactness", error=repr(e)[:500])
    print("done", flush=True)


if __name__ == "__main__":
    main()
