"""TPU probe: isolate WHERE the 16M int4 screen loses its 29x (verdict r3
item 1).

Facts going in (bench_results/int4_*.json):
  * Pallas screen kernel at 4M rows: 0.24 ms/query (Q=64) — 29x the XLA
    form. At 16M with top-c(128): 453-463 ms — same as XLA.
  * Every topc formulation (XLA direct/tiled, Pallas paired/transposed)
    lands at ~430-460 ms, and the XLA sweeps scale LINEARLY in Q
    (43.9 ms at Q=4 -> 431 ms at Q=64) — a shared per-query term.
  * The resident int8 sweep (bf16 MXU dot + lax.top_k k=10 over the full
    (64, 16M) plane, one jit) is 57.2 ms total — so selection at k=10
    is cheap. The int4 screen selects c=128.

Hypotheses this probe separates:
  H1 selection cost scales with k: lax.top_k(k=128) over (64, 16M) is the
     ~400 ms term (test: int8 sweep k=10 vs k=128; standalone top_k k=10 /
     k=128 / approx_max_k over identical random scores).
  H2 the score-plane concat/materialization is the term (test: kernel
     scores-only vs scores+selection).
  H3 the kernel itself degrades at 16M (test: scores-only at 8M slice).

Candidate fix measured in place: int4_screen_topc_pallas selector="approx"
(lax.approx_max_k — TPU-native partial reduction) on per-half score planes
with no concat, plus a screen-candidate containment check against the
device int8 oracle top-10 (upper bound on two-phase recall).

Output: bench_results/int4_isolate_probe.json (resumable).
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
C = 128
N = 1 << 24

OUT_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "bench_results", "int4_isolate_probe.json")
out = {"d": D, "nq": NQ, "c": C, "rows": N, "cases": {}}
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
        c = enqueue(tag); tag += 1
        t2 = time.perf_counter(); _ = fetch(c); t3 = time.perf_counter()
        del b
        ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
    return float(np.median(ts))


def timed(name, enqueue, fetch, **extra):
    if have(name):
        print(f"skip {name} (cached)", flush=True)
        return
    try:
        sec = device_seconds(enqueue, fetch)
        rec(name, sweep_ms=round(sec * 1e3, 3),
            ms_per_query=round(sec / NQ * 1e3, 4), **extra)
    except Exception as e:
        rec(name, error=str(e)[:300])


def main():
    from tools.int4_gallery_cache import get_gallery
    from image_retrieval_tpu.ops.pallas_kernels import (
        _int4_screen_scores_halves,
        int4_screen_topc_pallas,
        pack_words_paired,
    )

    out["device"] = str(jax.devices()[0])
    mk = jax.jit(lambda key: jax.random.normal(key, (NQ, D), jnp.float32))
    pool = [mk(jax.random.PRNGKey(10 + i)) for i in range(8)]
    _ = jax.device_get(pool[-1][0, 0])

    def qn_bf16(qs):
        return (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
                ).astype(jnp.bfloat16)

    g8 = s8 = None
    oracle10 = out["cases"].get("oracle10_ids")

    # ---- phase A: int8 sweep, k-axis ------------------------------------
    needA = (not have("int8_topk10") or not have("int8_topk128")
             or oracle10 is None)
    if needA:
        g8m, s8m, _pk, _s4 = get_gallery(N)
        g8 = jax.device_put(np.asarray(g8m))
        s8 = jax.device_put(np.asarray(s8m))
        _ = jax.device_get(g8[0, 0])

        def int8_sweep(g, sc, qs, k):
            dots = jax.lax.dot_general(
                qn_bf16(qs), g.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jax.lax.top_k(dots * sc[None, :], k)

        sweep10 = jax.jit(lambda g, sc, qs: int8_sweep(g, sc, qs, 10))
        sweep128 = jax.jit(lambda g, sc, qs: int8_sweep(g, sc, qs, C))
        timed("int8_topk10", lambda i: sweep10(g8, s8, pool[i % 8]),
              lambda a: jax.device_get(a[0][0, 0]))
        timed("int8_topk128", lambda i: sweep128(g8, s8, pool[i % 8]),
              lambda a: jax.device_get(a[0][0, 0]))
        if oracle10 is None and have("int8_topk10"):
            _v, ids = sweep10(g8, s8, pool[0])
            oracle10 = np.asarray(jax.device_get(ids)).tolist()
            rec("oracle10_ids", note="int8 oracle top-10 ids, query pool[0]",
                ids=oracle10)
            oracle10 = out["cases"]["oracle10_ids"]
        del g8, s8
        g8 = s8 = None

    # ---- phase B: standalone selection over identical random scores -----
    needB = not all(have(x) for x in
                    ("topk10_rand", "topk128_rand", "approx128_rand"))
    if needB:
        mks = jax.jit(lambda key: jax.random.normal(key, (NQ, N),
                                                    jnp.float32))
        scores = mks(jax.random.PRNGKey(0))
        _ = jax.device_get(scores[0, 0])
        t10 = jax.jit(lambda s: jax.lax.top_k(s, 10))
        t128 = jax.jit(lambda s: jax.lax.top_k(s, C))
        a128 = jax.jit(
            lambda s: jax.lax.approx_max_k(s, C, recall_target=0.95))
        timed("topk10_rand", lambda i: t10(scores),
              lambda a: jax.device_get(a[0][0, 0]))
        timed("topk128_rand", lambda i: t128(scores),
              lambda a: jax.device_get(a[0][0, 0]))
        timed("approx128_rand", lambda i: a128(scores),
              lambda a: jax.device_get(a[0][0, 0]))
        del scores

    # ---- phase C: the Pallas kernel at 16M ------------------------------
    _g8, _s8, pkm, s4m = get_gallery(N, want_int8=False)
    print("packing paired layout...", flush=True)
    pkp_h = pack_words_paired(np.asarray(pkm))
    pkp = jax.device_put(pkp_h)
    del pkp_h
    sc4 = jax.device_put(np.asarray(s4m))
    valid = jax.device_put(np.ones(N, bool))
    _ = jax.device_get(pkp[0, 0])

    # scores-only at an 8M-row slice (grid 1024; the 16M scores-only form
    # failed remote compile in int4_fuse5_probe — 4.3 GB output alloc)
    halfq = pkp.shape[0] // 2  # 4M storage rows = 8M gallery rows

    @jax.jit
    def scores8m(pk, sc, qs):
        s0, s1 = _int4_screen_scores_halves(
            qs if qs.dtype == jnp.bfloat16 else qn_bf16(qs),
            jax.lax.slice_in_dim(pk, 0, halfq, axis=0),
            jnp.concatenate([
                jax.lax.slice_in_dim(sc, 0, halfq, axis=0),
                jax.lax.slice_in_dim(sc, pk.shape[0], pk.shape[0] + halfq,
                                     axis=0),
            ]))
        return s0, s1

    timed("pallas_scores_8Mrows", lambda i: scores8m(pkp, sc4, pool[i % 8]),
          lambda a: jax.device_get(a[0][0, 0]),
          note="scores only, first 8M gallery rows; x2 for a 16M estimate")

    def topc(seg, selector):
        @jax.jit
        def run(pk, sc, v, qs):
            return int4_screen_topc_pallas(
                qn_bf16(qs), pk, sc, v, C, seg_rows=seg, selector=selector)
        return run

    for seg, selector in ((1 << 23, "exact"), (1 << 23, "approx"),
                          (1 << 22, "approx"), (1 << 22, "exact")):
        name = f"pallas_topc_{selector}_seg{seg >> 20}M"
        run = topc(seg, selector)
        timed(name, lambda i, run=run: run(pkp, sc4, valid, pool[i % 8]),
              lambda a: jax.device_get(a[0][0, 0]))

    # ---- containment: screen candidates vs the int8 oracle top-10 -------
    if oracle10 is not None and not have("screen_containment"):
        try:
            o = np.asarray(oracle10["ids"])  # (NQ, 10)
            cont = {}
            for selector in ("exact", "approx"):
                run = topc(1 << 23, selector)
                _v, ids = run(pkp, sc4, valid, pool[0])
                ids = np.asarray(jax.device_get(ids))
                hit = np.mean([
                    np.isin(o[q], ids[q]).mean() for q in range(NQ)])
                cont[selector] = round(float(hit), 4)
            rec("screen_containment",
                note="fraction of int8 oracle top-10 inside the C=128 "
                     "screen set (two-phase recall upper bound)",
                **cont)
        except Exception as e:
            rec("screen_containment", error=str(e)[:300])

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
