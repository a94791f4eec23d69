"""TPU probe round 2: int4 batched-screen bottleneck — transpose vs Q-path.

int4_fuse_probe.json: tile size, materialization, and MXU dtype all land
at ~440 ms (Q=64, 16M rows) — yet the Q=1 matvec runs ~25x faster per
byte. Remaining suspects:

  dg_1M        — dot_general contracting dim-1 on both operands (no
                 logical transpose of the unpacked tile; jnp.dot(q, lo.T)
                 allegedly canonicalizes identically, but 8-bit-origin
                 relayouts are where Mosaic hurts — measure, don't trust).
  tpose_1M     — gallery stored TRANSPOSED (D/2, N): unpack produces
                 (256, blk) directly in the matmul's preferred layout.
  q{4,8,16,32} — the direct full-width two-dot sweep at small Q: if the
                 fast Q=1 VPU path survives to Q=8/16, a 64-query screen
                 can run as ceil(64/Q) VPU sweeps instead of one slow MXU
                 sweep (bandwidth-bound: ~22.5 ms per sweep at 16M).

Output: bench_results/int4_fuse2_probe.json
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
C = 128
N = 1 << 24

OUT_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "bench_results", "int4_fuse2_probe.json")
out = {"d": D, "c": C, "rows": N, "cases": {}}


def rec(name, **kw):
    out["cases"][name] = kw
    print(json.dumps({name: kw}), flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def device_seconds(enqueue, fetch, repeats=5):
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


def main():
    from tools.int4_gallery_cache import get_gallery

    out["device"] = str(jax.devices()[0])
    _, _, pkh, s4h = get_gallery(N, want_int8=False)
    g = jax.device_put(np.ascontiguousarray(pkh))
    sc = jax.device_put(np.ascontiguousarray(s4h))
    _ = jax.device_get(g[0, 0])

    def mkpool(q):
        mk = jax.jit(lambda key: jax.random.normal(key, (q, D), jnp.float32))
        pool = [mk(jax.random.PRNGKey(10 + i)) for i in range(16)]
        _ = jax.device_get(pool[-1][0, 0])
        return pool

    block = 1 << 20

    def blocked(tile_scores, packed, scales, nq, slice_dim=0):
        def tile(pk, s, off):
            tv, ti = jax.lax.top_k(tile_scores(pk, s), C)
            return tv, ti.astype(jnp.int32) + off

        nb = N // block

        def merge(carry, tv, ti):
            vals, ids = carry
            mv, mi = jax.lax.top_k(jnp.concatenate([vals, tv], axis=1), C)
            return mv, jnp.take_along_axis(
                jnp.concatenate([ids, ti], axis=1), mi, axis=1)

        def step(carry, i):
            off = i * block
            tv, ti = tile(
                jax.lax.dynamic_slice_in_dim(packed, off, block, slice_dim),
                jax.lax.dynamic_slice_in_dim(scales, off, block, 0),
                off)
            return merge(carry, tv, ti), None

        init = (jnp.full((nq, C), -jnp.inf, jnp.float32),
                jnp.zeros((nq, C), jnp.int32))
        return jax.lax.scan(step, init, jnp.arange(nb))[0]

    pool64 = mkpool(64)

    # --- dot_general, no logical transpose ---------------------------------
    @jax.jit
    def run_dg(gg, ss, qs):
        qn = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
              ).astype(jnp.bfloat16)
        qe, qo = qn[:, 0::2], qn[:, 1::2]

        def scores(pk, s):
            lo = ((pk & 0xF).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            hi = ((pk >> 4).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            dim = (((1,), (1,)), ((), ()))
            return (jax.lax.dot_general(qe, lo, dim,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(qo, hi, dim,
                                          preferred_element_type=jnp.float32)
                    ) * s[None, :]
        return blocked(scores, gg, ss, 64)

    try:
        sec = device_seconds(lambda i: run_dg(g, sc, pool64[i]),
                             lambda a: jax.device_get(a[0][0, 0]))
        rec("dg_1M", sweep_ms=round(sec * 1e3, 3),
            ms_per_query=round(sec / 64 * 1e3, 4))
    except Exception as e:
        rec("dg_1M", error=str(e)[:300])

    # --- transposed storage ------------------------------------------------
    gT = jax.device_put(np.ascontiguousarray(pkh.T))
    _ = jax.device_get(gT[0, 0])

    @jax.jit
    def run_T(ggT, ss, qs):
        qn = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
              ).astype(jnp.bfloat16)
        qe, qo = qn[:, 0::2], qn[:, 1::2]

        def scores(pkT, s):  # pkT (256, blk)
            lo = ((pkT & 0xF).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            hi = ((pkT >> 4).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            dim = (((1,), (0,)), ((), ()))
            return (jax.lax.dot_general(qe, lo, dim,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(qo, hi, dim,
                                          preferred_element_type=jnp.float32)
                    ) * s[None, :]
        return blocked(scores, ggT, ss, 64, slice_dim=1)

    try:
        sec = device_seconds(lambda i: run_T(gT, sc, pool64[i]),
                             lambda a: jax.device_get(a[0][0, 0]))
        rec("tpose_1M", sweep_ms=round(sec * 1e3, 3),
            ms_per_query=round(sec / 64 * 1e3, 4))
    except Exception as e:
        rec("tpose_1M", error=str(e)[:300])
    gT.delete()

    # --- small-Q direct sweeps ---------------------------------------------
    from image_retrieval_tpu.ops.int4 import unpack2_dots

    for q in (4, 8, 16, 32):
        pool = mkpool(q)

        @jax.jit
        def run_q(gg, ss, qs):
            qn = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
                  ).astype(jnp.bfloat16)
            return jax.lax.top_k(unpack2_dots(qn, gg) * ss[None, :], C)

        try:
            sec = device_seconds(lambda i: run_q(g, sc, pool[i]),
                                 lambda a: jax.device_get(a[0][0, 0]))
            rec(f"direct_q{q}", sweep_ms=round(sec * 1e3, 3),
                ms_per_query=round(sec / q * 1e3, 4))
        except Exception as e:
            rec(f"direct_q{q}", error=str(e)[:300])

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
