"""TPU probe round 3: int32-lane nibble dots (unpack8_dots_i32) at 16M.

Rounds 1-2 pinned the batched int4 screen's ~7 ms/query cost on 8-bit
operand production (VPU reduce path, linear in Q). unpack8_dots_i32
rebuilds the sweep from int32 shifts — 8 per-nibble-position MXU dots.
Cases: direct full-width at Q=64, blocked 1M tiles at Q=64, and an
unpack-only bandwidth diagnostic (materialize one nibble plane).

Output: bench_results/int4_fuse3_probe.json
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
                        "bench_results", "int4_fuse3_probe.json")
out = {"d": D, "nq": NQ, "c": C, "rows": N, "cases": {}}


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
    from image_retrieval_tpu.ops.int4 import unpack8_dots_i32

    out["device"] = str(jax.devices()[0])
    from tools.int4_gallery_cache import get_gallery

    _, _, pkh, s4h = get_gallery(N, want_int8=False)
    g = jax.device_put(np.ascontiguousarray(pkh))
    sc = jax.device_put(np.ascontiguousarray(s4h))
    _ = jax.device_get(g[0, 0])

    mk = jax.jit(lambda key: jax.random.normal(key, (NQ, D), jnp.float32))
    pool = [mk(jax.random.PRNGKey(10 + i)) for i in range(16)]
    _ = jax.device_get(pool[-1][0, 0])

    # unpack-only diagnostic: materialize one int32 nibble plane (N, 64)
    @jax.jit
    def unpack_one(gg, t):
        pk32 = jax.lax.bitcast_convert_type(
            gg.reshape(N, (D // 2) // 4, 4), jnp.int32)
        return ((pk32 >> 4) & 0xF) - 8 + t.astype(jnp.int32)

    try:
        sec = device_seconds(lambda i: unpack_one(g, jnp.int32(i)),
                             lambda a: jax.device_get(a[0, 0]))
        rec("unpack_one_plane", ms=round(sec * 1e3, 3),
            read_gbps=round(g.size / sec / 1e9, 1))
    except Exception as e:
        rec("unpack_one_plane", error=str(e)[:300])

    # direct full-width i32-lane sweep
    @jax.jit
    def run_direct(gg, ss, qs):
        qn = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
              ).astype(jnp.bfloat16)
        return jax.lax.top_k(unpack8_dots_i32(qn, gg) * ss[None, :], C)

    try:
        sec = device_seconds(lambda i: run_direct(g, sc, pool[i]),
                             lambda a: jax.device_get(a[0][0, 0]))
        rec("i32_direct", sweep_ms=round(sec * 1e3, 3),
            ms_per_query=round(sec / NQ * 1e3, 4),
            eff_int8equiv_gbps=round(N * D / sec / 1e9, 1))
    except Exception as e:
        rec("i32_direct", error=str(e)[:300])

    # blocked 1M tiles
    block = 1 << 20

    @jax.jit
    def run_blocked(gg, ss, qs):
        qn = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
              ).astype(jnp.bfloat16)

        def tile(pk, s, off):
            tv, ti = jax.lax.top_k(unpack8_dots_i32(qn, pk) * s[None, :], C)
            return tv, ti.astype(jnp.int32) + off

        def merge(carry, tv, ti):
            vals, ids = carry
            mv, mi = jax.lax.top_k(jnp.concatenate([vals, tv], axis=1), C)
            return mv, jnp.take_along_axis(
                jnp.concatenate([ids, ti], axis=1), mi, axis=1)

        def step(carry, i):
            off = i * block
            tv, ti = tile(
                jax.lax.dynamic_slice_in_dim(gg, off, block, 0),
                jax.lax.dynamic_slice_in_dim(ss, off, block, 0), off)
            return merge(carry, tv, ti), None

        init = (jnp.full((NQ, C), -jnp.inf, jnp.float32),
                jnp.zeros((NQ, C), jnp.int32))
        return jax.lax.scan(step, init, jnp.arange(N // block))[0]

    try:
        sec = device_seconds(lambda i: run_blocked(g, sc, pool[i]),
                             lambda a: jax.device_get(a[0][0, 0]))
        rec("i32_blocked_1M", sweep_ms=round(sec * 1e3, 3),
            ms_per_query=round(sec / NQ * 1e3, 4),
            eff_int8equiv_gbps=round(N * D / sec / 1e9, 1))
    except Exception as e:
        rec("i32_blocked_1M", error=str(e)[:300])

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
