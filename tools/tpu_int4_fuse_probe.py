"""TPU probe: why the batched int4 screen runs at 20 GB/s, and what fixes it.

Facts so far (int4_scale_probe.json, int4_block_probe.json):
  * Q=1 matvec over the packed gallery runs at full bandwidth (1.10 ms/M
    rows) — the nibble unpack fuses into the VPU reduction.
  * Q=64 MXU matmul runs ~25x slower (6.75 ms/query at 16M), and tiling
    at 1M..8M rows changes nothing — the unpack does NOT fuse into MXU
    operand production; whatever XLA emits for (mask/shift/sub/cast ->
    matmul operand) at Q=64 is the bottleneck, not operand size.

Variants measured here at 16M rows, 64 queries, top-128, all through the
same blocked top-c merge (tile sizes in the case name):
  bf16_b{64k,128k,256k,512k} — the current screen_int4_topc form at tile
      sizes small enough for unpacked tiles to live in VMEM.
  i8mat_b{128k,1M} — force-materialize the unpacked tiles as int8 buffers
      (optimization_barrier), then dot with a convert-only bf16 cast: the
      exact operand pattern of the int8 baseline that runs at 150 GB/s.
  i8mxu_b{128k,1M} — quantize queries to int8 and run native int8xint8
      -> int32 MXU dots on the materialized int8 tiles (no bf16 cast at
      all); per-query scale cancels in ranking, row scales applied after.

Output: bench_results/int4_fuse_probe.json
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
                        "bench_results", "int4_fuse_probe.json")
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


def blocked_topc(tile_scores, packed, scales, block):
    """Generic blocked top-C sweep; tile_scores(pk_tile, sc_tile) -> (Q, t)."""
    n = packed.shape[0]

    def tile(pk, sc, off):
        s = tile_scores(pk, sc)
        tv, ti = jax.lax.top_k(s, C)
        return tv, ti.astype(jnp.int32) + off

    nb = n // block

    def merge(carry, tv, ti):
        vals, ids = carry
        mv, mi = jax.lax.top_k(jnp.concatenate([vals, tv], axis=1), C)
        return mv, jnp.take_along_axis(
            jnp.concatenate([ids, ti], axis=1), mi, axis=1)

    def step(carry, i):
        off = i * block
        tv, ti = tile(
            jax.lax.dynamic_slice_in_dim(packed, off, block, 0),
            jax.lax.dynamic_slice_in_dim(scales, off, block, 0),
            off)
        return merge(carry, tv, ti), None

    init = (jnp.full((NQ, C), -jnp.inf, jnp.float32),
            jnp.zeros((NQ, C), jnp.int32))
    carry, _ = jax.lax.scan(step, init, jnp.arange(nb))
    return carry


def main():
    from tools.int4_gallery_cache import get_gallery

    out["device"] = str(jax.devices()[0])
    _, _, pkh, s4h = get_gallery(N, want_int8=False)
    g = jax.device_put(np.ascontiguousarray(pkh))
    sc = jax.device_put(np.ascontiguousarray(s4h))
    _ = jax.device_get(g[0, 0])

    mk = jax.jit(lambda key: jax.random.normal(key, (NQ, D), jnp.float32))
    pool = [mk(jax.random.PRNGKey(10 + i)) for i in range(16)]
    _ = jax.device_get(pool[-1][0, 0])

    def norm_q(qs):
        return (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
                ).astype(jnp.bfloat16)

    # --- variant scorers ---------------------------------------------------
    def bf16_scores(qn):
        def f(pk, s):
            lo = ((pk & 0xF).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            hi = ((pk >> 4).astype(jnp.int8) - 8).astype(jnp.bfloat16)
            return (jnp.dot(qn[:, 0::2], lo.T,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(qn[:, 1::2], hi.T,
                              preferred_element_type=jnp.float32)
                    ) * s[None, :]
        return f

    def i8mat_scores(qn):
        def f(pk, s):
            lo = (pk & 0xF).astype(jnp.int8) - 8
            hi = (pk >> 4).astype(jnp.int8) - 8
            lo, hi = jax.lax.optimization_barrier((lo, hi))
            return (jnp.dot(qn[:, 0::2], lo.astype(jnp.bfloat16).T,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(qn[:, 1::2], hi.astype(jnp.bfloat16).T,
                              preferred_element_type=jnp.float32)
                    ) * s[None, :]
        return f

    def i8mxu_scores(qs_f32):
        m = jnp.maximum(jnp.abs(qs_f32).max(axis=1, keepdims=True), 1e-12)
        qi = jnp.clip(jnp.round(qs_f32 / m * 127), -127, 127
                      ).astype(jnp.int8)
        qe, qo = qi[:, 0::2], qi[:, 1::2]

        def f(pk, s):
            lo = (pk & 0xF).astype(jnp.int8) - 8
            hi = (pk >> 4).astype(jnp.int8) - 8
            lo, hi = jax.lax.optimization_barrier((lo, hi))
            d = (jax.lax.dot_general(qe, lo, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                 + jax.lax.dot_general(qo, hi, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.int32))
            return d.astype(jnp.float32) * s[None, :]
        return f

    cases = []
    for blk, tag in ((1 << 16, "64k"), (1 << 17, "128k"),
                     (1 << 18, "256k"), (1 << 19, "512k")):
        cases.append((f"bf16_b{tag}", "bf16", blk))
    for blk, tag in ((1 << 17, "128k"), (1 << 20, "1M")):
        cases.append((f"i8mat_b{tag}", "i8mat", blk))
    for blk, tag in ((1 << 17, "128k"), (1 << 20, "1M")):
        cases.append((f"i8mxu_b{tag}", "i8mxu", blk))

    for name, kind, blk in cases:
        @jax.jit
        def run(gg, ss, qs, kind=kind, blk=blk):
            qf = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
            if kind == "bf16":
                scorer = bf16_scores(qf.astype(jnp.bfloat16))
            elif kind == "i8mat":
                scorer = i8mat_scores(qf.astype(jnp.bfloat16))
            else:
                scorer = i8mxu_scores(qf)
            return blocked_topc(scorer, gg, ss, blk)

        try:
            sec = device_seconds(lambda i: run(g, sc, pool[i]),
                                 lambda a: jax.device_get(a[0][0, 0]))
            rec(name, sweep_ms=round(sec * 1e3, 3),
                ms_per_query=round(sec / NQ * 1e3, 4),
                eff_int8equiv_gbps=round(N * D / sec / 1e9, 1))
        except Exception as e:  # pragma: no cover
            rec(name, error=str(e)[:300])

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
