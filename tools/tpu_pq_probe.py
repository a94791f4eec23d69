"""PQ/ADC feasibility probe: can the TPU score 1M product-quantized rows
fast enough to beat the int8 exact sweep (0.67-0.9 ms)?

PQ(M=64 subspaces x 8 dims, 256 centroids): codes are (N, 64) uint8 =
64 MB at 1M rows (vs 512 MB int8 exact) -> bandwidth floor ~80 us. The
question is gather cost: ADC is score[n] = sum_m LUT[m, codes[n, m]].

Formulations probed:
  A. take_along_axis gather over a broadcast LUT
  B. one-hot matmul: scores = sum_m onehot(codes[:, m]) @ LUT[m]  (MXU,
     no gather, but 256x the FLOPs)
  C. segmented int8 matmul: reconstruct-free dot via (N,64) codes kept as
     int8 centroid ids is impossible without gather; instead dequantize
     blockwise in VMEM via Pallas (gather in VMEM).

Run:  python tools/tpu_pq_probe.py
Writes bench_results/pq_probe.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s


N = 1_000_000
M = 64          # subspaces
K = 256         # centroids per subspace
NQ = 64         # queries per scan step
TOPK = 10


def device_seconds(enqueue, repeats=5):
    _ = jax.device_get(enqueue(0))
    ts = []
    tag = 1
    for _r in range(repeats):
        a = enqueue(tag); tag += 1
        t0 = time.perf_counter(); _ = jax.device_get(a)
        t1 = time.perf_counter()
        b = enqueue(tag); tag += 1
        c = enqueue(tag); tag += 1
        t2 = time.perf_counter()
        _ = jax.device_get(c)
        t3 = time.perf_counter()
        del b
        ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
    return np.array(ts)


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    out = []

    codes = jax.jit(
        lambda key: jax.random.randint(key, (N, M), 0, K, jnp.int32).astype(jnp.uint8)
    )(jax.random.PRNGKey(0))
    _ = jax.device_get(codes[0, 0])

    def make_lut(i):
        return jax.jit(
            lambda key: jax.random.normal(key, (M, K), jnp.float32)
        )(jax.random.PRNGKey(100 + i))

    luts = [make_lut(i) for i in range(20)]
    _ = jax.device_get(luts[-1][0, 0])

    # --- A: XLA gather (take per subspace, vmapped) --------------------------
    @jax.jit
    def adc_gather2(codes, lut):
        def per_sub(c_m, lut_m):
            return jnp.take(lut_m, c_m.astype(jnp.int32))
        scores = jax.vmap(per_sub, in_axes=(1, 0), out_axes=0)(codes, lut)
        s = jnp.sum(scores, axis=0)
        return jax.lax.top_k(s, TOPK)

    try:
        t = device_seconds(lambda i: adc_gather2(codes, luts[i]), repeats=4)
        rec = {"name": "adc_take_vmap_1q", "ms": float(np.median(t) * 1e3)}
        out.append(rec); print(json.dumps(rec), flush=True)
    except Exception as e:
        rec = {"name": "adc_take_vmap_1q", "error": str(e)[:300]}
        out.append(rec); print(json.dumps(rec), flush=True)

    # --- B: one-hot matmul ----------------------------------------------------
    # scores = sum_m onehot(codes[:, m], K) @ lut[m]  == reshape trick:
    # onehot codes (N, M*K) @ lut.reshape(M*K): bf16 MXU, N x (M*K) x 1.
    # FLOPs: N * M * K * 2 = 32.8 GFLOP per query -> ~0.17 ms at bf16 peak,
    # but the one-hot operand is (N, 16384) -> materializing it is 32 GB.
    # Instead do it blockwise via dot_general with PREQUANTIZED one-hot in
    # int8? Still materializes. Skip unless A fails badly.

    # --- C: Pallas in-VMEM gather --------------------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BN = 8192

    def kernel(codes_ref, lut_ref, o_ref):
        c = codes_ref[:].astype(jnp.int32)  # (BN, M)
        lut = lut_ref[:]                    # (M, K) f32
        acc = jnp.zeros((c.shape[0],), jnp.float32)
        for m in range(M):
            acc = acc + jnp.take(lut[m], c[:, m])
        o_ref[:] = acc

    @jax.jit
    def adc_pallas(codes, lut):
        s = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((BN, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BN,), lambda i: (i,), memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(codes, lut)
        return jax.lax.top_k(s, TOPK)

    try:
        t = device_seconds(lambda i: adc_pallas(codes, luts[i]), repeats=4)
        rec = {"name": "adc_pallas_1q", "ms": float(np.median(t) * 1e3)}
        out.append(rec); print(json.dumps(rec), flush=True)
    except Exception as e:
        rec = {"name": "adc_pallas_1q", "error": str(e)[:300]}
        out.append(rec); print(json.dumps(rec), flush=True)

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "pq_probe.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
