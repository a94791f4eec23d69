"""TPU probe: blocked int4 screen at 16M — pick the tile size.

Context (bench_results/int4_scale_probe.json, first capture): the direct
two-dot screen is at int8-parity bandwidth at 1M rows but collapses to
~10 GB/s at 16M — XLA stops fusing the nibble unpack and materializes the
(N, D) bf16 operands. ops/int4.py screen_int4_topc tiles the sweep; this
probe measures the 64-query batched sweep at 16M over candidate tile
sizes to pick the default. Output: bench_results/int4_block_probe.json
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

OUT_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "bench_results", "int4_block_probe.json")
out = {"d": D, "nq": NQ, "c": C, "rows": 1 << 24, "cases": {}}


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
    from image_retrieval_tpu.ops.int4 import quantize_pack_int4, screen_int4_topc

    out["device"] = str(jax.devices()[0])
    n = 1 << 24
    print("generating 16M packed gallery...", flush=True)
    rng = np.random.default_rng(3)
    pk = np.empty((n, D // 2), np.uint8)
    s4 = np.empty(n, np.float32)
    step = 1 << 20
    for s in range(0, n, step):
        e = min(s + step, n)
        rows = rng.normal(size=(e - s, D)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        # skip the int8 twin generation: this probe times the screen only
        pk[s:e], s4[s:e] = quantize_pack_int4(rows)

    g = jax.device_put(pk)
    sc = jax.device_put(s4)
    valid = jax.device_put(np.ones(n, bool))
    _ = jax.device_get(g[0, 0])

    mk = jax.jit(lambda key: jax.random.normal(key, (NQ, D), jnp.float32))
    pool = [mk(jax.random.PRNGKey(10 + i)) for i in range(16)]
    _ = jax.device_get(pool[-1][0, 0])

    for block in (1 << 20, 1 << 21, 1 << 22, 1 << 23):
        @jax.jit
        def run(gg, ss, vv, qs, block=block):
            qn = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
                  ).astype(jnp.bfloat16)
            return screen_int4_topc(qn, gg, ss, vv, C, block=block)

        try:
            sec = device_seconds(lambda i: run(g, sc, valid, pool[i]),
                                 lambda a: jax.device_get(a[0][0, 0]))
            rec(f"blocked_{block >> 20}M",
                sweep_ms=round(sec * 1e3, 3),
                ms_per_query=round(sec / NQ * 1e3, 4),
                eff_int8equiv_gbps=round(n * D / sec / 1e9, 1))
        except Exception as e:  # pragma: no cover
            rec(f"blocked_{block >> 20}M", error=str(e)[:300])

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
