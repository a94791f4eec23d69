"""Training-throughput sweep on the real chip: batch size x remat x
pallas-attention, timed with the overhead-cancelling one-vs-two-dispatch
difference (same scheme as bench.py device_seconds, applied to whole
optimizer steps chained through donated state).

Prior capture: 33.7 ms/step at batch 64 (1.9k img/s) — forward-only runs at
11.4k img/s, so training efficiency at small batch is suspect.

Run:  python tools/tpu_train_probe.py
Writes bench_results/train_probe.json
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from image_retrieval_tpu.config import ModelConfig
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s


def measure(name, cfg, batch, out, steps_per_unit=4, repeats=3):
    from image_retrieval_tpu.train.trainer import CLIPTrainer

    tr = CLIPTrainer(cfg=cfg)
    px = jax.jit(
        lambda key: jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)
    )(jax.random.PRNGKey(0))
    toks = jax.jit(
        lambda key: jax.random.randint(key, (batch, 77), 1, 49407, jnp.int32)
    )(jax.random.PRNGKey(1))
    _ = jax.device_get(px[0, 0, 0, 0]); _ = jax.device_get(toks[0, 0])

    def chain(n):
        # async steps chain through donated state; ONE fetch at the very
        # end is the only barrier. Timing chain(1) vs chain(2) and taking
        # the difference cancels that fetch (and dispatch overhead)
        # exactly — a fetch inside each unit would leave +RTT/steps of
        # bias in every recorded step time.
        loss = None
        for _ in range(n * steps_per_unit):
            loss = tr.train_step_async(px, toks)
        return jax.device_get(loss)

    t0 = time.perf_counter()
    chain(1)
    compile_s = time.perf_counter() - t0

    ts = []
    for _r in range(repeats):
        t0 = time.perf_counter(); chain(1); t1 = time.perf_counter()
        chain(2); t2 = time.perf_counter()
        ts.append(max((t2 - t1) - (t1 - t0), 1e-9) / steps_per_unit)
    step_ms = float(np.median(ts) * 1e3)
    rec = {
        "name": name,
        "batch": batch,
        "step_ms": round(step_ms, 2),
        "img_per_s": round(batch / (step_ms / 1e3), 1),
        "compile_s": round(compile_s, 1),
    }
    out.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    out = []
    base = ModelConfig()
    remat = dataclasses.replace(base, remat=True)
    pallas = dataclasses.replace(base, pallas_attention=True)

    fused_train = dataclasses.replace(
        base, fused_attn_block=True, fused_mlp_block=True,
        fused_train_vjp=True,
    )

    measure("base_b64", base, 64, out)
    measure("base_b128", base, 128, out)
    measure("base_b256", base, 256, out)
    measure("remat_b256", remat, 256, out)
    measure("remat_b512", remat, 512, out)
    measure("pallas_b256", pallas, 256, out)
    measure("fusedtrain_b128", fused_train, 128, out)
    measure("fusedtrain_b256", fused_train, 256, out)

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "train_probe.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()


_ = fetch_overhead_s  # imported for parity with sibling probes
