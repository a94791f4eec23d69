"""Ninth probe: whole-layer mega-kernel (layer_block_int8) vs the
two-kernel fused path, loop attention (probe8 winner), bm/batch sweep, and
text-tower throughput with fused causal blocks.

Run:  python tools/tpu_attn_probe9.py
Writes bench_results/attn_probe9.json
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
from image_retrieval_tpu.ops import flash_attention as fa
from tools.tpu_attn_probe7 import numerics_check
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower


ITERS = 16


def text_tower(name, cfg, batch, fetch_s, out):
    from image_retrieval_tpu.models.clip import CLIP, init_params

    model, params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(
            1, cfg.vocab_size, size=(batch, cfg.context_length)
        ).astype(np.int32)
    )

    @jax.jit
    def run(p, toks):
        def step(_, i):
            tt = jnp.maximum(toks - (i.astype(jnp.int32) % 2), 1)
            return None, model.apply(p, tt, method=CLIP.encode_text)[:, 0]
        _, o = jax.lax.scan(step, None, jnp.arange(ITERS))
        return o

    t0 = time.perf_counter()
    _ = jax.device_get(run(params, toks))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = jax.device_get(run(params, toks))
        best = min(best, max(time.perf_counter() - t0 - fetch_s, 1e-9) / ITERS)
    rec = {
        "name": name,
        "batch": batch,
        "text_per_s": batch / best,
        "us_per_text": best / batch * 1e6,
        "compile_s": round(compile_s, 1),
    }
    out.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []
    base = ModelConfig()
    cfg_two = dataclasses.replace(
        base, fused_attn_block=True, fused_mlp_block=True, int8_matmuls=True
    )
    cfg_layer = dataclasses.replace(
        base, fused_layer_block=True, int8_matmuls=True
    )

    saved_block = fa._block_images_fused
    try:
        fa._block_images_fused = lambda b, t, *a: 8 if b % 8 == 0 else 1
        tower("layer8_bm8_b192", cfg_layer, 192, fetch_s, out)
        tower("layer8_bm8_b256", cfg_layer, 256, fetch_s, out)
        fa._block_images_fused = lambda b, t, *a: 16 if b % 16 == 0 else 1
        tower("layer8_bm16_b256", cfg_layer, 256, fetch_s, out)
        tower("all8_bm16_loop_b256", cfg_two, 256, fetch_s, out)
        fa._block_images_fused = saved_block
        numerics_check(out, cfg_layer, "layer8_cos")

        # text tower: parity vs two-kernel fused vs mega-kernel
        text_tower("text_parity_b256", base, 256, fetch_s, out)
        text_tower("text_all8_b256", cfg_two, 256, fetch_s, out)
        text_tower("text_layer8_b256", cfg_layer, 256, fetch_s, out)
    finally:
        fa._block_images_fused = saved_block

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe9.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
