"""Seventh probe: fully-fused layer (attention + MLP block kernels), bf16
and int8-in-kernel variants, block and batch sweeps.

State: fused attention block alone = 16.5k img/s at bm=8 (attn_probe6).
The first fused-MLP attempt hit a Mosaic bf16-logistic bug (fixed: gelu in
f32 in-kernel).

Run:  python tools/tpu_attn_probe7.py
Writes bench_results/attn_probe7.json
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.ops import flash_attention as fa
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower


def numerics_check(out, cfg, name):
    from image_retrieval_tpu.models.clip import CLIP, init_params

    base = ModelConfig()
    model, params = init_params(base, seed=0, dtype=jnp.bfloat16)
    mp = CLIP(cfg, dtype=jnp.bfloat16)
    px = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 224, 224, 3)).astype(np.float32)
    )
    a = np.asarray(jax.jit(lambda p, x: model.apply(p, x, method=CLIP.encode_image))(params, px), np.float64)
    b = np.asarray(jax.jit(lambda p, x: mp.apply(p, x, method=CLIP.encode_image))(params, px), np.float64)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    rec = {"name": name, "cos_min_vs_bf16_baseline": float(cos.min())}
    out.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []
    base = ModelConfig()
    cfg_all = dataclasses.replace(base, fused_attn_block=True, fused_mlp_block=True)
    cfg_all8 = dataclasses.replace(cfg_all, int8_matmuls=True)

    # NOTE: since the _block_images_fused split (commit 9c11239) the fused
    # sub-block kernels read fa._block_images_fused, so that is what the
    # sweep must patch (patching fa._block_images here would be a no-op).
    saved_block = fa._block_images_fused
    try:
        for bm in (8, 4):
            fa._block_images_fused = (
                lambda b, t, *a, _bm=bm: _bm if b % _bm == 0 else 1
            )
            tower(f"fused_all_bm{bm}", cfg_all, 128, fetch_s, out)
            tower(f"fused_all8_bm{bm}", cfg_all8, 128, fetch_s, out)
        fa._block_images_fused = lambda b, t, *a: 8 if b % 8 == 0 else 1
        tower("fused_all_bm8_b192", cfg_all, 192, fetch_s, out)
        tower("fused_all8_bm8_b192", cfg_all8, 192, fetch_s, out)
        numerics_check(out, cfg_all, "fused_all_cos")
        numerics_check(out, cfg_all8, "fused_all8_cos")
    finally:
        fa._block_images_fused = saved_block

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe7.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
