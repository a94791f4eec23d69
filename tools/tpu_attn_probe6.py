"""Sixth probe: fully-fused transformer layer (attention block + MLP block
kernels), block-size sweep, and batch sweep.

State (bench_results/attn_probe5.json): fused attention block alone gives
16.2k img/s at batch 128 (bm=4), beating pallas-attention+int8 (15.0k).

Run:  python tools/tpu_attn_probe6.py
Writes bench_results/attn_probe6.json
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.ops import flash_attention as fa
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []
    base = ModelConfig()
    cfg_fb = dataclasses.replace(base, fused_attn_block=True)
    cfg_all = dataclasses.replace(
        base, fused_attn_block=True, fused_mlp_block=True
    )
    cfg_mlp = dataclasses.replace(base, fused_mlp_block=True)

    saved_block = fa._block_images
    try:
        fa._block_images = lambda b, t: 8 if b % 8 == 0 else 1
        tower("fused_block_bm8", cfg_fb, 128, fetch_s, out)

        for bm in (4, 8):
            fa._block_images = lambda b, t, _bm=bm: _bm if b % _bm == 0 else 1
            tower(f"fused_all_bm{bm}", cfg_all, 128, fetch_s, out)

        fa._block_images = lambda b, t: 4 if b % 4 == 0 else 1
        tower("fused_mlp_only_bm4", cfg_mlp, 128, fetch_s, out)
        tower("fused_all_bm4_b192", cfg_all, 192, fetch_s, out)
        tower("fused_all_bm4_b64", cfg_all, 64, fetch_s, out)
    finally:
        fa._block_images = saved_block

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe6.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
