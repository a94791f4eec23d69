"""Eighth probe: packed block-diagonal attention INSIDE the fused sub-block
kernels vs the per-image/per-head loop, plus bm/batch sweep.

Rationale: at bm=8, t=50 the loop variant issues 96 tiny (50,50,64) score
matmuls per grid step — heavily padded on the 128x128 MXU. The packed
variant (same trick as the bare _attn_kernel) issues 12 (400,400,64)
matmuls with a block-diagonal -inf mask: ~8x the score FLOPs but
MXU-shaped. exp(-inf)=0 exactly, so numerics are identical.

Run:  python tools/tpu_attn_probe8.py
Writes bench_results/attn_probe8.json
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
from tools.tpu_attn_probe7 import numerics_check
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []
    base = ModelConfig()
    cfg8 = dataclasses.replace(
        base, fused_attn_block=True, fused_mlp_block=True, int8_matmuls=True
    )

    saved_block = fa._block_images_fused
    saved_packed = fa._PACKED_BLOCK_ATTN
    try:
        for bm in (8, 16):
            fa._block_images_fused = lambda b, t, *a, _bm=bm: (
                _bm if b % _bm == 0 else 1
            )
            for packed in (True, False) if bm == 8 else (True,):
                fa._PACKED_BLOCK_ATTN = packed
                tag = "packed" if packed else "loop"
                for batch in (192, 256):
                    tower(f"all8_bm{bm}_{tag}_b{batch}", cfg8, batch,
                          fetch_s, out)
        fa._PACKED_BLOCK_ATTN = True
        fa._block_images_fused = lambda b, t, *a: 8 if b % 8 == 0 else 1
        numerics_check(out, cfg8, "all8_bm8_packed_cos")
    finally:
        fa._block_images_fused = saved_block
        fa._PACKED_BLOCK_ATTN = saved_packed

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe8.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
