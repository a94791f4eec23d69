"""Twelfth probe: re-try the 3D batched-heads in-kernel attention
(`_BH3D_BLOCK_ATTN`) on the current toolchain. Earlier attempts crashed the
Mosaic compiler subprocess (attn_probe4 "pallas_bh3d", attn_probe11
"layer8_bh3d_b256" — HTTP 500 tpu_compile_helper exit 1). If it now lowers,
measure whether batching the per-head score matmuls into one 3D dot closes
part of the 21.0k -> 25.6k attention residue (VERDICT r2 item 8).

Run:  python tools/tpu_attn_probe12.py
Writes bench_results/attn_probe12.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from image_retrieval_tpu.config import ModelConfig, serving_config
from image_retrieval_tpu.ops import flash_attention as fa
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []
    cfg_srv = serving_config(ModelConfig())

    fa._BH3D_BLOCK_ATTN = True
    try:
        tower("layer8_bh3d_b256", cfg_srv, 256, fetch_s, out)
        from tools.tpu_attn_probe7 import numerics_check

        numerics_check(out, cfg_srv, "layer8_bh3d_cos")
    except Exception as e:  # Mosaic compile crash is the expected outcome
        rec = {"name": "layer8_bh3d_b256", "error": str(e)[:400]}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    finally:
        fa._BH3D_BLOCK_ATTN = False

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe12.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
