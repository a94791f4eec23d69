"""Tenth probe: (a) int8 layer kernel with the merged (w,3w) QKV matmul
(numerics-identical; fewer MXU dispatches), (b) ViT-B/16 (t=197) under the
VMEM-aware bm cap (bm=2), (c) bf16 whole-layer kernel on the text tower
(w=512 fits scoped VMEM; w=768 measured OOM and falls back to sub-blocks).

Run:  python tools/tpu_attn_probe10.py
Writes bench_results/attn_probe10.json
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from image_retrieval_tpu.config import ModelConfig, serving_config, vit_b16
from tools.tpu_attn_probe7 import numerics_check
from tools.tpu_attn_probe9 import text_tower
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []
    base = ModelConfig()
    cfg_srv = serving_config(base)               # int8 layer kernel, QKV merged
    cfg_bf16layer = dataclasses.replace(base, fused_layer_block=True)
    b16 = vit_b16()
    b16_srv = serving_config(b16)

    tower("layer8_qkvmerged_b256", cfg_srv, 256, fetch_s, out)
    numerics_check(out, cfg_srv, "layer8_qkvmerged_cos")
    text_tower("text_layer_bf16_b256", cfg_bf16layer, 256, fetch_s, out)
    tower("vit_b16_parity_b64", b16, 64, fetch_s, out)
    tower("vit_b16_serving_b64", b16_srv, 64, fetch_s, out)
    tower("vit_b16_serving_b128", b16_srv, 128, fetch_s, out)

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe10.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
