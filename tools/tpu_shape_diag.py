"""Diagnose the preset-probe layer-kernel failures: compile-only points
passed at b=8 but the b>=64 towers crashed the Mosaic compiler-helper.
Isolates grid size (standalone kernel at tower batch), tower composition
(full tower at b=8), and the causal text variants the sweep didn't cover.

Run:  python tools/tpu_shape_diag.py
Writes bench_results/shape_diag.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tools.tpu_embed_probe import _enable_cache
from tools.tpu_mosaic_shapes import try_compile

RESPATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_results", "shape_diag.json",
)


def tower_compile(name, cfg, batch, out):
    import numpy as np
    import jax.numpy as jnp

    from image_retrieval_tpu.models.clip import CLIP, init_params

    try:
        model, params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
        px = jnp.asarray(np.zeros((batch, 224, 224, 3), np.float32))
        jax.jit(
            lambda p, x: model.apply(p, x, method=CLIP.encode_image)
        ).lower(params, px).compile()
        rec = {"name": name, "ok": True}
    except Exception as e:
        rec = {"name": name, "ok": False, "error": str(e)[:300]}
    out.append(rec)
    print(json.dumps(rec), flush=True)
    with open(RESPATH, "w") as f:
        json.dump(out, f, indent=1)


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    out = []

    def point(name, *args, **kw):
        ok, err, secs = try_compile(*args, **kw)
        rec = {"name": name, "ok": ok, "compile_s": round(secs, 1)}
        if err:
            rec["error"] = err
        out.append(rec)
        print(json.dumps(rec), flush=True)
        with open(RESPATH, "w") as f:
            json.dump(out, f, indent=1)

    # grid size: same kernel, tower-scale batch
    point("layer_int8_w1024_t257_b64", "layer", True, 1024, 257, b=64)
    point("layer_bf16_w768_t50_b256", "layer", False, 768, 50, b=256)
    # causal variants the sweep skipped (text towers)
    point("layer_int8_w768_t77_causal", "layer", True, 768, 77, causal=True)
    point("layer_bf16_w512_t77_causal", "layer", False, 512, 77, causal=True)
    point("layer_int8_w1024_t77_causal", "layer", True, 1024, 77, causal=True)

    # full towers at small batch
    from image_retrieval_tpu.config import ModelConfig, serving_config, vit_l14
    from image_retrieval_tpu.ops import shape_support
    import dataclasses

    orig = shape_support.layer_kernel_fits
    shape_support.layer_kernel_fits = lambda q, w, t: True
    try:
        tower_compile("l14_layer_tower_b8", serving_config(vit_l14()), 8, out)
        tower_compile(
            "b32_bf16_layer_tower_b8",
            dataclasses.replace(ModelConfig(), fused_layer_block=True), 8, out,
        )
    finally:
        shape_support.layer_kernel_fits = orig
    print("done", flush=True)


if __name__ == "__main__":
    main()
