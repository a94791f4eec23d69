"""ViT preset generalization probe (VERDICT r2 item 3): tune B/16 serving
(bm sweep over the fused sub-block/layer kernels) and measure L/14 —
parity path, serving sub-block fallback, and a forced whole-layer int8
attempt at bm=1 with the VMEM outcome recorded either way.

Run:  python tools/tpu_preset_probe.py [--quick]
Writes bench_results/preset_probe.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from image_retrieval_tpu.config import (
    ModelConfig,
    serving_config,
    vit_b16,
    vit_l14,
)
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower

RESPATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_results", "preset_probe.json",
)


def guarded(out, name, fn):
    try:
        fn()
    except Exception as e:
        rec = {"name": name, "error": str(e)[:300]}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    with open(RESPATH, "w") as f:
        json.dump(out, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--l14-only", action="store_true",
                    help="skip the B/16 bm sweep; run only the L/14 "
                         "sections (r4: retry the whole-layer kernel with "
                         "the raised wide-tower VMEM ceiling)")
    args = ap.parse_args()

    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []

    from image_retrieval_tpu.ops import flash_attention as fa

    b16_srv = serving_config(vit_b16())
    orig_bm = fa._block_images_fused

    # --- B/16 tuning pass: force bm over the fused kernels ------------------
    bms = () if args.l14_only else ((2, 1) if args.quick else (2, 1, 4))
    batches = (128,) if args.quick else (128, 256)
    for bm in bms:
        fa._block_images_fused = (
            lambda b, t, hidden=3072, _bm=bm: _bm if b % _bm == 0 else 1
        )
        try:
            for batch in batches:
                guarded(out, f"b16_serving_bm{bm}_b{batch}",
                        lambda b=batch, n=f"b16_serving_bm{bm}_b{batch}":
                        tower(n, b16_srv, b, fetch_s, out))
        finally:
            fa._block_images_fused = orig_bm

    if args.quick:
        return

    # --- L/14: parity, serving with each kernel path PINNED (the r3 Mosaic
    # sweep showed the w1024 layer kernel compiles, so the table would
    # otherwise pick it silently for both runs) --------------------------
    from image_retrieval_tpu.ops import shape_support

    l14 = vit_l14()
    l14_srv = serving_config(l14)
    orig_fits = shape_support.layer_kernel_fits
    if not args.l14_only:
        guarded(out, "l14_parity_b64",
                lambda: tower("l14_parity_b64", l14, 64, fetch_s, out))

        shape_support.layer_kernel_fits = lambda quant, width, t: False
        try:
            guarded(out, "l14_serving_subblock_b64",
                    lambda: tower("l14_serving_subblock_b64", l14_srv, 64,
                                  fetch_s, out))
            guarded(out, "l14_serving_subblock_b128",
                    lambda: tower("l14_serving_subblock_b128", l14_srv, 128,
                                  fetch_s, out))
        finally:
            shape_support.layer_kernel_fits = orig_fits

    # whole-layer int8 at width 1024 (compiles per mosaic_shapes.json;
    # _block_images_fused lands on bm=1 at t=257)
    shape_support.layer_kernel_fits = lambda quant, width, t: True
    try:
        guarded(out, "l14_serving_layer_bm1_b64",
                lambda: tower("l14_serving_layer_bm1_b64", l14_srv, 64,
                              fetch_s, out))
        guarded(out, "l14_serving_layer_bm1_b128",
                lambda: tower("l14_serving_layer_bm1_b128", l14_srv, 128,
                              fetch_s, out))
    finally:
        shape_support.layer_kernel_fits = orig_fits

    # bf16 whole-layer at width 768 also newly compiles (was assumed VMEM-
    # OOM): measure the bf16 B/32-vision-width layer kernel on the B/16
    # tower's text side is w512; use a bf16 serving variant of B/32
    import dataclasses as _dc

    from image_retrieval_tpu.config import ModelConfig

    if not args.l14_only:
        bf16_layer_b32 = _dc.replace(
            ModelConfig(), fused_layer_block=True  # bf16 (no int8_matmuls)
        )
        guarded(out, "b32_bf16_layer_b256",
                lambda: tower("b32_bf16_layer_b256", bf16_layer_b32, 256,
                              fetch_s, out))

    print("done", flush=True)


if __name__ == "__main__":
    main()
