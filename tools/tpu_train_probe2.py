"""Training push (VERDICT r2 item 7): the serving kernel family applied to
the TRAINING forward, full config x batch sweep.

All three fused forwards are trainable today: the bf16 sub-block/layer
kernels recompute their backward through exact XLA mirrors, and the int8
variants use straight-through f32 VJPs. r2 measured only the parity
forward (2.24-2.33k img/s peak at b128) and the saved-intermediates
custom-VJP variant (slower); this probe closes the matrix. Decision rule
from the verdict: if nothing beats 2.33k img/s at b128 by >=15% (>=2.7k),
write the ceiling analysis into ARCHITECTURE.md and close the thread.

Run:  python tools/tpu_train_probe2.py [--quick]
Writes bench_results/train_probe2.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from image_retrieval_tpu.config import ModelConfig
from tools.tpu_embed_probe import _enable_cache
from tools.tpu_train_probe import measure

RESPATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_results", "train_probe2.json",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    out = []

    base = ModelConfig()
    subblock = dataclasses.replace(
        base, fused_attn_block=True, fused_mlp_block=True
    )  # recompute backward (NOT the r2 saved-intermediates variant)
    layer = dataclasses.replace(base, fused_layer_block=True)
    layer_int8 = dataclasses.replace(
        base, fused_layer_block=True, int8_matmuls=True
    )  # serving mega-kernel forward, straight-through f32 backward

    def save():
        with open(RESPATH, "w") as f:
            json.dump(out, f, indent=1)

    def run(name, cfg, batch):
        try:
            measure(name, cfg, batch, out)
        except Exception as e:
            rec = {"name": name, "error": str(e)[:300]}
            out.append(rec)
            print(json.dumps(rec), flush=True)
        save()

    run("base_b128", base, 128)  # session baseline for fair comparison
    run("subblock_recompute_b128", subblock, 128)
    if not args.quick:
        run("subblock_recompute_b256", subblock, 256)
    run("layer_recompute_b128", layer, 128)
    if not args.quick:
        run("layer_recompute_b256", layer, 256)
    run("layer_int8_ste_b128", layer_int8, 128)
    if not args.quick:
        run("layer_int8_ste_b256", layer_int8, 256)

    print("done", flush=True)


if __name__ == "__main__":
    main()
