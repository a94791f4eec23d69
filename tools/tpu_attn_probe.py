"""Measure the fused Pallas attention kernel in the ViT-B/32 vision tower on
the real TPU: bf16 + pallas, int8 projections + pallas, and an on-device
numerics check vs the XLA einsum path.

Run:  python tools/tpu_attn_probe.py
Appends records to bench_results/attn_probe.json
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
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower

ITERS = 20


def numerics_check(out):
    """Kernel vs XLA path on the real chip (bf16, batch 8)."""
    from image_retrieval_tpu.models.clip import CLIP, init_params

    base = ModelConfig()
    model, params = init_params(base, seed=0, dtype=jnp.bfloat16)
    mp = CLIP(dataclasses.replace(base, pallas_attention=True), dtype=jnp.bfloat16)
    px = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 224, 224, 3)).astype(np.float32)
    )
    a = np.asarray(jax.jit(lambda p, x: model.apply(p, x, method=CLIP.encode_image))(params, px), np.float64)
    b = np.asarray(jax.jit(lambda p, x: mp.apply(p, x, method=CLIP.encode_image))(params, px), np.float64)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    rec = {"name": "pallas_vs_xla_cos_min", "value": float(cos.min())}
    out.append(rec)
    print(json.dumps(rec), flush=True)
    assert cos.min() > 0.999, cos


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []

    numerics_check(out)

    base = ModelConfig()
    tower("vision_pallas", dataclasses.replace(base, pallas_attention=True),
          128, fetch_s, out)
    tower("vision_pallas_int8",
          dataclasses.replace(base, pallas_attention=True, int8_matmuls=True),
          128, fetch_s, out)
    tower("vision_pallas_int8_b192",
          dataclasses.replace(base, pallas_attention=True, int8_matmuls=True),
          192, fetch_s, out)

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
