"""Fourth attention probe: the lean bm=1 kernel (mask-free) as the new
default, its int8 combination, and an experimental 3D batched-heads kernel.

Run:  python tools/tpu_attn_probe4.py
Writes bench_results/attn_probe4.json
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.ops import flash_attention as fa
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower


def _attn_kernel_bh(q_ref, k_ref, v_ref, o_ref, *, heads: int):
    """Batched-heads 3D dot_general variant (bm=1): can Mosaic lower a
    (h, t, d) batched matmul better than an unrolled head loop?"""
    _, t, w = q_ref.shape
    hd = w // heads
    q3 = q_ref[0].reshape(t, heads, hd).transpose(1, 0, 2)
    k3 = k_ref[0].reshape(t, heads, hd).transpose(1, 0, 2)
    v3 = v_ref[0].reshape(t, heads, hd).transpose(1, 0, 2)
    s = jax.lax.dot_general(
        q3, k3, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * (hd ** -0.5)
    s = s - jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s)
    p = (p / jnp.sum(p, axis=2, keepdims=True)).astype(q3.dtype)
    o = jax.lax.dot_general(
        p, v3, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.transpose(1, 0, 2).reshape(t, w).astype(o_ref.dtype)


def pallas_attention_bh(q, k, v, heads: int):
    import functools

    b, t, w = q.shape
    spec = pl.BlockSpec((1, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_bh, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, t, w), q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=fa._interpret(),
    )(q, k, v)


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []
    base = ModelConfig()
    cfg_p = dataclasses.replace(base, pallas_attention=True)
    cfg_p8 = dataclasses.replace(base, pallas_attention=True, int8_matmuls=True)

    tower("pallas_bm1_nomask", cfg_p, 128, fetch_s, out)
    tower("pallas_bm1_int8", cfg_p8, 128, fetch_s, out)
    tower("pallas_bm1_int8_b192", cfg_p8, 192, fetch_s, out)
    tower("pallas_bm1_b192", cfg_p, 192, fetch_s, out)

    saved = fa._pallas_attention
    try:
        fa._pallas_attention = pallas_attention_bh
        tower("pallas_bh3d", cfg_p, 128, fetch_s, out)
    except Exception as e:  # Mosaic may reject 3D batched dots / transposes
        rec = {"name": "pallas_bh3d", "error": str(e)[:300]}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    finally:
        fa._pallas_attention = saved

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe4.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
