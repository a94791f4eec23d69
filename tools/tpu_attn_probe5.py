"""Fifth attention probe: bm>1 blocks with a per-image inner loop — fewer
grid steps than bm=1 without the packed (bm*t)^2 softmax waste. Informs
whether a fused attention-block mega-kernel should pack or loop.

Run:  python tools/tpu_attn_probe5.py
Writes bench_results/attn_probe5.json
"""

from __future__ import annotations

import dataclasses
import functools
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


def _attn_kernel_loop(q_ref, k_ref, v_ref, o_ref, *, heads: int):
    bm, t, w = q_ref.shape
    hd = w // heads
    scale = hd ** -0.5
    for i in range(bm):
        qf = q_ref[i]
        kf = k_ref[i]
        vf = v_ref[i]
        outs = []
        for h in range(heads):
            qh = qf[:, h * hd:(h + 1) * hd]
            kh = kf[:, h * hd:(h + 1) * hd]
            vh = vf[:, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s - jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s)
            p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(qf.dtype)
            outs.append(
                jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(o_ref.dtype)
            )
        o_ref[i] = jnp.concatenate(outs, axis=1)


def pallas_attention_loop(q, k, v, heads: int, bm: int = 4):
    b, t, w = q.shape
    if b % bm != 0:
        bm = 1
    spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_loop, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, t, w), q.dtype),
        grid=(b // bm,),
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

    saved = fa._pallas_attention
    try:
        for bm in (4, 8):
            fa._pallas_attention = functools.partial(pallas_attention_loop, bm=bm)
            tower(f"pallas_loop_bm{bm}", cfg_p, 128, fetch_s, out)
        # best loop size + int8, batch 192
        fa._pallas_attention = functools.partial(pallas_attention_loop, bm=4)
        tower("pallas_loop_bm4_int8_b192", cfg_p8, 192, fetch_s, out)
    finally:
        fa._pallas_attention = saved

    # fused attention BLOCK (LN1+QKV+attention+out-proj+residual, weights
    # VMEM-resident; ops/flash_attention.py attention_block)
    cfg_fb = dataclasses.replace(base, fused_attn_block=True)
    saved_block = fa._block_images
    try:
        for bm in (1, 4):
            fa._block_images = lambda b, t, _bm=bm: _bm if b % _bm == 0 else 1
            tower(f"fused_block_bm{bm}", cfg_fb, 128, fetch_s, out)
        fa._block_images = lambda b, t: 4 if b % 4 == 0 else 1
        tower("fused_block_bm4_b192", cfg_fb, 192, fetch_s, out)
    finally:
        fa._block_images = saved_block

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe5.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
