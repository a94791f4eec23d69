"""Third attention probe: small blocks, int8 combinations, the int8
no-attention floor, and a batched-softmax kernel variant.

Findings so far (bench_results/attn_probe*.json):
  bm=16: 10.8k | bm=8: 12.5k | bm=4: 13.0k img/s — smaller packs win, the
  per-image mask+softmax work is bm*t^2. Remaining per-step overhead looks
  fixed, so one variant batches all heads' softmax into one VPU pass.

Run:  python tools/tpu_attn_probe3.py
Writes bench_results/attn_probe3.json
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

import flax.linen as nn

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.models import clip as clip_mod
from image_retrieval_tpu.ops import flash_attention as fa
from tools.tpu_embed_probe import _enable_cache, fetch_overhead_s, tower


def _attn_kernel_cs(q_ref, k_ref, v_ref, o_ref, *, heads: int):
    """Batched-softmax variant: all heads' scores stacked into ONE
    (heads*m, m) tensor so mask-add/max/exp/sum run as single large VPU ops
    instead of `heads` small ones."""
    bm, t, w = q_ref.shape
    hd = w // heads
    m = bm * t
    qf = q_ref[:].reshape(m, w)
    kf = k_ref[:].reshape(m, w)
    vf = v_ref[:].reshape(m, w)
    row_img = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // t
    col_img = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // t
    neg = jnp.where(row_img == col_img, 0.0, -jnp.inf).astype(jnp.float32)
    scale = hd ** -0.5
    ss = []
    for h in range(heads):
        qh = qf[:, h * hd:(h + 1) * hd]
        kh = kf[:, h * hd:(h + 1) * hd]
        ss.append(
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    s = jnp.concatenate(ss, axis=0) * scale + jnp.tile(neg, (heads, 1))
    s = s - jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s)
    p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(qf.dtype)
    outs = []
    for h in range(heads):
        vh = vf[:, h * hd:(h + 1) * hd]
        outs.append(
            jax.lax.dot_general(
                p[h * m:(h + 1) * m], vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
        )
    o_ref[:] = jnp.concatenate(outs, axis=1).reshape(bm, t, w)


def pallas_attention_cs(q, k, v, heads: int, bm_cap: int = 4):
    b, t, w = q.shape
    bm = 1
    for c in (8, 4, 2, 1):
        if b % c == 0 and c * t <= 512 and c <= bm_cap:
            bm = c
            break
    spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_cs, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, t, w), q.dtype),
        grid=(b // bm,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=fa._interpret(),
    )(q, k, v)


class _AttnNoMix(clip_mod.Attention):
    @nn.compact
    def __call__(self, x, mask=None):
        from image_retrieval_tpu.models.clip import _dense

        v = _dense(self.quant, self.width, self.dtype, "v_proj")(x)
        q = _dense(self.quant, self.width, self.dtype, "q_proj")(x)
        k = _dense(self.quant, self.width, self.dtype, "k_proj")(x)
        out = v + 0.0 * (q + k)
        return _dense(self.quant, self.width, self.dtype, "out_proj")(out)


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []
    base = ModelConfig()
    cfg_p = dataclasses.replace(base, pallas_attention=True)
    cfg_p8 = dataclasses.replace(base, pallas_attention=True, int8_matmuls=True)

    saved_block = fa._block_images
    saved_pallas = fa._pallas_attention
    saved_attn = clip_mod.Attention
    try:
        for bm in (2, 1):
            fa._block_images = lambda b, t, _bm=bm: _bm if b % _bm == 0 else 1
            tower(f"pallas_bm{bm}", cfg_p, 128, fetch_s, out)
        # best packed block + int8 projections
        fa._block_images = lambda b, t: 4 if b % 4 == 0 else 1
        tower("pallas_bm4_int8", cfg_p8, 128, fetch_s, out)
        fa._block_images = saved_block

        # batched-softmax variant
        for bm in (4, 8):
            fa._pallas_attention = functools.partial(pallas_attention_cs, bm_cap=bm)
            tower(f"pallas_cs_bm{bm}", cfg_p, 128, fetch_s, out)
        fa._pallas_attention = saved_pallas

        # int8 floor: projections int8, attention mix removed entirely
        clip_mod.Attention = _AttnNoMix
        tower("no_attnmix_int8", dataclasses.replace(base, int8_matmuls=True),
              128, fetch_s, out)
    finally:
        fa._block_images = saved_block
        fa._pallas_attention = saved_pallas
        clip_mod.Attention = saved_attn

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe3.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
