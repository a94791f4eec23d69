"""Second attention-kernel probe: layout variants of ops/flash_attention.py
measured in the full 12-layer vision tower.

Probe 1 (bench_results/attn_probe.json) showed the packed kernel recovers
only ~10 of the 40 us/img attention overhead. Candidate costs: per-head
64-lane slicing relayouts, the in-matmul rhs transpose, block size, and
grid shape. Each variant below isolates one.

Run:  python tools/tpu_attn_probe2.py
Writes bench_results/attn_probe2.json
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


# -- variant: heads as a grid dimension (DMA fetches the 64-lane head slice;
# no in-kernel lane slicing) --

def _attn_kernel_hg(q_ref, k_ref, v_ref, o_ref):
    bm, t, hd = q_ref.shape
    m = bm * t
    qf = q_ref[:].reshape(m, hd)
    kf = k_ref[:].reshape(m, hd)
    vf = v_ref[:].reshape(m, hd)
    row_img = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // t
    col_img = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // t
    neg = jnp.where(row_img == col_img, 0.0, -jnp.inf).astype(jnp.float32)
    s = jax.lax.dot_general(
        qf, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * (hd ** -0.5) + neg
    s = s - jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s)
    p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(qf.dtype)
    o = jax.lax.dot_general(
        p, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = o.astype(o_ref.dtype).reshape(bm, t, hd)


def pallas_attention_headgrid(q, k, v, heads: int, bm_cap: int = 8):
    b, t, w = q.shape
    hd = w // heads
    bm = 1
    for c in (16, 8, 4, 2, 1):
        if b % c == 0 and c * t <= 1024 and c <= bm_cap:
            bm = c
            break
    spec = pl.BlockSpec((bm, t, hd), lambda i, h: (i, 0, h), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_kernel_hg,
        out_shape=jax.ShapeDtypeStruct((b, t, w), q.dtype),
        grid=(b // bm, heads),
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
    cfg = dataclasses.replace(ModelConfig(), pallas_attention=True)

    saved_block = fa._block_images
    saved_pallas = fa._pallas_attention
    try:
        # block-size sweep of the packed kernel
        for bm in (4, 16):
            fa._block_images = lambda b, t, _bm=bm: _bm if b % _bm == 0 else 1
            tower(f"pallas_bm{bm}", cfg, 128, fetch_s, out)
        fa._block_images = saved_block

        # heads-as-grid variant
        for bm in (8, 16):
            fa._pallas_attention = functools.partial(
                pallas_attention_headgrid, bm_cap=bm
            )
            tower(f"pallas_headgrid_bm{bm}", cfg, 128, fetch_s, out)
    finally:
        fa._block_images = saved_block
        fa._pallas_attention = saved_pallas

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "attn_probe2.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
