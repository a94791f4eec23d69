"""Fused multi-head attention Pallas kernel for the ViT embed hot path.

Motivation (measured, bench_results/embed_probe.json): at batch 128 the
ViT-B/32 vision tower spends ~45% of its runtime (40 of 90 us/img) in the
attention score/softmax/mix section. The FLOPs there are trivial (<2% of the
model); the cost is XLA's memory choreography — head-split transposes of
(B,T,W) activations, a materialized (B,H,T,T) f32 score tensor, multi-pass
softmax, and the transpose back. jax.nn.dot_product_attention measured
neutral on TPU (no flash lowering).

This kernel removes all of it. Per grid step it loads a block of `bm` images'
q/k/v (bm, T, W) into VMEM and never touches HBM again until the mixed
output is written:

  * tokens of all bm images are PACKED into one (bm*T, head_dim) operand, so
    each per-head score matmul is one large MXU op (e.g. 400x64x400 at T=50,
    bm=8) instead of bm tiny (50x64x50) ones;
  * cross-image score terms are killed with a block-diagonal -inf mask
    (images only attend within themselves — exact semantics, the extra
    FLOPs are free next to the MXU's idle time on tiny matmuls);
  * softmax runs in f32 in VMEM; heads are a static unrolled loop over
    64-lane slices (no transposes anywhere).

Numerics match the XLA einsum path to f32-accumulation tolerance: scores
accumulate in f32 (preferred_element_type), softmax in f32, probs cast back
to the compute dtype for the mix matmul — the same dtype contract as
models/clip.py's einsum branch.

Training still works: a custom VJP recomputes attention through the XLA
einsum path in the backward (rematerialization — nothing saved but q/k/v),
so the kernel needs no hand-written gradient.

The reference has no analog (torch CLIP, reference app_pipeline.py:113);
this replaces its L0 PyTorch attention with a TPU-native kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int,
                  mask=None) -> jnp.ndarray:
    """Plain XLA multi-head attention on (B, T, W) operands.

    Semantics-defining implementation: the kernel below must match it (it is
    also the backward-pass recompute path and the non-TPU fallback)."""
    b, t, w = q.shape
    hd = w // heads
    qh = q.reshape(b, t, heads, hd)
    kh = k.reshape(b, t, heads, hd)
    vh = v.reshape(b, t, heads, hd)
    scale = hd ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh * scale, kh, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return out.reshape(b, t, w)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int):
    bm, t, w = q_ref.shape
    hd = w // heads
    m = bm * t
    qf = q_ref[:].reshape(m, w)
    kf = k_ref[:].reshape(m, w)
    vf = v_ref[:].reshape(m, w)
    # Block-diagonal mask: token row i may only attend to tokens of the same
    # image (i // t == j // t); the packed matmul's cross-image terms get -inf.
    row_img = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // t
    col_img = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // t
    neg = jnp.where(row_img == col_img, 0.0, -jnp.inf).astype(jnp.float32)
    scale = hd ** -0.5
    outs = []
    for h in range(heads):
        qh = qf[:, h * hd:(h + 1) * hd]
        kh = kf[:, h * hd:(h + 1) * hd]
        vh = vf[:, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + neg
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(qf.dtype)
        oh = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        outs.append(oh.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=1).reshape(bm, t, w)


def _block_images(b: int, t: int) -> int:
    """Images per kernel block: the largest divisor of b keeping the packed
    token axis (bm * t) near the MXU sweet spot without bloating VMEM
    (scores are (bm*t)^2 f32 — bm=8, T=50 -> 640 KB)."""
    for bm in (8, 4, 2, 1):
        if b % bm == 0 and bm * t <= 512:
            return bm
    return 1


def _pallas_attention(q, k, v, heads: int) -> jnp.ndarray:
    b, t, w = q.shape
    bm = _block_images(b, t)
    grid = (b // bm,)
    spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, t, w), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def multihead_attention(q, k, v, heads: int):
    """Fused self-attention on (B, T, W): kernel forward, XLA-recompute
    backward. No attention mask (the packed kernel enforces per-image
    attention); masked variants (text causal) use xla_attention."""
    return _pallas_attention(q, k, v, heads)


def _mha_fwd(q, k, v, heads: int):
    return _pallas_attention(q, k, v, heads), (q, k, v)


def _mha_bwd(heads: int, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b_, c: xla_attention(a, b_, c, heads), q, k, v)
    return vjp(g)


multihead_attention.defvjp(_mha_fwd, _mha_bwd)
