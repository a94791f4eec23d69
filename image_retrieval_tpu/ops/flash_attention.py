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

The module grew into the serving kernel family (all measured on v5e,
bench_results/attn_probe*.json, each stage config-gated in ModelConfig):

  multihead_attention      bare fused attention     11.4k -> 14.2k img/s
  attention_block/mlp_block + int8 variants: whole sub-blocks, weights
                           VMEM-resident             -> 18.5k img/s
  layer_block_int8         ONE kernel per layer (the vit_b32_serving path,
                           causal in-kernel for text) -> 20.9k img/s,
                           26.5k texts/s

Every kernel has an XLA mirror defining its exact semantics (used by the
tests and as the straight-through backward), and a custom VJP so every
config — including int8 — remains trainable.
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
    if bm > 1:
        # Block-diagonal mask: token row i may only attend to tokens of the
        # same image (i // t == j // t); packed cross-image terms get -inf.
        row_img = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // t
        col_img = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // t
        neg = jnp.where(row_img == col_img, 0.0, -jnp.inf).astype(jnp.float32)
    else:
        neg = None  # single image per block: no packing, no mask needed
    scale = hd ** -0.5
    outs = []
    for h in range(heads):
        qh = qf[:, h * hd:(h + 1) * hd]
        kh = kf[:, h * hd:(h + 1) * hd]
        vh = vf[:, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale if neg is None else s * scale + neg
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(qf.dtype)
        oh = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        outs.append(oh.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=1).reshape(bm, t, w)


def _block_images(b: int, t: int) -> int:
    """Images per kernel block. Measured on v5e in the 12-layer ViT-B/32
    tower at batch 128 (bench_results/attn_probe*.json): bm=1 14.2k img/s,
    bm=4 13.0k, bm=8 12.5k, bm=16 10.8k — packing more images per block
    grows the wasted (bm*t)^2 softmax/mask area faster than it amortizes
    per-step overhead, so one image per block wins. The packed (bm>1) path
    stays available for callers with tiny sequences."""
    return 1


def _block_images_fused(b: int, t: int, hidden: int = 3072) -> int:
    """Images per block for the FUSED sub-block kernels (attention_block /
    mlp_block and their int8 variants). Unlike the bare attention kernel,
    these keep the full layer weights VMEM-resident and their cost is
    dominated by the (bm*t, w) projections, so packing more images per grid
    step amortizes the per-step weight traffic: measured at batch 128/192
    on v5e (bench_results/attn_probe7.json) bm=8 16.4k img/s int8 vs bm=1
    15.0k; bm=8 and bm=4 are within noise, bm=8 slightly ahead at 192.

    The packed-token cap keeps the per-step working set inside the ~16 MB
    scoped-VMEM budget: the largest intermediate scales as
    (bm*t, hidden) f32, and bm*t*hidden <= 1.3M is the measured-feasible
    envelope (ViT-B/32 bm=8: 400*3072; text bm=8: 616*2048; B/16 lands on
    bm=2: 394*3072; L/14 on bm=1)."""
    for bm in (8, 4, 2):
        if b % bm == 0 and bm * t * hidden <= 1_300_000:
            return bm
    return 1


def _pallas_attention(q, k, v, heads: int, bm: int | None = None) -> jnp.ndarray:
    b, t, w = q.shape
    if bm is None:
        bm = _block_images(b, t)
    if b % bm != 0:
        bm = 1
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


# ---------------------------------------------------------------------------
# Fused attention BLOCK: LN1 + QKV projections + attention + out projection
# + residual in ONE kernel, layer weights VMEM-resident across the batch
# grid (constant index_map -> fetched once). Removes the q/k/v/out HBM
# round-trips and XLA fusion boundaries around the attention section.
# ---------------------------------------------------------------------------


def _fast_layernorm_f32(xf, scale, bias, eps=1e-5):
    """flax nn.LayerNorm semantics (use_fast_variance=True, f32)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(ms - mu * mu, 0.0)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _causal_bias(t: int) -> jnp.ndarray:
    return jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)[None, None]


def xla_attention_block(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                        heads: int, causal: bool = False):
    """Semantics-defining XLA implementation (also the backward recompute):

        h = LayerNorm_f32(x) -> compute dtype
        attn = MHA(h@Wq+bq, h@Wk+bk, h@Wv+bv)
        return x + (attn @ Wo + bo)        # residual, compute dtype

    Matches models/clip.py Block's ln1+Attention+residual exactly."""
    dt = x.dtype
    h = _fast_layernorm_f32(
        x.astype(jnp.float32), ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
    ).astype(dt)
    q = (jnp.dot(h, wq.astype(dt), preferred_element_type=jnp.float32)
         + bq.astype(jnp.float32)).astype(dt)
    k = (jnp.dot(h, wk.astype(dt), preferred_element_type=jnp.float32)
         + bk.astype(jnp.float32)).astype(dt)
    v = (jnp.dot(h, wv.astype(dt), preferred_element_type=jnp.float32)
         + bv.astype(jnp.float32)).astype(dt)
    mask = _causal_bias(x.shape[1]) if causal else None
    attn = xla_attention(q, k, v, heads, mask)
    out = (jnp.dot(attn, wo.astype(dt), preferred_element_type=jnp.float32)
           + bo.astype(jnp.float32)).astype(dt)
    return x + out


# In-kernel attention strategy for the fused block kernels. "packed" does
# one (bm*t, bm*t, hd) score matmul per head with a block-diagonal -inf
# mask (exact: exp(-inf)=0 contributes exactly zero in f32, so numerics
# match the per-image loop bit-for-bit); "loop" does bm*heads tiny
# (t, t, hd) matmuls. Measured on v5e (bench_results/attn_probe8.json,
# int8 fused tower): loop 17.4k/18.5k img/s at batch 192/256 vs packed
# 15.8k/16.3k — inside the weights-resident block kernel the packed
# variant's ~bm x extra score FLOPs and (bm*t)^2 mask/softmax area cost
# more than the tiny-matmul padding they avoid (unlike the BARE attention
# kernel, where packed wins because there is nothing else to overlap).
# Module-level so probes can flip it.
_PACKED_BLOCK_ATTN = False

# Third strategy: all heads in ONE 3D batched dot_general per block
# (scores (heads, m, m) in a single MXU dispatch instead of a per-head
# loop). An earlier formulation failed to lower in Mosaic
# (attn_probe4.json "pallas_bh3d"); kept behind a flag for probing.
_BH3D_BLOCK_ATTN = False


def _inkernel_attention(q, k, v, heads: int, bm: int, t: int,
                        causal: bool = False):
    """Attention over bm sequences packed into (bm*t, w) operands, in VMEM.

    causal=True adds a per-sequence lower-triangular mask (the text tower's
    autoregressive mask, reference image_search.py:47-64 text path)."""
    m, w = q.shape
    hd = w // heads
    dt = q.dtype
    scale = hd ** -0.5
    if _BH3D_BLOCK_ATTN:
        # (m, heads*hd) -> (heads, m, hd); scores/softmax/mix batched
        # over the head dim in single 3D dot_generals.
        q3 = q.reshape(m, heads, hd).transpose(1, 0, 2)
        k3 = k.reshape(m, heads, hd).transpose(1, 0, 2)
        v3 = v.reshape(m, heads, hd).transpose(1, 0, 2)
        s3 = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        ok = (row // t) == (col // t)
        if causal:
            ok = ok & ((col % t) <= (row % t))
        if bm > 1 or causal:
            s3 = s3 + jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[None]
        s3 = s3 - jnp.max(s3, axis=2, keepdims=True)
        p3 = jnp.exp(s3)
        p3 = (p3 / jnp.sum(p3, axis=2, keepdims=True)).astype(dt)
        o3 = jax.lax.dot_general(
            p3, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        return o3.transpose(1, 0, 2).reshape(m, w)
    if (_PACKED_BLOCK_ATTN and bm > 1) or (causal and bm == 1):
        row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        ok = (row // t) == (col // t)
        if causal:
            ok = ok & ((col % t) <= (row % t))
        neg = jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)
        outs = []
        for hh in range(heads):
            cs = slice(hh * hd, (hh + 1) * hd)
            s = jax.lax.dot_general(
                q[:, cs], k[:, cs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + neg
            s = s - jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s)
            p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(dt)
            outs.append(
                jax.lax.dot_general(
                    p, v[:, cs], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
            )
        return jnp.concatenate(outs, axis=1)
    if causal:
        rr = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        cmask = jnp.where(cc <= rr, 0.0, -jnp.inf).astype(jnp.float32)
    attn_rows = []
    for i in range(bm):
        sl = slice(i * t, (i + 1) * t)
        outs = []
        for hh in range(heads):
            cs = slice(hh * hd, (hh + 1) * hd)
            s = jax.lax.dot_general(
                q[sl, cs], k[sl, cs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if causal:
                s = s + cmask
            s = s - jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s)
            p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(dt)
            outs.append(
                jax.lax.dot_general(
                    p, v[sl, cs], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
            )
        attn_rows.append(jnp.concatenate(outs, axis=1))
    return jnp.concatenate(attn_rows, axis=0) if bm > 1 else attn_rows[0]


def _attn_block_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref,
                       bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, o_ref, *,
                       heads: int, causal: bool = False):
    bm, t, w = x_ref.shape
    m = bm * t
    dt = x_ref.dtype
    xb = x_ref[:].reshape(m, w)
    h = _fast_layernorm_f32(
        xb.astype(jnp.float32), lns_ref[0].astype(jnp.float32),
        lnb_ref[0].astype(jnp.float32),
    ).astype(dt)
    q = (jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[0].astype(jnp.float32)).astype(dt)
    k = (jnp.dot(h, wk_ref[:], preferred_element_type=jnp.float32)
         + bk_ref[0].astype(jnp.float32)).astype(dt)
    v = (jnp.dot(h, wv_ref[:], preferred_element_type=jnp.float32)
         + bv_ref[0].astype(jnp.float32)).astype(dt)
    attn = _inkernel_attention(q, k, v, heads, bm, t, causal)
    out = (jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
           + bo_ref[0].astype(jnp.float32)).astype(dt)
    o_ref[:] = (xb + out).reshape(bm, t, w)


def _pallas_attention_block(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
                            wo, bo, heads: int, bm: int | None = None,
                            causal: bool = False):
    b, t, w = x.shape
    dt = x.dtype
    if bm is None or b % bm != 0:
        bm = _block_images_fused(b, t, 4 * w)
    x_spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = lambda a: a.reshape(1, w)
    return pl.pallas_call(
        functools.partial(_attn_block_kernel, heads=heads, causal=causal),
        out_shape=jax.ShapeDtypeStruct((b, t, w), dt),
        grid=(b // bm,),
        in_specs=[x_spec, v_spec, v_spec, w_spec, v_spec, w_spec, v_spec,
                  w_spec, v_spec, w_spec, v_spec],
        out_specs=x_spec,
        interpret=_interpret(),
    )(
        x, vec(ln_scale), vec(ln_bias), wq.astype(dt), vec(bq),
        wk.astype(dt), vec(bk), wv.astype(dt), vec(bv), wo.astype(dt),
        vec(bo),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def attention_block(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                    heads: int, causal: bool = False):
    """Whole pre-LN attention sub-block as one kernel (forward); backward
    recomputes through xla_attention_block. Weights stay VMEM-resident
    across the image grid (~4.7 MB bf16 for ViT-B/32). causal=True applies
    the text tower's autoregressive mask in-kernel."""
    return _pallas_attention_block(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, heads,
        causal=causal,
    )


def _blk_fwd(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, heads,
             causal):
    out = _pallas_attention_block(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, heads,
        causal=causal,
    )
    return out, (x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)


def _blk_bwd(heads, causal, res, g):
    _, vjp = jax.vjp(
        lambda *a: xla_attention_block(*a, heads=heads, causal=causal), *res
    )
    return vjp(g)


attention_block.defvjp(_blk_fwd, _blk_bwd)


# ---------------------------------------------------------------------------
# Fused MLP block: LN2 + fc1 + quick_gelu + fc2 + residual in one kernel,
# both MLP weight matrices VMEM-resident (~9.4 MB bf16 for ViT-B/32).
# ---------------------------------------------------------------------------


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def xla_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Semantics-defining XLA implementation (backward recompute path):
    x + fc2(quick_gelu(fc1(LayerNorm_f32(x)))) — matches models/clip.py
    Block's ln2+MLP+residual."""
    dt = x.dtype
    h = _fast_layernorm_f32(
        x.astype(jnp.float32), ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
    ).astype(dt)
    af = (jnp.dot(h, w1.astype(dt), preferred_element_type=jnp.float32)
          + b1.astype(jnp.float32))
    # gelu in f32, matching the kernel (_mlp_block_kernel) exactly — a
    # bf16 pre-gelu cast here would make the mirror (and the VJP
    # recompute) diverge from the forward by up to ~0.03 in bf16 towers.
    a = _quick_gelu(af).astype(dt)
    out = (jnp.dot(a, w2.astype(dt), preferred_element_type=jnp.float32)
           + b2.astype(jnp.float32)).astype(dt)
    return x + out


def _mlp_block_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref):
    bm, t, w = x_ref.shape
    m = bm * t
    dt = x_ref.dtype
    xb = x_ref[:].reshape(m, w)
    h = _fast_layernorm_f32(
        xb.astype(jnp.float32), lns_ref[0].astype(jnp.float32),
        lnb_ref[0].astype(jnp.float32),
    ).astype(dt)
    af = (jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
          + b1_ref[0].astype(jnp.float32))
    # gelu in f32: Mosaic rejects bf16 logistic ('vector.broadcast' element
    # type verification bug), and f32 is the more accurate choice anyway.
    a = _quick_gelu(af).astype(dt)
    out = (jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
           + b2_ref[0].astype(jnp.float32)).astype(dt)
    o_ref[:] = (xb + out).reshape(bm, t, w)


def _pallas_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2,
                      bm: int | None = None):
    b, t, w = x.shape
    hidden = w1.shape[1]
    dt = x.dtype
    if bm is None or b % bm != 0:
        bm = _block_images_fused(b, t, hidden)
    x_spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((w, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((hidden, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vw = lambda a: a.reshape(1, -1)
    vw_spec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mlp_block_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, w), dt),
        grid=(b // bm,),
        in_specs=[x_spec, vw_spec(w), vw_spec(w), w1_spec, vw_spec(hidden),
                  w2_spec, vw_spec(w)],
        out_specs=x_spec,
        interpret=_interpret(),
    )(x, vw(ln_scale), vw(ln_bias), w1.astype(dt), vw(b1), w2.astype(dt),
      vw(b2))


@jax.custom_vjp
def mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Whole pre-LN MLP sub-block as one kernel (forward); backward
    recomputes through xla_mlp_block."""
    return _pallas_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
    out = _pallas_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp_bwd(res, g):
    _, vjp = jax.vjp(xla_mlp_block, *res)
    return vjp(g)


mlp_block.defvjp(_mlp_fwd, _mlp_bwd)


# ---------------------------------------------------------------------------
# int8 variants: same fused blocks with the projections executed as
# int8 x int8 -> int32 MXU matmuls (v5e int8 peak = 2x bf16). Weights are
# quantized per output channel OUTSIDE the kernel (input-independent, XLA
# hoists it); activations are quantized per row IN VMEM. Backward uses a
# straight-through estimator: gradients flow through the f32
# xla_attention_block / xla_mlp_block as if quantization were identity
# (jnp.round's a.e.-zero derivative would kill weight grads otherwise).
# ---------------------------------------------------------------------------


def _quantize_weight(w):
    """f32 (in, out) -> (int8 values, f32 (1, out) per-channel scales)."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    wq = jnp.round(w / s).astype(jnp.int8)
    return wq, s.reshape(1, -1).astype(jnp.float32)


def _rowquant(hf32):
    """f32 (m, w) -> (int8 values, f32 (m, 1) per-row scales)."""
    s = jnp.maximum(jnp.max(jnp.abs(hf32), axis=-1, keepdims=True), 1e-12) / 127.0
    return jnp.round(hf32 / s).astype(jnp.int8), s


def _int8_proj(hq, hs, wq_ref, ws_ref, b_ref, dt):
    acc = jax.lax.dot_general(
        hq, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * hs * ws_ref[0]
            + b_ref[0].astype(jnp.float32)).astype(dt)


def _attn_block_int8_kernel(x_ref, lns_ref, lnb_ref, wqq_ref, wqs_ref,
                            bq_ref, wkq_ref, wks_ref, bk_ref, wvq_ref,
                            wvs_ref, bv_ref, woq_ref, wos_ref, bo_ref,
                            o_ref, *, heads: int, causal: bool = False):
    bm, t, w = x_ref.shape
    hd = w // heads
    m = bm * t
    dt = x_ref.dtype
    xb = x_ref[:].reshape(m, w)
    hf = _fast_layernorm_f32(
        xb.astype(jnp.float32), lns_ref[0].astype(jnp.float32),
        lnb_ref[0].astype(jnp.float32),
    )
    hq, hs = _rowquant(hf)
    q = _int8_proj(hq, hs, wqq_ref, wqs_ref, bq_ref, dt)
    k = _int8_proj(hq, hs, wkq_ref, wks_ref, bk_ref, dt)
    v = _int8_proj(hq, hs, wvq_ref, wvs_ref, bv_ref, dt)
    attn = _inkernel_attention(q, k, v, heads, bm, t, causal)
    aq, as_ = _rowquant(attn.astype(jnp.float32))
    out = _int8_proj(aq, as_, woq_ref, wos_ref, bo_ref, dt)
    o_ref[:] = (xb + out).reshape(bm, t, w)


def xla_attention_block_int8(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
                             wo, bo, heads: int, causal: bool = False):
    """XLA mirror of the int8 kernel's exact quantization math (tests)."""
    dt = x.dtype
    b, t, w = x.shape
    hf = _fast_layernorm_f32(
        x.reshape(b * t, w).astype(jnp.float32),
        ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
    )
    hq, hs = _rowquant(hf)

    def proj(wmat, bias):
        wqv, ws = _quantize_weight(wmat)
        acc = jax.lax.dot_general(
            hq, wqv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return ((acc.astype(jnp.float32) * hs * ws
                 + bias.astype(jnp.float32)).astype(dt)).reshape(b, t, w)

    mask = _causal_bias(t) if causal else None
    attn = xla_attention(proj(wq, bq), proj(wk, bk), proj(wv, bv), heads, mask)
    aq, as_ = _rowquant(attn.reshape(b * t, w).astype(jnp.float32))
    woq, wos = _quantize_weight(wo)
    acc = jax.lax.dot_general(
        aq, woq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = (acc.astype(jnp.float32) * as_ * wos
           + bo.astype(jnp.float32)).astype(dt).reshape(b, t, w)
    return x + out


def _pallas_attention_block_int8(x, ln_scale, ln_bias, wq, bq, wk, bk, wv,
                                 bv, wo, bo, heads: int,
                                 bm: int | None = None,
                                 causal: bool = False):
    b, t, w = x.shape
    dt = x.dtype
    if bm is None or b % bm != 0:
        bm = _block_images_fused(b, t, 4 * w)
    x_spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = lambda a: a.reshape(1, w)
    qs = [_quantize_weight(m_) for m_ in (wq, wk, wv, wo)]
    return pl.pallas_call(
        functools.partial(_attn_block_int8_kernel, heads=heads,
                          causal=causal),
        out_shape=jax.ShapeDtypeStruct((b, t, w), dt),
        grid=(b // bm,),
        in_specs=[x_spec, v_spec, v_spec,
                  w_spec, v_spec, v_spec,
                  w_spec, v_spec, v_spec,
                  w_spec, v_spec, v_spec,
                  w_spec, v_spec, v_spec],
        out_specs=x_spec,
        interpret=_interpret(),
    )(
        x, vec(ln_scale), vec(ln_bias),
        qs[0][0], qs[0][1], vec(bq),
        qs[1][0], qs[1][1], vec(bk),
        qs[2][0], qs[2][1], vec(bv),
        qs[3][0], qs[3][1], vec(bo),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def attention_block_int8(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo,
                         bo, heads: int, causal: bool = False):
    """int8 fused attention sub-block; backward = straight-through f32."""
    return _pallas_attention_block_int8(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, heads,
        causal=causal,
    )


def _blk8_fwd(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, heads,
              causal):
    out = _pallas_attention_block_int8(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, heads,
        causal=causal,
    )
    return out, (x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)


def _blk8_bwd(heads, causal, res, g):
    _, vjp = jax.vjp(
        lambda *a: xla_attention_block(*a, heads=heads, causal=causal), *res
    )
    return vjp(g)


attention_block_int8.defvjp(_blk8_fwd, _blk8_bwd)


def _mlp_block_int8_kernel(x_ref, lns_ref, lnb_ref, w1q_ref, w1s_ref,
                           b1_ref, w2q_ref, w2s_ref, b2_ref, o_ref):
    bm, t, w = x_ref.shape
    m = bm * t
    dt = x_ref.dtype
    xb = x_ref[:].reshape(m, w)
    hf = _fast_layernorm_f32(
        xb.astype(jnp.float32), lns_ref[0].astype(jnp.float32),
        lnb_ref[0].astype(jnp.float32),
    )
    hq, hs = _rowquant(hf)
    # f32 gelu (Mosaic rejects bf16 logistic), straight into requantization
    a = _quick_gelu(
        _int8_proj(hq, hs, w1q_ref, w1s_ref, b1_ref, jnp.float32)
    )
    aq, as_ = _rowquant(a)
    out = _int8_proj(aq, as_, w2q_ref, w2s_ref, b2_ref, dt)
    o_ref[:] = (xb + out).reshape(bm, t, w)


def xla_mlp_block_int8(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """XLA mirror of the int8 MLP kernel's quantization math (tests)."""
    dt = x.dtype
    b, t, w = x.shape
    hf = _fast_layernorm_f32(
        x.reshape(b * t, w).astype(jnp.float32),
        ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
    )
    hq, hs = _rowquant(hf)
    w1q, w1s = _quantize_weight(w1)
    acc = jax.lax.dot_general(
        hq, w1q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    # f32 gelu straight into requantization, matching _mlp_block_int8_kernel
    a = _quick_gelu(
        acc.astype(jnp.float32) * hs * w1s + b1.astype(jnp.float32)
    )
    aq, as_ = _rowquant(a)
    w2q, w2s = _quantize_weight(w2)
    acc2 = jax.lax.dot_general(
        aq, w2q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = (acc2.astype(jnp.float32) * as_ * w2s
           + b2.astype(jnp.float32)).astype(dt).reshape(b, t, w)
    return x + out


def _pallas_mlp_block_int8(x, ln_scale, ln_bias, w1, b1, w2, b2,
                           bm: int | None = None):
    b, t, w = x.shape
    hidden = w1.shape[1]
    dt = x.dtype
    if bm is None or b % bm != 0:
        bm = _block_images_fused(b, t, hidden)
    x_spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((w, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((hidden, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vw = lambda a: a.reshape(1, -1)
    vw_spec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w1q, w1s = _quantize_weight(w1)
    w2q, w2s = _quantize_weight(w2)
    return pl.pallas_call(
        _mlp_block_int8_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, w), dt),
        grid=(b // bm,),
        in_specs=[x_spec, vw_spec(w), vw_spec(w),
                  w1_spec, vw_spec(hidden), vw_spec(hidden),
                  w2_spec, vw_spec(w), vw_spec(w)],
        out_specs=x_spec,
        interpret=_interpret(),
    )(x, vw(ln_scale), vw(ln_bias), w1q, w1s, vw(b1), w2q, w2s, vw(b2))


@jax.custom_vjp
def mlp_block_int8(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """int8 fused MLP sub-block; backward = straight-through f32."""
    return _pallas_mlp_block_int8(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp8_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
    out = _pallas_mlp_block_int8(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp8_bwd(res, g):
    _, vjp = jax.vjp(xla_mlp_block, *res)
    return vjp(g)


mlp_block_int8.defvjp(_mlp8_fwd, _mlp8_bwd)


# ---------------------------------------------------------------------------
# MEGA-KERNEL: one Pallas call per transformer LAYER (attention sub-block +
# MLP sub-block). Relative to the two-kernel path this removes the
# mid-layer (bm, t, w) activation HBM round-trip and halves kernel
# launches; all weights of the layer stay VMEM-resident (~7 MB int8 for
# ViT-B/32). int8-projection variant only (the serving path).
# ---------------------------------------------------------------------------


def _layer_block_int8_kernel(x_ref, ln1s_ref, ln1b_ref, wqkvq_ref,
                             wqkvs_ref, bqkv_ref, woq_ref, wos_ref, bo_ref,
                             ln2s_ref, ln2b_ref, w1q_ref, w1s_ref, b1_ref,
                             w2q_ref, w2s_ref, b2_ref, o_ref, *, heads: int,
                             causal: bool = False):
    bm, t, w = x_ref.shape
    m = bm * t
    dt = x_ref.dtype
    xb = x_ref[:].reshape(m, w)
    # attention sub-block
    hf = _fast_layernorm_f32(
        xb.astype(jnp.float32), ln1s_ref[0].astype(jnp.float32),
        ln1b_ref[0].astype(jnp.float32),
    )
    hq, hs = _rowquant(hf)
    # QKV as ONE (m, w) x (w, 3w) int8 matmul: per-output-channel scales
    # make this bit-identical to three separate projections, with one MXU
    # dispatch and one pass over hq.
    qkv = _int8_proj(hq, hs, wqkvq_ref, wqkvs_ref, bqkv_ref, dt)
    q, k, v = qkv[:, :w], qkv[:, w:2 * w], qkv[:, 2 * w:]
    attn = _inkernel_attention(q, k, v, heads, bm, t, causal)
    aq, as_ = _rowquant(attn.astype(jnp.float32))
    x1 = xb + _int8_proj(aq, as_, woq_ref, wos_ref, bo_ref, dt)
    # MLP sub-block
    h2 = _fast_layernorm_f32(
        x1.astype(jnp.float32), ln2s_ref[0].astype(jnp.float32),
        ln2b_ref[0].astype(jnp.float32),
    )
    h2q, h2s = _rowquant(h2)
    a = _quick_gelu(_int8_proj(h2q, h2s, w1q_ref, w1s_ref, b1_ref, jnp.float32))
    aq2, as2 = _rowquant(a)
    out2 = _int8_proj(aq2, as2, w2q_ref, w2s_ref, b2_ref, dt)
    o_ref[:] = (x1 + out2).reshape(bm, t, w)


def _layer_compiler_params(w: int, hidden: int, bm: int, t: int,
                           quant: bool):
    """Explicit scoped-VMEM budget for WIDE whole-layer kernels.

    Mosaic's default VMEM ceiling (~16 MB) fits the tuned narrow towers
    (B/32 w768 int8 layer kernel: 7.1 MB weights) but rejects width-1024
    towers at the FULL-tower compile even though the single-layer
    compile-only sweep passes (preset_probe.json r3:
    l14_serving_layer_bm1_* died in the remote compile helper). v5e's
    physical VMEM is far larger than the default ceiling; raise it
    explicitly from the kernel's accounted working set:
      weights  4w^2 + 2wh bytes int8 (x2 bf16)
      acts     4*m*(6w + 2h) f32 intermediates (h, qkv, attn, mlp)
      scores   ~2 (m, m) f32 buffers in the in-kernel attention
    Narrow (w <= 768) towers keep Mosaic defaults — their measured
    numbers (21.0k img/s B/32 serving) were captured under them."""
    if w <= 768:
        return None
    m = bm * t
    weights = (4 * w * w + 2 * w * hidden) * (1 if quant else 2)
    acts = 4 * m * (6 * w + 2 * hidden)
    scores = 8 * m * m
    est = int((weights + acts + scores) * 1.5)
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(max(est, 32 * 2**20), 100 * 2**20))


def _pallas_layer_block_int8(x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo,
                             bo, ln2_s, ln2_b, w1, b1, w2, b2, heads: int,
                             bm: int | None = None, causal: bool = False):
    b, t, w = x.shape
    hidden = w1.shape[1]
    dt = x.dtype
    if bm is None or b % bm != 0:
        bm = _block_images_fused(b, t, hidden)
    x_spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sq_spec = pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((w, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((hidden, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    qkv_spec = pl.BlockSpec((w, 3 * w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vw = lambda a: a.reshape(1, -1)
    vw_spec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    bqkv = jnp.concatenate([bq, bk, bv], axis=0)
    wqkvq, wqkvs = _quantize_weight(wqkv)
    woq, wos = _quantize_weight(wo)
    w1q, w1s = _quantize_weight(w1)
    w2q, w2s = _quantize_weight(w2)
    return pl.pallas_call(
        functools.partial(_layer_block_int8_kernel, heads=heads,
                          causal=causal),
        out_shape=jax.ShapeDtypeStruct((b, t, w), dt),
        compiler_params=_layer_compiler_params(w, hidden, bm, t, True),
        grid=(b // bm,),
        in_specs=[x_spec, vw_spec(w), vw_spec(w),
                  qkv_spec, vw_spec(3 * w), vw_spec(3 * w),
                  sq_spec, vw_spec(w), vw_spec(w),
                  vw_spec(w), vw_spec(w),
                  w1_spec, vw_spec(hidden), vw_spec(hidden),
                  w2_spec, vw_spec(w), vw_spec(w)],
        out_specs=x_spec,
        interpret=_interpret(),
    )(
        x, vw(ln1_s), vw(ln1_b),
        wqkvq, wqkvs, vw(bqkv),
        woq, wos, vw(bo),
        vw(ln2_s), vw(ln2_b),
        w1q, w1s, vw(b1), w2q, w2s, vw(b2),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18))
def layer_block_int8(x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo,
                     ln2_s, ln2_b, w1, b1, w2, b2, heads: int,
                     causal: bool = False):
    """Whole transformer layer (int8 attention + MLP sub-blocks) as ONE
    kernel; backward = straight-through f32 through the XLA mirrors."""
    return _pallas_layer_block_int8(
        x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s, ln2_b,
        w1, b1, w2, b2, heads, causal=causal,
    )


def _layer8_fwd(x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s,
                ln2_b, w1, b1, w2, b2, heads, causal):
    out = _pallas_layer_block_int8(
        x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s, ln2_b,
        w1, b1, w2, b2, heads, causal=causal,
    )
    return out, (x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s,
                 ln2_b, w1, b1, w2, b2)


def _layer8_bwd(heads, causal, res, g):
    x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s, ln2_b, \
        w1, b1, w2, b2 = res

    def ref(x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s, ln2_b,
            w1, b1, w2, b2):
        x1 = xla_attention_block(
            x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, heads=heads,
            causal=causal,
        )
        return xla_mlp_block(x1, ln2_s, ln2_b, w1, b1, w2, b2)

    _, vjp = jax.vjp(ref, x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo,
                     ln2_s, ln2_b, w1, b1, w2, b2)
    return vjp(g)


layer_block_int8.defvjp(_layer8_fwd, _layer8_bwd)


def xla_layer_block_int8(x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo,
                         ln2_s, ln2_b, w1, b1, w2, b2, heads: int,
                         causal: bool = False):
    """XLA mirror of the mega-kernel's exact quantization math (tests)."""
    x1 = xla_attention_block_int8(
        x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, heads=heads,
        causal=causal,
    )
    return xla_mlp_block_int8(x1, ln2_s, ln2_b, w1, b1, w2, b2)


def _layer_block_kernel(x_ref, ln1s_ref, ln1b_ref, wq_ref, bq_ref, wk_ref,
                        bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, ln2s_ref,
                        ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                        heads: int, causal: bool = False):
    """bf16 whole-layer kernel (same fusion as _layer_block_int8_kernel,
    plain compute-dtype projections — the closer-numerics option)."""
    bm, t, w = x_ref.shape
    m = bm * t
    dt = x_ref.dtype
    xb = x_ref[:].reshape(m, w)
    h = _fast_layernorm_f32(
        xb.astype(jnp.float32), ln1s_ref[0].astype(jnp.float32),
        ln1b_ref[0].astype(jnp.float32),
    ).astype(dt)
    q = (jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[0].astype(jnp.float32)).astype(dt)
    k = (jnp.dot(h, wk_ref[:], preferred_element_type=jnp.float32)
         + bk_ref[0].astype(jnp.float32)).astype(dt)
    v = (jnp.dot(h, wv_ref[:], preferred_element_type=jnp.float32)
         + bv_ref[0].astype(jnp.float32)).astype(dt)
    attn = _inkernel_attention(q, k, v, heads, bm, t, causal)
    x1 = xb + (jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
               + bo_ref[0].astype(jnp.float32)).astype(dt)
    h2 = _fast_layernorm_f32(
        x1.astype(jnp.float32), ln2s_ref[0].astype(jnp.float32),
        ln2b_ref[0].astype(jnp.float32),
    ).astype(dt)
    af = (jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32)
          + b1_ref[0].astype(jnp.float32))
    # gelu in f32 (Mosaic rejects bf16 logistic; see _mlp_block_kernel)
    a = _quick_gelu(af).astype(dt)
    out = (jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
           + b2_ref[0].astype(jnp.float32)).astype(dt)
    o_ref[:] = (x1 + out).reshape(bm, t, w)


def _pallas_layer_block(x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo,
                        ln2_s, ln2_b, w1, b1, w2, b2, heads: int,
                        bm: int | None = None, causal: bool = False):
    b, t, w = x.shape
    hidden = w1.shape[1]
    dt = x.dtype
    if bm is None or b % bm != 0:
        bm = _block_images_fused(b, t, hidden)
    x_spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sq_spec = pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((w, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((hidden, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vw = lambda a: a.reshape(1, -1)
    vw_spec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer_block_kernel, heads=heads, causal=causal),
        out_shape=jax.ShapeDtypeStruct((b, t, w), dt),
        compiler_params=_layer_compiler_params(w, hidden, bm, t, False),
        grid=(b // bm,),
        in_specs=[x_spec, vw_spec(w), vw_spec(w),
                  sq_spec, vw_spec(w), sq_spec, vw_spec(w),
                  sq_spec, vw_spec(w), sq_spec, vw_spec(w),
                  vw_spec(w), vw_spec(w),
                  w1_spec, vw_spec(hidden), w2_spec, vw_spec(w)],
        out_specs=x_spec,
        interpret=_interpret(),
    )(
        x, vw(ln1_s), vw(ln1_b),
        wq.astype(dt), vw(bq), wk.astype(dt), vw(bk),
        wv.astype(dt), vw(bv), wo.astype(dt), vw(bo),
        vw(ln2_s), vw(ln2_b),
        w1.astype(dt), vw(b1), w2.astype(dt), vw(b2),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18))
def layer_block(x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo,
                ln2_s, ln2_b, w1, b1, w2, b2, heads: int,
                causal: bool = False):
    """Whole transformer layer (bf16 sub-blocks) as ONE kernel; backward
    recomputes through the XLA mirrors (exact same math)."""
    return _pallas_layer_block(
        x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s, ln2_b,
        w1, b1, w2, b2, heads, causal=causal,
    )


def _layer_fwd(x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s,
               ln2_b, w1, b1, w2, b2, heads, causal):
    out = _pallas_layer_block(
        x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s, ln2_b,
        w1, b1, w2, b2, heads, causal=causal,
    )
    return out, (x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s,
                 ln2_b, w1, b1, w2, b2)


def _layer_bwd(heads, causal, res, g):
    def ref(x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, ln2_s, ln2_b,
            w1, b1, w2, b2):
        x1 = xla_attention_block(
            x, ln1_s, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo, heads=heads,
            causal=causal,
        )
        return xla_mlp_block(x1, ln2_s, ln2_b, w1, b1, w2, b2)

    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


layer_block.defvjp(_layer_fwd, _layer_bwd)


# ---------------------------------------------------------------------------
# Training-grade backward for the attention sub-block: the forward kernel
# ALSO writes q, k, v, attn and the per-head softmax probabilities, and the
# backward is hand-written XLA over those saved tensors — no forward
# recompute (the default custom-VJP re-runs the whole sub-block, i.e. the
# exact choreography the kernel exists to avoid). Gradient formulas follow
# the mirror exactly; parity vs jax.vjp(xla_attention_block) is pinned by
# tests/test_flash_attention.py.
# ---------------------------------------------------------------------------


def _attn_block_saved_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref,
                             wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                             o_ref, q_ref, k_ref, v_ref, attn_ref, p_ref,
                             *, heads: int, causal: bool = False):
    bm, t, w = x_ref.shape
    hd = w // heads
    m = bm * t
    dt = x_ref.dtype
    xb = x_ref[:].reshape(m, w)
    h = _fast_layernorm_f32(
        xb.astype(jnp.float32), lns_ref[0].astype(jnp.float32),
        lnb_ref[0].astype(jnp.float32),
    ).astype(dt)
    q = (jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[0].astype(jnp.float32)).astype(dt)
    k = (jnp.dot(h, wk_ref[:], preferred_element_type=jnp.float32)
         + bk_ref[0].astype(jnp.float32)).astype(dt)
    v = (jnp.dot(h, wv_ref[:], preferred_element_type=jnp.float32)
         + bv_ref[0].astype(jnp.float32)).astype(dt)
    scale = hd ** -0.5
    if causal:
        rr = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        cmask = jnp.where(cc <= rr, 0.0, -jnp.inf).astype(jnp.float32)
    attn_rows = []
    for i in range(bm):
        sl = slice(i * t, (i + 1) * t)
        outs = []
        for hh in range(heads):
            cs = slice(hh * hd, (hh + 1) * hd)
            s = jax.lax.dot_general(
                q[sl, cs], k[sl, cs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if causal:
                s = s + cmask
            s = s - jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            p_ref[i, hh] = p
            pd = p.astype(dt)
            outs.append(
                jax.lax.dot_general(
                    pd, v[sl, cs], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
            )
        attn_rows.append(jnp.concatenate(outs, axis=1))
    attn = jnp.concatenate(attn_rows, axis=0) if bm > 1 else attn_rows[0]
    out = (jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
           + bo_ref[0].astype(jnp.float32)).astype(dt)
    o_ref[:] = (xb + out).reshape(bm, t, w)
    q_ref[:] = q.reshape(bm, t, w)
    k_ref[:] = k.reshape(bm, t, w)
    v_ref[:] = v.reshape(bm, t, w)
    attn_ref[:] = attn.reshape(bm, t, w)


def _pallas_attention_block_saved(x, ln_scale, ln_bias, wq, bq, wk, bk, wv,
                                  bv, wo, bo, heads: int,
                                  causal: bool = False):
    b, t, w = x.shape
    dt = x.dtype
    # tighter block budget than the plain kernel: the five extra (bm,t,w)
    # outputs + (bm,heads,t,t) probs add ~4 MB at bm=8 and blow the 16 MB
    # scoped-VMEM limit (measured); 8*w halves bm vs the plain kernel
    bm = _block_images_fused(b, t, 8 * w)
    x_spec = pl.BlockSpec((bm, t, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec(
        (bm, heads, t, t), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = lambda a: a.reshape(1, w)
    return pl.pallas_call(
        functools.partial(_attn_block_saved_kernel, heads=heads,
                          causal=causal),
        out_shape=[
            jax.ShapeDtypeStruct((b, t, w), dt),              # o
            jax.ShapeDtypeStruct((b, t, w), dt),              # q
            jax.ShapeDtypeStruct((b, t, w), dt),              # k
            jax.ShapeDtypeStruct((b, t, w), dt),              # v
            jax.ShapeDtypeStruct((b, t, w), dt),              # attn
            jax.ShapeDtypeStruct((b, heads, t, t), jnp.float32),  # probs
        ],
        grid=(b // bm,),
        in_specs=[x_spec, v_spec, v_spec, w_spec, v_spec, w_spec, v_spec,
                  w_spec, v_spec, w_spec, v_spec],
        out_specs=[x_spec, x_spec, x_spec, x_spec, x_spec, p_spec],
        interpret=_interpret(),
    )(
        x, vec(ln_scale), vec(ln_bias), wq.astype(dt), vec(bq),
        wk.astype(dt), vec(bk), wv.astype(dt), vec(bv), wo.astype(dt),
        vec(bo),
    )


def _ln_bwd_f32(dh, x32, ln_scale, eps=1e-5):
    """VJP of _fast_layernorm_f32 wrt its input and (scale, bias)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(ms - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * rstd
    dxhat = dh * ln_scale.astype(jnp.float32)
    dx = rstd * (
        dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dls = jnp.sum(dh * xhat, axis=tuple(range(dh.ndim - 1)))
    dlb = jnp.sum(dh, axis=tuple(range(dh.ndim - 1)))
    return dx, dls, dlb


def _attn_block_saved_bwd(heads, causal, res, g):
    """Hand-written backward over the saved tensors (no fwd recompute
    except the cheap LayerNorm). Math mirrors xla_attention_block."""
    x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, q, k, v, attn, \
        probs = res
    b, t, w = x.shape
    hd = w // heads
    scale = hd ** -0.5
    f32 = jnp.float32
    g32 = g.astype(f32)
    x32 = x.astype(f32)
    dt = x.dtype

    # out projection + residual: out = attn @ wo + bo ; y = x + out
    g2 = g32.reshape(b * t, w)
    attn2 = attn.astype(f32).reshape(b * t, w)
    dwo = attn2.T @ g2
    dbo = jnp.sum(g2, axis=0)
    dattn = (g2 @ wo.astype(f32).T).reshape(b, t, heads, hd)

    # attention: per-head softmax(q scale @ k^T) @ v, probs saved in f32
    qh = q.astype(f32).reshape(b, t, heads, hd)
    kh = k.astype(f32).reshape(b, t, heads, hd)
    vh = v.astype(f32).reshape(b, t, heads, hd)
    # the forward mixes with probs CAST to the compute dtype (pd = p.astype
    # (dt); oh = pd @ v), so the true vjp for dv uses the cast probs — in
    # bf16 towers using the raw f32 probs here would drop the ~2^-8 prob
    # rounding from every dv term. ds (softmax bwd) stays in f32: the
    # softmax itself ran in f32 and the cast node's vjp is pass-through.
    probs_mix = probs.astype(dt).astype(f32)
    dv_h = jnp.einsum("bhqk,bqhd->bkhd", probs_mix, dattn)
    dp = jnp.einsum("bqhd,bkhd->bhqk", dattn, vh)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq_h = jnp.einsum("bhqk,bkhd->bqhd", ds, kh) * scale
    dk_h = jnp.einsum("bhqk,bqhd->bkhd", ds, qh) * scale

    # projections: q = h @ wq + bq (h = LN(x) cast to compute dtype)
    h32 = _fast_layernorm_f32(
        x32, ln_scale.astype(f32), ln_bias.astype(f32)
    ).astype(dt).astype(f32)
    h2 = h32.reshape(b * t, w)
    dq2 = dq_h.reshape(b * t, w)
    dk2 = dk_h.reshape(b * t, w)
    dv2 = dv_h.reshape(b * t, w)
    dwq, dwk, dwv = h2.T @ dq2, h2.T @ dk2, h2.T @ dv2
    dbq = jnp.sum(dq2, axis=0)
    dbk = jnp.sum(dk2, axis=0)
    dbv = jnp.sum(dv2, axis=0)
    dh = (dq2 @ wq.astype(f32).T + dk2 @ wk.astype(f32).T
          + dv2 @ wv.astype(f32).T).reshape(b, t, w)

    dx_ln, dls, dlb = _ln_bwd_f32(dh, x32, ln_scale)
    dx = (g32 + dx_ln).astype(x.dtype)
    cast = lambda grad, prim: grad.astype(prim.dtype)
    return (dx, cast(dls, ln_scale), cast(dlb, ln_bias), cast(dwq, wq),
            cast(dbq, bq), cast(dwk, wk), cast(dbk, bk), cast(dwv, wv),
            cast(dbv, bv), cast(dwo, wo), cast(dbo, bo))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def attention_block_train(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo,
                          bo, heads: int, causal: bool = False):
    """attention_block with a no-recompute backward: the forward kernel
    saves q/k/v/attn/probs, the backward is hand-written XLA over them.
    Same gradient as the recompute VJP; trades ~(5 + heads·t/w) extra
    activation memory per token for skipping the attention sub-block's
    entire forward recompute in the backward pass."""
    return _pallas_attention_block(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, heads,
        causal=causal,
    )


def _blk_saved_fwd(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                   heads, causal):
    o, q, k, v, attn, probs = _pallas_attention_block_saved(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, heads,
        causal=causal,
    )
    return o, (x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
               q, k, v, attn, probs)


attention_block_train.defvjp(_blk_saved_fwd, _attn_block_saved_bwd)
