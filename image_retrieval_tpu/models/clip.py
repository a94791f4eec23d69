"""CLIP ViT-B/32 in Flax — the TPU replacement for the reference's PyTorch
"openai/clip-vit-base-patch32" (reference app_pipeline.py:103-104,
ImageEmbeddingSystem.py:82-85, image_search.py:61-64).

Built from scratch for jit/pjit execution: bf16 compute with f32 params and
f32 accumulation, static shapes (224x224 images, 77-token text), no Python
control flow in the traced path. Weight layout matches the HF checkpoint
structure so pretrained weights can be ported when available
(models/weights.py).

Architecture (HF CLIPConfig for clip-vit-base-patch32):
  vision: 32x32 patch conv -> [CLS] + 49 tokens, width 768, 12 layers,
          12 heads, pre-LN transformer, quick_gelu, post-LN on CLS,
          projection 768 -> 512
  text:   vocab 49408, 77 positions, width 512, 12 layers, 8 heads,
          causal mask, final LN, pooled at argmax(token_id) (EOT),
          projection 512 -> 512
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_retrieval_tpu.config import ModelConfig

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


@jax.custom_vjp
def _quant_matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 MXU matmul with dynamic symmetric scales,
    returned dequantized as f32. Straight-through backward: gradients are
    those of the f32 matmul x @ kernel (round/cast would otherwise zero
    every weight gradient — ADVICE r2), so direct jax.grad over an
    int8_matmuls model trains instead of silently freezing."""
    wmax = jnp.max(jnp.abs(kernel), axis=0)
    wscale = jnp.maximum(wmax, 1e-12) / 127.0
    wq = jnp.round(kernel / wscale).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    xmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xscale = jnp.maximum(xmax, 1e-12) / 127.0
    xq = jnp.round(xf / xscale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xscale * wscale[None]


def _quant_matmul_fwd(x, kernel):
    return _quant_matmul(x, kernel), (x, kernel)


def _quant_matmul_bwd(res, g):
    x, kernel = res
    gf = g.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)
    dx = jax.lax.dot_general(
        gf, kf, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    x2 = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    g2 = gf.reshape(-1, g.shape[-1])
    dk = jnp.dot(x2.T, g2, preferred_element_type=jnp.float32).astype(kernel.dtype)
    return dx, dk


_quant_matmul.defvjp(_quant_matmul_fwd, _quant_matmul_bwd)


class QuantDense(nn.Module):
    """Dense projection executed as an int8 x int8 -> int32 MXU matmul.

    v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS), so the big
    projections (QKV/out, MLP fc1/fc2 — ~94% of ViT-B/32 FLOPs) can halve
    their MXU time. Dynamic symmetric quantization: per-token (row) scales
    for activations, per-output-channel scales for weights, exact rescale
    after the int32 accumulation. The parameter tree ({'kernel','bias'})
    matches flax nn.Dense exactly, so ported HF checkpoints
    (models/weights.py) drop in unchanged.

    This is a serving-time numerics trade (the reference has no analog; its
    CLIP forward is f32 torch, ImageEmbeddingSystem.py:82-85) — embedding
    cosine vs the f32 tower stays >0.99 (tests/test_models.py)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # Weight quantization is input-independent; XLA hoists it out of
        # lax.scan loops, and per dispatch it is O(params) elementwise work.
        # _quant_matmul's custom VJP makes this differentiable
        # (straight-through) so direct jax.grad works, not just the
        # trainers' guarded paths.
        out = _quant_matmul(x, kernel)
        return (out + bias).astype(self.dtype)


def _dense(quant: bool, features: int, dtype, name: str):
    if quant:
        return QuantDense(features, dtype, name=name)
    return nn.Dense(features, dtype=dtype, name=name)


class MLP(nn.Module):
    width: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        h = _dense(self.quant, self.width * 4, self.dtype, "fc1")(x)
        h = quick_gelu(h)
        return _dense(self.quant, self.width, self.dtype, "fc2")(h)


class Attention(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32
    fused: bool = False  # jax.nn.dot_product_attention (XLA fused path)
    quant: bool = False
    pallas: bool = False  # fused VMEM-resident kernel (ops/flash_attention.py)

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, t, _ = x.shape
        hd = self.width // self.heads
        q = _dense(self.quant, self.width, self.dtype, "q_proj")(x)
        k = _dense(self.quant, self.width, self.dtype, "k_proj")(x)
        v = _dense(self.quant, self.width, self.dtype, "v_proj")(x)
        if self.pallas and mask is None:
            # Vision path (no attention mask): fused Pallas kernel — packed
            # per-image block-diagonal attention, no HBM score tensor.
            from image_retrieval_tpu.ops.flash_attention import multihead_attention

            out = multihead_attention(q, k, v, self.heads)
            return _dense(self.quant, self.width, self.dtype, "out_proj")(out)
        q = q.reshape(b, t, self.heads, hd)
        k = k.reshape(b, t, self.heads, hd)
        v = v.reshape(b, t, self.heads, hd)
        scale = hd ** -0.5
        if self.fused:
            out = jax.nn.dot_product_attention(q, k, v, bias=mask, scale=scale)
        else:
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
            )
            if mask is not None:
                logits = logits + mask
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(b, t, self.width)
        return _dense(self.quant, self.width, self.dtype, "out_proj")(out)


class _LNParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's tree ({'scale','bias'}) for
    paths consumed by a fused kernel instead of a flax call."""

    width: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.width,))
        b = self.param("bias", nn.initializers.zeros, (self.width,))
        return s, b


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({'kernel','bias'})."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _AttnParams(nn.Module):
    """Attention projection parameter holder (tree matches the unfused
    Attention module: attn/{q,k,v,out}_proj/{kernel,bias})."""

    width: int

    @nn.compact
    def __call__(self):
        return [
            _DenseParams(self.width, self.width, name=nm)()
            for nm in ("q_proj", "k_proj", "v_proj", "out_proj")
        ]


class _MLPParams(nn.Module):
    """MLP parameter holder (tree matches MLP: mlp/{fc1,fc2})."""

    width: int

    @nn.compact
    def __call__(self):
        w1 = _DenseParams(self.width, self.width * 4, name="fc1")()
        w2 = _DenseParams(self.width * 4, self.width, name="fc2")()
        return w1, w2


class Block(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32
    fused_attn: bool = False
    quant: bool = False
    pallas_attn: bool = False
    fused_block: bool = False  # whole LN1+attention sub-block as one kernel
    fused_mlp: bool = False    # whole LN2+MLP sub-block as one kernel
    causal: bool = False       # autoregressive (text) tower: the fused
    #                            kernel applies the causal mask in-kernel
    #                            instead of needing the `mask` argument
    fused_layer: bool = False  # whole layer (attn + MLP) as ONE kernel
    #                            (ops/flash_attention.py layer_block /
    #                            layer_block_int8 per `quant`)
    train_vjp: bool = False    # fused attention sub-block saves its
    #                            intermediates and uses the hand-written
    #                            no-recompute backward (training path)

    @nn.compact
    def __call__(self, x, mask=None):
        # Kernel feasibility comes from the on-hardware compile-shape sweep
        # (bench_results/mosaic_shapes.json via ops/shape_support.py) when
        # a point was swept, else the measured VMEM envelope: layer-kernel
        # weights are 12*w^2 bytes int8 / 24*w^2 bf16 against ~16 MB scoped
        # VMEM, so int8 fits through width 768 (ViT-B, 7.1 MB) and bf16
        # through width 512 (768 bf16 = 14.2 MB measured OOM). Wider towers
        # (e.g. L/14's 1024) and non-causal-masked inputs (vision_seq_pad)
        # fall back to the two sub-block kernels — same fusion minus the
        # mid-layer HBM round-trip, and the MLP kernel still applies even
        # when the attention sub-block must honor a mask. Sub-block points
        # the sweep REJECTED (bf16 lane-unaligned t) fall all the way back
        # to the unfused XLA path instead of crashing the remote compiler.
        from image_retrieval_tpu.ops.shape_support import (
            attn_kernel_fits,
            layer_kernel_fits,
            mlp_kernel_fits,
            subblock_kernel_fits,
        )

        t_len = x.shape[1]
        layer_fits = layer_kernel_fits(self.quant, self.width, t_len)
        # width > 768: the whole-layer kernel COMPILES under the raised
        # wide-tower VMEM ceiling (ops/flash_attention.py
        # _layer_compiler_params) but measured SLOWER than the two
        # sub-block kernels on the L/14 tower — 1168 vs 1218 img/s at
        # batch 128 (bench_results/preset_probe.json r4
        # l14_serving_layer_bm1_* vs l14_serving_subblock_*), so wide
        # towers take the sub-block path on purpose, not as a fallback.
        layer_ok = (self.fused_layer and layer_fits and self.width <= 768
                    and (mask is None or self.causal))
        subblocks_fit = subblock_kernel_fits(self.quant, self.width, t_len)
        use_subblocks = self.fused_layer and not layer_ok and subblocks_fit
        # per-kernel gates: a sweep entry rejecting only the attention
        # kernel must not also disable the independent MLP kernel
        fused_block = (
            self.fused_block and attn_kernel_fits(self.quant, self.width, t_len)
        ) or use_subblocks
        fused_mlp = (
            self.fused_mlp and mlp_kernel_fits(self.quant, self.width, t_len)
        ) or use_subblocks
        if layer_ok:
            from image_retrieval_tpu.ops.flash_attention import (
                layer_block,
                layer_block_int8,
            )

            layer_fn = layer_block_int8 if self.quant else layer_block

            ln1_s, ln1_b = _LNParams(self.width, name="ln1")()

            (wq, bq), (wk, bk), (wv, bv), (wo, bo) = _AttnParams(
                self.width, name="attn"
            )()
            ln2_s, ln2_b = _LNParams(self.width, name="ln2")()

            (w1, b1), (w2, b2) = _MLPParams(self.width, name="mlp")()
            return layer_fn(
                x.astype(self.dtype), ln1_s, ln1_b, wq, bq, wk, bk, wv, bv,
                wo, bo, ln2_s, ln2_b, w1, b1, w2, b2, self.heads,
                self.causal,
            )
        if fused_block and (mask is None or self.causal):
            # Fused attention sub-block (ops/flash_attention.py
            # attention_block): LN1 + QKV + attention + out-proj + residual
            # in one kernel, weights VMEM-resident. The parameter tree is
            # identical to the unfused path (same module/param names), so
            # checkpoints and the weight port are unaffected. With quant,
            # the projections run int8 x int8 on the MXU in-kernel.
            from image_retrieval_tpu.ops.flash_attention import (
                attention_block,
                attention_block_int8,
                attention_block_train,
            )

            if self.quant:
                kernel_fn = attention_block_int8
            elif self.train_vjp:
                kernel_fn = attention_block_train
            else:
                kernel_fn = attention_block
            ln_s, ln_b = _LNParams(self.width, name="ln1")()

            (wq, bq), (wk, bk), (wv, bv), (wo, bo) = _AttnParams(
                self.width, name="attn"
            )()
            x = kernel_fn(
                x.astype(self.dtype), ln_s, ln_b, wq, bq, wk, bk, wv, bv,
                wo, bo, self.heads, self.causal,
            )
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x)
            x = x + Attention(
                self.width, self.heads, self.dtype, self.fused_attn, self.quant,
                self.pallas_attn, name="attn",
            )(h, mask)
        if fused_mlp:
            from image_retrieval_tpu.ops.flash_attention import (
                mlp_block,
                mlp_block_int8,
            )

            mlp_fn = mlp_block_int8 if self.quant else mlp_block
            ln_s, ln_b = _LNParams(self.width, name="ln2")()

            (w1, b1), (w2, b2) = _MLPParams(self.width, name="mlp")()
            return mlp_fn(x.astype(self.dtype), ln_s, ln_b, w1, b1, w2, b2)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x)
        return x + MLP(self.width, self.dtype, self.quant, name="mlp")(h)


class PatchEmbed(nn.Module):
    """Strided patch conv, optionally lowered as reshape -> one MXU matmul.

    The parameter tree ({'kernel': (p, p, 3, width)}) matches flax nn.Conv
    exactly, so checkpoints port identically either way."""

    width: int
    patch: int
    dtype: Dtype = jnp.float32
    as_matmul: bool = False

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        p = self.patch
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, 3, self.width),
        )
        x = pixels.astype(self.dtype)
        if self.as_matmul:
            b, h, w, _ = x.shape
            gh, gw = h // p, w // p
            x = (
                x.reshape(b, gh, p, gw, p, 3)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, gh * gw, p * p * 3)
            )
            wmat = kernel.astype(self.dtype).reshape(p * p * 3, self.width)
            return jnp.dot(x, wmat)
        return jax.lax.conv_general_dilated(
            x,
            kernel.astype(self.dtype),
            window_strides=(p, p),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class CLIPVisionTower(nn.Module):
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: (B, H, W, 3) normalized -> (B, embed_dim) unnormalized."""
        c = self.cfg
        b = pixels.shape[0]
        x = PatchEmbed(
            c.vision_width,
            c.patch_size,
            self.dtype,
            as_matmul=c.patch_embed_matmul,
            name="patch_embed",
        )(pixels)
        n = (c.image_size // c.patch_size) ** 2
        x = x.reshape(b, n, c.vision_width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.vision_width,)
        )
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.vision_width))
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n + 1, c.vision_width)
        )
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_ln")(x).astype(self.dtype)
        mask = None
        if c.vision_seq_pad and c.vision_seq_pad > n + 1:
            # Lane-align the token axis: pad with zero tokens whose KEYS are
            # attention-masked (-inf bias), so real-token outputs (and the
            # CLS pooling below) are numerically identical.
            pad = c.vision_seq_pad - (n + 1)
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.concatenate(
                [
                    jnp.zeros((n + 1,), jnp.float32),
                    jnp.full((pad,), -jnp.inf, jnp.float32),
                ]
            )[None, None, None, :]
        block_cls = nn.remat(Block) if c.remat else Block
        for i in range(c.vision_layers):
            x = block_cls(
                c.vision_width, c.vision_heads, self.dtype,
                c.fused_attention, c.int8_matmuls, c.pallas_attention,
                c.fused_attn_block, c.fused_mlp_block,
                fused_layer=c.fused_layer_block,
                train_vjp=c.fused_train_vjp, name=f"block_{i}",
            )(x, mask)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_ln")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c.vision_width, c.embed_dim)
        )
        return jnp.dot(
            pooled.astype(self.dtype), proj.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )


class CLIPTextTower(nn.Module):
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """token_ids: (B, T) int32 -> (B, embed_dim) unnormalized.

        Pooled at argmax(token_ids) — the EOT token has the largest id in the
        CLIP vocabulary, matching HF pooling semantics."""
        c = self.cfg
        b, t = token_ids.shape
        tok = nn.Embed(
            c.vocab_size, c.text_width, dtype=self.dtype, name="token_embedding"
        )(token_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (c.context_length, c.text_width)
        )
        x = tok + pos.astype(self.dtype)[None, :t]
        from image_retrieval_tpu.ops.flash_attention import _causal_bias

        mask = _causal_bias(t)
        block_cls = nn.remat(Block) if c.remat else Block
        for i in range(c.text_layers):
            x = block_cls(
                c.text_width, c.text_heads, self.dtype,
                c.fused_attention, c.int8_matmuls, c.pallas_attention,
                c.fused_attn_block, c.fused_mlp_block, causal=True,
                fused_layer=c.fused_layer_block,
                train_vjp=c.fused_train_vjp, name=f"block_{i}",
            )(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln")(x)
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = x[jnp.arange(b), eot]
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c.text_width, c.embed_dim)
        )
        return jnp.dot(
            pooled.astype(self.dtype), proj.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )


class CLIP(nn.Module):
    """Joint model; `encode_image` / `encode_text` return unnormalized
    embeddings (the reference stores unnormalized text and
    (unit, magnitude)-decomposed image embeddings)."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.vision = CLIPVisionTower(self.cfg, self.dtype)
        self.text = CLIPTextTower(self.cfg, self.dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(2.6592), ()
        )

    def encode_image(self, pixels):
        return self.vision(pixels)

    def encode_text(self, token_ids):
        return self.text(token_ids)

    def __call__(self, pixels, token_ids):
        """Contrastive logits for training: (B, B) image->text similarities."""
        img = self.encode_image(pixels)
        txt = self.encode_text(token_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits = scale * jnp.dot(img, txt.T, preferred_element_type=jnp.float32)
        return logits


def init_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.float32):
    """Deterministic parameter init (no pretrained weights needed).

    The init is JITTED: flax's eager init executes every fused Pallas
    kernel at batch 1 through the per-op dispatch compile path, which
    crashes the Mosaic compile helper for the width-1024 whole-layer
    kernel (L/14) — while the jit compile path accepts the identical
    program (r3 shape diagnosis, bench_results/shape_diag.json). Jitting
    also makes repeated inits cheap via the persistent compile cache."""
    model = CLIP(cfg, dtype=dtype)
    pixels = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    tokens = jnp.zeros((1, cfg.context_length), jnp.int32)
    return model, jax.jit(model.init)(
        jax.random.PRNGKey(seed), pixels, tokens
    )
