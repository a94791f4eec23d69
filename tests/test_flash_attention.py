"""Fused Pallas attention kernel (ops/flash_attention.py): parity vs the
XLA einsum path, gradients (custom VJP recompute), block-size selection, and
end-to-end inside the CLIP vision tower. Runs in interpret mode on the CPU
mesh; the TPU-compiled path is validated on hardware by
tools/tpu_attn_probe.py (bench_results/attn_probe.json)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_retrieval_tpu.ops.flash_attention import (
    _block_images,
    multihead_attention,
    xla_attention,
)


@pytest.mark.parametrize(
    "b,t,w,h",
    [
        (4, 50, 96, 12),   # ViT-B/32 token count, several images per block
        (3, 7, 32, 4),     # odd batch -> bm=1 fallback
        (8, 50, 64, 1),    # single head
        (2, 128, 64, 2),   # long sequence -> bm capped by packed-token limit
    ],
)
def test_kernel_matches_xla(rng, b, t, w, h):
    q, k, v = [
        jnp.asarray(rng.normal(size=(b, t, w)).astype(np.float32)) for _ in range(3)
    ]
    got = multihead_attention(q, k, v, h)
    want = xla_attention(q, k, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_images_do_not_attend_across_the_pack(rng):
    """Packing images into one matmul must not leak attention across images:
    each image's output is identical to running it alone."""
    b, t, w, h = 4, 10, 32, 4
    q, k, v = [
        jnp.asarray(rng.normal(size=(b, t, w)).astype(np.float32)) for _ in range(3)
    ]
    packed = np.asarray(multihead_attention(q, k, v, h))
    for i in range(b):
        solo = np.asarray(
            multihead_attention(q[i : i + 1], k[i : i + 1], v[i : i + 1], h)
        )[0]
        np.testing.assert_allclose(packed[i], solo, atol=2e-5)


def test_gradients_match_xla_path(rng):
    q, k, v = [
        jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32)) for _ in range(3)
    ]

    def loss_kernel(q, k, v):
        return jnp.sum(multihead_attention(q, k, v, 4) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, 4) ** 2)

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=2e-5)


def test_block_images_selection():
    assert _block_images(128, 50) == 8   # 400 packed tokens
    assert _block_images(128, 128) == 4  # 512 cap
    assert _block_images(3, 50) == 1     # odd batch
    assert _block_images(2, 512) == 1    # long sequence
    assert _block_images(192, 50) == 8


def test_vision_tower_with_pallas_attention_matches_baseline(rng):
    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.models.clip import CLIP, init_params

    cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=2,
        vocab_size=1000, context_length=16, embed_dim=24, dtype="float32",
    )
    model, params = init_params(cfg, seed=0)
    mp = CLIP(dataclasses.replace(cfg, pallas_attention=True), dtype=jnp.float32)
    px = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    base = np.asarray(model.apply(params, px, method=CLIP.encode_image))
    pall = np.asarray(mp.apply(params, px, method=CLIP.encode_image))
    np.testing.assert_allclose(pall, base, rtol=1e-4, atol=1e-5)

    # text tower has a causal mask -> falls back to the XLA path, identical
    ids = np.zeros((2, 16), np.int64)
    ids[:, 0] = 1
    ids[:, 1] = 999
    tok = jnp.asarray(ids.astype(np.int32))
    bt = np.asarray(model.apply(params, tok, method=CLIP.encode_text))
    pt = np.asarray(mp.apply(params, tok, method=CLIP.encode_text))
    np.testing.assert_allclose(pt, bt, rtol=1e-6, atol=1e-7)
