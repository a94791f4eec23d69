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
    # bm=1 is the measured-fastest production default (see _block_images
    # docstring); any batch/sequence gets a legal grid.
    for b, t in [(128, 50), (3, 50), (2, 512), (192, 50)]:
        assert b % _block_images(b, t) == 0


@pytest.mark.parametrize("bm", [2, 4, 8])
def test_packed_blocks_match_xla(rng, bm):
    """The packed (bm>1) block-diagonal path stays correct."""
    from image_retrieval_tpu.ops.flash_attention import _pallas_attention

    q, k, v = [
        jnp.asarray(rng.normal(size=(8, 10, 32)).astype(np.float32))
        for _ in range(3)
    ]
    got = _pallas_attention(q, k, v, 4, bm=bm)
    want = xla_attention(q, k, v, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


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


# -- fused attention BLOCK (LN1 + QKV + attention + out-proj + residual) --


def _block_args(rng, w):
    """Realistically-scaled block parameters (lecun-ish weights, LN near
    identity) — adversarial unnormalized scales saturate softmax and only
    bound f32 reassociation error loosely."""
    import math

    def mat():
        return jnp.asarray(
            (rng.normal(size=(w, w)) / math.sqrt(w)).astype(np.float32)
        )

    def vec(scale=0.02):
        return jnp.asarray((rng.normal(size=(w,)) * scale).astype(np.float32))

    ln_s = jnp.asarray((1.0 + 0.05 * rng.normal(size=(w,))).astype(np.float32))
    ln_b = vec()
    return [ln_s, ln_b, mat(), vec(), mat(), vec(), mat(), vec(), mat(), vec()]


def test_attention_block_matches_xla(rng):
    from image_retrieval_tpu.ops.flash_attention import (
        attention_block,
        xla_attention_block,
    )

    w, heads = 96, 12
    x = jnp.asarray(rng.normal(size=(4, 50, w)).astype(np.float32))
    args = _block_args(rng, w)
    got = attention_block(x, *args, heads)
    want = xla_attention_block(x, *args, heads=heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_attention_block_gradients(rng):
    from image_retrieval_tpu.ops.flash_attention import (
        attention_block,
        xla_attention_block,
    )

    w, heads = 32, 4
    x = jnp.asarray(rng.normal(size=(2, 5, w)).astype(np.float32))
    args = _block_args(rng, w)

    def lk(x, *a):
        return jnp.mean(attention_block(x, *a, heads) ** 2)

    def lr(x, *a):
        return jnp.mean(xla_attention_block(x, *a, heads=heads) ** 2)

    gk = jax.grad(lk, argnums=tuple(range(11)))(x, *args)
    gr = jax.grad(lr, argnums=tuple(range(11)))(x, *args)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_vision_tower_fused_block_matches_baseline(rng):
    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.models.clip import CLIP, init_params

    cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=2,
        vocab_size=1000, context_length=16, embed_dim=24, dtype="float32",
    )
    model, params = init_params(cfg, seed=0)
    fcfg = dataclasses.replace(cfg, fused_attn_block=True)
    mf = CLIP(fcfg, dtype=jnp.float32)
    # identical parameter trees AND identical init values (same param paths)
    _, pf = init_params(fcfg, seed=0)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(pf)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(pf)
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b_))

    px = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    base = np.asarray(model.apply(params, px, method=CLIP.encode_image))
    fused = np.asarray(mf.apply(params, px, method=CLIP.encode_image))
    np.testing.assert_allclose(fused, base, rtol=1e-5, atol=1e-6)

    # text tower (masked) falls back to the standard path: identical
    ids = np.zeros((2, 16), np.int64)
    ids[:, 0] = 1
    ids[:, 1] = 999
    tok = jnp.asarray(ids.astype(np.int32))
    bt = np.asarray(model.apply(params, tok, method=CLIP.encode_text))
    ft = np.asarray(mf.apply(params, tok, method=CLIP.encode_text))
    np.testing.assert_allclose(ft, bt, rtol=1e-6, atol=1e-7)


def test_mlp_block_matches_xla(rng):
    import math

    from image_retrieval_tpu.ops.flash_attention import mlp_block, xla_mlp_block

    w = 64
    x = jnp.asarray(rng.normal(size=(4, 50, w)).astype(np.float32))
    ln_s = jnp.asarray((1.0 + 0.05 * rng.normal(size=(w,))).astype(np.float32))
    ln_b = jnp.asarray((0.02 * rng.normal(size=(w,))).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(w, 4 * w)) / math.sqrt(w)).astype(np.float32))
    b1 = jnp.asarray((0.02 * rng.normal(size=(4 * w,))).astype(np.float32))
    w2 = jnp.asarray(
        (rng.normal(size=(4 * w, w)) / math.sqrt(4 * w)).astype(np.float32)
    )
    b2 = jnp.asarray((0.02 * rng.normal(size=(w,))).astype(np.float32))
    got = mlp_block(x, ln_s, ln_b, w1, b1, w2, b2)
    want = xla_mlp_block(x, ln_s, ln_b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def lk(*a):
        return jnp.mean(mlp_block(*a) ** 2)

    def lr(*a):
        return jnp.mean(xla_mlp_block(*a) ** 2)

    gk = jax.grad(lk, argnums=tuple(range(7)))(x, ln_s, ln_b, w1, b1, w2, b2)
    gr = jax.grad(lr, argnums=tuple(range(7)))(x, ln_s, ln_b, w1, b1, w2, b2)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_vision_tower_fully_fused_matches_baseline(rng):
    """fused_attn_block + fused_mlp_block: identical tree, same outputs."""
    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.models.clip import CLIP, init_params

    cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=2,
        vocab_size=1000, context_length=16, embed_dim=24, dtype="float32",
    )
    model, params = init_params(cfg, seed=0)
    fcfg = dataclasses.replace(cfg, fused_attn_block=True, fused_mlp_block=True)
    mf = CLIP(fcfg, dtype=jnp.float32)
    _, pf = init_params(fcfg, seed=0)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(pf)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(pf)
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b_))

    px = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    base = np.asarray(model.apply(params, px, method=CLIP.encode_image))
    fused = np.asarray(mf.apply(params, px, method=CLIP.encode_image))
    np.testing.assert_allclose(fused, base, rtol=1e-5, atol=1e-6)

    # gradients flow through both fused sub-blocks (training viability)
    def loss(p):
        e = mf.apply(p, px, method=CLIP.encode_image)
        return jnp.mean(e ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_int8_fused_blocks_match_their_xla_mirrors(rng):
    """attention_block_int8 / mlp_block_int8 vs XLA mirrors of the exact
    same quantization math; plus full int8-fused tower cos>0.999 vs f32."""
    import math

    from image_retrieval_tpu.ops.flash_attention import (
        attention_block_int8,
        mlp_block_int8,
        xla_attention_block_int8,
        xla_mlp_block_int8,
    )

    w, heads = 96, 12
    x = jnp.asarray(rng.normal(size=(2, 50, w)).astype(np.float32))
    args = _block_args(rng, w)
    got = attention_block_int8(x, *args, heads)
    want = xla_attention_block_int8(x, *args, heads=heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    w1 = jnp.asarray((rng.normal(size=(w, 4 * w)) / math.sqrt(w)).astype(np.float32))
    b1 = jnp.asarray((0.02 * rng.normal(size=(4 * w,))).astype(np.float32))
    w2 = jnp.asarray(
        (rng.normal(size=(4 * w, w)) / math.sqrt(4 * w)).astype(np.float32)
    )
    b2 = jnp.asarray((0.02 * rng.normal(size=(w,))).astype(np.float32))
    got_m = mlp_block_int8(x, args[0], args[1], w1, b1, w2, b2)
    want_m = xla_mlp_block_int8(x, args[0], args[1], w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m), atol=2e-5)


def test_vision_tower_int8_fused_cos_and_grads(rng):
    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.models.clip import CLIP, init_params

    cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=2,
        vocab_size=1000, context_length=16, embed_dim=24, dtype="float32",
    )
    model, params = init_params(cfg, seed=0)
    fcfg = dataclasses.replace(
        cfg, fused_attn_block=True, fused_mlp_block=True, int8_matmuls=True
    )
    mf = CLIP(fcfg, dtype=jnp.float32)
    _, pf = init_params(fcfg, seed=0)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(pf)

    px = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    base = np.asarray(model.apply(params, px, method=CLIP.encode_image), np.float64)
    fused = np.asarray(mf.apply(params, px, method=CLIP.encode_image), np.float64)
    cos = (base * fused).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(fused, axis=-1)
    )
    assert cos.min() > 0.999

    # straight-through backward: finite, nonzero grads
    def loss(p):
        return jnp.mean(mf.apply(p, px, method=CLIP.encode_image) ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_causal_fused_blocks_match_xla(rng):
    """causal=True attention blocks (text tower) vs their XLA mirrors with
    an explicit triangular mask, bf16-free f32 check, packed and loop paths."""
    from image_retrieval_tpu.ops import flash_attention as fa

    w, heads = 64, 4
    x = jnp.asarray(rng.normal(size=(4, 11, w)).astype(np.float32))
    args = _block_args(rng, w)

    got = fa.attention_block(x, *args, heads, True)
    want = fa.xla_attention_block(x, *args, heads=heads, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    got8 = fa.attention_block_int8(x, *args, heads, True)
    want8 = fa.xla_attention_block_int8(x, *args, heads=heads, causal=True)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want8), atol=2e-5)

    # the PACKED (bm>1 block-diagonal + intra-block causal) variant must
    # agree too — the default is the loop path, so flip the flag on
    saved = fa._PACKED_BLOCK_ATTN
    try:
        fa._PACKED_BLOCK_ATTN = True
        got_packed = fa.attention_block(x, *args, heads, True)
        np.testing.assert_allclose(
            np.asarray(got_packed), np.asarray(want), atol=2e-5
        )
        got_packed8 = fa.attention_block_int8(x, *args, heads, True)
        np.testing.assert_allclose(
            np.asarray(got_packed8), np.asarray(want8), atol=2e-5
        )
    finally:
        fa._PACKED_BLOCK_ATTN = saved


def test_causal_kernel_is_actually_causal(rng):
    """Perturbing a future token must not change earlier tokens' outputs."""
    from image_retrieval_tpu.ops import flash_attention as fa

    w, heads, t = 32, 4, 9
    x = rng.normal(size=(2, t, w)).astype(np.float32)
    args = _block_args(rng, w)
    base = np.asarray(fa.attention_block(jnp.asarray(x), *args, heads, True))
    x2 = x.copy()
    x2[:, -1] += 3.0  # perturb only the last token
    pert = np.asarray(fa.attention_block(jnp.asarray(x2), *args, heads, True))
    np.testing.assert_allclose(base[:, :-1], pert[:, :-1], atol=1e-6)
    assert np.abs(base[:, -1] - pert[:, -1]).max() > 1e-3


def test_text_tower_fused_matches_baseline(rng):
    """Full CLIP text tower with fused causal blocks (bf16 and int8 paths)
    vs the unfused baseline: same params tree, cos > 0.999."""
    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.models.clip import CLIP, init_params

    cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=2,
        vocab_size=1000, context_length=16, embed_dim=24, dtype="float32",
    )
    model, params = init_params(cfg, seed=0)
    toks = jnp.asarray(
        rng.integers(1, 1000, size=(6, 16)).astype(np.int32)
    )
    base = np.asarray(
        model.apply(params, toks, method=CLIP.encode_text), np.float64
    )
    for quant in (False, True):
        fcfg = dataclasses.replace(
            cfg, fused_attn_block=True, fused_mlp_block=True,
            int8_matmuls=quant,
        )
        mf = CLIP(fcfg, dtype=jnp.float32)
        _, pf = init_params(fcfg, seed=0)
        assert (
            jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pf)
        )
        fused = np.asarray(
            mf.apply(params, toks, method=CLIP.encode_text), np.float64
        )
        cos = (base * fused).sum(-1) / (
            np.linalg.norm(base, axis=-1) * np.linalg.norm(fused, axis=-1)
        )
        assert cos.min() > 0.999, f"quant={quant}: {cos.min()}"


def test_layer_block_int8_matches_mirror_and_tower(rng):
    """layer_block_int8 (whole-layer mega-kernel) vs the XLA mirror of its
    exact quantization math, causal and non-causal; then the full vision +
    text towers under fused_layer_block vs baseline (cos > 0.999, grads
    finite via the straight-through VJP)."""
    import math

    from image_retrieval_tpu.ops.flash_attention import (
        layer_block_int8,
        xla_layer_block_int8,
    )

    w, heads = 64, 4
    x = jnp.asarray(rng.normal(size=(4, 11, w)).astype(np.float32))
    args = _block_args(rng, w)
    w1 = jnp.asarray((rng.normal(size=(w, 4 * w)) / math.sqrt(w)).astype(np.float32))
    b1 = jnp.asarray((0.02 * rng.normal(size=(4 * w,))).astype(np.float32))
    w2 = jnp.asarray(
        (rng.normal(size=(4 * w, w)) / math.sqrt(4 * w)).astype(np.float32)
    )
    b2 = jnp.asarray((0.02 * rng.normal(size=(w,))).astype(np.float32))
    ln2 = _block_args(rng, w)[:2]
    for causal in (False, True):
        got = layer_block_int8(
            x, *args, *ln2, w1, b1, w2, b2, heads, causal
        )
        want = xla_layer_block_int8(
            x, *args, *ln2, w1, b1, w2, b2, heads=heads, causal=causal
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5
        )

    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.models.clip import CLIP, init_params

    cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=2,
        vocab_size=1000, context_length=16, embed_dim=24, dtype="float32",
    )
    model, params = init_params(cfg, seed=0)
    lcfg = dataclasses.replace(cfg, fused_layer_block=True, int8_matmuls=True)
    ml = CLIP(lcfg, dtype=jnp.float32)
    _, pl_ = init_params(lcfg, seed=0)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(pl_)

    px = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    toks = jnp.asarray(rng.integers(1, 1000, size=(4, 16)).astype(np.int32))
    for method, inp in ((CLIP.encode_image, px), (CLIP.encode_text, toks)):
        base = np.asarray(model.apply(params, inp, method=method), np.float64)
        fused = np.asarray(ml.apply(params, inp, method=method), np.float64)
        cos = (base * fused).sum(-1) / (
            np.linalg.norm(base, axis=-1) * np.linalg.norm(fused, axis=-1)
        )
        assert cos.min() > 0.999, cos.min()

    def loss(p):
        return jnp.mean(ml.apply(p, px, method=CLIP.encode_image) ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_layer_block_bf16_matches_mirror_and_tower(rng):
    """bf16 whole-layer kernel vs composed XLA sub-block mirrors (exact
    same math) and end-to-end towers under fused_layer_block without
    int8: tight atol (no quantization in the path)."""
    import math

    from image_retrieval_tpu.ops.flash_attention import (
        layer_block,
        xla_attention_block,
        xla_mlp_block,
    )

    w, heads = 64, 4
    x = jnp.asarray(rng.normal(size=(4, 11, w)).astype(np.float32))
    args = _block_args(rng, w)
    w1 = jnp.asarray((rng.normal(size=(w, 4 * w)) / math.sqrt(w)).astype(np.float32))
    b1 = jnp.asarray((0.02 * rng.normal(size=(4 * w,))).astype(np.float32))
    w2 = jnp.asarray(
        (rng.normal(size=(4 * w, w)) / math.sqrt(4 * w)).astype(np.float32)
    )
    b2 = jnp.asarray((0.02 * rng.normal(size=(w,))).astype(np.float32))
    ln2 = _block_args(rng, w)[:2]
    for causal in (False, True):
        got = layer_block(x, *args, *ln2, w1, b1, w2, b2, heads, causal)
        x1 = xla_attention_block(x, *args, heads=heads, causal=causal)
        want = xla_mlp_block(x1, *ln2, w1, b1, w2, b2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.models.clip import CLIP, init_params

    cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=2,
        vocab_size=1000, context_length=16, embed_dim=24, dtype="float32",
    )
    model, params = init_params(cfg, seed=0)
    lcfg = dataclasses.replace(cfg, fused_layer_block=True)
    ml = CLIP(lcfg, dtype=jnp.float32)
    px = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    toks = jnp.asarray(rng.integers(1, 1000, size=(4, 16)).astype(np.int32))
    for method, inp in ((CLIP.encode_image, px), (CLIP.encode_text, toks)):
        base = np.asarray(model.apply(params, inp, method=method), np.float64)
        fused = np.asarray(ml.apply(params, inp, method=method), np.float64)
        np.testing.assert_allclose(fused, base, rtol=2e-4, atol=2e-4)

    def loss(p):
        return jnp.mean(ml.apply(p, px, method=CLIP.encode_image) ** 2)

    def loss_base(p):
        return jnp.mean(model.apply(p, px, method=CLIP.encode_image) ** 2)

    g = jax.grad(loss)(params)
    gb = jax.grad(loss_base)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)


def test_bf16_kernels_match_mirrors():
    """In bf16 (the production compute dtype) the kernels and their XLA
    mirrors must still agree: locks the f32-gelu contract — a pre-gelu
    bf16 cast in a mirror diverges by up to ~0.03 (caught in review)."""
    import math

    from image_retrieval_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(7)
    w, heads = 64, 4
    x = jnp.asarray(rng.normal(size=(4, 11, w)), jnp.bfloat16)
    args = _block_args(rng, w)
    w1 = jnp.asarray((rng.normal(size=(w, 4 * w)) / math.sqrt(w)).astype(np.float32))
    b1 = jnp.asarray((0.02 * rng.normal(size=(4 * w,))).astype(np.float32))
    w2 = jnp.asarray(
        (rng.normal(size=(4 * w, w)) / math.sqrt(4 * w)).astype(np.float32)
    )
    b2 = jnp.asarray((0.02 * rng.normal(size=(w,))).astype(np.float32))
    ln2 = _block_args(rng, w)[:2]

    pairs = [
        # (kernel, mirror, atol)
        (fa.mlp_block(x, args[0], args[1], w1, b1, w2, b2),
         fa.xla_mlp_block(x, args[0], args[1], w1, b1, w2, b2), 1e-2),
        (fa.mlp_block_int8(x, args[0], args[1], w1, b1, w2, b2),
         fa.xla_mlp_block_int8(x, args[0], args[1], w1, b1, w2, b2), 1e-2),
        (fa.attention_block(x, *args, heads, False),
         fa.xla_attention_block(x, *args, heads=heads), 1e-2),
        # the whole-layer kernel chains x1 through the in-trace MLP half:
        # XLA's bf16 excess precision can shift LN(x1) by one ulp at a
        # _rowquant rounding boundary, flipping a single int8 level
        # (~0.03 in the output). Benign; the f32 tests pin exact
        # semantics, so allow one quantization level here.
        (fa.layer_block_int8(x, *args, *ln2, w1, b1, w2, b2, heads, False),
         fa.xla_layer_block_int8(x, *args, *ln2, w1, b1, w2, b2,
                                 heads=heads), 5e-2),
    ]
    for got, want, atol in pairs:
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=atol,
        )


@pytest.mark.parametrize(
    "b,t,w,heads,causal",
    [
        (3, 50, 64, 4, False),    # odd batch -> bm=1 fallback
        (8, 197, 64, 4, False),   # B/16-like t: bm capped by packed tokens
        (6, 77, 64, 4, True),     # text-like causal, bm from the cap
        (1, 5, 32, 2, True),      # single sequence, tiny t
        (5, 13, 96, 12, False),   # odd everything
    ],
)
def test_fused_kernels_shape_sweep(rng, b, t, w, heads, causal):
    """Every fused kernel must stay correct across geometries: odd batches
    (bm=1 fallback), long sequences (VMEM bm cap), causal and not."""
    import math

    from image_retrieval_tpu.ops import flash_attention as fa

    x = jnp.asarray(rng.normal(size=(b, t, w)).astype(np.float32))
    args = _block_args(rng, w)
    w1 = jnp.asarray((rng.normal(size=(w, 4 * w)) / math.sqrt(w)).astype(np.float32))
    b1 = jnp.asarray((0.02 * rng.normal(size=(4 * w,))).astype(np.float32))
    w2 = jnp.asarray(
        (rng.normal(size=(4 * w, w)) / math.sqrt(4 * w)).astype(np.float32)
    )
    b2 = jnp.asarray((0.02 * rng.normal(size=(w,))).astype(np.float32))
    ln2 = _block_args(rng, w)[:2]

    want_attn = fa.xla_attention_block(x, *args, heads=heads, causal=causal)
    got_attn = fa.attention_block(x, *args, heads, causal)
    np.testing.assert_allclose(
        np.asarray(got_attn), np.asarray(want_attn), atol=3e-5
    )
    # int8 variants: the kernel's attention reductions associate
    # differently than the mirror's einsum; a sub-ulp f32 difference at a
    # _rowquant boundary flips one int8 level (~1e-3 after the out-proj
    # scale), so int8 tolerances allow one quantization step.
    got8 = fa.attention_block_int8(x, *args, heads, causal)
    want8 = fa.xla_attention_block_int8(x, *args, heads=heads, causal=causal)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want8), atol=2e-3)

    got_l = fa.layer_block_int8(x, *args, *ln2, w1, b1, w2, b2, heads, causal)
    want_l = fa.xla_layer_block_int8(
        x, *args, *ln2, w1, b1, w2, b2, heads=heads, causal=causal
    )
    # two chained quantizers (attention out + MLP in) compound a single
    # boundary flip to ~2e-2 on <0.1% of elements
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l), atol=2.5e-2)


@pytest.mark.parametrize("causal", [False, True])
def test_attention_block_train_gradients_match_xla(rng, causal):
    """attention_block_train's hand-written backward (saved q/k/v/probs,
    no forward recompute) must produce the same gradients as jax.vjp of
    the XLA mirror, for inputs AND all parameters."""
    from image_retrieval_tpu.ops.flash_attention import (
        attention_block_train,
        xla_attention_block,
    )

    w, heads = 32, 4
    x = jnp.asarray(rng.normal(size=(3, 7, w)).astype(np.float32))
    args = _block_args(rng, w)

    def lk(x, *a):
        return jnp.mean(attention_block_train(x, *a, heads, causal) ** 2)

    def lr(x, *a):
        return jnp.mean(
            xla_attention_block(x, *a, heads=heads, causal=causal) ** 2
        )

    # forward parity first
    np.testing.assert_allclose(
        np.asarray(attention_block_train(x, *args, heads, causal)),
        np.asarray(xla_attention_block(x, *args, heads=heads, causal=causal)),
        atol=2e-5,
    )
    gk = jax.grad(lk, argnums=tuple(range(11)))(x, *args)
    gr = jax.grad(lr, argnums=tuple(range(11)))(x, *args)
    for i, (a, b_) in enumerate(zip(gk, gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, err_msg=f"arg {i}"
        )


def test_train_config_tower_gradients_match_baseline(rng):
    """Full CLIP towers under the training kernel config (fused attention
    sub-block with the saved-intermediates backward + fused MLP block)
    must produce the same gradients as the unfused baseline (f32)."""
    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.models.clip import CLIP, init_params

    cfg = ModelConfig(
        image_size=32, patch_size=8, vision_width=48, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=2,
        vocab_size=1000, context_length=16, embed_dim=24, dtype="float32",
    )
    model, params = init_params(cfg, seed=0)
    tcfg = dataclasses.replace(
        cfg, fused_attn_block=True, fused_mlp_block=True,
        fused_train_vjp=True,
    )
    mt = CLIP(tcfg, dtype=jnp.float32)
    px = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    toks = jnp.asarray(rng.integers(1, 1000, size=(4, 16)).astype(np.int32))

    def loss(m):
        def f(p):
            img = m.apply(p, px, method=CLIP.encode_image)
            txt = m.apply(p, toks, method=CLIP.encode_text)
            return jnp.mean(img ** 2) + jnp.mean(txt ** 2)
        return f

    gb = jax.grad(loss(model))(params)
    gt = jax.grad(loss(mt))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(gb), jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5
        )


def test_bh3d_attention_variant_matches_xla(rng):
    """The 3D batched-heads in-kernel attention (flagged off: Mosaic
    crashes on it on-hardware, attn_probe11) stays numerically correct in
    interpret mode so it can be re-probed on newer toolchains."""
    from image_retrieval_tpu.ops import flash_attention as fa

    w, heads = 64, 4
    x = jnp.asarray(rng.normal(size=(4, 10, w)).astype(np.float32))
    args = _block_args(rng, w)
    saved = fa._BH3D_BLOCK_ATTN
    try:
        fa._BH3D_BLOCK_ATTN = True
        for causal in (False, True):
            got = fa.attention_block(x, *args, heads, causal)
            want = fa.xla_attention_block(x, *args, heads=heads, causal=causal)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5
            )
    finally:
        fa._BH3D_BLOCK_ATTN = saved
