"""CLIP model + encoders: shapes, determinism, sharded batched encode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_retrieval_tpu.config import Config, MeshConfig, ModelConfig
from image_retrieval_tpu.models.clip import CLIP, init_params
from image_retrieval_tpu.models.encoder import CLIPEncoder, FakeEncoder
from image_retrieval_tpu.models.preprocess import preprocess_host, preprocess_batch
from image_retrieval_tpu.models.tokenizer import HashTokenizer, BOS, EOS
from image_retrieval_tpu.parallel.mesh import make_mesh


def tiny_model_config():
    return ModelConfig(
        image_size=32,
        patch_size=8,
        vision_width=64,
        vision_layers=2,
        vision_heads=4,
        text_width=32,
        text_layers=2,
        text_heads=2,
        vocab_size=49408,
        context_length=16,
        embed_dim=24,
        dtype="float32",
    )


def test_clip_forward_shapes(rng):
    cfg = tiny_model_config()
    model, params = init_params(cfg, seed=0)
    pixels = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    tokens = jnp.asarray(np.array([[BOS, 5, 9, EOS] + [0] * 12] * 2, np.int32))
    img = model.apply(params, pixels, method=CLIP.encode_image)
    txt = model.apply(params, tokens, method=CLIP.encode_text)
    assert img.shape == (2, 24) and txt.shape == (2, 24)
    logits = model.apply(params, pixels, tokens)
    assert logits.shape == (2, 2)


def test_clip_deterministic_init():
    cfg = tiny_model_config()
    _, p1 = init_params(cfg, seed=0)
    _, p2 = init_params(cfg, seed=0)
    leaves1 = jax.tree.leaves(p1)
    leaves2 = jax.tree.leaves(p2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_text_pooling_at_eot(rng):
    """Pooled text features must come from the EOT (argmax id) position."""
    cfg = tiny_model_config()
    model, params = init_params(cfg, seed=0)
    t1 = np.array([[BOS, 7, EOS] + [0] * 13], np.int32)
    t2 = np.array([[BOS, 7, EOS] + [0] * 13], np.int32)
    t2[0, 5] = 3  # padding-region change before... actually after EOT
    e1 = model.apply(params, jnp.asarray(t1), method=CLIP.encode_text)
    e2 = model.apply(params, jnp.asarray(t2), method=CLIP.encode_text)
    # causal mask: token at pos 5 cannot influence pooled pos 2
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


def test_clip_encoder_batched_sharded(rng):
    cfg = Config(model=tiny_model_config(), mesh=MeshConfig(data=8, model=1))
    mesh = make_mesh(cfg.mesh)
    enc = CLIPEncoder(config=cfg, mesh=mesh)
    pixels = rng.normal(size=(13, 32, 32, 3)).astype(np.float32)  # odd batch
    out = enc.encode_pixels(pixels)
    assert out.shape == (13, 24)
    # padding must not affect real rows
    out2 = enc.encode_pixels(pixels[:5])
    np.testing.assert_allclose(out[:5], out2, rtol=2e-4, atol=2e-4)
    txt = enc.encode_texts(["a red dog", "blue car"])
    assert txt.shape == (2, 24)
    txt2 = enc.encode_texts(["a red dog"])
    np.testing.assert_allclose(txt[0], txt2[0], rtol=2e-4, atol=2e-4)


def test_fake_encoder_deterministic(tmp_path):
    from PIL import Image

    p = str(tmp_path / "img.png")
    Image.fromarray(
        (np.linspace(0, 255, 64 * 64 * 3).reshape(64, 64, 3)).astype(np.uint8)
    ).save(p)
    enc1 = FakeEncoder(dim=512)
    enc2 = FakeEncoder(dim=512)
    e1 = enc1.encode_images([p])
    e2 = enc2.encode_images([p])
    np.testing.assert_array_equal(e1, e2)
    t1 = enc1.encode_texts(["red dog"])
    t2 = enc2.encode_texts(["red dog"])
    np.testing.assert_array_equal(t1, t2)
    assert e1.shape == (1, 512) and t1.shape == (1, 512)
    assert np.linalg.norm(e1) > 0


def test_hash_tokenizer_layout():
    tok = HashTokenizer()
    ids = tok(["hello world"])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == BOS
    assert EOS in ids[0]
    eot = int(np.argmax(ids[0]))
    assert ids[0, eot] == EOS
    # deterministic
    np.testing.assert_array_equal(ids, tok(["hello world"]))


def test_preprocess_host_shape_and_range(tmp_path):
    from PIL import Image

    p = str(tmp_path / "img.jpg")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (300, 400, 3), np.uint8)
    ).save(p)
    x = preprocess_host(p)
    assert x.shape == (224, 224, 3)
    assert -3.0 < x.min() < x.max() < 3.0


def test_preprocess_device_close_to_host(tmp_path):
    """Device-batched bilinear resize+normalize tracks the PIL path."""
    from PIL import Image
    import jax.numpy as jnp
    from image_retrieval_tpu.models.preprocess import preprocess_device

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (224, 224, 3), np.uint8)  # already square/size
    p = str(tmp_path / "sq.png")
    Image.fromarray(img).save(p)
    host = preprocess_host(p)
    dev = np.asarray(preprocess_device(jnp.asarray(img[None])))[0]
    np.testing.assert_allclose(dev, host, atol=1e-2)  # no resize needed: exact-ish
    # resizing path produces the right shape and value range
    small = rng.integers(0, 255, (2, 112, 112, 3), np.uint8)
    out = np.asarray(preprocess_device(jnp.asarray(small)))
    assert out.shape == (2, 224, 224, 3)
    assert -3.0 < out.min() < out.max() < 3.0


def test_int8_matmuls_close_to_f32(rng):
    """The int8 serving path (QuantDense: dynamic per-token activation +
    per-channel weight scales, int8 MXU dot) shares the f32 parameter tree
    and keeps embedding cosine >0.999 on both towers."""
    import dataclasses

    cfg = tiny_model_config()
    model, params = init_params(cfg, seed=0)
    m8 = CLIP(dataclasses.replace(cfg, int8_matmuls=True), dtype=jnp.float32)

    px = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    ids = np.zeros((2, 16), np.int64)
    ids[:, 0] = BOS
    ids[0, 1:4] = [100, 200, 300]
    ids[:, 4] = EOS
    tok = jnp.asarray(ids.astype(np.int32))

    def cos(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return (a * b).sum(-1) / (np.linalg.norm(a, -1) or 1) if a.ndim == 1 else (
            (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        )

    img32 = model.apply(params, px, method=CLIP.encode_image)
    img8 = m8.apply(params, px, method=CLIP.encode_image)
    assert cos(img32, img8).min() > 0.999

    txt32 = model.apply(params, tok, method=CLIP.encode_text)
    txt8 = m8.apply(params, tok, method=CLIP.encode_text)
    assert cos(txt32, txt8).min() > 0.999


def test_clip_encoder_sharded_serving_config(rng):
    """The serving execution strategy (whole-layer int8 Pallas mega-kernels,
    causal in-kernel text mask) must compose with the data-sharded encoder
    on a multi-device mesh — this is the multi-chip serving path."""
    import dataclasses as _dc

    from image_retrieval_tpu.config import serving_config

    base = Config(model=tiny_model_config(), mesh=MeshConfig(data=8, model=1))
    scfg = _dc.replace(base, model=serving_config(tiny_model_config()))
    mesh = make_mesh(scfg.mesh)
    enc_base = CLIPEncoder(config=base, mesh=mesh)
    enc_srv = CLIPEncoder(config=scfg, mesh=mesh, params=enc_base.params)
    pixels = rng.normal(size=(13, 32, 32, 3)).astype(np.float32)
    a = enc_base.encode_pixels(pixels)
    b = enc_srv.encode_pixels(pixels)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() > 0.995, cos.min()
    ta = enc_base.encode_texts(["a red dog", "blue car", "x"])
    tb = enc_srv.encode_texts(["a red dog", "blue car", "x"])
    cost = (ta * tb).sum(-1) / (
        np.linalg.norm(ta, axis=-1) * np.linalg.norm(tb, axis=-1)
    )
    assert cost.min() > 0.995, cost.min()


def test_preprocess_matches_hf_clip_processor_nonsquare():
    """preprocess_host must match transformers' CLIPImageProcessor on
    NON-square images (short edge pinned, long edge int-truncated; the
    old round() deviated, e.g. 480x640 -> 299 instead of 298)."""
    transformers = pytest.importorskip("transformers")
    from PIL import Image

    from image_retrieval_tpu.models.preprocess import preprocess_host

    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": 224}, crop_size={"height": 224, "width": 224}
    )
    rng = np.random.default_rng(0)
    for w, h in [(640, 480), (480, 640), (500, 333), (224, 224)]:
        arr = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        im = Image.fromarray(arr)
        ours = preprocess_host(im)
        hf = proc(images=im, return_tensors="np")["pixel_values"][0]
        hf = np.transpose(hf, (1, 2, 0))  # CHW -> HWC
        np.testing.assert_allclose(ours, hf, atol=1e-4), (w, h)


def test_quant_dense_straight_through_gradients(rng):
    """QuantDense is differentiable via the straight-through VJP: direct
    jax.grad produces kernel/input grads matching the f32 matmul's
    (round/int8-cast would otherwise zero them — ADVICE r2)."""
    from image_retrieval_tpu.models.clip import QuantDense

    qd = QuantDense(8, jnp.float32)
    x = jnp.asarray(rng.normal(size=(3, 5, 16)).astype(np.float32))
    params = qd.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        y = qd.apply(p, x)
        return jnp.sum(y * jnp.sin(jnp.arange(y.size).reshape(y.shape)))

    g = jax.grad(loss)(params, x)
    gk = np.asarray(g["params"]["kernel"])
    gb = np.asarray(g["params"]["bias"])
    assert np.abs(gk).max() > 0  # not silently frozen

    # reference grads: same loss through a plain f32 matmul
    def loss_f32(p, x):
        y = x @ p["params"]["kernel"] + p["params"]["bias"]
        return jnp.sum(y * jnp.sin(jnp.arange(y.size).reshape(y.shape)))

    gref = jax.grad(loss_f32)(params, x)
    np.testing.assert_allclose(gk, gref["params"]["kernel"], rtol=0, atol=1e-4)
    np.testing.assert_allclose(gb, gref["params"]["bias"], rtol=0, atol=1e-5)
    gx = jax.grad(loss, argnums=1)(params, x)
    gx_ref = jax.grad(loss_f32, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4)


def test_encode_stream_matches_per_batch(rng):
    """encode_stream (cross-batch async dispatch, the ingest hot path)
    returns the same (meta, embeddings) as per-batch encode_pixels, in
    order, for mixed batch sizes including an empty and an oversized one."""
    cfg = Config(model=tiny_model_config(), mesh=MeshConfig(data=8, model=1))
    mesh = make_mesh(cfg.mesh)
    enc = CLIPEncoder(config=cfg, mesh=mesh)
    sizes = [13, 8, 0, 5, enc._BUCKETS[-1] * enc._MAX_IN_FLIGHT + 8]
    batches = [(f"b{i}", rng.normal(size=(n, 32, 32, 3)).astype(np.float32))
               for i, n in enumerate(sizes)]
    got = list(enc.encode_stream(iter(batches)))
    assert [m for m, _ in got] == [m for m, _ in batches]
    for (_, pixels), (_, out) in zip(batches, got):
        ref = enc.encode_pixels(pixels)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_encode_stream_fake_encoder_base_impl(rng):
    """The Encoder base class provides a synchronous encode_stream so every
    encoder (FakeEncoder included) serves the streaming ingest path."""
    enc = FakeEncoder(dim=32)
    batches = [("a", rng.normal(size=(4, 32, 32, 3)).astype(np.float32)),
               ("b", rng.normal(size=(2, 32, 32, 3)).astype(np.float32))]
    got = list(enc.encode_stream(iter(batches)))
    assert [m for m, _ in got] == ["a", "b"]
    np.testing.assert_array_equal(got[0][1], enc.encode_pixels(batches[0][1]))
