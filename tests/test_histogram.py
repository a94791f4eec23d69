"""Color-histogram encoder family (BASELINE config #1)."""

import numpy as np
import pytest

from image_retrieval_tpu.config import IndexConfig, vit_b16, vit_l14
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.models.histogram import HistogramEncoder, batched_color_histogram
from image_retrieval_tpu.models.preprocess import CLIP_MEAN, CLIP_STD


def test_histogram_basic_properties(rng):
    import jax.numpy as jnp

    px = rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32)
    h = np.asarray(batched_color_histogram(jnp.asarray(px)))
    assert h.shape == (3, 512)
    np.testing.assert_allclose(h.sum(1), 1.0, rtol=1e-5)
    # solid-color image concentrates in one bin
    solid = np.full((1, 8, 8, 3), 0.95, np.float32)
    hs = np.asarray(batched_color_histogram(jnp.asarray(solid)))
    assert hs.max() == 1.0


def test_histogram_encoder_l2_retrieval(tmp_path, rng):
    """Config #1: histogram embeddings + L2 brute-force top-k — a white
    query must retrieve the white-dominated images first."""
    from PIL import Image

    rgb = {"white": (240, 240, 240), "black": (15, 15, 15),
           "brown": (139, 69, 19)}
    paths, colors = [], []
    for i, color in enumerate(["white", "black", "brown"] * 3):
        p = str(tmp_path / f"{i}_{color}.jpg")
        base = np.array(rgb[color], np.int16)
        arr = np.clip(base + rng.integers(-10, 11, (64, 64, 3)), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(p)
        paths.append(p)
        colors.append(color)
    enc = HistogramEncoder()
    idx = ShardedVectorIndex(dim=enc.dim, config=IndexConfig(capacity_step=64))
    idx.insert(paths, enc.encode_images(paths))
    q = enc.encode_texts(["white"])[0]
    vals, ids = idx.search(q, top_k=3, metric="l2_distance")
    top_colors = [colors[int(i)] for i in ids]
    assert top_colors.count("white") == 3, top_colors


def test_histogram_encoder_pixels_roundtrip(rng):
    enc = HistogramEncoder()
    x01 = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    normed = (x01 - CLIP_MEAN) / CLIP_STD
    h = enc.encode_pixels(normed)
    assert h.shape == (2, 512)
    np.testing.assert_allclose(h.sum(1), 1.0, rtol=1e-4)


def test_vit_presets():
    b16 = vit_b16()
    assert b16.patch_size == 16 and b16.vision_width == 768
    l14 = vit_l14()
    assert l14.vision_layers == 24 and l14.embed_dim == 768
    # presets construct a valid model (shapes only; tiny forward elsewhere)
    from image_retrieval_tpu.models.clip import CLIP
    import jax.numpy as jnp

    CLIP(b16, dtype=jnp.float32)  # constructible
