"""Color-histogram embedding family — the classical baseline encoder.

BASELINE.json config #1 is "color-histogram embeddings + L2 brute-force
top-k"; this encoder provides it TPU-natively: each image becomes a
normalized 8x8x8 RGB occupancy histogram (512 dims — the same width as CLIP
embeddings, so it drops into the same index/search/analysis stack). The
histogram runs device-batched: channel quantization to 3 bits, a fused
scatter-add per image, one jit call per batch.

Useful as a no-weights retrieval baseline and as the second encoder family
for metric-comparison studies (color information is explicit here, latent in
CLIP — exactly the contrast the reference's MI analysis probes).
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from image_retrieval_tpu.models.encoder import Encoder
from image_retrieval_tpu.models.preprocess import CLIP_MEAN, CLIP_STD


@functools.partial(jax.jit, static_argnames=("bins_per_channel",))
def batched_color_histogram(
    pixels01: jnp.ndarray, bins_per_channel: int = 8
) -> jnp.ndarray:
    """(B, H, W, 3) float in [0,1] -> (B, bins^3) L1-normalized histograms."""
    b = pixels01.shape[0]
    nbins = bins_per_channel
    q = jnp.clip((pixels01 * nbins).astype(jnp.int32), 0, nbins - 1)
    flat_idx = (
        q[..., 0] * nbins * nbins + q[..., 1] * nbins + q[..., 2]
    ).reshape(b, -1)

    def one(idx):
        return jnp.zeros((nbins**3,), jnp.float32).at[idx].add(1.0)

    hist = jax.vmap(one)(flat_idx)
    return hist / jnp.maximum(hist.sum(axis=1, keepdims=True), 1.0)


class HistogramEncoder(Encoder):
    """Drop-in encoder producing 512-d color-histogram embeddings.

    encode_pixels accepts the standard CLIP-normalized batches (it undoes
    the normalization to recover [0,1] RGB), so every existing pipeline —
    ImageEmbeddingSystem, loaders, the app facade — works unchanged.
    Text queries hash color/category words onto the matching histogram
    bins, giving a crude but deterministic text->color search."""

    COLOR_WORDS = {
        "red": (0.8, 0.1, 0.1), "green": (0.1, 0.7, 0.1), "blue": (0.1, 0.2, 0.8),
        "white": (0.95, 0.95, 0.95), "black": (0.05, 0.05, 0.05),
        "brown": (0.55, 0.27, 0.07), "yellow": (0.9, 0.85, 0.1),
        "gray": (0.5, 0.5, 0.5), "grey": (0.5, 0.5, 0.5),
        "orange": (0.9, 0.55, 0.1), "purple": (0.5, 0.1, 0.6),
    }

    def __init__(self, bins_per_channel: int = 8):
        self.bins = bins_per_channel
        self.dim = bins_per_channel**3

    # Same bucket ladder as CLIPEncoder: each distinct batch shape is a jit
    # signature (minutes through the remote TPU compiler), so ragged tails
    # snap up to a bucket and the padding is sliced off.
    _BUCKETS = (8, 32, 128, 256)

    def encode_pixels(self, pixels: np.ndarray) -> np.ndarray:
        pixels = np.asarray(pixels, np.float32)
        n = pixels.shape[0]
        if n == 0:
            return np.zeros((0, self.dim), np.float32)
        top = self._BUCKETS[-1]
        if n > top:
            # chunk oversize batches at the largest bucket: every distinct
            # n would otherwise be a fresh jit signature (minutes through
            # the remote compiler) and one giant device batch
            return np.concatenate(
                [self.encode_pixels(pixels[i : i + top])
                 for i in range(0, n, top)]
            )
        x01 = np.clip(pixels * CLIP_STD + CLIP_MEAN, 0.0, 1.0)
        nb = next((b for b in self._BUCKETS if n <= b), n)
        if nb > n:
            x01 = np.concatenate(
                [x01, np.zeros((nb - n,) + x01.shape[1:], np.float32)]
            )
        return np.asarray(batched_color_histogram(jnp.asarray(x01), self.bins))[:n]

    def encode_images(self, paths: Sequence[str], batch_size: int = 256) -> np.ndarray:
        from image_retrieval_tpu.models.preprocess import preprocess_batch

        outs = []
        for i in range(0, len(paths), batch_size):
            outs.append(self.encode_pixels(preprocess_batch(list(paths[i : i + batch_size]))))
        return (np.concatenate(outs, 0) if outs
                else np.zeros((0, self.dim), np.float32))

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        nb = self.bins
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            hits = 0
            for word in text.lower().split():
                rgb = self.COLOR_WORDS.get(word)
                if rgb is None:
                    continue
                q = np.clip((np.array(rgb) * nb).astype(int), 0, nb - 1)
                # soft peak around the named color's bin
                for dr in (-1, 0, 1):
                    for dg in (-1, 0, 1):
                        for db in (-1, 0, 1):
                            r, g, b = q[0] + dr, q[1] + dg, q[2] + db
                            if 0 <= r < nb and 0 <= g < nb and 0 <= b < nb:
                                w = 1.0 / (1 + abs(dr) + abs(dg) + abs(db))
                                out[i, r * nb * nb + g * nb + b] += w
                hits += 1
            if hits == 0:
                out[i] = 1.0  # uniform: matches anything equally
            out[i] /= max(out[i].sum(), 1e-9)
        return out
