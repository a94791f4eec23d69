"""Dominant-color extraction — batched JAX KMeans replacing per-image sklearn.

The reference runs sklearn KMeans(k=3, n_init=10) over every candidate COCO
image's pixels, one image at a time (reference imageProcessing.py:83-99) —
the most expensive host loop in dataset building (SURVEY §3.4). Here a
vmapped Lloyd's iteration clusters a whole batch of images on device in one
jit call. The fallback path (bright-pixel-masked mean,
imageProcessing.py:100-110) and the RGB classification thresholds
(imageProcessing.py:113-120) are preserved exactly.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

COLOR_NAMES = ("white", "black", "brown", "other")


def classify_rgb(r: float, g: float, b: float) -> str:
    """Reference thresholds (imageProcessing.py:113-120)."""
    if r > 200 and g > 200 and b > 200:
        return "white"
    elif r < 60 and g < 60 and b < 60:
        return "black"
    elif r > 100 and g < 100 and b < 80:
        return "brown"
    else:
        return "other"


def _kmeans_one(pixels: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Lloyd's k=3 over (P, 3) f32 pixels; returns dominant cluster center.

    Deterministic init: centers seeded from luminance quantiles (darkest,
    median, brightest pixel) — stable across runs, unlike sklearn's random
    restarts."""
    lum = jnp.sum(pixels, axis=1)
    order = jnp.argsort(lum)
    p = pixels.shape[0]
    init_idx = jnp.stack([order[0], order[p // 2], order[-1]])
    centers = pixels[init_idx]  # (3, 3)

    def step(centers, _):
        d = jnp.sum((pixels[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        assign = jnp.argmin(d, axis=-1)  # (P,)
        onehot = jax.nn.one_hot(assign, 3, dtype=jnp.float32)  # (P, 3)
        counts = jnp.sum(onehot, axis=0)  # (3,)
        sums = onehot.T @ pixels  # (3, 3)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centers)
        return new, counts

    centers, counts = jax.lax.scan(step, centers, None, length=iters)
    dominant = jnp.argmax(counts[-1])
    return centers[dominant]


@functools.partial(jax.jit, static_argnames=("iters",))
def _dominant_batch_jit(pixels: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """(B, P, 3) f32 -> (B, 3) dominant RGB centers."""
    return jax.vmap(lambda px: _kmeans_one(px, iters))(pixels)


def _sample_pixels(img: np.ndarray, n: int = 4096, seed: int = 0) -> np.ndarray:
    flat = img.reshape(-1, 3).astype(np.float32)
    if flat.shape[0] <= n:
        reps = -(-n // flat.shape[0])
        return np.tile(flat, (reps, 1))[:n]
    stride = flat.shape[0] // n
    return flat[:: stride][:n]


def dominant_colors_batch(
    images: Sequence[np.ndarray], method: str = "kmeans", sample: int = 4096
) -> List[str]:
    """Dominant color names for a batch of HxWx3 uint8 images.

    method='kmeans': device-batched Lloyd's (reference sklearn path).
    method='mean'  : bright-masked mean (reference fallback path,
                     imageProcessing.py:100-110)."""
    if not len(images):
        return []
    if method == "mean":
        out = []
        for img in images:
            arr = np.asarray(img)
            mask = np.max(arr, axis=2) < 240
            if mask.sum() > 0:
                dom = np.mean(arr[mask], axis=0).astype(int)
            else:
                dom = np.mean(arr, axis=(0, 1)).astype(int)
            out.append(classify_rgb(*dom))
        return out
    batch = np.stack([_sample_pixels(np.asarray(im), sample) for im in images])
    centers = np.asarray(_dominant_batch_jit(jnp.asarray(batch)))
    return [classify_rgb(*c.astype(int)) for c in centers]


def extract_dominant_color(image, method: str = "kmeans") -> str:
    """Single-image API mirroring reference imageProcessing.py:73-120."""
    return dominant_colors_batch([np.asarray(image)], method=method)[0]
