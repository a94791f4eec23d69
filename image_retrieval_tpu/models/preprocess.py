"""Image preprocessing: host decode + device-batched transform.

The reference delegates per-image preprocessing to HF CLIPProcessor
(reference ImageEmbeddingSystem.py:83, app_pipeline.py:112): resize shortest
edge to 224 (bicubic), center-crop 224, scale 1/255, normalize with CLIP
mean/std. Here decode happens host-side (PIL / native helper) while
resize+normalize run device-batched, replacing the reference's
one-image-at-a-time loop (color_analysis_workflow.py:127-142).
"""

from __future__ import annotations

import functools
from typing import Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def decode_image(path: str) -> np.ndarray:
    """Host-side decode to RGB uint8 (H, W, 3)."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def preprocess_host(image: Union[str, np.ndarray, Image.Image], size: int = 224) -> np.ndarray:
    """CLIPProcessor-equivalent single-image transform on host.

    Returns (size, size, 3) float32, normalized."""
    if isinstance(image, str):
        im = Image.open(image).convert("RGB")
    elif isinstance(image, np.ndarray):
        im = Image.fromarray(image).convert("RGB")
    else:
        im = image.convert("RGB")
    w, h = im.size
    # HF get_resize_output_image_size: short edge pinned to `size`, long
    # edge TRUNCATED with int() (not rounded) — 480x640 resizes to
    # 224x298, not 224x299; round() here deviated from CLIPProcessor for
    # non-square images (verified against the installed transformers).
    if w <= h:
        nw, nh = size, int(size * h / w)
    else:
        nw, nh = int(size * w / h), size
    im = im.resize((nw, nh), Image.Resampling.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    im = im.crop((left, top, left + size, top + size))
    x = np.asarray(im, np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


@functools.partial(jax.jit, static_argnames=("size",))
def preprocess_device(batch_u8: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Device-batched resize+normalize for already-square uint8 batches.

    batch_u8: (B, H, W, 3) uint8 (H == W). Bilinear resize on device — used
    on the high-throughput ingest path where host decode emits fixed-size
    thumbnails; the exact-bicubic host path stays available for parity."""
    x = batch_u8.astype(jnp.float32) / 255.0
    if batch_u8.shape[1] != size or batch_u8.shape[2] != size:
        x = jax.image.resize(
            x, (x.shape[0], size, size, 3), method="bilinear", antialias=True
        )
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std


def normalize_u8_device(batch_u8: jnp.ndarray) -> jnp.ndarray:
    """Device-side /255 + CLIP mean/std for already-sized uint8 batches.

    The ingest pipeline's device half: the native decoder emits raw
    (B, size, size, 3) uint8 (utils/native.py decode_preprocess_batch_u8)
    so the host->device transfer moves 1/4 the f32 bytes; this fuses into
    the encoder forward under jit. Same math as preprocess_host's tail."""
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (batch_u8.astype(jnp.float32) / 255.0 - mean) / std


def preprocess_host_u8(image: Union[str, np.ndarray, Image.Image],
                       size: int = 224) -> np.ndarray:
    """PIL fallback for the u8 ingest path: resize shortest edge + center
    crop, returning raw (size, size, 3) uint8 (no normalize — that runs
    on device via normalize_u8_device)."""
    if isinstance(image, str):
        im = Image.open(image).convert("RGB")
    elif isinstance(image, np.ndarray):
        im = Image.fromarray(image).convert("RGB")
    else:
        im = image.convert("RGB")
    w, h = im.size
    if w <= h:
        nw, nh = size, int(size * h / w)
    else:
        nw, nh = int(size * w / h), size
    im = im.resize((nw, nh), Image.Resampling.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    im = im.crop((left, top, left + size, top + size))
    return np.asarray(im, np.uint8)


def preprocess_batch(paths: Sequence[str], size: int = 224) -> np.ndarray:
    """Host decode+transform for a list of paths -> (B, size, size, 3) f32."""
    return np.stack([preprocess_host(p, size) for p in paths])
