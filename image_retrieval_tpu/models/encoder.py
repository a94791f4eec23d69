"""Encoder facade: batched, jit-compiled, mesh-sharded embedding generation.

Replaces the reference's per-image, batch-size-1 CLIP loops
(reference ImageEmbeddingSystem.py:120-129, app_pipeline.py:108-117,
color_analysis_workflow.py:127-142) with fixed-shape device batches sharded
over the mesh `data` axis. Also replaces the per-query model reload
(reference app_pipeline.py:181-183) — the compiled apply functions live for
the process lifetime.

Two implementations share one interface:
  CLIPEncoder — the real Flax CLIP ViT-B/32 (pretrained weights ported when
                available, deterministic init otherwise).
  FakeEncoder — deterministic projection encoder for tests/CI, the
                reproducible version of the reference's dummy-embedding
                fallback (app_pipeline.py:129-141).
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_retrieval_tpu.config import Config
from image_retrieval_tpu.models.clip import CLIP, init_params
from image_retrieval_tpu.models.preprocess import preprocess_batch
from image_retrieval_tpu.models.tokenizer import get_tokenizer
from image_retrieval_tpu.parallel.mesh import make_mesh


class Encoder:
    """Interface: paths/texts in, unnormalized f32 embeddings out."""

    dim: int = 512

    def encode_images(self, paths: Sequence[str], batch_size: int = 256) -> np.ndarray:
        raise NotImplementedError

    def encode_pixels(self, pixels: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        raise NotImplementedError

    def encode_stream(self, batches):
        """Streaming encode: iterate (meta, pixels) pairs, yield
        (meta, embeddings) in order.

        Base implementation is synchronous (one encode_pixels per batch);
        CLIPEncoder overrides it with cross-batch async dispatch so device
        transfer/compute/fetch overlap the caller's host work (ingest
        decode) instead of fetch-barriering every batch."""
        for meta, pixels in batches:
            yield meta, self.encode_pixels(pixels)


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)
    return np.concatenate([x, pad], 0)


class CLIPEncoder(Encoder):
    def __init__(
        self,
        config: Optional[Config] = None,
        mesh: Optional[Mesh] = None,
        params=None,
        seed: int = 0,
    ):
        self.config = config or Config()
        cfg = self.config.model
        self.dim = cfg.embed_dim
        self.mesh = mesh if mesh is not None else make_mesh(self.config.mesh)
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.model = CLIP(cfg, dtype=dtype)
        if params is None:
            if self.config.weights_path:
                from image_retrieval_tpu.models.weights import load_hf_clip_params

                params = load_hf_clip_params(self.config.weights_path, cfg)
            else:
                _, params = init_params(cfg, seed=seed, dtype=dtype)
        self.params = jax.device_put(params, NamedSharding(self.mesh, P()))
        self.tokenizer = get_tokenizer(self.config.weights_path)
        data_spec = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())

        # Multi-chip data parallelism is shard_map, NOT sharded jit: GSPMD
        # cannot auto-partition compiled Mosaic kernels ("Mosaic kernels
        # cannot be automatically partitioned. Please wrap the call in a
        # shard_map" — bench_results/gspmd_probe.json aot_v5e8 case), so a
        # plain jit with data-sharded inputs only works single-device. The
        # towers are per-example independent (no cross-batch ops), so the
        # shard_map wrap is EXACT — each device runs the full tower on its
        # batch shard with replicated params (verified bitwise vs the
        # unsharded jit on hardware, gspmd_probe.json sharded_1dev).
        from image_retrieval_tpu.models.preprocess import normalize_u8_device

        def wrap(fn):
            if self.mesh.shape["data"] > 1:
                from jax import shard_map

                fn = shard_map(fn, mesh=self.mesh,
                               in_specs=(P(), P("data")),
                               out_specs=P("data"), check_vma=False)
            return jax.jit(
                fn,
                in_shardings=(NamedSharding(self.mesh, P()), data_spec),
                out_shardings=data_spec,
            )

        self._encode_image = wrap(
            lambda p, x: self.model.apply(p, x, method=CLIP.encode_image))
        # uint8 ingest form: the host ships raw RGB bytes (1/4 the f32
        # transfer — the tunnel/PCIe leg of ingest) and /255 + mean/std
        # fuse into the forward under jit (models/preprocess.py)
        self._encode_image_u8 = wrap(
            lambda p, x: self.model.apply(
                p, normalize_u8_device(x), method=CLIP.encode_image))
        self._encode_text = wrap(
            lambda p, t: self.model.apply(p, t, method=CLIP.encode_text))
        self._rep = rep

    # Each distinct batch shape costs a jit compile (minutes through the
    # remote TPU compiler), so batches snap to a small bucket ladder.
    # 192 is the measured v5e throughput peak (bench_results/
    # embed_experiments.json: 11.4k img/s vs 11.1k at 128, 10.4k at 256).
    _BUCKETS = (8, 32, 128, 192, 256)

    def _batch_sizes(self, requested: int) -> int:
        # batch must divide evenly over the data axis; snap up to a bucket
        nd = self.mesh.shape["data"]
        for b in self._BUCKETS:
            if requested <= b and b % nd == 0:
                return b
        return max(nd, -(-requested // nd) * nd)

    # In-flight dispatch window: each pending execution pins its padded
    # input batch in HBM (~116 MB at bucket 192), so an unbounded dispatch
    # queue over a large ingest could OOM the 16 GB chip. A window of a few
    # batches keeps compute/fetch/decode overlapped with bounded residency.
    _MAX_IN_FLIGHT = 4

    def _drain(self, pending, outs, limit):
        while len(pending) > limit:
            dev, m = pending.pop(0)
            outs.append(np.asarray(dev)[:m])

    def _dispatch_pixels(self, pixels: np.ndarray):
        """Async-dispatch one pixel batch: [(device_result, keep_n), ...].

        Dispatch alone is ~26 ms for a 38 MB uint8 batch on the dev tunnel
        (bench_results/ingest_attrib_probe.json A_put: the host->device
        copy and the forward both run asynchronously); the caller decides
        when to pay the fetch barrier."""
        n = pixels.shape[0]
        u8 = pixels.dtype == np.uint8
        encode = self._encode_image_u8 if u8 else self._encode_image
        step = self._batch_sizes(min(n, self._BUCKETS[-1])) if n else 1
        parts = []
        for i in range(0, n, step):
            chunk = pixels[i : i + step]
            if not u8 and chunk.dtype != np.float32:
                chunk = chunk.astype(np.float32)
            nb = self._batch_sizes(chunk.shape[0])
            padded = _pad_to(chunk, nb)
            parts.append(
                (encode(self.params, jnp.asarray(padded)), chunk.shape[0])
            )
        return parts

    def encode_pixels(self, pixels: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) pixels -> (B, dim) f32 unnormalized embeddings.

        Accepts CLIP-normalized f32 (the parity path) OR raw uint8 RGB —
        u8 batches ship 1/4 the bytes to the device and normalize inside
        the forward jit (the high-throughput ingest form; see
        utils/native.py decode_preprocess_batch_u8).

        Pipelined: up to _MAX_IN_FLIGHT batches are dispatched before the
        oldest is fetched — device compute overlaps the per-batch host-fetch
        round-trips (the dev tunnel's fetch alone is ~30 ms, longer than a
        batch forward) with bounded HBM residency."""
        n = pixels.shape[0]
        if n == 0:
            return np.zeros((0, self.dim), np.float32)
        u8 = pixels.dtype == np.uint8
        encode = self._encode_image_u8 if u8 else self._encode_image
        step = self._batch_sizes(min(n, self._BUCKETS[-1]))
        pending, outs = [], []
        for i in range(0, n, step):
            chunk = pixels[i : i + step]
            if not u8 and chunk.dtype != np.float32:
                chunk = chunk.astype(np.float32)
            nb = self._batch_sizes(chunk.shape[0])
            padded = _pad_to(chunk, nb)
            pending.append(
                (encode(self.params, jnp.asarray(padded)), chunk.shape[0])
            )
            self._drain(pending, outs, self._MAX_IN_FLIGHT)
        self._drain(pending, outs, 0)
        return np.concatenate(outs, 0)

    def encode_stream(self, batches):
        """Cross-batch pipelined encode: iterate (meta, pixels), yield
        (meta, embeddings) in order with up to _MAX_IN_FLIGHT device
        batches dispatched ahead of the oldest fetch.

        This is the ingest hot path (VERDICT r4 item 1): per-batch
        encode_pixels() fetch-barriers at the END of every call, so the
        loader's background decode of batch N+1 cannot overlap batch N's
        device transfer/compute/fetch — measured fully serial
        (ingest_attrib_probe.json D_e2e: wait_decode + encode_call sum to
        the wall). Here the fetch of batch N happens while batch N+1 is
        decoding AND its transfer is in flight, so the pipeline's wall
        time approaches max(decode, transfer+compute) instead of the sum."""
        pending = []  # (meta, [(device_result, keep_n), ...])

        def fetch(entry):
            meta, parts = entry
            if not parts:
                return meta, np.zeros((0, self.dim), np.float32)
            outs = [np.asarray(d)[:m] for d, m in parts]
            return meta, np.concatenate(outs, 0)

        big = self._BUCKETS[-1] * self._MAX_IN_FLIGHT
        for meta, pixels in batches:
            if pixels.shape[0] > big:
                # oversized batch: drain the window, then let
                # encode_pixels bound HBM residency internally
                while pending:
                    yield fetch(pending.pop(0))
                yield meta, self.encode_pixels(pixels)
                continue
            # drain BEFORE dispatching so in-flight stays bounded by
            # _MAX_IN_FLIGHT even transiently (dispatch-then-drain let the
            # window double to 2x for a moment — ~0.9 GB of extra pinned
            # HBM at bucket 256, r5 review). The oldest fetch still
            # overlaps the previously dispatched batches.
            n_px = pixels.shape[0]
            step = (self._batch_sizes(min(n_px, self._BUCKETS[-1]))
                    if n_px else 1)
            incoming = max(1, -(-n_px // step))
            while (len(pending) > 1
                   and sum(len(p) for _, p in pending) + incoming
                   > self._MAX_IN_FLIGHT):
                yield fetch(pending.pop(0))
            pending.append((meta, self._dispatch_pixels(pixels)))
            while (sum(len(p) for _, p in pending) > self._MAX_IN_FLIGHT
                   and len(pending) > 1):
                yield fetch(pending.pop(0))
        while pending:
            yield fetch(pending.pop(0))

    def encode_images(self, paths: Sequence[str], batch_size: int = 256) -> np.ndarray:
        """Host-parallel decode -> device-batched forward.

        Decode of batch i+1 overlaps the device forward of batch i: each
        batch is dispatched (async) before the next decode starts; fetches
        trail by up to _MAX_IN_FLIGHT batches."""
        bs = self._batch_sizes(batch_size)
        pending, outs = [], []
        for i in range(0, len(paths), bs):
            chunk = list(paths[i : i + bs])
            pixels = preprocess_batch(
                chunk, size=self.config.model.image_size
            ).astype(np.float32)
            nb = self._batch_sizes(pixels.shape[0])
            padded = _pad_to(pixels, nb)
            pending.append(
                (self._encode_image(self.params, jnp.asarray(padded)), pixels.shape[0])
            )
            self._drain(pending, outs, self._MAX_IN_FLIGHT)
        self._drain(pending, outs, 0)
        if not outs:
            return np.zeros((0, self.dim), np.float32)
        return np.concatenate(outs, 0)

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        tokens = self.tokenizer(
            list(texts), context_length=self.config.model.context_length
        )
        n = tokens.shape[0]
        if n == 0:
            return np.zeros((0, self.dim), np.float32)
        step = self._batch_sizes(min(n, self._BUCKETS[-1]))
        # Padded rows would pool at argmax=0; harmless, sliced away below.
        # Windowed async dispatch (see encode_pixels).
        pending, outs = [], []
        for i in range(0, n, step):
            chunk = tokens[i : i + step]
            nb = self._batch_sizes(chunk.shape[0])
            padded = _pad_to(chunk, nb)
            pending.append(
                (self._encode_text(self.params, jnp.asarray(padded)), chunk.shape[0])
            )
            self._drain(pending, outs, self._MAX_IN_FLIGHT)
        self._drain(pending, outs, 0)
        return np.concatenate(outs, 0)


class FakeEncoder(Encoder):
    """Deterministic projection encoder (no weights, instant, reproducible).

    Images: 8x8 mean-pooled RGB grid -> fixed seeded projection to dim.
    Texts: hashed bag-of-words -> same projection family. Norms vary with
    content so magnitude-sensitive metrics stay meaningful."""

    def __init__(self, dim: int = 512, seed: int = 1234):
        self.dim = dim
        rng = np.random.default_rng(seed)
        self._img_proj = rng.normal(size=(8 * 8 * 3, dim)).astype(np.float32) / np.sqrt(192)
        self._txt_proj = rng.normal(size=(256, dim)).astype(np.float32) / np.sqrt(256)

    def encode_pixels(self, pixels: np.ndarray) -> np.ndarray:
        if pixels.dtype == np.uint8:
            # mirror CLIPEncoder's on-device u8 normalize so fake
            # embeddings are identical across the f32/u8 ingest forms
            from image_retrieval_tpu.models.preprocess import (
                CLIP_MEAN,
                CLIP_STD,
            )

            pixels = (pixels.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        b, h, w, _ = pixels.shape
        gh, gw = h // 8, w // 8
        x = pixels[:, : gh * 8, : gw * 8, :]
        x = x.reshape(b, 8, gh, 8, gw, 3).mean((2, 4)).reshape(b, -1)
        return (x @ self._img_proj).astype(np.float32) * 4.0

    def encode_images(self, paths: Sequence[str], batch_size: int = 256) -> np.ndarray:
        pixels = preprocess_batch(list(paths))
        return self.encode_pixels(pixels)

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), 256), np.float32)
        for i, t in enumerate(texts):
            for w in t.lower().split():
                h = int.from_bytes(hashlib.sha1(w.encode()).digest()[:4], "little")
                out[i, h % 256] += 1.0
        return (out @ self._txt_proj).astype(np.float32) * 4.0


def get_encoder(config: Optional[Config] = None, fake: bool = False, **kw) -> Encoder:
    if fake:
        return FakeEncoder(dim=(config.model.embed_dim if config else 512))
    return CLIPEncoder(config=config, **kw)
