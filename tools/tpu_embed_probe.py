"""Decompose the ViT-B/32 embed time on the real TPU chip.

The embed path sits at ~52% MFU (bench_results/embed_experiments.json) and
the earlier numerics-preserving layout sweep was neutral, so this probe
answers two questions before more kernel work:

  1. How fast is the int8 MXU path really (micro: bf16 vs dynamic-int8
     matmul at the ViT MLP shape)? v5e peak is 394 int8 vs 197 bf16 TOPS.
  2. Where do the non-matmul microseconds go (ablations: LayerNorms
     removed, attention softmax/mix removed)?

Timing protocol per CLAUDE.md: chain ITERS iterations inside one lax.scan
dispatch, barrier with jax.device_get, subtract the measured fetch
round-trip.

Run:  python tools/tpu_embed_probe.py
Appends JSON records to bench_results/embed_probe.json
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import flax.linen as nn

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.models import clip as clip_mod
from image_retrieval_tpu.models.clip import CLIP, init_params

ITERS = 20
REPEATS = 5
MICRO_ITERS = 100


def _enable_cache():
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch_overhead_s() -> float:
    x = jnp.float32(1.0) + jnp.float32(1.0)
    jax.device_get(x)
    ts = []
    for _ in range(7):
        y = jnp.float32(np.random.rand())
        t0 = time.perf_counter()
        jax.device_get(y + 1.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(run, args, fetch_s, iters):
    t0 = time.perf_counter()
    jax.device_get(run(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        times.append(time.perf_counter() - t0 - fetch_s)
    times = np.array(times)
    return float(np.median(times)) / iters, compile_s, times


def micro_matmul(fetch_s, out):
    """bf16 vs dynamic-int8 matmul at the ViT fc1 shape (9600,768)x(768,3072)."""
    m, k, n = 9600, 768, 3072
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    flops = 2 * m * k * n

    @jax.jit
    def run_bf16(x0, w):
        wb = w.astype(jnp.bfloat16)

        def step(c, _):
            x = (x0 + c * 1e-9).astype(jnp.bfloat16)
            y = jnp.dot(x, wb, preferred_element_type=jnp.float32)
            return jnp.float32(y.mean()) * 1e-9, None

        tot, _ = lax.scan(step, jnp.float32(0.0), None, length=MICRO_ITERS)
        return tot

    @jax.jit
    def run_int8(x0, w):
        wmax = jnp.max(jnp.abs(w), axis=0)
        wscale = jnp.maximum(wmax, 1e-12) / 127.0
        wq = jnp.round(w / wscale).astype(jnp.int8)

        def step(c, _):
            x = x0 + c * 1e-9
            xmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            xscale = jnp.maximum(xmax, 1e-12) / 127.0
            xq = jnp.round(x / xscale).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = acc.astype(jnp.float32) * xscale * wscale[None]
            return jnp.float32(y.mean()) * 1e-9, None

        tot, _ = lax.scan(step, jnp.float32(0.0), None, length=MICRO_ITERS)
        return tot

    for name, fn in (("micro_bf16", run_bf16), ("micro_int8_dyn", run_int8)):
        sec, compile_s, _ = timed(fn, (x0, w), fetch_s, MICRO_ITERS)
        rec = {
            "name": name,
            "ms": sec * 1e3,
            "tflops": flops / sec / 1e12,
            "compile_s": round(compile_s, 1),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)


def build_tower(cfg: ModelConfig, batch: int):
    model, params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    px = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 224, 224, 3)).astype(np.float32)
    )

    @jax.jit
    def run(params, px):
        def step(c, _):
            emb = model.apply(params, px + c * 1e-9, method=CLIP.encode_image)
            return jnp.float32(emb.mean()) * 1e-6, None

        tot, _ = lax.scan(step, jnp.float32(0.0), None, length=ITERS)
        return tot

    return run, params, px


def tower(name, cfg, batch, fetch_s, out):
    run, params, px = build_tower(cfg, batch)
    sec, compile_s, _ = timed(run, (params, px), fetch_s, ITERS)
    rec = {
        "name": name,
        "batch": batch,
        "img_per_s": batch / sec,
        "us_per_img": sec / batch * 1e6,
        "compile_s": round(compile_s, 1),
    }
    out.append(rec)
    print(json.dumps(rec), flush=True)


class _IdentityLN:
    """Stand-in for nn.LayerNorm in the no-LN ablation (no params)."""

    def __init__(self, **kw):
        pass

    def __call__(self, x):
        return x


class _AttnNoMix(clip_mod.Attention):
    """QKV/out projections kept, score/softmax/mix replaced by out=v."""

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, _ = x.shape
        v = nn.Dense(self.width, dtype=self.dtype, name="v_proj")(x)
        q = nn.Dense(self.width, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.width, dtype=self.dtype, name="k_proj")(x)
        out = v + 0.0 * (q + k)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)
    out = []

    micro_matmul(fetch_s, out)

    base = ModelConfig()
    tower("vision_baseline", base, 128, fetch_s, out)
    tower("vision_int8", dataclasses.replace(base, int8_matmuls=True), 128, fetch_s, out)

    saved_ln = clip_mod.nn.LayerNorm
    try:
        clip_mod.nn.LayerNorm = _IdentityLN
        tower("vision_no_ln", base, 128, fetch_s, out)
    finally:
        clip_mod.nn.LayerNorm = saved_ln

    saved_attn = clip_mod.Attention
    try:
        clip_mod.Attention = _AttnNoMix
        tower("vision_no_attnmix", base, 128, fetch_s, out)
    finally:
        clip_mod.Attention = saved_attn

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results",
        "embed_probe.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
