"""ViT-B/32 embed-throughput experiments on the real TPU chip.

Measures img/s for the baseline layout and the numerics-preserving variants
(vision_seq_pad=64, patch_embed_matmul, fused_attention) so the default
ModelConfig can be set to the measured-fastest combination (VERDICT r1 #5).

Timing protocol (CLAUDE.md): the remote tunnel's block_until_ready returns
before device execution completes, so each measurement chains ITERS forward
passes inside one lax.scan dispatch (sequential dependency -> XLA cannot
hoist the body), fetches a scalar with jax.device_get as the barrier, and
subtracts the measured fetch round-trip.

Run:  python tools/tpu_embed_experiments.py [--quick]
Writes JSON lines to bench_results/embed_experiments.json
"""

from __future__ import annotations

import argparse
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

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.models.clip import CLIP, init_params

ITERS = 20
REPEATS = 5


def _enable_cache():
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch_overhead_s() -> float:
    """Median host-fetch round-trip for a scalar (subtracted from timings)."""
    x = jnp.float32(1.0) + jnp.float32(1.0)
    jax.device_get(x)
    ts = []
    for _ in range(7):
        y = jnp.float32(np.random.rand())
        t0 = time.perf_counter()
        jax.device_get(y + 1.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def build(cfg: ModelConfig, batch: int):
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


def measure(name: str, cfg: ModelConfig, batch: int, fetch_s: float, out):
    run, params, px = build(cfg, batch)
    t0 = time.perf_counter()
    jax.device_get(run(params, px))  # compile + first run
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.device_get(run(params, px))
        times.append(time.perf_counter() - t0 - fetch_s)
    times = np.array(times)
    ips = batch * ITERS / times
    rec = {
        "name": name,
        "batch": batch,
        "img_per_s_p50": float(np.median(ips)),
        "img_per_s_min": float(ips.min()),
        "img_per_s_max": float(ips.max()),
        "sec_per_dispatch": float(np.median(times)),
        "compile_s": round(compile_s, 1),
        "repeats": REPEATS,
        "iters": ITERS,
    }
    out.append(rec)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="baseline@128 only")
    args = ap.parse_args()
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    fetch_s = fetch_overhead_s()
    print(f"fetch overhead: {fetch_s*1e3:.1f} ms", flush=True)

    out = []
    base = ModelConfig()
    measure("baseline", base, 128, fetch_s, out)
    if not args.quick:
        for b in (64, 192, 256):
            measure("baseline", base, b, fetch_s, out)
        variants = {
            "pad64": {"vision_seq_pad": 64},
            "patch_matmul": {"patch_embed_matmul": True},
            "fused_attn": {"fused_attention": True},
            "all": {
                "vision_seq_pad": 64,
                "patch_embed_matmul": True,
                "fused_attention": True,
            },
        }
        for name, kw in variants.items():
            measure(name, dataclasses.replace(base, **kw), 128, fetch_s, out)

    res_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_results")
    os.makedirs(res_dir, exist_ok=True)
    with open(os.path.join(res_dir, "embed_experiments.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
