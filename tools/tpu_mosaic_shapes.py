"""On-TPU Mosaic compile-shape sweep for the fused kernel family
(VERDICT r2 item 4).

Compile-only (tiny batch, .lower().compile(), nothing executed): each grid
point records whether Mosaic accepts the (kernel, width, t, dtype) shape on
real hardware. Interpret-mode tests cannot catch these rejections — the
known bf16 lane-unaligned-t failure ((4, 11, 64) packed to (44, 64)) and
the bf16 width-768 layer-kernel VMEM overflow only appear at compile time.

The emitted table (bench_results/mosaic_shapes.json) is consumed by
image_retrieval_tpu/ops/shape_support.py, which models/clip.py's Block
consults before selecting a fused path — swept-and-rejected points fall
back to sub-block kernels or the unfused XLA path instead of crashing the
remote compiler at serving time.

Run:  python tools/tpu_mosaic_shapes.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.tpu_embed_probe import _enable_cache

HEADS = {64: 2, 512: 8, 768: 12, 1024: 16}
RESPATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_results", "mosaic_shapes.json",
)


def _params(width, rng):
    w = lambda *s: jnp.asarray(rng.normal(size=s, scale=0.02).astype(np.float32))
    return {
        "ln_s": jnp.ones((width,), jnp.float32),
        "ln_b": jnp.zeros((width,), jnp.float32),
        "wq": w(width, width), "bq": w(width),
        "wk": w(width, width), "bk": w(width),
        "wv": w(width, width), "bv": w(width),
        "wo": w(width, width), "bo": w(width),
        "w1": w(width, width * 4), "b1": w(width * 4),
        "w2": w(width * 4, width), "b2": w(width),
    }


def try_compile(kernel, quant, width, t, b=8, causal=False):
    from image_retrieval_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(0)
    p = _params(width, rng)
    x = jnp.asarray(rng.normal(size=(b, t, width)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    heads = HEADS[width]
    if kernel == "layer":
        fn = fa.layer_block_int8 if quant else fa.layer_block
        args = (x, p["ln_s"], p["ln_b"], p["wq"], p["bq"], p["wk"], p["bk"],
                p["wv"], p["bv"], p["wo"], p["bo"], p["ln_s"], p["ln_b"],
                p["w1"], p["b1"], p["w2"], p["b2"])
        jfn = jax.jit(functools.partial(fn, heads=heads, causal=causal))
    elif kernel == "attn":
        fn = fa.attention_block_int8 if quant else fa.attention_block
        args = (x, p["ln_s"], p["ln_b"], p["wq"], p["bq"], p["wk"], p["bk"],
                p["wv"], p["bv"], p["wo"], p["bo"])
        jfn = jax.jit(functools.partial(fn, heads=heads, causal=causal))
    elif kernel == "mlp":
        fn = fa.mlp_block_int8 if quant else fa.mlp_block
        args = (x, p["ln_s"], p["ln_b"], p["w1"], p["b1"], p["w2"], p["b2"])
        jfn = jax.jit(fn)
    else:
        raise ValueError(kernel)
    t0 = time.time()
    try:
        jfn.lower(*args).compile()
        return True, None, time.time() - t0
    except Exception as e:
        return False, str(e)[:300], time.time() - t0


def main():
    _enable_cache()
    assert jax.default_backend() == "tpu", "sweep must run on real hardware"
    print(f"devices: {jax.devices()}", flush=True)

    # production token counts: B/32 vision 50, text 77, B/16 vision 197,
    # L/14 vision 257 (16x16 patches + CLS); t=11 reproduces the reported
    # bf16 lane-unaligned rejection from the tiny test config
    grid = []
    # layer kernel: the VMEM envelope (int8 through 768, bf16 through 512)
    for w, ts in ((512, (77,)), (768, (50, 197)), (1024, (257,))):
        for t in ts:
            grid.append(("layer", True, w, t))
    for w, ts in ((512, (77,)), (768, (50,))):
        for t in ts:
            grid.append(("layer", False, w, t))
    # sub-block kernels: lane-unaligned t is the known bf16 hazard
    for w, ts in ((512, (11, 77)), (768, (11, 50, 197)), (1024, (257,))):
        for t in ts:
            grid.append(("attn", False, w, t))
    for w, ts in ((768, (11, 50)), (1024, (257,))):
        for t in ts:
            grid.append(("mlp", False, w, t))
    for w, ts in ((768, (50, 197)), (1024, (257,))):
        for t in ts:
            grid.append(("attn", True, w, t))
    grid.append(("mlp", True, 768, 50))
    grid.append(("mlp", True, 1024, 257))
    # the reported tiny-config repro: (4, 11, 64) bf16
    grid.append(("attn", False, 64, 11))

    out = []
    for kernel, quant, width, t in grid:
        ok, err, secs = try_compile(kernel, quant, width, t)
        entry = {"kernel": kernel, "quant": quant, "width": width, "t": t,
                 "heads": HEADS[width], "ok": ok, "compile_s": round(secs, 1)}
        if err:
            entry["error"] = err
        out.append(entry)
        print(json.dumps(entry), flush=True)
        with open(RESPATH, "w") as f:
            json.dump(out, f, indent=1)
    n_ok = sum(e["ok"] for e in out)
    print(f"done: {n_ok}/{len(out)} points compile", flush=True)


if __name__ == "__main__":
    main()
