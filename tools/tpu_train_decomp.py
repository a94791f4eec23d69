"""Decompose the training step cost at batch 256: forward loss only,
value_and_grad, grad + AdamW update (the full step shape). Identifies
whether the 2.0k img/s training ceiling (vs 11.4k forward-only) is
backward choreography or optimizer traffic.

Run:  python tools/tpu_train_decomp.py
Writes bench_results/train_decomp.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from image_retrieval_tpu.config import ModelConfig
from image_retrieval_tpu.models.clip import CLIP, init_params
from image_retrieval_tpu.train.trainer import clip_contrastive_loss
from tools.tpu_embed_probe import _enable_cache


B = 256


def main():
    _enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    out = []
    cfg = ModelConfig()
    model, params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = tx.init(params)

    px = jax.jit(
        lambda key: jax.random.normal(key, (B, 224, 224, 3), jnp.float32)
    )(jax.random.PRNGKey(0))
    toks = jax.jit(
        lambda key: jax.random.randint(key, (B, 77), 1, 49407, jnp.int32)
    )(jax.random.PRNGKey(1))
    _ = jax.device_get(px[0, 0, 0, 0]); _ = jax.device_get(toks[0, 0])

    def loss_fn(p, px, toks):
        img = model.apply(p, px, method=CLIP.encode_image)
        txt = model.apply(p, toks, method=CLIP.encode_text)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(p["params"]["logit_scale"])
        logits = scale * jnp.dot(img, txt.T, preferred_element_type=jnp.float32)
        return clip_contrastive_loss(logits)

    fwd = jax.jit(loss_fn)

    @jax.jit
    def vg(p, px, toks):
        # MUST consume the grads (sum of leaf sums) or XLA dead-code
        # eliminates the whole backward and this measures forward only.
        loss, grads = jax.value_and_grad(loss_fn)(p, px, toks)
        gsum = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(grads))
        return loss + 0.0 * gsum

    @jax.jit
    def full(p, o, px, toks):
        loss, grads = jax.value_and_grad(loss_fn)(p, px, toks)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    def timeit(name, unit):
        _ = jax.device_get(unit(0))
        ts = []
        for r in range(4):
            a = unit(3 * r + 1)
            t0 = time.perf_counter(); _ = jax.device_get(a)
            t1 = time.perf_counter()
            _b = unit(3 * r + 2); c = unit(3 * r + 3)
            t2 = time.perf_counter(); _ = jax.device_get(c)
            t3 = time.perf_counter()
            ts.append(max((t3 - t2) - (t1 - t0), 1e-9))
        ms = float(np.median(ts) * 1e3)
        rec = {"name": name, "ms": round(ms, 2),
               "img_per_s": round(B / (ms / 1e3), 1)}
        out.append(rec); print(json.dumps(rec), flush=True)

    def perturb(i):
        return px + jnp.float32(i) * 1e-6

    timeit("fwd_loss_b256", lambda i: fwd(params, perturb(i), toks))
    timeit("value_and_grad_b256", lambda i: vg(params, perturb(i), toks))

    state = {"p": params, "o": opt_state}

    def full_unit(i):
        p2, o2, loss = full(state["p"], state["o"], perturb(i), toks)
        state["p"], state["o"] = p2, o2
        return loss

    timeit("full_step_b256", full_unit)

    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "train_decomp.json",
    )
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
