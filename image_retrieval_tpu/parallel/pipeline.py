"""GPipe-style pipeline parallelism over homogeneous transformer blocks.

The CLIP towers are stacks of identical Blocks (models/clip.py), which makes
them pipeline-able the classic way: stage s of a `pipe` mesh axis holds
layers [s*L/S, (s+1)*L/S); M microbatches flow through the stages over
M + S - 1 ticks, activations hopping stages via `ppermute` over ICI. JAX AD
differentiates through the schedule (ppermute's transpose is the reverse
permute), so the same code serves training.

At ViT-B scale pipeline parallelism is optional (the model fits one chip —
dp x tp in train/trainer.py is the production layout); this module exists so
the framework scales to deeper towers and to demonstrate the full
parallelism vocabulary. Verified bit-close against sequential execution for
both forward values and gradients on a virtual mesh (tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_retrieval_tpu.parallel.mesh import row_spec


def stack_layer_params(layer_params_list):
    """[params_layer_0, ...] -> single tree with leading (L, ...) axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params_list)


def shard_stages(stacked, mesh: Mesh, axis: str = "pipe"):
    """Place stacked layer params with the layer axis sharded over `axis`."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, row_spec(x.ndim, axis)))

    return jax.tree.map(put, stacked)


def gpipe_local(
    apply_layer: Callable[[Any, jnp.ndarray], jnp.ndarray],
    params_local,
    x_all: jnp.ndarray,
    *,
    axis: str,
    num_stages: int,
) -> jnp.ndarray:
    """The per-device GPipe schedule — call INSIDE a shard_map whose mesh has
    a `axis` pipeline dimension.

    params_local: this stage's layers, leading (L/S, ...) axes.
    x_all: (M, mb, ...) microbatches (already local to this device).
    Returns (M, mb, ...) outputs replicated across the `axis` stages."""
    num_micro = x_all.shape[0]
    stage = jax.lax.axis_index(axis)
    is_first = stage == 0
    is_last = stage == num_stages - 1
    perm = [(int(s), int((s + 1) % num_stages)) for s in range(num_stages)]

    def run_stage(x):
        def body(h, layer_params):
            return apply_layer(layer_params, h), None

        h, _ = jax.lax.scan(body, x, params_local)
        return h

    zero = jnp.zeros(x_all.shape[1:], x_all.dtype)

    def tick(carry, t):
        prev_out, outputs = carry
        # activation arriving from the previous stage (tick t-1's output)
        recv = jax.lax.ppermute(prev_out, axis, perm)
        feed_idx = jnp.clip(t, 0, num_micro - 1)
        first_in = jnp.where(t < num_micro, 1.0, 0.0).astype(x_all.dtype) * x_all[feed_idx]
        inp = jnp.where(is_first, first_in, recv)
        out = run_stage(inp)
        # last stage banks its result for microbatch t - (S - 1)
        out_idx = jnp.clip(t - (num_stages - 1), 0, num_micro - 1)
        bank = jnp.logical_and(is_last, t >= num_stages - 1)
        outputs = jax.lax.cond(
            bank, lambda o: o.at[out_idx].set(out), lambda o: o, outputs
        )
        return (out, outputs), None

    init = (zero, jnp.zeros_like(x_all))
    (_, outputs), _ = jax.lax.scan(
        tick, init, jnp.arange(num_micro + num_stages - 1)
    )
    # replicate final outputs to every stage
    mask = jnp.where(is_last, 1.0, 0.0).astype(outputs.dtype)
    return jax.lax.psum(outputs * mask, axis)


def gpipe_apply(
    apply_layer: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params,
    microbatches: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "pipe",
) -> jnp.ndarray:
    """Run a stack of L layers over M microbatches, pipelined over S stages.

    Args:
        apply_layer: (one_layer_params, x) -> x, the homogeneous block fn.
        stacked_params: tree with leading (L, ...) axes, sharded over `axis`
            (L % S == 0).
        microbatches: (M, mb, ...) input microbatches, replicated.

    Returns:
        (M, mb, ...) outputs, replicated on all stages.
    """
    num_stages = mesh.shape[axis]

    def local(params_local, x_all):
        return gpipe_local(
            apply_layer, params_local, x_all, axis=axis, num_stages=num_stages
        )

    in_specs = (
        jax.tree.map(lambda x: row_spec(x.ndim, axis), stacked_params),
        P(),
    )
    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )
    return fn(stacked_params, microbatches)


def sequential_apply(apply_layer, stacked_params, microbatches):
    """Reference execution: all layers, every microbatch, no pipeline."""
    def per_micro(x):
        def body(h, layer_params):
            return apply_layer(layer_params, h), None

        h, _ = jax.lax.scan(body, x, stacked_params)
        return h

    return jax.vmap(per_micro)(microbatches)
