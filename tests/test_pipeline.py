"""GPipe pipeline parallelism: forward + gradient parity vs sequential."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from image_retrieval_tpu.parallel.pipeline import (
    gpipe_apply,
    sequential_apply,
    stack_layer_params,
    shard_stages,
)
from image_retrieval_tpu.models.clip import Block


@pytest.fixture(scope="module")
def pipe_mesh():
    devs = np.array(jax.devices()[:4]).reshape(4)
    return Mesh(devs, ("pipe",))


@pytest.fixture(scope="module")
def block_stack(pipe_mesh):
    """8 transformer blocks stacked, sharded 2 layers/stage over 4 stages."""
    width, heads, layers = 32, 4, 8
    block = Block(width, heads, jnp.float32)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 6, width))
    params = [
        block.init(jax.random.fold_in(rng, i), x0)["params"] for i in range(layers)
    ]
    stacked = stack_layer_params(params)
    apply_layer = lambda p, x: block.apply({"params": p}, x)
    return block, stacked, apply_layer, pipe_mesh


def test_pipeline_forward_matches_sequential(block_stack, rng):
    block, stacked, apply_layer, mesh = block_stack
    x = jnp.asarray(rng.normal(size=(6, 2, 6, 32)).astype(np.float32))  # 6 microbatches
    sharded = shard_stages(stacked, mesh)
    got = gpipe_apply(apply_layer, sharded, x, mesh=mesh)
    want = sequential_apply(apply_layer, stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential(block_stack, rng):
    block, stacked, apply_layer, mesh = block_stack
    x = jnp.asarray(rng.normal(size=(4, 2, 6, 32)).astype(np.float32))
    sharded = shard_stages(stacked, mesh)

    def loss_pipe(params):
        out = gpipe_apply(apply_layer, params, x, mesh=mesh)
        return jnp.sum(out**2)

    def loss_seq(params):
        out = sequential_apply(apply_layer, params, x)
        return jnp.sum(out**2)

    g_pipe = jax.grad(loss_pipe)(sharded)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_pipeline_single_microbatch(block_stack, rng):
    _, stacked, apply_layer, mesh = block_stack
    x = jnp.asarray(rng.normal(size=(1, 2, 6, 32)).astype(np.float32))
    got = gpipe_apply(apply_layer, shard_stages(stacked, mesh), x, mesh=mesh)
    want = sequential_apply(apply_layer, stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
