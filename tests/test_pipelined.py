"""Pipelined (dp x pp) CLIP trainer vs the plain dp trainer: loss parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from image_retrieval_tpu.config import MeshConfig
from image_retrieval_tpu.models.clip import init_params
from image_retrieval_tpu.parallel.mesh import make_mesh
from image_retrieval_tpu.train.trainer import CLIPTrainer
from image_retrieval_tpu.train.pipelined import PipelinedCLIPTrainer, split_clip_params
from tests.test_models import tiny_model_config


def make_pipe_mesh(data, pipe):
    devs = np.array(jax.devices()[: data * pipe]).reshape(data, pipe)
    return Mesh(devs, ("data", "pipe"))


@pytest.mark.parametrize("layout", [(4, 2), (2, 2), (1, 2)])
def test_pipelined_matches_plain_trainer(rng, layout):
    cfg = tiny_model_config()  # 2+2 layers -> 2 stages
    _, params = init_params(cfg, seed=0)
    b = 8
    pixels = rng.normal(size=(b, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, 100, size=(b, 16)).astype(np.int32)

    plain = CLIPTrainer(cfg=cfg, mesh=make_mesh(MeshConfig(data=8, model=1)),
                        params=jax.tree.map(jnp.array, params))
    losses_plain = [plain.train_step(pixels, tokens) for _ in range(2)]

    data, pipe = layout
    mesh = make_pipe_mesh(data, pipe)
    pp = PipelinedCLIPTrainer(cfg=cfg, mesh=mesh, num_micro=2,
                              params=jax.tree.map(jnp.array, params))
    losses_pp = [pp.train_step(pixels, tokens) for _ in range(2)]
    np.testing.assert_allclose(losses_pp, losses_plain, rtol=1e-4, atol=1e-5)


def test_split_params_roundtrip_shapes():
    cfg = tiny_model_config()
    _, params = init_params(cfg, seed=0)
    split = split_clip_params(params, cfg)
    # stacked blocks carry a leading layer axis
    fc1 = split["vb"]["mlp"]["fc1"]["kernel"]
    assert fc1.shape[0] == cfg.vision_layers
    assert split["logit_scale"].shape == ()


@pytest.mark.parametrize("layout", [(2, 2), (1, 2)])
def test_pipelined_gradients_match_plain_trainer_sgd(rng, layout):
    """GRADIENT equivalence, not just loss equivalence: with plain SGD (not
    scale-invariant AdamW) one step must move parameters identically to the
    GSPMD trainer — this catches the mesh.size gradient overcount that the
    shard_map psums produce when every device computes the same global loss."""
    import optax
    from image_retrieval_tpu.train.pipelined import split_clip_params

    cfg = tiny_model_config()
    _, params = init_params(cfg, seed=0)
    b = 8
    pixels = rng.normal(size=(b, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, 100, size=(b, 16)).astype(np.int32)

    plain = CLIPTrainer(cfg=cfg, mesh=make_mesh(MeshConfig(data=8, model=1)),
                        params=jax.tree.map(jnp.array, params),
                        optimizer=optax.sgd(0.1))
    plain.train_step(pixels, tokens)
    want = split_clip_params(jax.device_get(plain.params), cfg)

    data, pipe = layout
    pp = PipelinedCLIPTrainer(cfg=cfg, mesh=make_pipe_mesh(data, pipe),
                              num_micro=2,
                              params=jax.tree.map(jnp.array, params),
                              optimizer=optax.sgd(0.1))
    pp.train_step(pixels, tokens)
    got = jax.device_get(pp.params)
    for key in ("logit_scale", "ve", "vh", "te", "th", "vb", "tb"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-3, atol=2e-5,
            ),
            got[key], want[key],
        )


def test_pipelined_short_token_batches(rng):
    """Token batches shorter than context_length must train (the causal mask
    follows the actual sequence length, like CLIPTextTower)."""
    cfg = tiny_model_config()  # context_length 16
    pp = PipelinedCLIPTrainer(cfg=cfg, mesh=make_pipe_mesh(2, 2), num_micro=2)
    pixels = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    short = rng.integers(1, 100, size=(8, 8)).astype(np.int32)  # t=8 < 16
    loss = pp.train_step(pixels, short)
    assert np.isfinite(loss)
