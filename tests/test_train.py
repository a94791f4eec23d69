"""Sharded contrastive training: dp x tp on an 8-device virtual mesh."""

import numpy as np
import pytest
import jax

from image_retrieval_tpu.config import MeshConfig
from image_retrieval_tpu.parallel.mesh import make_mesh
from image_retrieval_tpu.train.trainer import CLIPTrainer, clip_contrastive_loss
from tests.test_models import tiny_model_config


def test_contrastive_loss_identity_alignment():
    import jax.numpy as jnp

    # perfectly aligned pairs -> low loss; shuffled -> higher
    logits_good = jnp.eye(4) * 10.0
    logits_bad = jnp.roll(jnp.eye(4) * 10.0, 1, axis=1)
    assert float(clip_contrastive_loss(logits_good)) < 0.01
    assert float(clip_contrastive_loss(logits_bad)) > 1.0


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_train_step_runs_on_mesh(rng, mesh_shape):
    data, model = mesh_shape
    mesh = make_mesh(MeshConfig(data=data, model=model))
    cfg = tiny_model_config()
    trainer = CLIPTrainer(cfg=cfg, mesh=mesh, learning_rate=1e-3)
    b = 8
    pixels = rng.normal(size=(b, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, 100, size=(b, 16)).astype(np.int32)
    tokens[:, 0] = 49406
    tokens[:, -1] = 49407
    l1 = trainer.train_step(pixels, tokens)
    l2 = trainer.train_step(pixels, tokens)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1  # same batch twice -> loss decreases


def test_tp_params_actually_sharded(rng):
    mesh = make_mesh(MeshConfig(data=2, model=4))
    cfg = tiny_model_config()
    trainer = CLIPTrainer(cfg=cfg, mesh=mesh)
    fc1 = trainer.params["params"]["vision"]["block_0"]["mlp"]["fc1"]["kernel"]
    spec = fc1.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, "model")
    fc2 = trainer.params["params"]["vision"]["block_0"]["mlp"]["fc2"]["kernel"]
    assert fc2.sharding.spec == jax.sharding.PartitionSpec("model", None)


def test_dp_tp_losses_agree(rng):
    """Same data, different mesh layouts -> same loss trajectory."""
    cfg = tiny_model_config()
    b = 8
    pixels = rng.normal(size=(b, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, 100, size=(b, 16)).astype(np.int32)
    losses = {}
    for shape in [(8, 1), (2, 4)]:
        mesh = make_mesh(MeshConfig(data=shape[0], model=shape[1]))
        tr = CLIPTrainer(cfg=cfg, mesh=mesh, seed=0)
        losses[shape] = [tr.train_step(pixels, tokens) for _ in range(2)]
    np.testing.assert_allclose(losses[(8, 1)], losses[(2, 4)], rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax
    mesh = make_mesh(MeshConfig(data=8, model=1))
    cfg = tiny_model_config()
    tr = CLIPTrainer(cfg=cfg, mesh=mesh, seed=0)
    pixels = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, 100, size=(8, 16)).astype(np.int32)
    tr.train_step(pixels, tokens)
    ckpt = str(tmp_path / "ckpt")
    tr.save_checkpoint(ckpt)
    loss_before = tr.train_step(pixels, tokens)

    tr2 = CLIPTrainer(cfg=cfg, mesh=mesh, seed=1)  # different init
    tr2.restore_checkpoint(ckpt)
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        pass  # params advanced one step past ckpt; compare via loss instead
    loss_restored = tr2.train_step(pixels, tokens)
    assert loss_restored == pytest.approx(loss_before, abs=1e-5)


def test_remat_training_matches_no_remat(rng):
    import dataclasses

    mesh = make_mesh(MeshConfig(data=8, model=1))
    cfg = tiny_model_config()
    cfg_remat = dataclasses.replace(cfg, remat=True)
    pixels = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, 100, size=(8, 16)).astype(np.int32)
    l_plain = CLIPTrainer(cfg=cfg, mesh=mesh, seed=0).train_step(pixels, tokens)
    l_remat = CLIPTrainer(cfg=cfg_remat, mesh=mesh, seed=0).train_step(pixels, tokens)
    assert l_remat == pytest.approx(l_plain, rel=1e-5)


def test_finetune_on_color_dataset(tmp_path, rng):
    """End-to-end trainability: synthetic dataset -> captioned contrastive
    batches -> loss decreases."""
    import dataclasses
    from image_retrieval_tpu.data.dataset import prepare_color_dataset
    from image_retrieval_tpu.train.data import finetune_on_color_dataset

    base = str(tmp_path / "ds")
    prepare_color_dataset(base_dir=base, num_examples=2)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    cfg = dataclasses.replace(tiny_model_config(), image_size=224, patch_size=32)
    tr = CLIPTrainer(cfg=cfg, mesh=mesh, learning_rate=3e-4)
    losses = finetune_on_color_dataset(tr, base, batch_size=16, steps=6)
    assert len(losses) == 6
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # learning happens
