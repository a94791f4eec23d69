"""Fused Pallas kernel vs the pure-JAX metrics reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from image_retrieval_tpu.ops import metrics as M
from image_retrieval_tpu.ops.pallas_kernels import (
    PLANES,
    fused_all_metrics,
    fused_optimized_scores,
)


def _setup(rng, n=256, d=128, q=3):
    emb = rng.normal(size=(n, d)).astype(np.float32) * rng.uniform(
        0.5, 4.0, (n, 1)
    ).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1)
    unit = emb / mags[:, None]
    queries = rng.normal(size=(q, d)).astype(np.float32)
    return queries, unit, mags, emb


def test_fused_all_metrics_matches_reference(rng):
    queries, unit, mags, emb = _setup(rng)
    planes = np.asarray(fused_all_metrics(jnp.asarray(queries), jnp.asarray(unit),
                                          jnp.asarray(mags), block_n=64))
    ref = M.pairwise_metrics(queries, emb, metrics=PLANES, exact_l2=True)
    for k, name in enumerate(PLANES):
        np.testing.assert_allclose(
            planes[k], np.asarray(ref[name]), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_fused_optimized_scores_matches_reference(rng):
    queries, unit, mags, emb = _setup(rng, q=2)
    w = np.array([1.0, 1.0, 1.0, 0.0, 0.5], np.float32)
    got = np.asarray(
        fused_optimized_scores(
            jnp.asarray(queries), jnp.asarray(unit), jnp.asarray(mags),
            jnp.asarray(w), block_n=64,
        )
    )
    params = {"w_angle": 1.0, "w_l1": 1.0, "w_l2": 1.0, "w_inf": 0.0, "w_mag": 0.5}
    want = np.asarray(M.optimized_similarity(queries, emb, params))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_fused_zero_norm_query(rng):
    _, unit, mags, _ = _setup(rng, n=64, q=1)
    q0 = np.zeros((1, 128), np.float32)
    planes = np.asarray(fused_all_metrics(jnp.asarray(q0), jnp.asarray(unit),
                                          jnp.asarray(mags), block_n=64))
    assert np.all(planes[0] == 0.0)  # cosine_similarity -> 0 on zero norm


def test_fused_kernels_pad_ragged_gallery(rng):
    """N not divisible by block_n exercises the internal padding path."""
    queries, unit, mags, emb = _setup(rng, n=150, d=128, q=2)
    planes = np.asarray(fused_all_metrics(jnp.asarray(queries), jnp.asarray(unit),
                                          jnp.asarray(mags), block_n=64))
    assert planes.shape == (5, 2, 150)
    ref = M.pairwise_metrics(queries, emb, metrics=PLANES, exact_l2=True)
    for k, name in enumerate(PLANES):
        np.testing.assert_allclose(planes[k], np.asarray(ref[name]),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
    w = np.array([0.5, 1.0, 0.2, 0.1, 0.3], np.float32)
    got = np.asarray(fused_optimized_scores(
        jnp.asarray(queries), jnp.asarray(unit), jnp.asarray(mags),
        jnp.asarray(w), block_n=64))
    assert got.shape == (2, 150)
