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


def test_fused_optimized_topk_matches_oracle(rng):
    """In-kernel block top-k (scores never materialize (Q, N) in HBM):
    exact index parity with an f64 reference-semantics oracle, including
    ascending-index tie-break order and ragged-gallery padding."""
    from image_retrieval_tpu.ops.pallas_kernels import fused_optimized_topk

    n, d, k = 3000, 64, 7  # 3000 % 512 != 0: exercises capacity masking
    emb = rng.normal(size=(n, d)).astype(np.float32) * rng.uniform(
        0.5, 2, (n, 1)
    ).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1).astype(np.float32)
    unit = emb / mags[:, None]
    q = rng.normal(size=(2, d)).astype(np.float32)
    w = (1.0, 1.0, 1.0, 0.3, 0.5)

    vals, idx = fused_optimized_topk(
        jnp.asarray(q), jnp.asarray(unit), jnp.asarray(mags), w,
        k=k, block_n=512,
    )
    rows = (unit * mags[:, None]).astype(np.float64)
    q64 = q.astype(np.float64)
    qn = np.linalg.norm(q64, axis=1, keepdims=True)
    cos = (q64 @ rows.T) / (qn * np.linalg.norm(rows, axis=1)[None, :])
    diff = rows[None] - q64[:, None, :]
    ad = np.abs(diff)
    s = (
        w[0] * cos
        - w[1] * ad.sum(-1) / d
        - w[2] * np.sqrt((diff**2).sum(-1)) / np.sqrt(d)
        - w[3] * ad.max(-1)
        - w[4] * np.abs(np.linalg.norm(rows, axis=1)[None, :] - qn)
    )
    oracle = np.argsort(-s, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), oracle)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(s, oracle, 1), atol=1e-4
    )


def test_fused_optimized_topk_bf16_gallery(rng):
    """bf16 gallery mode (half the HBM sweep): top-k overlaps the f32 result
    >= 90% on well-separated data."""
    from image_retrieval_tpu.ops.pallas_kernels import fused_optimized_topk

    n, d, k = 2048, 64, 10
    emb = rng.normal(size=(n, d)).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1).astype(np.float32)
    unit = emb / mags[:, None]
    q = rng.normal(size=(1, d)).astype(np.float32)
    w = (1.0, 0.5, 0.5, 0.0, 0.2)
    _, i32 = fused_optimized_topk(
        jnp.asarray(q), jnp.asarray(unit), jnp.asarray(mags), w,
        k=k, block_n=512,
    )
    _, i16 = fused_optimized_topk(
        jnp.asarray(q), jnp.asarray(unit).astype(jnp.bfloat16),
        jnp.asarray(mags), w, k=k, block_n=512,
    )
    assert i32[0, 0] == i16[0, 0]
    assert len(set(np.asarray(i16)[0].tolist()) & set(np.asarray(i32)[0].tolist())) >= 9


def test_int8_pallas_scorer_matches_xla_int8(rng):
    """Single-read int8 Pallas scorer is numerically faithful to the XLA
    int8 scorer (same bf16 MXU dot + Gram L2 + bf16 L1/Linf formulation).
    Kept as a measured demonstration: 5.8 ms vs XLA's 1.40 ms at 1M on v5e
    (ARCHITECTURE.md) — XLA stays the production path."""
    from image_retrieval_tpu.ops.metrics import fused_optimized_scores_int8
    from image_retrieval_tpu.ops.pallas_kernels import (
        fused_optimized_scores_int8_pallas,
    )

    n, d = 1500, 64  # ragged vs block_n: exercises padding
    unit = rng.normal(size=(n, d)).astype(np.float32)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    grid = np.maximum(np.abs(unit).max(1), 1e-12) / 127.0
    g8 = np.clip(np.rint(unit / grid[:, None]), -127, 127).astype(np.int8)
    sc = (1.0 / np.linalg.norm(g8.astype(np.float32), axis=1)).astype(np.float32)
    mags = rng.uniform(0.5, 2.0, n).astype(np.float32)
    q = rng.normal(size=(2, d)).astype(np.float32)
    for w in ((1.0, 1.0, 1.0, 0.0, 0.5), (1.0, 0.0, 1.0, 0.4, 0.0)):
        a = np.asarray(fused_optimized_scores_int8(q, g8, sc, mags, w))
        b = np.asarray(
            fused_optimized_scores_int8_pallas(
                jnp.asarray(q), jnp.asarray(g8), jnp.asarray(sc),
                jnp.asarray(mags), w, block_n=512,
            )
        )
        np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4)


def test_int8_pallas_scorer_v2_matches_xla_int8(rng):
    """The VPU-minimal v2 rewrite (hoisted dequant, native bf16 reductions)
    must stay numerically identical to the XLA int8 scorer — same bf16 MXU
    dot, Gram L2, bf16 |diff| sweep with f32 accumulation."""
    from image_retrieval_tpu.ops.metrics import fused_optimized_scores_int8
    from image_retrieval_tpu.ops.pallas_kernels import (
        fused_optimized_scores_int8_pallas_v2,
    )

    n, d = 1500, 64  # ragged vs block_n: exercises padding
    unit = rng.normal(size=(n, d)).astype(np.float32)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    grid = np.maximum(np.abs(unit).max(1), 1e-12) / 127.0
    g8 = np.clip(np.rint(unit / grid[:, None]), -127, 127).astype(np.int8)
    sc = (1.0 / np.linalg.norm(g8.astype(np.float32), axis=1)).astype(np.float32)
    mags = rng.uniform(0.5, 2.0, n).astype(np.float32)
    q = rng.normal(size=(3, d)).astype(np.float32)
    for w in ((1.0, 1.0, 1.0, 0.0, 0.5), (1.0, 0.0, 1.0, 0.4, 0.0),
              (1.0, 0.0, 1.0, 0.0, 0.5)):
        a = np.asarray(fused_optimized_scores_int8(q, g8, sc, mags, w))
        b = np.asarray(
            fused_optimized_scores_int8_pallas_v2(
                jnp.asarray(q), jnp.asarray(g8), jnp.asarray(sc),
                jnp.asarray(mags), w, block_n=512,
            )
        )
        np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4)
