"""Metric core vs NumPy oracles implementing the reference semantics
(reference geometric_metrics.py:12-111)."""

import numpy as np
import pytest

from image_retrieval_tpu.ops import metrics as M


def oracle_all_metrics(v1, v2):
    """Scalar oracle re-stating reference geometric_metrics.py semantics."""
    v1 = v1.astype(np.float64)
    v2 = v2.astype(np.float64)
    n1, n2 = np.linalg.norm(v1), np.linalg.norm(v2)
    cos = 0.0 if (n1 == 0 or n2 == 0) else float(np.dot(v1, v2) / (n1 * n2))
    d = len(v1)
    return {
        "cosine_similarity": cos,
        "cosine_distance": 1.0 - cos,
        "angular_distance": float(np.arccos(np.clip(cos, -1.0, 1.0))),
        "l1_distance": float(np.sum(np.abs(v1 - v2)) / d),
        "l2_distance": float(np.sqrt(np.sum((v1 - v2) ** 2)) / np.sqrt(d)),
        "linf_distance": float(np.max(np.abs(v1 - v2))),
        "magnitude_difference": float(abs(n1 - n2)),
    }


def test_pairwise_metrics_match_oracle(embeddings_512):
    q = embeddings_512[:4]
    g = embeddings_512[4:20]
    out = M.pairwise_metrics(q, g)
    for i in range(4):
        for j in range(16):
            want = oracle_all_metrics(q[i], g[j])
            for name in M.METRIC_NAMES:
                got = float(out[name][i, j])
                assert got == pytest.approx(want[name], rel=2e-4, abs=1e-3), (name, i, j)


def test_pair_metrics_match_oracle(embeddings_512):
    a = embeddings_512[:16]
    b = embeddings_512[16:32]
    out = M.pair_metrics(a, b)
    for i in range(16):
        want = oracle_all_metrics(a[i], b[i])
        for name in M.METRIC_NAMES:
            assert float(out[name][i]) == pytest.approx(want[name], rel=2e-4, abs=1e-3), name


def test_zero_norm_cosine_is_zero():
    q = np.zeros((1, 8), np.float32)
    g = np.ones((2, 8), np.float32)
    out = M.pairwise_metrics(q, g, metrics=("cosine_similarity", "angular_distance"))
    assert np.all(np.asarray(out["cosine_similarity"]) == 0.0)
    # arccos(0) = pi/2
    assert np.allclose(np.asarray(out["angular_distance"]), np.pi / 2)


def test_blocked_equals_unblocked(rng):
    q = rng.normal(size=(3, 64)).astype(np.float32)
    g = rng.normal(size=(1000, 64)).astype(np.float32)
    full = M.pairwise_metrics(q, g, block_n=4096)
    blocked = M.pairwise_metrics(q, g, block_n=128)
    for name in M.METRIC_NAMES:
        np.testing.assert_allclose(
            np.asarray(full[name]), np.asarray(blocked[name]), rtol=1e-5, atol=1e-6
        )


def test_optimized_similarity_matches_reference_combo(embeddings_512):
    params = {"w_angle": 1.0, "w_l1": 1.0, "w_l2": 1.0, "w_inf": 0.0, "w_mag": 0.5}
    q = embeddings_512[:2]
    g = embeddings_512[2:10]
    got = np.asarray(M.optimized_similarity(q, g, params))
    for i in range(2):
        for j in range(8):
            o = oracle_all_metrics(q[i], g[j])
            want = (
                params["w_angle"] * o["cosine_similarity"]
                - params["w_l1"] * o["l1_distance"]
                - params["w_l2"] * o["l2_distance"]
                - params["w_inf"] * o["linf_distance"]
                - params["w_mag"] * o["magnitude_difference"]
            )
            assert got[i, j] == pytest.approx(want, rel=3e-4, abs=2e-3)


def test_exact_l2_close_to_gram_l2(rng):
    q = rng.normal(size=(2, 512)).astype(np.float32)
    g = rng.normal(size=(32, 512)).astype(np.float32)
    a = M.pairwise_metrics(q, g, metrics=("l2_distance",), exact_l2=True)
    b = M.pairwise_metrics(q, g, metrics=("l2_distance",), exact_l2=False)
    np.testing.assert_allclose(
        np.asarray(a["l2_distance"]), np.asarray(b["l2_distance"]), rtol=2e-3, atol=1e-4
    )


def test_fused_xla_scorer_matches_reference(embeddings_512):
    """fused_optimized_scores_xla vs the unfused optimized_similarity."""
    q = embeddings_512[:3]
    g = embeddings_512[3:35]
    mags = np.linalg.norm(g, axis=1)
    unit = g / mags[:, None]
    weights = (1.0, 1.0, 1.0, 0.25, 0.5)
    got = np.asarray(M.fused_optimized_scores_xla(q, unit, mags, weights))
    params = dict(zip(("w_angle", "w_l1", "w_l2", "w_inf", "w_mag"), weights))
    want = np.asarray(M.optimized_similarity(q, g, params))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
