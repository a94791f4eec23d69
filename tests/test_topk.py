"""Top-k ranking parity vs NumPy brute force (BASELINE.md parity target)."""

import numpy as np

from image_retrieval_tpu.ops.topk import exact_topk, merge_topk, topk_for_metric


def np_topk(scores, k, descending=True):
    s = scores if descending else -scores
    # argsort by (-score, index): stable mergesort on negated scores.
    order = np.argsort(-s, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(scores, order, axis=-1), order


def test_topk_matches_numpy(rng):
    scores = rng.normal(size=(4, 1000)).astype(np.float32)
    for descending in (True, False):
        v, i = exact_topk(scores, 10, descending=descending)
        wv, wi = np_topk(scores, 10, descending=descending)
        np.testing.assert_array_equal(np.asarray(i), wi)
        np.testing.assert_array_equal(np.asarray(v), wv)


def test_topk_tie_break_lowest_index():
    scores = np.array([[1.0, 5.0, 5.0, 5.0, 0.0]], np.float32)
    v, i = exact_topk(scores, 3, descending=True)
    assert i.tolist() == [[1, 2, 3]]
    scores = np.array([[2.0, 1.0, 1.0, 3.0]], np.float32)
    v, i = exact_topk(scores, 3, descending=False)
    assert i.tolist() == [[1, 2, 0]]


def test_metric_direction():
    scores = np.array([[0.1, 0.9, 0.5]], np.float32)
    _, i = topk_for_metric(scores, 1, "cosine_similarity")
    assert i.tolist() == [[1]]
    _, i = topk_for_metric(scores, 1, "l2_distance")
    assert i.tolist() == [[0]]


def test_merge_topk_equals_global(rng):
    scores = rng.normal(size=(2, 512)).astype(np.float32)
    a, b = scores[:, :256], scores[:, 256:]
    va, ia = exact_topk(a, 10)
    vb, ib = exact_topk(b, 10)
    v, i = merge_topk(va, ia, vb, np.asarray(ib) + 256, 10)
    wv, wi = np_topk(scores, 10)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(v), wv)


def test_merge_topk_cross_shard_ties():
    a = np.array([[5.0, 1.0]], np.float32)
    b = np.array([[5.0, 5.0]], np.float32)
    va, ia = exact_topk(a, 2)
    vb, ib = exact_topk(b, 2)
    v, i = merge_topk(va, ia, vb, np.asarray(ib) + 2, 3)
    # Ties resolve to lowest global index: 0 (5.0), 2 (5.0), 3 (5.0)
    assert i.tolist() == [[0, 2, 3]]
