"""Beyond-HBM streaming sweep (index/streaming.py): exactness vs a NumPy
oracle on the same quantized rows, partial-chunk padding, and agreement with
the resident int8 scoring scheme."""

import numpy as np
import pytest

from image_retrieval_tpu.index.streaming import (
    StreamingGallerySearch,
    quantize_rows_int8,
)


@pytest.fixture(scope="module")
def gallery():
    rng = np.random.default_rng(0)
    rows = rng.normal(size=(5000, 64)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return rows


def _oracle_topk(q8, scales, queries, k):
    """f64 exact cosine over the dequantized-int8 rows."""
    eff = q8.astype(np.float64) * scales[:, None]
    scores = queries.astype(np.float64) @ eff.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_streamed_matches_oracle_across_chunk_sizes(gallery):
    rng = np.random.default_rng(1)
    q = rng.normal(size=(7, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q8, sc = quantize_rows_int8(gallery)
    want_v, want_i = _oracle_topk(q8, sc, q, 10)

    # chunk sizes exercising: single chunk, even split, ragged last chunk
    for chunk in (5000, 1250, 999, 4096):
        eng = StreamingGallerySearch(q8, sc, chunk_rows=chunk)
        vals, idx = eng.search(q, top_k=10)
        assert idx.shape == (7, 10)
        # bf16 scoring can swap near-ties; compare score sets, and require
        # the top-1 to match the oracle exactly
        assert (idx[:, 0] == want_i[:, 0]).all()
        np.testing.assert_allclose(vals, want_v, atol=2e-2)
        overlap = np.mean([
            len(set(idx[r]) & set(want_i[r])) / 10 for r in range(7)
        ])
        assert overlap >= 0.9, (chunk, overlap)


def test_padded_rows_never_surface(gallery):
    """With chunk_rows > N the whole gallery is one padded chunk; padded
    rows (scale 0, masked -inf) must never appear in results."""
    q8, sc = quantize_rows_int8(gallery[:100])
    eng = StreamingGallerySearch(q8, sc, chunk_rows=4096)
    q = gallery[:3]
    vals, idx = eng.search(q, top_k=50)
    assert (idx >= 0).all() and (idx < 100).all()
    assert np.isfinite(vals).all()


def test_top_k_capped_at_n():
    rng = np.random.default_rng(2)
    rows = rng.normal(size=(8, 32)).astype(np.float32)
    q8, sc = quantize_rows_int8(rows)
    eng = StreamingGallerySearch(q8, sc, chunk_rows=3)
    vals, idx = eng.search(rows[:2] / np.linalg.norm(rows[:2], axis=1, keepdims=True), top_k=20)
    assert vals.shape == (2, 8)
    assert sorted(idx[0].tolist()) == list(range(8))


def test_single_query_vector_accepted(gallery):
    q8, sc = quantize_rows_int8(gallery)
    eng = StreamingGallerySearch(q8, sc, chunk_rows=2000)
    v1, i1 = eng.search(gallery[0], top_k=5)
    assert v1.shape == (1, 5)
    assert i1[0, 0] == 0  # a gallery row's own query finds itself first


def test_matches_resident_int8_index_scheme(gallery):
    """The streamed scorer and ShardedVectorIndex's int8 path use the same
    norm-preserving quantization: identical top-1 on identical rows."""
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex

    idx = ShardedVectorIndex(
        dim=64, config=IndexConfig(capacity_step=1024, dtype="int8")
    )
    idx.insert([f"p{i}" for i in range(len(gallery))], gallery)
    rng = np.random.default_rng(3)
    q = rng.normal(size=(5, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    rv, ri = idx.search(q, top_k=5)

    q8, sc = quantize_rows_int8(gallery)
    eng = StreamingGallerySearch(q8, sc, chunk_rows=1000)
    sv, si = eng.search(q, top_k=5)
    assert (np.asarray(ri)[:, 0] == si[:, 0]).all()


def test_index_streamed_tier_matches_resident(gallery):
    """Crossing stream_threshold_bytes flips the index into the streamed
    beyond-HBM tier transparently: same cosine results, same API."""
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex

    paths = [f"p{i}" for i in range(len(gallery))]
    rng = np.random.default_rng(3)
    q = rng.normal(size=(5, 64)).astype(np.float32)

    resident = ShardedVectorIndex(
        dim=64, config=IndexConfig(capacity_step=1024, dtype="int8")
    )
    resident.insert(paths, gallery)
    rv, ri = resident.search(q, top_k=5)

    streamed = ShardedVectorIndex(
        dim=64, config=IndexConfig(capacity_step=1024, dtype="int8",
                                   stream_threshold_bytes=1),
    )
    streamed.insert(paths, gallery)
    sv, si = streamed.search(q, top_k=5)
    assert streamed._stream is not None  # tier actually engaged
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(si))
    np.testing.assert_allclose(np.asarray(rv), np.asarray(sv),
                               rtol=2e-2, atol=2e-3)


def test_index_streamed_tier_respects_tombstones(gallery):
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex

    paths = [f"p{i}" for i in range(len(gallery))]
    idx = ShardedVectorIndex(
        dim=64, config=IndexConfig(capacity_step=1024, dtype="int8",
                                   stream_threshold_bytes=1),
    )
    idx.insert(paths, gallery)
    target = gallery[7] * 3.0
    vals, ids = idx.search(target, top_k=3)
    assert int(ids[0]) == 7
    idx.delete(["p7"])
    vals, ids = idx.search(target, top_k=3)
    assert int(ids[0]) != 7 and 7 not in ids.tolist()


def test_index_streamed_tier_guards_unsupported(gallery):
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex

    idx = ShardedVectorIndex(
        dim=64, config=IndexConfig(capacity_step=1024, dtype="int8",
                                   stream_threshold_bytes=1),
    )
    idx.insert([f"p{i}" for i in range(len(gallery))], gallery)
    q = gallery[0]
    with pytest.raises(ValueError, match="streamed"):
        idx.search(q, top_k=3, metric="l2_distance")
    with pytest.raises(ValueError, match="streamed"):
        idx.multi_metric_topk(q, top_k=3)
    with pytest.raises(ValueError, match="streamed"):
        idx.scores(q)
    # f32 beyond threshold is a config error, told loudly
    f32 = ShardedVectorIndex(
        dim=64, config=IndexConfig(capacity_step=1024,
                                   stream_threshold_bytes=1),
    )
    f32.insert(["a"], gallery[:1])
    with pytest.raises(ValueError, match="int8"):
        f32.search(gallery[0], top_k=1)


def test_index_streamed_tier_disengages_below_threshold(gallery):
    """Dropping back under the threshold (deletes + compact) returns the
    index to the resident path."""
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex

    thr = gallery[:64].nbytes // 2  # int8 gallery bytes = N*D
    idx = ShardedVectorIndex(
        dim=64, config=IndexConfig(capacity_step=16, dtype="int8",
                                   stream_threshold_bytes=2048),
    )
    idx.insert([f"p{i}" for i in range(64)], gallery[:64])  # 4096 B > thr
    idx.search(gallery[0], top_k=1)
    assert idx._stream is not None
    idx.delete([f"p{i}" for i in range(48)])
    idx.compact()  # 16 rows = 1024 B < thr
    vals, ids = idx.search(gallery[50] * 2.0, top_k=1)
    assert idx._stream is None and idx.paths[int(ids[0])] == "p50"
