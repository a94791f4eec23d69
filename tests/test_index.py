"""Sharded index: ranking parity vs NumPy brute force on an 8-device mesh."""

import numpy as np
import pytest

import jax

from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.parallel.mesh import make_mesh
from image_retrieval_tpu.config import MeshConfig, IndexConfig


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=8, model=1))


def make_index(mesh, rng, n=500, dim=64):
    emb = rng.normal(size=(n, dim)).astype(np.float32) * rng.uniform(
        0.5, 3.0, (n, 1)
    ).astype(np.float32)
    paths = [f"img_{i}.jpg" for i in range(n)]
    idx = ShardedVectorIndex(dim=dim, mesh=mesh, config=IndexConfig(capacity_step=64))
    idx.insert(paths, emb)
    return idx, emb, paths


def np_cosine(q, g):
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=-1, keepdims=True)
    return qn @ gn.T


def test_mesh_has_8_devices(mesh):
    assert mesh.shape["data"] == 8
    assert jax.device_count() >= 8


def test_cosine_topk_parity(mesh, rng):
    idx, emb, paths = make_index(mesh, rng)
    q = rng.normal(size=(3, 64)).astype(np.float32)
    vals, ids = idx.search(q, top_k=10)
    ref = np_cosine(q.astype(np.float64), emb.astype(np.float64))
    ref_order = np.argsort(-ref, axis=-1, kind="stable")[:, :10]
    np.testing.assert_array_equal(ids, ref_order)
    np.testing.assert_allclose(vals, np.take_along_axis(ref, ref_order, -1), rtol=1e-4, atol=1e-5)


def test_distance_metric_ascending(mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=200)
    q = rng.normal(size=(64,)).astype(np.float32)
    vals, ids = idx.search(q, top_k=5, metric="l2_distance")
    diff = emb.astype(np.float64) - q.astype(np.float64)
    ref = np.sqrt((diff**2).sum(-1)) / np.sqrt(64)
    order = np.argsort(ref, kind="stable")[:5]
    np.testing.assert_array_equal(ids, order)
    np.testing.assert_allclose(vals, ref[order], rtol=1e-4, atol=1e-5)
    assert np.all(np.diff(vals) >= 0)


def test_optimized_similarity_uses_magnitudes(mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=100)
    q = rng.normal(size=(64,)).astype(np.float32)
    params = {"w_angle": 1.0, "w_l1": 1.0, "w_l2": 1.0, "w_inf": 0.0, "w_mag": 0.5}
    vals, ids = idx.search(q, top_k=5, metric="optimized_similarity", params=params)
    # Host oracle against ORIGINAL (unnormalized) embeddings, as the reference
    # reranks with unnormalized vectors (image_search.py:103-107).
    e = emb.astype(np.float64)
    qq = q.astype(np.float64)
    cos = np_cosine(qq[None], e)[0]
    l1 = np.abs(e - qq).sum(-1) / 64
    l2 = np.sqrt(((e - qq) ** 2).sum(-1)) / np.sqrt(64)
    mag = np.abs(np.linalg.norm(e, axis=-1) - np.linalg.norm(qq))
    score = cos - l1 - l2 - 0.5 * mag
    order = np.argsort(-score, kind="stable")[:5]
    np.testing.assert_array_equal(ids, order)
    np.testing.assert_allclose(vals, score[order], rtol=1e-3, atol=1e-3)


def test_search_paths_result_shape(mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=50)
    res = idx.search_paths(emb[7], top_k=3)
    assert res[0]["path"] == "img_7.jpg"  # self-match first
    assert res[0]["score"] == pytest.approx(1.0, abs=1e-5)
    assert set(res[0].keys()) == {"path", "score"}


def test_incremental_insert_and_growth(mesh, rng):
    idx = ShardedVectorIndex(dim=32, mesh=mesh, config=IndexConfig(capacity_step=16))
    for batch in range(4):
        emb = rng.normal(size=(30, 32)).astype(np.float32)
        idx.insert([f"b{batch}_{i}" for i in range(30)], emb)
    assert len(idx) == 120
    q = rng.normal(size=(32,)).astype(np.float32)
    vals, ids = idx.search(q, top_k=120)
    assert len(set(ids.tolist())) == 120  # no padded rows leak into results


def test_query_roundtrip(mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=20)
    rec = idx.reconstruct_original_embeddings(limit=20)
    for i, (p, e) in enumerate(rec):
        assert p == paths[i]
        np.testing.assert_allclose(e, emb[i], rtol=1e-5, atol=1e-5)


def test_save_load_roundtrip(tmp_path, mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=40)
    f = str(tmp_path / "index.npz")
    idx.save(f)
    idx2 = ShardedVectorIndex.load_from(f, mesh=mesh)
    q = rng.normal(size=(64,)).astype(np.float32)
    v1, i1 = idx.search(q, top_k=5)
    v2, i2 = idx2.search(q, top_k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_scores_full_matrix(mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=100)
    q = rng.normal(size=(2, 64)).astype(np.float32)
    s = idx.scores(q)
    ref = np_cosine(q.astype(np.float64), emb.astype(np.float64))
    np.testing.assert_allclose(s, ref, rtol=1e-4, atol=1e-5)


def test_multi_metric_topk_one_pass(mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=300)
    q = rng.normal(size=(64,)).astype(np.float32)
    out = idx.multi_metric_topk(q, top_k=7)
    assert set(out.keys()) == {
        "cosine_similarity", "l1_distance", "l2_distance",
        "linf_distance", "magnitude_difference",
    }
    e = emb.astype(np.float64)
    qq = q.astype(np.float64)
    refs = {
        "cosine_similarity": (np_cosine(qq[None], e)[0], True),
        "l1_distance": (np.abs(e - qq).sum(-1) / 64, False),
        "l2_distance": (np.sqrt(((e - qq) ** 2).sum(-1)) / np.sqrt(64), False),
        "linf_distance": (np.abs(e - qq).max(-1), False),
        "magnitude_difference": (
            np.abs(np.linalg.norm(e, axis=-1) - np.linalg.norm(qq)), False),
    }
    for name, (ref, descending) in refs.items():
        vals, ids = out[name]
        order = np.argsort(-ref if descending else ref, kind="stable")[:7]
        np.testing.assert_array_equal(ids, order, err_msg=name)
        np.testing.assert_allclose(vals, ref[order], rtol=1e-3, atol=1e-4,
                                   err_msg=name)


def test_bf16_gallery_mode(mesh, rng):
    """bfloat16 storage: half the HBM traffic, near-identical rankings."""
    emb = rng.normal(size=(200, 64)).astype(np.float32)
    paths = [f"i{i}" for i in range(200)]
    f32 = ShardedVectorIndex(dim=64, mesh=mesh, config=IndexConfig(capacity_step=64))
    bf16 = ShardedVectorIndex(
        dim=64, mesh=mesh, config=IndexConfig(capacity_step=64, dtype="bfloat16")
    )
    f32.insert(paths, emb)
    bf16.insert(paths, emb)
    q = rng.normal(size=(64,)).astype(np.float32)
    v32, i32 = f32.search(q, top_k=5)
    v16, i16 = bf16.search(q, top_k=5)
    # top-1 agrees on well-separated random data; scores within bf16 epsilon
    assert i16[0] == i32[0]
    np.testing.assert_allclose(v16, v32, rtol=2e-2, atol=2e-2)
    assert set(i16.tolist()) & set(i32.tolist())  # heavy overlap expected


def test_int8_gallery_mode(mesh, rng):
    """int8 quantized storage: 4x less HBM traffic, near-identical rankings."""
    emb = rng.normal(size=(160, 64)).astype(np.float32) * rng.uniform(
        0.5, 2.0, (160, 1)
    ).astype(np.float32)
    paths = [f"i{i}" for i in range(160)]
    f32 = ShardedVectorIndex(dim=64, mesh=mesh, config=IndexConfig(capacity_step=64))
    q8 = ShardedVectorIndex(
        dim=64, mesh=mesh, config=IndexConfig(capacity_step=64, dtype="int8")
    )
    f32.insert(paths, emb)
    q8.insert(paths, emb)
    q = rng.normal(size=(64,)).astype(np.float32)
    v32, i32 = f32.search(q, top_k=5)
    v8, i8 = q8.search(q, top_k=5)
    assert i8[0] == i32[0]
    np.testing.assert_allclose(v8, v32, rtol=2e-2, atol=2e-2)
    # optimized metric works through dequantization too
    params = {"w_angle": 1.0, "w_l1": 1.0, "w_l2": 0.5, "w_inf": 0.0, "w_mag": 0.2}
    vo32, io32 = f32.search(q, top_k=3, metric="optimized_similarity", params=params)
    vo8, io8 = q8.search(q, top_k=3, metric="optimized_similarity", params=params)
    assert io8[0] == io32[0]
    np.testing.assert_allclose(vo8, vo32, rtol=5e-2, atol=5e-2)
    # host round-trips dequantize (unit vectors within quantization error)
    rec = q8.query(limit=3)
    np.testing.assert_allclose(
        np.linalg.norm(rec[0][1]), 1.0, atol=2e-2
    )


def test_int8_norm_preserving_scales(mesh, rng):
    """int8 dequantized unit rows are EXACTLY unit norm (the scale folds the
    quantization-grid norm error back in), which the fused int8 scorer's
    Gram-form L2 relies on."""
    emb = rng.normal(size=(96, 64)).astype(np.float32) * rng.uniform(
        0.5, 2.0, (96, 1)
    ).astype(np.float32)
    q8 = ShardedVectorIndex(
        dim=64, mesh=mesh, config=IndexConfig(capacity_step=64, dtype="int8")
    )
    q8.insert([f"i{i}" for i in range(96)], emb)
    deq = q8._host_gallery[:96].astype(np.float32) * q8._host_scales[:96, None]
    np.testing.assert_allclose(np.linalg.norm(deq, axis=1), 1.0, rtol=1e-6)


def test_int8_fused_optimized_scorer_vs_f64_oracle(mesh, rng):
    """fused_optimized_scores_int8 (bf16 MXU dot + Gram L2 + bf16 L1/Linf
    sweep) matches an f64 reference-semantics oracle computed on the SAME
    dequantized rows — all five weights live, so every branch runs."""
    from image_retrieval_tpu.ops.metrics import fused_optimized_scores_int8

    n, d = 160, 64
    emb = rng.normal(size=(n, d)).astype(np.float32) * rng.uniform(
        0.5, 2.0, (n, 1)
    ).astype(np.float32)
    q8 = ShardedVectorIndex(
        dim=d, mesh=mesh, config=IndexConfig(capacity_step=64, dtype="int8")
    )
    q8.insert([f"i{i}" for i in range(n)], emb)
    qs = rng.normal(size=(3, d)).astype(np.float32)
    weights = (1.0, 1.0, 1.0, 0.7, 0.5)

    got = np.asarray(
        fused_optimized_scores_int8(
            qs,
            q8._host_gallery[:n],
            q8._host_scales[:n],
            q8._host_mags[:n],
            weights,
        )
    )

    # f64 oracle, reference geometric_metrics.py:60-94 semantics, on the
    # reconstructed (dequantized * magnitude) rows
    rows = (
        q8._host_gallery[:n].astype(np.float64)
        * q8._host_scales[:n, None]
        * q8._host_mags[:n, None]
    )
    q64 = qs.astype(np.float64)
    qn = np.linalg.norm(q64, axis=1, keepdims=True)
    cos = (q64 @ rows.T) / (qn * np.linalg.norm(rows, axis=1)[None, :])
    diff = rows[None] - q64[:, None, :]
    ad = np.abs(diff)
    w_angle, w_l1, w_l2, w_inf, w_mag = weights
    want = (
        w_angle * cos
        - w_l1 * ad.sum(-1) / d
        - w_l2 * np.sqrt((diff**2).sum(-1)) / np.sqrt(d)
        - w_inf * ad.max(-1)
        - w_mag * np.abs(np.linalg.norm(rows, axis=1)[None, :] - qn)
    )
    # bf16 sweeps bound the error at ~1e-2 absolute on O(1) scores
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)
    # rankings: top-1 identical, top-5 heavy overlap per query
    for r in range(3):
        oracle_top = np.argsort(-want[r], kind="stable")[:5]
        got_top = np.argsort(-got[r], kind="stable")[:5]
        assert got_top[0] == oracle_top[0]
        assert len(set(got_top) & set(oracle_top)) >= 4


def test_delete_tombstones(mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=50)
    q = emb[7].astype(np.float32)
    vals, ids = idx.search(q, top_k=1)
    assert idx.paths[int(ids[0])] == "img_7.jpg"
    assert idx.delete(["img_7.jpg", "img_8.jpg", "nonexistent"]) == 2
    assert idx.live_count == 48
    vals2, ids2 = idx.search(q, top_k=50)
    assert len(ids2) == 48  # k clamps to live rows
    returned = {idx.paths[int(i)] for i in ids2}
    assert "img_7.jpg" not in returned and "img_8.jpg" not in returned
    assert np.isfinite(vals2).all()


def test_error_paths(mesh, rng):
    idx = ShardedVectorIndex(dim=16, mesh=mesh, config=IndexConfig(capacity_step=8))
    with pytest.raises(ValueError):
        idx.search(np.zeros(16, np.float32), top_k=1)  # empty index
    with pytest.raises(AssertionError):
        idx.insert(["a"], rng.normal(size=(1, 8)).astype(np.float32))  # dim mismatch
    idx.insert(["only"], rng.normal(size=(1, 16)).astype(np.float32))
    vals, ids = idx.search(rng.normal(size=16).astype(np.float32), top_k=5)
    assert len(ids) == 1  # k clamps to size


def test_compact_reclaims_tombstones(mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=40)
    idx.delete([f"img_{i}.jpg" for i in range(0, 40, 2)])  # delete evens
    assert idx.live_count == 20
    q = emb[7].astype(np.float32)  # odd index survives
    v_before, i_before = idx.search(q, top_k=5)
    paths_before = [idx.paths[int(i)] for i in i_before]
    assert idx.compact() == 20
    assert idx.count == 20 and idx.live_count == 20
    v_after, i_after = idx.search(q, top_k=5)
    assert [idx.paths[int(i)] for i in i_after] == paths_before
    np.testing.assert_allclose(v_after, v_before, rtol=1e-6)
    assert idx.compact() == 0  # idempotent


def test_deletes_survive_save_load(tmp_path, mesh, rng):
    idx, emb, paths = make_index(mesh, rng, n=30)
    idx.delete(["img_3.jpg", "img_4.jpg"])
    f = str(tmp_path / "deleted.npz")
    idx.save(f)
    idx2 = ShardedVectorIndex.load_from(f, mesh=mesh)
    assert len(idx2) == 28
    assert "img_3.jpg" not in idx2.paths and "img_4.jpg" not in idx2.paths


def test_query_batch_bucketing_reuses_compiles(mesh, rng):
    """Distinct query-batch sizes snap to a bucket (padded with zero rows,
    sliced from results), so the micro-batching server doesn't pay a jit
    compile per batch size — and padding is invisible in the results."""
    from image_retrieval_tpu.parallel.collectives import sharded_search_topk

    idx, emb, paths = make_index(mesh, rng, n=100)
    before = sharded_search_topk._cache_size()
    q3 = rng.normal(size=(3, 64)).astype(np.float32)
    q5 = rng.normal(size=(5, 64)).astype(np.float32)
    v3, i3 = idx.search(q3, top_k=4)
    v5, i5 = idx.search(q5, top_k=4)
    assert v3.shape == (3, 4) and v5.shape == (5, 4)
    # both bucketed to Q=8: exactly ONE new executable
    assert sharded_search_topk._cache_size() == before + 1
    # padding rows don't perturb real results: row-wise parity vs oracle
    oracle = np_cosine(q5, emb)
    want = np.argsort(-oracle, axis=1, kind="stable")[:, :4]
    np.testing.assert_array_equal(i5, want)


def test_make_mesh_rejects_zero_data_axis():
    """model > device count with data=-1 must raise, not build a 0-device
    mesh (data = n // model == 0 used to slip past validation)."""
    with pytest.raises(ValueError, match="needs"):
        make_mesh(MeshConfig(data=-1, model=1024))


def test_save_load_roundtrip_without_npz_suffix(tmp_path):
    """save('gallery') / load_from('gallery') must round-trip even though
    np.savez appends .npz (the sidecar is keyed off the final filename)."""
    idx = ShardedVectorIndex(dim=16, config=IndexConfig(capacity_step=8))
    emb = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    idx.insert([f"p{i}" for i in range(5)], emb)
    base = str(tmp_path / "gallery")  # no .npz suffix
    idx.save(base)
    idx2 = ShardedVectorIndex.load_from(base)
    assert idx2.paths == idx.paths
    assert len(idx2) == 5


def test_query_excludes_tombstones():
    """Milvus parity: query() never returns deleted entities."""
    idx = ShardedVectorIndex(dim=8, config=IndexConfig(capacity_step=8))
    emb = np.eye(8, dtype=np.float32)[:4]
    idx.insert([f"p{i}" for i in range(4)], emb)
    idx.delete(["p1"])
    got = [p for p, _ in idx.query(limit=100)]
    assert got == ["p0", "p2", "p3"]
    gotm = [p for p, _, _ in idx.query(limit=100, with_magnitude=True)]
    assert gotm == ["p0", "p2", "p3"]
    rec = [p for p, _ in idx.reconstruct_original_embeddings(limit=100)]
    assert rec == ["p0", "p2", "p3"]


def test_insert_path_row_mismatch_raises():
    idx = ShardedVectorIndex(dim=8, config=IndexConfig(capacity_step=8))
    with np.testing.assert_raises(ValueError):
        idx.insert(["only-one"], np.zeros((2, 8), np.float32))


def test_int8_shadow_scorer_bitwise_matches_int8(mesh, rng):
    """The pre-dequantized bf16 shadow path must be BIT-IDENTICAL to the
    in-sweep dequant path: bf16 multiply rounds the same whether the
    product is stored once (make_l1_shadow) or recomputed per element."""
    from image_retrieval_tpu.ops.metrics import (
        fused_optimized_scores_int8,
        fused_optimized_scores_int8_shadow,
        make_l1_shadow,
    )

    n, d = 160, 64
    emb = rng.normal(size=(n, d)).astype(np.float32) * rng.uniform(
        0.5, 2.0, (n, 1)
    ).astype(np.float32)
    q8 = ShardedVectorIndex(
        dim=d, mesh=mesh, config=IndexConfig(capacity_step=64, dtype="int8")
    )
    q8.insert([f"i{i}" for i in range(n)], emb)
    qs = rng.normal(size=(3, d)).astype(np.float32)
    g8 = q8._host_gallery[:n]
    sc = q8._host_scales[:n]
    mg = q8._host_mags[:n]
    shadow = make_l1_shadow(g8, sc, mg)
    for w in ((1.0, 1.0, 1.0, 0.7, 0.5), (1.0, 1.0, 0.0, 0.0, 0.0),
              (1.0, 0.0, 1.0, 0.0, 0.5)):
        a = np.asarray(fused_optimized_scores_int8(qs, g8, sc, mg, w))
        b = np.asarray(
            fused_optimized_scores_int8_shadow(qs, g8, sc, mg, shadow, w)
        )
        np.testing.assert_array_equal(a, b)


def test_l1_shadow_flag_bitwise_identical_search(mesh, rng):
    """IndexConfig.l1_shadow=True must return BIT-identical results for
    every metric (the shadow only changes where the optimized L1 sweep's
    dequant multiply happens), including after deletes."""
    n, d = 160, 64
    emb = rng.normal(size=(n, d)).astype(np.float32) * rng.uniform(
        0.5, 2.0, (n, 1)
    ).astype(np.float32)
    paths = [f"i{i}" for i in range(n)]

    def build(flag):
        ix = ShardedVectorIndex(
            dim=d, mesh=mesh,
            config=IndexConfig(capacity_step=64, dtype="int8", l1_shadow=flag),
        )
        ix.insert(paths, emb)
        ix.delete([f"i{i}" for i in range(0, n, 7)])
        return ix

    a, b = build(False), build(True)
    b.load()
    import jax.numpy as jnp
    assert b._shadow is not None and b._shadow.dtype == jnp.bfloat16
    qs = rng.normal(size=(3, d)).astype(np.float32)
    params = {"w_angle": 1.0, "w_l1": 1.0, "w_l2": 1.0, "w_inf": 0.3,
              "w_mag": 0.5}
    for metric, p in (("optimized_similarity", params),
                      ("cosine_similarity", None),
                      ("l1_distance", None)):
        va, ia = a.search(qs, top_k=9, metric=metric, params=p)
        vb, ib = b.search(qs, top_k=9, metric=metric, params=p)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(va, vb)


def test_approx_select_flag(mesh, rng):
    """config.approx_select=True routes selection through approx_max_k /
    approx_min_k (true scores, approximate candidate SET). Off-TPU the
    approx primitives lower to exact top-k, so results here must be
    IDENTICAL to the exact index — this pins the wiring and the
    ascending/descending split; the recall/latency trade is measured on
    hardware (bench_results/int8_tiled_probe.json: 9.8 vs 56.6 ms at 16M,
    recall@10 0.9984)."""
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index.vector_index import ShardedVectorIndex

    n, d = 4096, 64
    emb = rng.normal(size=(n, d)).astype(np.float32)
    paths = [f"p{i}" for i in range(n)]
    exact = ShardedVectorIndex(
        dim=d, mesh=mesh, config=IndexConfig(embedding_dim=d, dtype="int8"))
    approx = ShardedVectorIndex(
        dim=d, mesh=mesh, config=IndexConfig(embedding_dim=d, dtype="int8",
                                             approx_select=True))
    exact.insert(paths, emb)
    approx.insert(paths, emb)
    q = rng.normal(size=(4, d)).astype(np.float32)
    for metric in ("cosine_similarity", "l2_distance"):
        va, ia = exact.search(q, top_k=10, metric=metric)
        vb, ib = approx.search(q, top_k=10, metric=metric)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(va, vb)


def test_insert_bad_magnitudes_length_leaves_index_unchanged(mesh, rng):
    """A wrong-length magnitudes list must fail BEFORE anything commits —
    the old order committed attrs first, permanently shifting the
    attribute columns against the gallery rows (r5 review)."""
    idx = ShardedVectorIndex(dim=16, mesh=mesh,
                             config=IndexConfig(capacity_step=8))
    emb = rng.normal(size=(2, 16)).astype(np.float32)
    with pytest.raises(ValueError):
        idx.insert(["a", "b"], emb, magnitudes=[1.0, 2.0, 3.0],
                   attrs={"color": ["r", "g"]})
    assert idx.count == 0 and idx.attrs.rows == 0
    # a 1-element list must not silently broadcast either
    with pytest.raises(ValueError):
        idx.insert(["a", "b"], emb, magnitudes=[1.0])
    # the index still works after the rejected inserts
    idx.insert(["a", "b"], emb, attrs={"color": ["r", "g"]})
    assert idx.count == 2
    _, ids = idx.search(emb[0] / np.linalg.norm(emb[0]), top_k=1,
                        flt="color == 'r'")
    assert ids[0] == 0


def test_query_on_empty_index_returns_empty(mesh):
    """Milvus query() on an empty collection returns [], not a crash."""
    idx = ShardedVectorIndex(dim=16, mesh=mesh)
    assert idx.query() == []
    assert idx.reconstruct_original_embeddings() == []


def test_cosine_alias_every_resident_tier(mesh, rng):
    """metric='cosine' must behave like 'cosine_similarity' on every tier
    (it worked on int4/streamed but crashed resident f32/int8 — r5
    review: an IndexConfig.dtype flip broke caller code)."""
    emb = rng.normal(size=(24, 32)).astype(np.float32)
    q = emb[3] / np.linalg.norm(emb[3])
    for dtype in ("float32", "int8"):
        idx = ShardedVectorIndex(
            dim=32, mesh=mesh,
            config=IndexConfig(dtype=dtype, capacity_step=8))
        idx.insert([f"p{i}" for i in range(24)], emb)
        v1, i1 = idx.search(q, top_k=3, metric="cosine")
        v2, i2 = idx.search(q, top_k=3, metric="cosine_similarity")
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(v1, v2)
        assert int(i1[0]) == 3
