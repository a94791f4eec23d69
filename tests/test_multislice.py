"""Multi-slice (DCN) hierarchical top-k: parity vs the flat single-axis
merge and a NumPy oracle on a virtual (slice=2, data=4) mesh.

SURVEY §5's scale-out story: within a slice, candidates merge over ICI;
across slices only k results per slice cross DCN. Semantics must be
indistinguishable from the single-axis path (same tie-breaks included).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_retrieval_tpu.parallel.collectives import (
    multislice_search_topk,
    sharded_search_topk,
)


@pytest.fixture(scope="module")
def meshes():
    devs = np.array(jax.devices()[:8])
    flat = Mesh(devs.reshape(8, 1), ("data", "model"))
    sliced = Mesh(devs.reshape(2, 4), ("slice", "data"))
    return flat, sliced


def _place(x, mesh, axes):
    spec = P(axes, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def _run_pair(meshes, emb, mags, q, k, metric, weights=None, scales=None):
    flat, sliced = meshes
    valid = np.ones((emb.shape[0],), bool)
    flat_out = sharded_search_topk(
        jnp.asarray(q),
        _place(jnp.asarray(emb), flat, "data"),
        _place(jnp.asarray(valid), flat, "data"),
        None if mags is None else _place(jnp.asarray(mags), flat, "data"),
        k,
        metric,
        weights,
        None if scales is None else _place(jnp.asarray(scales), flat, "data"),
        mesh=flat,
        axis="data",
    )
    ms_out = multislice_search_topk(
        jnp.asarray(q),
        _place(jnp.asarray(emb), sliced, ("slice", "data")),
        _place(jnp.asarray(valid), sliced, ("slice", "data")),
        None if mags is None else _place(jnp.asarray(mags), sliced, ("slice", "data")),
        k,
        metric,
        weights,
        None
        if scales is None
        else _place(jnp.asarray(scales), sliced, ("slice", "data")),
        mesh=sliced,
    )
    return [np.asarray(a) for a in flat_out], [np.asarray(a) for a in ms_out]


def test_cosine_hierarchical_matches_flat_and_oracle(meshes, rng):
    n, d, k = 256, 32, 10
    emb = rng.normal(size=(n, d)).astype(np.float32)
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.normal(size=(2, d)).astype(np.float32)
    (fv, fi), (mv, mi) = _run_pair(meshes, unit, None, q, k, "cosine_similarity")
    np.testing.assert_array_equal(mi, fi)
    np.testing.assert_allclose(mv, fv, rtol=1e-6)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    oracle = np.argsort(-(qn @ unit.T), axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(mi, oracle)


def test_ascending_metric_hierarchical(meshes, rng):
    n, d, k = 128, 16, 7
    emb = rng.normal(size=(n, d)).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1).astype(np.float32)
    unit = emb / mags[:, None]
    q = rng.normal(size=(1, d)).astype(np.float32)
    (fv, fi), (mv, mi) = _run_pair(meshes, unit, mags, q, k, "l2_distance")
    np.testing.assert_array_equal(mi, fi)
    np.testing.assert_allclose(mv, fv, rtol=1e-6)
    diff = emb[None] - q[:, None]
    oracle = np.argsort(
        np.sqrt((diff**2).sum(-1)) / np.sqrt(d), axis=1, kind="stable"
    )[:, :k]
    np.testing.assert_array_equal(mi, oracle)


def test_optimized_metric_hierarchical(meshes, rng):
    n, d, k = 128, 16, 5
    emb = rng.normal(size=(n, d)).astype(np.float32) * rng.uniform(
        0.5, 2.0, (n, 1)
    ).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1).astype(np.float32)
    unit = emb / mags[:, None]
    q = rng.normal(size=(1, d)).astype(np.float32)
    weights = (1.0, 1.0, 1.0, 0.0, 0.5)
    (fv, fi), (mv, mi) = _run_pair(
        meshes, unit, mags, q, k, "optimized_similarity", weights
    )
    np.testing.assert_array_equal(mi, fi)
    np.testing.assert_allclose(mv, fv, rtol=1e-6)


def test_int8_hierarchical(meshes, rng):
    n, d, k = 128, 16, 5
    emb = rng.normal(size=(n, d)).astype(np.float32)
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    grid = np.maximum(np.abs(unit).max(1), 1e-12) / 127.0
    qrows = np.clip(np.rint(unit / grid[:, None]), -127, 127).astype(np.int8)
    scales = (
        np.linalg.norm(unit, axis=1)
        / np.linalg.norm(qrows.astype(np.float32), axis=1)
    ).astype(np.float32)
    mags = np.ones((n,), np.float32)
    q = rng.normal(size=(1, d)).astype(np.float32)
    (fv, fi), (mv, mi) = _run_pair(
        meshes, qrows, mags, q, k, "cosine_similarity", None, scales
    )
    np.testing.assert_array_equal(mi, fi)
    np.testing.assert_allclose(mv, fv, rtol=1e-6)
    (fv, fi), (mv, mi) = _run_pair(
        meshes, qrows, mags, q, k, "optimized_similarity", (1.0, 1.0, 1.0, 0.0, 0.5),
        scales,
    )
    np.testing.assert_array_equal(mi, fi)
    np.testing.assert_allclose(mv, fv, rtol=1e-6)


def test_sharded_index_on_multislice_mesh(meshes, rng):
    """ShardedVectorIndex transparently shards rows over (slice, data) and
    searches via the hierarchical merge — identical results to the same
    index on a flat 8-way mesh, for f32 and int8 storage."""
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex

    devs = np.array(jax.devices()[:8])
    flat_mesh = Mesh(devs.reshape(8, 1), ("data", "model"))
    sliced_mesh = Mesh(devs.reshape(2, 4), ("slice", "data"))

    emb = rng.normal(size=(200, 32)).astype(np.float32) * rng.uniform(
        0.5, 2.0, (200, 1)
    ).astype(np.float32)
    paths = [f"p{i}" for i in range(200)]
    q = rng.normal(size=(32,)).astype(np.float32)

    for dtype in ("float32", "int8"):
        flat = ShardedVectorIndex(
            dim=32, mesh=flat_mesh,
            config=IndexConfig(capacity_step=32, dtype=dtype),
        )
        ms = ShardedVectorIndex(
            dim=32, mesh=sliced_mesh,
            config=IndexConfig(capacity_step=32, dtype=dtype),
        )
        assert ms._multislice and not flat._multislice
        flat.insert(paths, emb)
        ms.insert(paths, emb)
        for metric, params in (
            ("cosine_similarity", None),
            ("l2_distance", None),
            ("optimized_similarity",
             {"w_angle": 1.0, "w_l1": 1.0, "w_l2": 1.0, "w_inf": 0.0,
              "w_mag": 0.5}),
        ):
            fv, fi = flat.search(q, top_k=7, metric=metric, params=params)
            mv, mi = ms.search(q, top_k=7, metric=metric, params=params)
            np.testing.assert_array_equal(mi, fi), (dtype, metric)
            np.testing.assert_allclose(mv, fv, rtol=1e-6)
        # flat-merge paths accept the tuple axis too
        mm_flat = flat.multi_metric_topk(q, top_k=5)
        mm_ms = ms.multi_metric_topk(q, top_k=5)
        for name in mm_flat:
            np.testing.assert_array_equal(mm_ms[name][1], mm_flat[name][1])
        np.testing.assert_allclose(
            ms.scores(q), flat.scores(q), rtol=1e-6
        )


def test_multislice_l1_shadow_bitwise_identical(rng):
    """l1_shadow on a (slice, data) mesh: hierarchical-merge results must
    be bitwise identical to the flag-off index."""
    import jax

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    import numpy as np

    from jax.sharding import Mesh

    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs.reshape(2, 4), ("slice", "data"))
    n, d = 128, 64
    emb = rng.normal(size=(n, d)).astype(np.float32)

    def build(flag):
        ix = ShardedVectorIndex(
            dim=d, mesh=mesh,
            config=IndexConfig(capacity_step=64, dtype="int8", l1_shadow=flag),
        )
        ix.insert([f"i{i}" for i in range(n)], emb)
        return ix

    a, b = build(False), build(True)
    qs = rng.normal(size=(2, d)).astype(np.float32)
    p = {"w_angle": 1.0, "w_l1": 1.0, "w_l2": 1.0, "w_inf": 0.0, "w_mag": 0.5}
    va, ia = a.search(qs, top_k=7, metric="optimized_similarity", params=p)
    vb, ib = b.search(qs, top_k=7, metric="optimized_similarity", params=p)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(va, vb)
