"""IVF approximate index: recall vs the exact index, nprobe monotonicity."""

import numpy as np
import pytest

from image_retrieval_tpu.config import IndexConfig
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.index.ivf import IVFIndex


@pytest.fixture(scope="module")
def clustered_data():
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(32, 64)) * 3
    rows = []
    for i in range(4000):
        rows.append(centers[i % 32] + rng.normal(size=64) * 0.5)
    emb = np.stack(rows).astype(np.float32)
    queries = (centers[:8] + rng.normal(size=(8, 64)) * 0.3).astype(np.float32)
    return emb, queries


def exact_topk_ids(emb, queries, k):
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qu = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    return np.argsort(-(qu @ unit.T), axis=1, kind="stable")[:, :k]


def test_ivf_high_recall_on_clustered_data(clustered_data):
    emb, queries = clustered_data
    ivf = IVFIndex(nlist=64, nprobe=8, seed=0).build(emb)
    exact = exact_topk_ids(emb, queries, 10)
    recall = ivf.recall_at(queries, exact, k=10)
    assert recall > 0.9, recall


def test_ivf_nprobe_monotone_recall(clustered_data):
    emb, queries = clustered_data
    ivf = IVFIndex(nlist=64, seed=0).build(emb)
    exact = exact_topk_ids(emb, queries, 10)
    r_small = ivf.recall_at(queries, exact, k=10, nprobe=1)
    r_large = ivf.recall_at(queries, exact, k=10, nprobe=64)
    assert r_large >= r_small
    assert r_large == pytest.approx(1.0)  # full probe == exact


def test_ivf_from_sharded_index(clustered_data):
    emb, queries = clustered_data
    idx = ShardedVectorIndex(dim=64, config=IndexConfig(capacity_step=64))
    idx.insert([f"p{i}" for i in range(len(emb))], emb)
    ivf = IVFIndex.from_index(idx, nlist=64, nprobe=64)
    vals, ids = ivf.search(queries[0], top_k=5)
    v_ex, i_ex = idx.search(queries[0], top_k=5)
    # full-probe IVF returns the exact result set
    assert set(ids.tolist()) == set(i_ex.tolist())
    assert ivf.paths[int(ids[0])] == idx.paths[int(i_ex[0])]


def test_ivf_deterministic(clustered_data):
    emb, queries = clustered_data
    a = IVFIndex(nlist=32, seed=7).build(emb)
    b = IVFIndex(nlist=32, seed=7).build(emb)
    va, ia = a.search(queries, top_k=5)
    vb, ib = b.search(queries, top_k=5)
    np.testing.assert_array_equal(ia, ib)


def test_searcher_with_ivf_candidates(clustered_data):
    """Two-phase IVF-candidates + exact-rerank search through the app
    searcher (the reference's Milvus shape)."""
    from image_retrieval_tpu.app.search import TextImageSearcher
    from image_retrieval_tpu.models.encoder import FakeEncoder

    emb, queries = clustered_data
    # use fake-encoder text embeddings as both gallery and queries

    enc = FakeEncoder(dim=64)

    class _Enc(FakeEncoder):
        def __init__(self):
            self.dim = 64
        def encode_texts(self, texts):
            i = int(texts[0].split()[-1])
            return queries[i][None].copy()

    idx = ShardedVectorIndex(dim=64, config=IndexConfig(capacity_step=64))
    idx.insert([f"p{i}" for i in range(len(emb))], emb)
    ivf = IVFIndex.from_index(idx, nlist=64, nprobe=16)
    exact_searcher = TextImageSearcher(_Enc(), idx)
    ann_searcher = TextImageSearcher(_Enc(), idx, ann=ivf)
    r_exact = exact_searcher.search("query 0", top_k=5, score_threshold=-1e9)
    r_ann = ann_searcher.search("query 0", top_k=5, score_threshold=-1e9)
    assert [h["path"] for h in r_ann] == [h["path"] for h in r_exact]
    # optimized rerank also works over ANN candidates
    ann_searcher.set_similarity_params({"w_angle": 1.0, "w_l1": 0.5, "w_l2": 0.5,
                                        "w_inf": 0.0, "w_mag": 0.1})
    r_opt = ann_searcher.search("query 0", top_k=5, score_threshold=0.0,
                                use_optimized_similarity=True)
    assert len(r_opt) >= 1


def test_sharded_ivf_matches_single_device(clustered_data):
    """Clusters sharded over an 8-device mesh; results equal single-device."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from image_retrieval_tpu.index.ivf import sharded_ivf_search

    emb, queries = clustered_data
    ivf = IVFIndex(nlist=64, seed=0).build(emb)  # 64 clusters / 8 devices
    single_v, single_i = ivf.search(queries, top_k=10, nprobe=16)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    pf = jax.device_put(np.asarray(ivf._packed), NamedSharding(mesh, P("data", None)))
    idf = jax.device_put(np.asarray(ivf._row_ids), NamedSharding(mesh, P("data")))
    qd = jax.device_put(jnp.asarray(queries), NamedSharding(mesh, P()))
    cd = jax.device_put(ivf._centroids, NamedSharding(mesh, P()))
    vals, ids = sharded_ivf_search(qd, cd, pf, idf, ivf._lmax, 16, 10,
                                   mesh=mesh, axis="data")
    # same result set per query (tie order may differ across merge paths)
    for a, b in zip(np.asarray(ids), single_i):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(np.asarray(vals), axis=-1),
                               np.sort(single_v, axis=-1), rtol=1e-5)


def test_balanced_build_bounds_lmax(clustered_data):
    emb, queries = clustered_data
    raw = IVFIndex(nlist=64, seed=0).build(emb, balance=None)
    bal = IVFIndex(nlist=64, seed=0).build(emb, balance=1.2)
    cap = int(np.ceil(1.2 * len(emb) / 64))
    assert bal._lmax <= cap
    assert bal._lmax <= raw._lmax
    # recall stays high despite the cap
    exact = exact_topk_ids(emb, queries, 10)
    assert bal.recall_at(queries, exact, k=10, nprobe=16) > 0.85
    # every row is still present exactly once
    ids = np.asarray(bal._row_ids)
    live = ids[ids >= 0]
    assert len(live) == len(emb) and len(set(live.tolist())) == len(emb)


def test_int8_ivf_close_to_f32(clustered_data):
    """int8 slabs reorder near-ties (rows in this fixture are near
    duplicates within a cluster), but every returned row's true score must
    be within quantization error of the f32 winner set."""
    emb, queries = clustered_data
    f32 = IVFIndex(nlist=64, seed=0).build(emb)
    q8 = IVFIndex(nlist=64, seed=0, dtype="int8").build(emb)
    v32, i32 = f32.search(queries, top_k=5, nprobe=16)
    v8, i8 = q8.search(queries, top_k=5, nprobe=16)
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qu = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    for qi in range(len(queries)):
        true8 = unit[i8[qi]] @ qu[qi]      # true scores of int8's picks
        best = (unit[i32[qi]] @ qu[qi]).max()
        assert np.all(true8 > best - 0.02)  # all picks are near-optimal
        # reported int8 scores track the true scores
        np.testing.assert_allclose(v8[qi], true8, rtol=3e-2, atol=3e-2)
