"""Projection-screened two-phase search (index/screen.py): exact-coverage
parity vs the exact engine, recall on clustered data, tombstones, padding,
staleness, and the multi-slice mesh path — all on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from image_retrieval_tpu.config import IndexConfig, MeshConfig
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.index.screen import ScreenedSearch
from image_retrieval_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=8, model=1))


def clustered_rows(rng, n=512, dim=64, ncenters=16, noise=0.25):
    """Unit rows around unit centers — the clustered regime CLIP corpora
    live in (same data model as the IVF probes)."""
    centers = rng.normal(size=(ncenters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, ncenters, size=n)
    rows = centers[assign] + noise * rng.normal(size=(n, dim)) / np.sqrt(dim)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return rows.astype(np.float32)


def build(mesh, rows, dtype="int8", **cfg):
    idx = ShardedVectorIndex(
        dim=rows.shape[1], mesh=mesh,
        config=IndexConfig(dtype=dtype, capacity_step=64, **cfg),
    )
    idx.insert([f"img_{i}.jpg" for i in range(len(rows))], rows)
    return idx


@pytest.mark.parametrize("dtype", ["int8", "float32"])
def test_full_coverage_matches_exact(mesh, rng, dtype):
    """candidates >= N: the screen must reproduce the exact engine's
    ranking (same indices; scores equal to rerank-math precision)."""
    rows = clustered_rows(rng)
    idx = build(mesh, rows, dtype)
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=512)
    q = rng.normal(size=(5, rows.shape[1])).astype(np.float32)
    sv, si = scr.search(q, top_k=10)
    ev, ei = idx.search(q, top_k=10)
    np.testing.assert_array_equal(si, ei)
    np.testing.assert_allclose(sv, ev, rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize("method", ["pca", "random"])
def test_recall_on_clustered_data(mesh, rng, method):
    """A thin sketch with modest overfetch keeps recall high on clustered
    rows (the regime the tier exists for)."""
    rows = clustered_rows(rng, n=1024)
    idx = build(mesh, rows, "int8")
    scr = ScreenedSearch.from_index(
        idx, sketch_dims=16, candidates=64, method=method
    )
    q = clustered_rows(rng, n=16)
    _, si = scr.search(q, top_k=10)
    _, ei = idx.search(q, top_k=10)
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(si, ei)
    ])
    assert recall >= 0.9, recall


def test_pca_beats_random_at_equal_width(mesh, rng):
    """On anisotropic data the PCA sketch should dominate the random one —
    this is the reason 'pca' is the default."""
    dim = 64
    # variance concentrated in a few directions
    scales = np.geomspace(1.0, 0.02, dim)
    rows = (rng.normal(size=(1024, dim)) * scales).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    idx = build(mesh, rows, "int8")
    q = (rng.normal(size=(16, dim)) * scales).astype(np.float32)
    _, ei = idx.search(q, top_k=10)

    def recall(method):
        scr = ScreenedSearch.from_index(
            idx, sketch_dims=8, candidates=32, method=method, seed=3
        )
        _, si = scr.search(q, top_k=10)
        return np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(si, ei)
        ])

    assert recall("pca") >= recall("random")


def test_tombstones_never_surface(mesh, rng):
    rows = clustered_rows(rng, n=256)
    idx = build(mesh, rows, "int8")
    dead = [f"img_{i}.jpg" for i in range(0, 256, 3)]
    idx.delete(dead)
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=256)
    _, si = scr.search(rows[:4], top_k=20)
    dead_ids = set(range(0, 256, 3))
    assert not (set(si.ravel().tolist()) & dead_ids)


def test_padding_when_pool_exhausted(mesh, rng):
    """top_k beyond the live rows pads with (-inf, -1), IVF's contract."""
    rows = clustered_rows(rng, n=24)
    idx = build(mesh, rows, "int8")
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=64)
    v, i = scr.search(rows[0], top_k=32)
    assert (i >= 0).sum() == 24
    assert np.all(i[24:] == -1) and np.all(np.isneginf(v[24:]))


def test_single_query_shape_and_batch_agree(mesh, rng):
    rows = clustered_rows(rng, n=256)
    idx = build(mesh, rows, "int8")
    scr = ScreenedSearch.from_index(idx, sketch_dims=32, candidates=128)
    v1, i1 = scr.search(rows[7], top_k=5)
    vb, ib = scr.search(rows[6:8], top_k=5)
    assert v1.shape == (5,) and i1.shape == (5,)
    np.testing.assert_array_equal(i1, ib[1])
    np.testing.assert_allclose(v1, vb[1], rtol=1e-6)


def test_stale_after_mutation_raises(mesh, rng):
    rows = clustered_rows(rng, n=128)
    idx = build(mesh, rows, "int8")
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=64)
    idx.insert(["new.jpg"], rows[:1])
    assert scr.stale
    with pytest.raises(ValueError, match="generation"):
        scr.search(rows[0], top_k=5)


def test_streamed_screen_full_coverage_matches_streamed_exact(mesh, rng):
    """Over a beyond-HBM (streamed) index the screen switches to the
    streamed mode (device sketch + host candidate gathers); at full
    coverage it reproduces the streamed exact sweep."""
    rows = clustered_rows(rng, n=256)
    idx = build(mesh, rows, "int8", stream_threshold_bytes=1024)
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=256)
    assert scr.streamed
    q = rng.normal(size=(5, rows.shape[1])).astype(np.float32)
    sv, si = scr.search(q, top_k=10)
    ev, ei = idx.search(q, top_k=10)  # streamed exact engine
    np.testing.assert_array_equal(si, ei)
    np.testing.assert_allclose(sv, ev, rtol=2e-2, atol=1e-3)


def test_streamed_screen_with_tombstones(mesh, rng):
    rows = clustered_rows(rng, n=192)
    idx = build(mesh, rows, "int8", stream_threshold_bytes=1024)
    dead = [f"img_{i}.jpg" for i in range(0, 192, 5)]
    idx.delete(dead)
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=192)
    _, si = scr.search(rows[:3], top_k=20)
    assert not (set(si.ravel().tolist()) & set(range(0, 192, 5)))
    _, ei = idx.search(rows[:3], top_k=20)
    np.testing.assert_array_equal(si, ei)


def test_streamed_screen_recall_thin_sketch(mesh, rng):
    rows = clustered_rows(rng, n=1024)
    idx = build(mesh, rows, "int8", stream_threshold_bytes=1024)
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=64)
    q = clustered_rows(rng, n=16)
    _, si = scr.search(q, top_k=10)
    _, ei = idx.search(q, top_k=10)
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(si, ei)
    ])
    assert recall >= 0.9, recall


def test_streamed_screen_padding_and_single_query(mesh, rng):
    rows = clustered_rows(rng, n=24)
    idx = build(mesh, rows, "int8", stream_threshold_bytes=64)
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=64)
    v, i = scr.search(rows[0], top_k=32)
    assert v.shape == (32,) and (i >= 0).sum() == 24
    assert np.all(i[24:] == -1) and np.all(np.isneginf(v[24:]))


def test_multislice_mesh(rng):
    """Hierarchical (slice, data) merge returns the flat mesh's results."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    devs = np.array(jax.devices()[:8])
    sliced = Mesh(devs.reshape(2, 4), ("slice", "data"))
    flat = make_mesh(MeshConfig(data=8, model=1))
    rows = clustered_rows(rng, n=512)
    q = rng.normal(size=(3, rows.shape[1])).astype(np.float32)
    out = {}
    for name, mesh in (("flat", flat), ("sliced", sliced)):
        idx = build(mesh, rows, "int8")
        scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=512)
        out[name] = scr.search(q, top_k=10)
    np.testing.assert_array_equal(out["flat"][1], out["sliced"][1])
    np.testing.assert_allclose(out["flat"][0], out["sliced"][0], rtol=1e-6)


def test_facade_ann_screen(tmp_path, rng):
    """SearchConfig.ann='screen' routes search_images through the screened
    candidate generator and still matches the exact facade results."""
    from image_retrieval_tpu.app.pipeline import ImageSearchApp
    from image_retrieval_tpu.config import Config
    from image_retrieval_tpu.models.encoder import FakeEncoder

    dim = 64
    rows = clustered_rows(rng, n=96, dim=dim)

    def make_app(ann):
        cfg = Config()
        cfg.search.ann = ann
        cfg.search.screen_candidates = 96  # full coverage: exact parity
        app = ImageSearchApp(config=cfg, encoder=FakeEncoder(dim=dim))
        app.embeddings = {f"img_{i}.jpg": rows[i] for i in range(len(rows))}
        app._index_dirty = True
        return app

    a_exact = make_app("exact")
    a_screen = make_app("screen")
    # identical query embedding from the shared fake encoder
    res_e = a_exact.search_images("a red square", top_k=8)
    res_s = a_screen.search_images("a red square", top_k=8)
    assert [r["path"] for r in res_s] == [r["path"] for r in res_e]
    np.testing.assert_allclose(
        [r["score"] for r in res_s], [r["score"] for r in res_e],
        rtol=2e-2, atol=1e-3,
    )


def test_zero_candidates_rejected(mesh, rng):
    rows = clustered_rows(rng, n=64)
    idx = build(mesh, rows, "int8")
    with pytest.raises(ValueError, match="candidates"):
        ScreenedSearch.from_index(idx, sketch_dims=16, candidates=0)


def test_facade_ann_config_flip_rebuilds(rng):
    """Changing config.search.ann (or its knobs) between searches must
    rebuild the engine even when the index generation is unchanged."""
    from image_retrieval_tpu.app.pipeline import ImageSearchApp
    from image_retrieval_tpu.config import Config
    from image_retrieval_tpu.index.ivf import IVFIndex
    from image_retrieval_tpu.models.encoder import FakeEncoder

    rows = clustered_rows(rng, n=64)
    cfg = Config()
    cfg.search.ann = "ivf"
    cfg.search.nlist = 4
    cfg.search.nprobe = 4
    app = ImageSearchApp(config=cfg, encoder=FakeEncoder(dim=rows.shape[1]))
    app.embeddings = {f"img_{i}": rows[i] for i in range(len(rows))}
    index = app._ensure_index()
    ann1 = app._ensure_ann(index)
    assert isinstance(ann1, IVFIndex)
    cfg.search.ann = "screen"
    cfg.search.screen_candidates = 64
    ann2 = app._ensure_ann(index)
    assert isinstance(ann2, ScreenedSearch)
    cfg.search.screen_dims = 32
    ann3 = app._ensure_ann(index)
    assert ann3 is not ann2 and ann3.sketch_dims == 32


def test_server_with_screen_ann(mesh, rng):
    """SearchServer(ann=ScreenedSearch) serves two-phase candidates through
    the same contract as IVF; at full coverage cosine matches exact."""
    from image_retrieval_tpu.app.server import SearchServer
    from image_retrieval_tpu.models.encoder import FakeEncoder

    rows = clustered_rows(rng, n=96)
    idx = build(mesh, rows, "int8")
    ann = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=96)
    enc = FakeEncoder(dim=rows.shape[1])
    with SearchServer(enc, idx, ann=None) as exact_srv, SearchServer(
        enc, idx, ann=ann
    ) as scr_srv:
        a = exact_srv.search("a blue bird", top_k=5)
        b = scr_srv.search("a blue bird", top_k=5)
        assert [r["path"] for r in a] == [r["path"] for r in b]
        np.testing.assert_allclose(
            [r["score"] for r in a], [r["score"] for r in b],
            rtol=2e-2, atol=1e-3,
        )


def test_streamed_phase1_blocked_path(monkeypatch, mesh, rng):
    """The blocked running-top-C phase 1 (big-N path) must agree with the
    exact streamed engine — including pad-row masking against queries
    whose true cosines are ALL negative (a zero-scored pad row would win)."""
    import image_retrieval_tpu.index.screen as scr_mod

    monkeypatch.setattr(scr_mod, "_PHASE1_BLOCK", 64)
    rows = clustered_rows(rng, n=200)  # not a block multiple -> padding
    idx = build(mesh, rows, "int8", stream_threshold_bytes=1024)
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=256)
    assert scr.streamed and scr._sketch.shape[0] == 256  # padded to 4 blocks
    q = np.concatenate([rows[:3], -rows[3:5]])  # antipodes: all-negative cos
    sv, si = scr.search(q, top_k=10)
    ev, ei = idx.search(q, top_k=10)
    np.testing.assert_array_equal(si, ei)
    np.testing.assert_allclose(sv, ev, rtol=2e-2, atol=1e-3)


def test_recall_at_contract(mesh, rng):
    rows = clustered_rows(rng, n=256)
    idx = build(mesh, rows, "int8")
    scr = ScreenedSearch.from_index(idx, sketch_dims=32, candidates=256)
    q = rows[:8]
    _, ei = idx.search(q, top_k=10)
    assert scr.recall_at(q, ei, k=10) == 1.0  # full coverage


def test_all_tombstoned_returns_padding(mesh, rng):
    """Direct use on a fully-tombstoned gallery degrades to (-inf, -1)
    padding (the facade guards live_count==0 before building; direct
    callers get the padding contract, not a crash)."""
    rows = clustered_rows(rng, n=64)
    idx = build(mesh, rows, "int8")
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=64)
    idx.delete([f"img_{i}.jpg" for i in range(64)])
    scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=64)
    v, i = scr.search(rows[0], top_k=5)
    assert np.all(i == -1) and np.all(np.isneginf(v))


@pytest.mark.parametrize("n,block", [(100, 32), (129, 64), (96, 48)])
def test_blocked_phase1_equals_direct(monkeypatch, mesh, rng, n, block):
    """Blocked phase 1 (scan + running merge) must return exactly the
    direct path's candidates for any (n, block) remainder shape."""
    import image_retrieval_tpu.index.screen as scr_mod

    rows = clustered_rows(rng, n=n)
    idx = build(mesh, rows, "int8", stream_threshold_bytes=64)
    monkeypatch.setattr(scr_mod, "_PHASE1_BLOCK", 1 << 30)  # direct
    direct = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=32,
                                       method="random", seed=1)
    q = rng.normal(size=(3, rows.shape[1])).astype(np.float32)
    dv, di = direct.search(q, top_k=10)
    monkeypatch.setattr(scr_mod, "_PHASE1_BLOCK", block)  # blocked
    blocked = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=32,
                                        method="random", seed=1)
    bv, bi = blocked.search(q, top_k=10)
    np.testing.assert_array_equal(di, bi)
    np.testing.assert_allclose(dv, bv, rtol=1e-6)


class TestBlockedPhase1:
    """The blocked resident phase-1 (running top-C merge over row tiles,
    _phase1_local_topc) must be result-identical to the direct full-width
    top_k it replaces — including when live rows < candidates, where merge
    placeholder slots must not duplicate a live row into the results."""

    def test_blocked_matches_direct(self, mesh, rng):
        rows = clustered_rows(rng, n=1024)
        idx = build(mesh, rows)
        scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=16)
        q = rng.normal(size=(7, rows.shape[1])).astype(np.float32)
        scr.p1_block = 1 << 30  # direct
        dv, di = scr.search(q, top_k=10)
        # 1024/8 shards = 128 local rows -> 4 tiles of 32 >= cl=16
        scr.p1_block = 32
        bv, bi = scr.search(q, top_k=10)
        np.testing.assert_array_equal(bi, di)
        np.testing.assert_allclose(bv, dv, rtol=1e-5, atol=1e-6)

    def test_blocked_no_duplicates_when_live_lt_candidates(self, mesh, rng):
        rows = clustered_rows(rng, n=1024)
        idx = build(mesh, rows)
        # tombstone most rows: 16 live spread over 8 shards, so every
        # shard has live < cl=16 and the merge carries placeholder slots
        idx.delete([f"img_{i}.jpg" for i in range(1008)])
        scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=16)
        scr.p1_block = 32  # 128 local rows -> 4 tiles
        q = rng.normal(size=(3, rows.shape[1])).astype(np.float32)
        vals, ids = scr.search(q, top_k=16)
        for row_ids, row_vals in zip(ids, vals):
            live = row_ids[row_ids >= 0]
            assert len(set(live.tolist())) == len(live)  # no duplicates
            assert all(i >= 1008 for i in live)  # only live rows
            assert np.all(np.isneginf(row_vals[row_ids < 0]))

    def test_blocked_tail_matches_direct(self, mesh, rng):
        """Shard sizes that are NOT a tile multiple must still take the
        blocked path (static tail step), not fall back to materializing —
        and match the direct results exactly. 1536/8 shards = 192 local
        rows = 4 tiles of 48 + a 0-tail... use block 40: 4 tiles + 32."""
        rows = clustered_rows(rng, n=1536)
        idx = build(mesh, rows)
        scr = ScreenedSearch.from_index(idx, sketch_dims=16, candidates=24)
        q = rng.normal(size=(5, rows.shape[1])).astype(np.float32)
        scr.p1_block = 1 << 30
        dv, di = scr.search(q, top_k=10)
        scr.p1_block = 40  # 192 = 4*40 + 32 tail
        bv, bi = scr.search(q, top_k=10)
        np.testing.assert_array_equal(bi, di)
        np.testing.assert_allclose(bv, dv, rtol=1e-5, atol=1e-6)


# -- property-based coverage (hypothesis): the blocked phase-1 running
# merge must be value- AND index-identical to the direct full-width top_k
# for arbitrary (n, block, cl, validity) combinations — tile boundaries,
# tails, all-invalid tiles, duplicates-of-score ties --

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(8, 200),
        block=st.integers(4, 64),
        cl=st.integers(1, 24),
        q_n=st.integers(1, 4),
        ds=st.integers(2, 8),
        live_frac=st.floats(0.0, 1.0),
        seed=st.integers(0, 2**16),
    )
    def test_property_blocked_phase1_matches_direct(
        n, block, cl, q_n, ds, live_frac, seed
    ):
        import jax.numpy as jnp

        from image_retrieval_tpu.index.screen import _phase1_local_topc

        rng = np.random.default_rng(seed)
        # int8-ish sketch values with many exact score ties
        sk = rng.integers(-3, 4, size=(n, ds)).astype(np.int8)
        sks = rng.uniform(0.5, 2.0, n).astype(np.float32)
        valid = rng.uniform(size=n) < live_frac
        qs = rng.integers(-2, 3, size=(q_n, ds)).astype(np.float32)
        cl_eff = min(cl, n)

        def run(p1_block):
            v, i = _phase1_local_topc(
                jnp.asarray(qs, jnp.bfloat16), jnp.asarray(sk),
                jnp.asarray(sks), jnp.asarray(valid), cl_eff, p1_block,
            )
            return np.asarray(v), np.asarray(i)

        dv, di = run(1 << 30)  # direct
        bv, bi = run(block)    # blocked (may still be direct if n <= block)
        np.testing.assert_array_equal(bv, dv)
        # indices must agree wherever the value is finite (ties broken
        # lowest-index in both paths); -inf slots are placeholders
        finite = np.isfinite(dv)
        np.testing.assert_array_equal(bi[finite], di[finite])
