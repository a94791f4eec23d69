"""Attribute-filtered search (Milvus boolean-expr analog, index/filters.py).

The filter mask replaces the tombstone mask inside the same masked scan, so
every test checks parity against a NumPy oracle restricted to matching rows.
"""

import os

import numpy as np
import pytest

from image_retrieval_tpu.config import IndexConfig, MeshConfig
from image_retrieval_tpu.index import ShardedVectorIndex
from image_retrieval_tpu.index.filters import (
    AttributeStore,
    FilterError,
    parse_filter,
)
from image_retrieval_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=8, model=1))


COLORS = ["red", "green", "blue"]


def make_index(mesh, rng, n=300, dim=32, dtype="f32"):
    emb = rng.normal(size=(n, dim)).astype(np.float32) * rng.uniform(
        0.5, 3.0, (n, 1)
    ).astype(np.float32)
    paths = [f"img_{i}.jpg" for i in range(n)]
    colors = [COLORS[i % 3] for i in range(n)]
    views = (np.arange(n) * 7 % 100).astype(np.float64)
    idx = ShardedVectorIndex(
        dim=dim, mesh=mesh, config=IndexConfig(capacity_step=64, dtype=dtype)
    )
    idx.insert(paths, emb, attrs={"color": colors, "views": views})
    return idx, emb, np.asarray(colors), views


def np_cosine(q, g):
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=-1, keepdims=True)
    return qn @ gn.T


def oracle_topk(q, emb, mask, k):
    ref = np_cosine(q.astype(np.float64), emb.astype(np.float64))[0]
    ref = np.where(mask, ref, -np.inf)
    order = np.argsort(-ref, kind="stable")[:k]
    return order[np.isfinite(ref[order])]


# -- parser ------------------------------------------------------------------


def test_parser_precedence_and_parens():
    # and binds tighter than or
    ast = parse_filter("a == 1 or b == 2 and c == 3")
    assert ast[0] == "or" and ast[2][0] == "and"
    ast = parse_filter("(a == 1 or b == 2) and c == 3")
    assert ast[0] == "and" and ast[1][0] == "or"


def test_parser_forms():
    assert parse_filter("x >= 10")[0] == "cmp"
    assert parse_filter("not x == 1")[0] == "not"
    assert parse_filter("!x == 1")[0] == "not"
    assert parse_filter("c in ['a', 'b']") == (
        "in", "c", [("str", "a"), ("str", "b")], False)
    assert parse_filter("c not in ['a']")[3] is True
    assert parse_filter("s == \"it's\"") == ("cmp", "==", "s", ("str", "it's"))
    assert parse_filter("f == 1.5e2")[3] == ("num", 150.0)
    assert parse_filter("b == true")[3] == ("num", 1.0)


@pytest.mark.parametrize("bad", [
    "", "   ", "x ==", "== 1", "x in 3", "x in []", "(x == 1", "x == 1 extra",
    "x ~ 2", "x == 'a' or", "and x == 1",
])
def test_parser_rejects(bad):
    with pytest.raises(FilterError):
        parse_filter(bad)


# -- attribute store schema ----------------------------------------------------


def test_schema_enforced():
    st = AttributeStore()
    st.append({"c": ["x", "y"]}, 2)
    with pytest.raises(FilterError):
        st.append({"c": ["a", "b"]}, 3)  # wrong length
    with pytest.raises(FilterError):
        st.append({"c": [1]}, 1)  # kind flip str->num
    with pytest.raises(FilterError):
        st.append({"c": ["a", 1]}, 2)  # mixed kinds in one insert
    st.append({"c": ["z"]}, 1)
    assert st.rows == 3


def test_nullable_fields():
    """Fields are nullable (Milvus >=2.5 style): attr-less inserts, subset
    inserts, late new fields, and per-row None all become missing values
    that match != / not in and nothing else."""
    st = AttributeStore()
    st.append(None, 2)  # attr-less prefix
    st.append({"c": ["x", None], "v": [1.0, None]}, 2)  # late fields + None
    st.append({"c": ["y"]}, 1)  # subset insert (v missing)
    assert st.rows == 5
    np.testing.assert_array_equal(
        st.evaluate(parse_filter("c == 'x'"), 5),
        [False, False, True, False, False])
    np.testing.assert_array_equal(
        st.evaluate(parse_filter("c != 'x'"), 5),
        [True, True, False, True, True])  # missing matches !=
    np.testing.assert_array_equal(
        st.evaluate(parse_filter("v >= 0"), 5),
        [False, False, True, False, False])  # NaN matches no ordered cmp
    np.testing.assert_array_equal(
        st.evaluate(parse_filter("v != 1"), 5),
        [True, True, False, True, True])
    np.testing.assert_array_equal(
        st.evaluate(parse_filter("c not in ['x', 'y']"), 5),
        [True, True, False, True, False])


def test_unknown_field_and_type_errors():
    st = AttributeStore()
    st.append({"c": ["x"], "v": [1.0]}, 1)
    with pytest.raises(FilterError):
        st.evaluate(parse_filter("nope == 1"), 1)
    with pytest.raises(FilterError):
        st.evaluate(parse_filter("c < 'a'"), 1)  # ordered cmp on strings
    with pytest.raises(FilterError):
        st.evaluate(parse_filter("v == 'a'"), 1)  # str literal on num col
    with pytest.raises(FilterError):
        st.evaluate(parse_filter("c == 3"), 1)  # num literal on str col


def test_unseen_string_literal_matches_nothing():
    st = AttributeStore()
    st.append({"c": ["x", "y"]}, 2)
    assert st.evaluate(parse_filter("c == 'zzz'"), 2).sum() == 0
    assert st.evaluate(parse_filter("c != 'zzz'"), 2).sum() == 2
    assert st.evaluate(parse_filter("c not in ['zzz']"), 2).sum() == 2


# -- filtered search parity ------------------------------------------------------


@pytest.mark.parametrize("dtype", ["f32", "int8"])
def test_filtered_topk_parity(mesh, rng, dtype):
    idx, emb, colors, views = make_index(mesh, rng, dtype=dtype)
    q = rng.normal(size=(1, 32)).astype(np.float32)
    expr = "color == 'red' and views >= 20"
    mask = (colors == "red") & (views >= 20)
    vals, ids = idx.search(q, top_k=10, flt=expr)
    want = oracle_topk(q, emb, mask, 10)
    np.testing.assert_array_equal(ids[0][: len(want)], want)
    assert set(np.asarray(colors)[ids[0][: len(want)]]) == {"red"}


def test_compound_exprs_match_numpy(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng)
    cases = [
        ("color in ['red', 'blue']", np.isin(colors, ["red", "blue"])),
        ("not color == 'green'", colors != "green"),
        ("views < 50 or color == 'green'", (views < 50) | (colors == "green")),
        ("(views >= 10 and views <= 30) or color != 'red'",
         ((views >= 10) & (views <= 30)) | (colors != "red")),
        ("views != 0", views != 0),
        ("views in [7, 14, 21]", np.isin(views, [7, 14, 21])),
    ]
    q = rng.normal(size=(1, 32)).astype(np.float32)
    for expr, mask in cases:
        np.testing.assert_array_equal(
            idx.filter_mask(expr), mask, err_msg=expr
        )
        vals, ids = idx.search(q, top_k=5, flt=expr)
        want = oracle_topk(q, emb, mask, 5)
        np.testing.assert_array_equal(ids[0][: len(want)], want, err_msg=expr)


def test_sub_topk_matches_pad_with_sentinels(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng, n=60)
    q = rng.normal(size=(1, 32)).astype(np.float32)
    expr = "views == 7"
    n_match = int((views == 7).sum())
    assert 0 < n_match < 10
    vals, ids = idx.search(q, top_k=10, flt=expr)
    assert np.isfinite(vals[0]).sum() == n_match
    assert (ids[0][n_match:] == -1).all()
    assert (vals[0][n_match:] == -np.inf).all()


def test_filter_composes_with_tombstones(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng, n=90)
    red_ids = np.flatnonzero(colors[:90] == "red")
    idx.delete([f"img_{i}.jpg" for i in red_ids[:5]])
    mask = (colors[:90] == "red")
    mask[red_ids[:5]] = False
    q = rng.normal(size=(1, 32)).astype(np.float32)
    vals, ids = idx.search(q, top_k=8, flt="color == 'red'")
    want = oracle_topk(q, emb, mask, 8)
    np.testing.assert_array_equal(ids[0][: len(want)], want)


def test_filter_cache_invalidated_by_mutation(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng, n=40)
    q = rng.normal(size=(1, 32)).astype(np.float32)
    _ = idx.search(q, top_k=3, flt="color == 'red'")
    # insert a new red row that dominates every score: exactly the query
    new = (q[0] * 10).astype(np.float32)
    idx.insert(["img_new.jpg"], new[None],
               attrs={"color": ["red"], "views": [1.0]})
    vals, ids = idx.search(q, top_k=3, flt="color == 'red'")
    assert ids[0][0] == 40  # the fresh row wins; stale mask would hide it


def test_filtered_optimized_metric(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng)
    q = rng.normal(size=(1, 32)).astype(np.float32)
    params = {"w_angle": 1.0, "w_l1": 1.0, "w_l2": 0.5, "w_inf": 0.0,
              "w_mag": 0.25}
    vals, ids = idx.search(q, top_k=5, metric="optimized_similarity",
                           params=params, flt="color == 'blue'")
    assert np.isfinite(vals[0]).all()
    assert set(np.asarray(colors)[ids[0]]) == {"blue"}
    # parity vs the unfiltered search restricted to blue rows
    vals_all, ids_all = idx.search(q, top_k=len(emb),
                                   metric="optimized_similarity",
                                   params=params)
    keep = [i for i in ids_all[0] if colors[i] == "blue"][:5]
    np.testing.assert_array_equal(ids[0], keep)


def test_multi_metric_topk_filtered(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng, n=120)
    q = rng.normal(size=(32,)).astype(np.float32)
    out = idx.multi_metric_topk(q, top_k=4, flt="color == 'green'")
    for name, (vals, ids) in out.items():
        live = ids[np.isfinite(vals)]
        assert set(np.asarray(colors)[live]) <= {"green"}, name


def test_delete_where(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng, n=60)
    n_red = int((colors[:60] == "red").sum())
    assert idx.delete_where("color == 'red'") == n_red
    assert idx.live_count == 60 - n_red
    q = rng.normal(size=(1, 32)).astype(np.float32)
    vals, ids = idx.search(q, top_k=10)
    for v, i in zip(vals[0], ids[0]):
        if np.isfinite(v):
            assert colors[i] != "red"


def test_save_load_compact_preserve_attrs(tmp_path, mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng, n=50)
    idx.delete_where("views < 10")
    path = str(tmp_path / "gal.npz")
    idx.save(path)  # compacts
    idx2 = ShardedVectorIndex.load_from(path, mesh=mesh)
    assert idx2.attrs.fields == ["color", "views"]
    assert idx2.attrs.rows == idx2.count == idx.count
    q = rng.normal(size=(1, 32)).astype(np.float32)
    v1, i1 = idx.search(q, top_k=5, flt="color == 'blue'")
    v2, i2 = idx2.search(q, top_k=5, flt="color == 'blue'")
    assert [idx.paths[i] for i in i1[0] if i >= 0] == [
        idx2.paths[i] for i in i2[0] if i >= 0
    ]


def test_insert_schema_error_leaves_index_unchanged(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng, n=30)
    before = idx.count
    with pytest.raises(FilterError):  # kind flip on an existing column
        idx.insert(["x.jpg"], rng.normal(size=(1, 32)).astype(np.float32),
                   attrs={"color": [7]})
    assert idx.count == before and idx.attrs.rows == before


def test_attrless_insert_composes_with_attributed_index(mesh, rng):
    """A direct insert() without attrs on an attributed index must work
    (the facade auto-attaches `dir`; downstream writers don't know that) —
    the new row is simply missing from every filter except != / not in."""
    idx, emb, colors, views = make_index(mesh, rng, n=30)
    new = rng.normal(size=(1, 32)).astype(np.float32)
    idx.insert(["later.jpg"], new)
    assert idx.attrs.rows == idx.count == 31
    mask = idx.filter_mask("color == 'red'")
    assert not mask[30]
    assert idx.filter_mask("color != 'red'")[30]
    q = new  # the unattributed row is the best cosine match for itself
    vals, ids = idx.search(q, top_k=3, flt="color != 'purple'")
    assert ids[0][0] == 30


def test_streaming_engine_masked(rng):
    """Direct engine test: per-chunk bool mask over multiple chunks, with
    a padded final chunk, against a NumPy oracle."""
    from image_retrieval_tpu.index.streaming import (
        StreamingGallerySearch,
        quantize_rows_int8,
    )

    n, d = 50, 16
    g = rng.normal(size=(n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q8, sc = quantize_rows_int8(g)
    eng = StreamingGallerySearch(q8, sc, chunk_rows=16)  # 4 chunks, last short
    mask = (np.arange(n) % 3) == 0
    q = rng.normal(size=(2, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    vals, ids = eng.search(q, top_k=8, mask=mask)
    deq = q8.astype(np.float64) * sc[:, None]
    for r in range(2):
        ref = q[r].astype(np.float64) @ deq.T
        ref = np.where(mask, ref, -np.inf)
        want = np.argsort(-ref, kind="stable")[:8]
        want = want[np.isfinite(ref[want])]
        np.testing.assert_array_equal(ids[r][: len(want)], want)
        assert (ids[r][len(want):] == -1).all()


def test_streamed_tier_filtered_parity(mesh, rng):
    """The beyond-HBM streamed tier honors attribute filters (mask rides
    the chunk window) — parity vs a resident int8 twin, with tombstones
    exercising the live-row remap."""
    def build(stream):
        cfg = IndexConfig(capacity_step=64, dtype="int8",
                          stream_threshold_bytes=1 if stream else 1 << 40)
        return ShardedVectorIndex(dim=32, mesh=mesh, config=cfg)

    emb = rng.normal(size=(80, 32)).astype(np.float32)
    colors = [COLORS[i % 3] for i in range(80)]
    streamed, resident = build(True), build(False)
    for idx in (streamed, resident):
        idx.insert([f"i{i}" for i in range(80)], emb,
                   attrs={"color": colors, "views": list(range(80))})
        idx.delete([f"i{i}" for i in range(0, 80, 10)])
    q = rng.normal(size=(3, 32)).astype(np.float32)
    expr = "color == 'red' and views >= 8"
    vs, is_ = streamed.search(q, top_k=6, flt=expr)
    vr, ir = resident.search(q, top_k=6, flt=expr)
    np.testing.assert_array_equal(is_, ir)
    np.testing.assert_allclose(vs, vr, rtol=2e-2, atol=2e-2)
    finite = np.isfinite(vr)
    got = np.asarray(is_)[finite]
    assert all(colors[i] == "red" and i % 10 != 0 for i in got)


# -- searcher / facade / server / compat ----------------------------------------


def test_searcher_filter(mesh, rng):
    from image_retrieval_tpu.app.search import TextImageSearcher
    from image_retrieval_tpu.models.encoder import FakeEncoder

    enc = FakeEncoder(dim=32)
    idx = ShardedVectorIndex(dim=32, mesh=mesh,
                             config=IndexConfig(capacity_step=64))
    n = 48
    emb = np.stack([enc.encode_texts([f"item {i}"])[0] for i in range(n)])
    colors = [COLORS[i % 3] for i in range(n)]
    idx.insert([f"img_{i}.jpg" for i in range(n)], emb,
               attrs={"color": colors, "views": list(range(n))})
    s = TextImageSearcher(enc, idx)
    hits = s.search("item 3", top_k=5, score_threshold=-10.0,
                    filter_expr="color == 'red'")
    assert hits
    got = [int(h["path"].split("_")[1].split(".")[0]) for h in hits]
    assert all(colors[i] == "red" for i in got)


def test_facade_auto_dir_attr(tmp_path, rng):
    from image_retrieval_tpu.app.pipeline import ImageSearchApp
    from image_retrieval_tpu.models.encoder import FakeEncoder

    app = ImageSearchApp(encoder=FakeEncoder(dim=512))
    # inject embeddings directly (no decode): paths under color dirs
    for color in COLORS:
        os.makedirs(tmp_path / color, exist_ok=True)
    app.embeddings = {
        str(tmp_path / COLORS[i % 3] / f"im{i}.png"):
            rng.normal(size=(512,)).astype(np.float32)
        for i in range(24)
    }
    hits = app.search_images("anything", top_k=6, filter_expr="dir == 'red'")
    assert hits
    assert all("/red/" in h["path"] for h in hits)
    # unfiltered returns other dirs too
    hits_all = app.search_images("anything", top_k=24)
    assert any("/blue/" in h["path"] for h in hits_all)


def test_server_filter_groups(mesh, rng):
    from image_retrieval_tpu.app.server import SearchServer
    from image_retrieval_tpu.models.encoder import FakeEncoder

    enc = FakeEncoder(dim=32)
    idx = ShardedVectorIndex(dim=32, mesh=mesh,
                             config=IndexConfig(capacity_step=64))
    n = 36
    emb = np.stack([enc.encode_texts([f"t{i}"])[0] for i in range(n)])
    colors = [COLORS[i % 3] for i in range(n)]
    idx.insert([f"img_{i}.jpg" for i in range(n)], emb,
               attrs={"color": colors, "views": list(range(n))})
    with SearchServer(enc, idx, max_batch=8) as srv:
        plain = srv.search("t1", top_k=4)
        red = srv.search("t1", top_k=4, flt="color == 'red'")
        assert plain and red
        got = [int(h["path"].split("_")[1].split(".")[0]) for h in red]
        assert all(colors[i] == "red" for i in got)
        with pytest.raises(Exception):
            srv.search("t1", top_k=4, flt="bogus ~ 1")


def test_compat_expr_surface(mesh, rng):
    from image_retrieval_tpu.index.compat import Collection

    col = Collection("flt_test", dim=16)
    emb = rng.normal(size=(12, 16)).astype(np.float32)
    paths = [f"p{i}.jpg" for i in range(12)]
    mags = np.linalg.norm(emb, axis=1)
    units = emb / mags[:, None]
    col.insert([paths, units, mags],
               attrs={"cat": ["dog" if i % 2 else "cat" for i in range(12)]})
    # query by attr expr
    rows = col.query(expr="cat == 'dog'", output_fields=["image_path"])
    assert len(rows) == 6 and all(
        int(r["image_path"][1:-4]) % 2 == 1 for r in rows
    )
    # query by virtual id / image_path
    rows = col.query(expr="id < 3", output_fields=["image_path"])
    assert [r["id"] for r in rows] == [0, 1, 2]
    rows = col.query(expr="image_path in ['p5.jpg']")
    assert len(rows) == 1 and rows[0]["id"] == 5
    # filtered ANN search
    hits = col.search([units[0]], limit=4, expr="cat == 'dog'")[0]
    assert hits and all(int(h.entity.get("image_path")[1:-4]) % 2 == 1
                        for h in hits)
    # delete by expr
    assert col.delete("cat == 'cat'") == 6
    assert col.num_entities == 12  # tombstoned, not compacted
    assert len(col.query(expr="id >= 0")) == 6


def test_compat_search_virtual_fields(mesh, rng):
    """search(expr=...) must honor the virtual id/image_path columns like
    query/delete do — including the reference's own trivial 'id >= 0'."""
    from image_retrieval_tpu.index.compat import Collection

    col = Collection("flt_virt", dim=16)
    emb = rng.normal(size=(10, 16)).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1)
    units = emb / mags[:, None]
    col.insert([[f"v{i}.jpg" for i in range(10)], units, mags])
    hits = col.search([units[0]], limit=3, expr="id >= 0")[0]
    assert len(hits) == 3
    hits = col.search([units[0]], limit=5, expr="id >= 5")[0]
    assert hits and all(int(h.entity.get("image_path")[1:-4]) >= 5
                        for h in hits)
    hits = col.search([units[3]], limit=2,
                      expr="image_path in ['v3.jpg', 'v4.jpg']")[0]
    assert [h.entity.get("image_path") for h in hits][0] == "v3.jpg"


def test_compat_delete_expr_exact_with_duplicate_paths(mesh, rng):
    """delete(expr) tombstones exactly the matched row ids — rows sharing
    a path with a matched row must NOT be dragged along."""
    from image_retrieval_tpu.index.compat import Collection

    col = Collection("flt_dup", dim=16)
    emb = rng.normal(size=(3, 16)).astype(np.float32)
    mags = np.linalg.norm(emb, axis=1)
    units = emb / mags[:, None]
    col.insert([["dup.jpg", "other.jpg", "dup.jpg"], units, mags])
    assert col.delete("id == 0") == 1
    live = col.query(expr="id >= 0", output_fields=["image_path"])
    assert [r["id"] for r in live] == [1, 2]


def test_delete_rows_exact(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng, n=30)
    assert idx.delete_rows([3, 5, 5, -1, 999]) == 2  # dedup/range-safe
    assert idx.delete_rows([3]) == 0  # already dead
    assert idx.live_count == 28


def test_filter_accepts_precomputed_mask(mesh, rng):
    idx, emb, colors, views = make_index(mesh, rng, n=60)
    mask = (np.arange(60) % 4) == 0
    vals, ids = idx.search(rng.normal(size=(1, 32)).astype(np.float32),
                           top_k=5, flt=mask)
    live = ids[0][ids[0] >= 0]
    assert len(live) and all(i % 4 == 0 for i in live)
    with pytest.raises(ValueError, match="mask shape"):
        idx.search(emb[0], top_k=5, flt=np.ones(7, bool))


def test_ascending_metric_pad_sentinel(mesh, rng):
    """Sub-top_k filtered matches on ascending distance metrics pad with
    (+inf, -1) — idx < 0 is the documented pad check."""
    idx, emb, colors, views = make_index(mesh, rng, n=60)
    n_match = int((views == 7).sum())
    assert 0 < n_match < 10
    q = rng.normal(size=(1, 32)).astype(np.float32)
    vals, ids = idx.search(q, top_k=10, metric="l2_distance", flt="views == 7")
    assert (ids[0][n_match:] == -1).all()
    assert (vals[0][n_match:] == np.inf).all()
    assert np.isfinite(vals[0][:n_match]).all()
