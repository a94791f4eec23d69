"""int4 capacity tier: pack/unpack numerics, two-phase resident search,
packed streamed mode, multislice mesh parity.

The tier's contract (ops/int4.py, bench_results/int4_probe.json): device
rows are nibble-packed uint8 (half of int8 — ~2x resident rows/chip and
half the streamed transfer bytes); search is a cosine int4 screen followed
by an exact int8 rerank whose bf16-dot math matches the resident int8
sweep, so two-phase scores are identical to dtype='int8' for the same
rows (recall@10 0.983 vs int8's 0.984 at 1M on v5e).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from image_retrieval_tpu.config import IndexConfig
from image_retrieval_tpu.index.vector_index import ShardedVectorIndex
from image_retrieval_tpu.ops.int4 import (
    pack_nibbles,
    quantize_pack_int4,
    unpack_nibbles,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _unit_rows(rng, n, d):
    rows = rng.normal(size=(n, d)).astype(np.float32)
    return rows / np.linalg.norm(rows, axis=1, keepdims=True)


# -- ops ---------------------------------------------------------------------


def test_pack_unpack_roundtrip(rng):
    q4 = rng.integers(-8, 8, size=(17, 30)).astype(np.int8)
    assert (unpack_nibbles(pack_nibbles(q4)) == q4).all()


def test_quantize_pack_norm_preserving(rng):
    rows = _unit_rows(rng, 32, 64) * rng.uniform(0.5, 2.0, size=(32, 1))
    pk, sc = quantize_pack_int4(rows)
    assert pk.shape == (32, 32) and pk.dtype == np.uint8
    q4 = unpack_nibbles(pk).astype(np.float32)
    assert np.abs(q4).max() <= 7
    # ||q4|| * scale == ||row|| (the norm-preserving property that makes
    # raw_dot * scale an unbiased cosine approximation)
    np.testing.assert_allclose(
        np.linalg.norm(q4, axis=1) * sc,
        np.linalg.norm(rows, axis=1), rtol=1e-5,
    )


def test_unpack2_dots_matches_numpy_sim(rng):
    """The two-dot decomposition computes exactly the dots of the unpacked
    int4 values (bf16 rounding aside — compared here in looser tolerance)."""
    import jax.numpy as jnp

    from image_retrieval_tpu.ops.int4 import unpack2_dots

    rows = _unit_rows(rng, 24, 32)
    pk, sc = quantize_pack_int4(rows)
    q = _unit_rows(rng, 3, 32)
    got = np.asarray(unpack2_dots(jnp.asarray(q, jnp.bfloat16),
                                  jnp.asarray(pk)))
    want = q @ unpack_nibbles(pk).astype(np.float32).T
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


# -- resident two-phase ------------------------------------------------------


@pytest.fixture
def trio(rng):
    """int4 / int8 / f32 indexes over the same 4096 rows."""
    n, d = 4096, 64
    emb = rng.normal(size=(n, d)).astype(np.float32)
    paths = [f"p{i}.jpg" for i in range(n)]
    mk = lambda dt: ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype=dt, rerank_c=64))
    i4, i8, f32 = mk("int4"), mk("int8"), mk("float32")
    for ix in (i4, i8, f32):
        ix.insert(paths, emb)
    return i4, i8, f32, emb


def test_int4_two_phase_recall_and_score_parity(trio, rng):
    i4, i8, _f32, emb = trio
    q = rng.normal(size=(4, emb.shape[1])).astype(np.float32)
    v4, idx4 = i4.search(q, top_k=10)
    v8, idx8 = i8.search(q, top_k=10)
    rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx4, idx8)])
    assert rec >= 0.9  # typically 1.0 at this size
    # phase-2 rerank math == resident int8 sweep math: identical scores
    # for every row both report
    for r in range(len(q)):
        m8 = {int(i): float(v) for i, v in zip(idx8[r], v8[r])}
        for i, v in zip(idx4[r], v4[r]):
            if int(i) in m8:
                assert abs(m8[int(i)] - float(v)) < 1e-6


def test_int4_vs_f32_oracle_recall(trio, rng):
    i4, _i8, f32, emb = trio
    q = rng.normal(size=(8, emb.shape[1])).astype(np.float32)
    _, idx4 = i4.search(q, top_k=10)
    _, idxf = f32.search(q, top_k=10)
    rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx4, idxf)])
    assert rec >= 0.9


def test_int4_single_query_and_filters(trio, rng):
    i4, _, _, emb = trio
    d = emb.shape[1]
    q = rng.normal(size=d).astype(np.float32)
    v, i = i4.search(q, top_k=5)
    assert v.shape == (5,) and i.shape == (5,)

    idx = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype="int4"))
    idx.insert([f"x{i}" for i in range(100)], emb[:100],
               attrs={"grp": ["a"] * 50 + ["b"] * 50})
    vv, ii = idx.search(q, top_k=60, flt="grp == 'a'")
    ok = np.isfinite(vv)
    assert ok.sum() == 50
    assert (ii[ok] < 50).all() and (ii[~ok] == -1).all()


def test_int4_delete_compact_save_load(trio, rng, tmp_path):
    i4, _, _, emb = trio
    q = rng.normal(size=(2, emb.shape[1])).astype(np.float32)
    i4.delete([f"p{i}.jpg" for i in range(100)])
    _, idx = i4.search(q, top_k=10)
    assert (idx >= 100).all()
    before = i4.search(q, top_k=10)
    i4.compact()
    after = i4.search(q, top_k=10)
    # compaction renumbers rows; compare by path
    for r in range(2):
        pb = [i4.paths[int(i)] for i in after[1][r]]
        # pre-compact indices are original row ids == original paths
        pa = [f"p{int(i)}.jpg" for i in before[1][r]]
        assert pb == pa
    i4.save(str(tmp_path / "g"))
    re = ShardedVectorIndex.load_from(str(tmp_path / "g"))
    assert len(re) == len(i4)


def test_save_load_preserves_tier_config(trio, rng, tmp_path):
    """The tier must survive the save/load cycle: a saved int4 index that
    reloads as float32 would silently 2x its HBM footprint (and an int8
    one 4x). The sidecar config restores dtype/rerank_c; an explicit
    config= re-tiers on load."""
    i4, i8, _f32, emb = trio
    q = rng.normal(size=(3, emb.shape[1])).astype(np.float32)

    i4.save(str(tmp_path / "g4"))
    r4 = ShardedVectorIndex.load_from(str(tmp_path / "g4"))
    assert r4.config.dtype == "int4" and r4.config.rerank_c == 64
    # the reloaded screen re-quantizes from the saved (already int8-
    # quantized) rows, so candidate sets can differ at the margin; the
    # exact rerank keeps top-10 essentially identical
    v_a, i_a = i4.search(q, top_k=10)
    v_b, i_b = r4.search(q, top_k=10)
    rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i_a, i_b)])
    assert rec >= 0.9
    np.testing.assert_allclose(v_a[:, 0], v_b[:, 0], rtol=1e-4, atol=1e-5)

    i8.save(str(tmp_path / "g8"))
    r8 = ShardedVectorIndex.load_from(str(tmp_path / "g8"))
    assert r8.config.dtype == "int8"

    # explicit override wins: re-tier the saved int4 rows as float32
    rf = ShardedVectorIndex.load_from(
        str(tmp_path / "g4"),
        config=IndexConfig(embedding_dim=emb.shape[1], dtype="float32"))
    assert rf.config.dtype == "float32"
    rf.scores(q[0])  # full-matrix API exists again on the f32 tier


def test_int4_rejects_non_cosine_and_matrix_apis(trio, rng):
    i4, _, _, emb = trio
    q = rng.normal(size=emb.shape[1]).astype(np.float32)
    with pytest.raises(ValueError, match="cosine"):
        i4.search(q, top_k=5, metric="l2_distance")
    with pytest.raises(ValueError, match="int4"):
        i4.multi_metric_topk(q, top_k=5)
    with pytest.raises(ValueError, match="int4"):
        i4.scores(q)


def test_screen_tier_refuses_int4(trio):
    from image_retrieval_tpu.index.screen import ScreenedSearch

    i4, _, _, _ = trio
    with pytest.raises(ValueError, match="int4"):
        ScreenedSearch.from_index(i4, sketch_dims=16)


def test_int4_paired_pallas_path_end_to_end(rng):
    """dim=512 engages the PAIRED int32 device layout (the Pallas screen
    kernel; interpret mode off-TPU) through ShardedVectorIndex.search.
    With rerank_c >= live rows every row survives the screen, so the
    exact rerank makes the result identical to the resident int8 index —
    any paired-layout id/scale/valid mismatch surfaces as a hard diff."""
    n, d = 300, 512
    emb = rng.normal(size=(n, d)).astype(np.float32)
    paths = [f"p{i}" for i in range(n)]
    i4 = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype="int4",
                                  rerank_c=512, capacity_step=2048))
    i8 = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype="int8"))
    i4.insert(paths, emb)
    i8.insert(paths, emb)
    i4._sync_device()
    assert i4._packed.dtype == jnp.int32  # paired layout actually in use
    assert i4._packed.shape == (i4.capacity // 2, d // 4)

    q = rng.normal(size=(3, d)).astype(np.float32)
    v4, x4 = i4.search(q, top_k=10)
    v8, x8 = i8.search(q, top_k=10)
    np.testing.assert_array_equal(x4, x8)
    np.testing.assert_allclose(v4, v8, rtol=0, atol=1e-6)

    # tombstones + attribute filter ride the identity-order valid mask
    # through the paired kernel's per-half split
    i4.delete([f"p{i}" for i in range(0, n, 3)])
    i8.delete([f"p{i}" for i in range(0, n, 3)])
    v4, x4 = i4.search(q, top_k=10)
    v8, x8 = i8.search(q, top_k=10)
    np.testing.assert_array_equal(x4, x8)

    flt = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype="int4",
                                  rerank_c=512, capacity_step=2048))
    flt.insert(paths[:100], emb[:100],
               attrs={"grp": ["a"] * 50 + ["b"] * 50})
    vv, ii = flt.search(q[0], top_k=60, flt="grp == 'b'")
    ok = np.isfinite(vv)
    assert ok.sum() == 50
    assert ((ii[ok] >= 50) & (ii[ok] < 100)).all() and (ii[~ok] == -1).all()


def test_int4_rerank_device_one_dispatch_parity(rng):
    """rerank_device=True fuses the exact rerank into the screen dispatch
    (no host hop). With full screen coverage results must equal both the
    host-rerank int4 path and the resident int8 index; tombstones and
    filters ride the same valid mask."""
    n, d = 300, 512
    emb = rng.normal(size=(n, d)).astype(np.float32)
    paths = [f"p{i}" for i in range(n)]
    mk = lambda **kw: ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, rerank_c=512,
                                  capacity_step=2048, **kw))
    idev = mk(dtype="int4", rerank_device=True)
    ihost = mk(dtype="int4")
    i8 = mk(dtype="int8")
    attrs = {"grp": ["hi" if i >= 250 else "lo" for i in range(n)]}
    for ix in (idev, ihost, i8):
        ix.insert(paths, emb, attrs=attrs)
    idev._sync_device()
    assert idev._gallery is not None  # int8 rows resident (latency mode)

    q = rng.normal(size=(3, d)).astype(np.float32)
    vd, xd = idev.search(q, top_k=10)
    vh, xh = ihost.search(q, top_k=10)
    v8, x8 = i8.search(q, top_k=10)
    np.testing.assert_array_equal(xd, xh)
    np.testing.assert_array_equal(xd, x8)
    np.testing.assert_allclose(vd, v8, rtol=0, atol=2e-6)

    idev.delete([f"p{i}" for i in range(0, n, 4)])
    i8.delete([f"p{i}" for i in range(0, n, 4)])
    vd, xd = idev.search(q, top_k=10)
    v8, x8 = i8.search(q, top_k=10)
    np.testing.assert_array_equal(xd, x8)

    vv, ii = idev.search(q[0], top_k=40, flt="grp == 'hi'")
    ok = np.isfinite(vv)
    # rows 250..299 minus the deleted multiples of 4 (252..296: 12 rows)
    assert ok.sum() == 38
    assert (ii[ok] >= 250).all() and (ii[~ok] == -1).all()


def test_paired_form_gates(rng):
    """Non-512-multiple dims / non-256-multiple shard rows keep the uint8
    XLA layout (the Pallas kernel's lane/block constraints)."""
    d = 64
    idx = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype="int4"))
    idx.insert(["a", "b"], rng.normal(size=(2, d)).astype(np.float32))
    idx._sync_device()
    assert idx._packed.dtype == jnp.uint8


def test_int4_fully_tombstoned(rng):
    d = 32
    idx = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype="int4"))
    idx.insert(["a", "b"], _unit_rows(rng, 2, d))
    idx.delete(["a", "b"])
    v, i = idx.search(rng.normal(size=d).astype(np.float32), top_k=3)
    assert v.shape == (0,) and i.shape == (0,)


def test_int4_multislice_mesh_parity(rng):
    """(slice=2, data=4) hierarchical merge returns the same rows as the
    flat 8-shard mesh (ICI-then-DCN two-stage merge in the screen)."""
    import jax
    from jax.sharding import Mesh

    n, d = 1024, 32
    emb = rng.normal(size=(n, d)).astype(np.float32)
    paths = [f"p{i}" for i in range(n)]
    q = rng.normal(size=(3, d)).astype(np.float32)

    flat = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype="int4",
                                  rerank_c=32))
    flat.insert(paths, emb)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    ms = ShardedVectorIndex(
        dim=d, mesh=Mesh(devs, ("slice", "data")),
        config=IndexConfig(embedding_dim=d, dtype="int4", rerank_c=32))
    ms.insert(paths, emb)

    vf, jf = flat.search(q, top_k=10)
    vm, jm = ms.search(q, top_k=10)
    np.testing.assert_array_equal(jf, jm)
    np.testing.assert_allclose(vf, vm, rtol=1e-6)


# -- streamed packed mode ----------------------------------------------------


def test_streamed_packed4_parity_and_mask(rng):
    from image_retrieval_tpu.index.streaming import (
        StreamingGallerySearch,
        quantize_rows_int8,
    )

    n, d = 2048, 64
    rows = _unit_rows(rng, n, d)
    r8, s8 = quantize_rows_int8(rows)
    pk, s4 = quantize_pack_int4(rows)
    q = _unit_rows(rng, 5, d)

    eng8 = StreamingGallerySearch(r8, s8, chunk_rows=300)
    v8, i8 = eng8.search(q, top_k=10)
    eng4 = StreamingGallerySearch(
        pk, s4, chunk_rows=300, packed4=True,
        rerank_rows=r8, rerank_scales=s8, rerank_c=64)
    assert eng4.bytes_per_sweep == n * d // 2  # HALF of int8's sweep bytes
    v4, i4 = eng4.search(q, top_k=10)
    rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i4, i8)])
    assert rec >= 0.9
    for r in range(5):  # rerank scores == int8 sweep scores, shared rows
        m8 = {int(i): float(v) for i, v in zip(i8[r], v8[r])}
        for i, v in zip(i4[r], v4[r]):
            if int(i) in m8:
                assert abs(m8[int(i)] - float(v)) < 1e-6

    mask = np.zeros(n, bool)
    mask[:100] = True
    vm, im = eng4.search(q, top_k=20, mask=mask)
    ok = np.isfinite(vm)
    assert (im[ok] < 100).all() and (im[~ok] == -1).all()


def test_streamed_packed4_memmap_rerank(rng, tmp_path):
    """The full-precision rerank source may live on DISK (np.memmap): the
    screen touches host RAM only for the packed rows; phase 2 reads C
    rows/query off disk — host RAM per row halves vs int8 streaming."""
    from image_retrieval_tpu.index.streaming import (
        StreamingGallerySearch,
        quantize_rows_int8,
    )

    n, d = 1024, 32
    rows = _unit_rows(rng, n, d)
    r8, s8 = quantize_rows_int8(rows)
    pk, s4 = quantize_pack_int4(rows)
    mmpath = str(tmp_path / "r8.mm")
    mm = np.memmap(mmpath, dtype=np.int8, mode="w+", shape=r8.shape)
    mm[:] = r8
    mm.flush()
    q = _unit_rows(rng, 3, d)
    ram = StreamingGallerySearch(pk, s4, chunk_rows=200, packed4=True,
                                 rerank_rows=r8, rerank_scales=s8)
    dsk = StreamingGallerySearch(
        pk, s4, chunk_rows=200, packed4=True,
        rerank_rows=np.memmap(mmpath, dtype=np.int8, mode="r",
                              shape=r8.shape),
        rerank_scales=s8)
    v1, i1 = ram.search(q, top_k=10)
    v2, i2 = dsk.search(q, top_k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2)


def test_streamed_paired_pallas_chunks(rng):
    """dim=512 + kernel-compatible chunking engages the PAIRED streamed
    sweep (Pallas kernel per chunk; interpret off-TPU). With rerank over
    full coverage the result equals a plain int8 streamed sweep; masks
    and the padded tail chunk ride the per-half keep logic."""
    from image_retrieval_tpu.index.streaming import (
        StreamingGallerySearch,
        quantize_rows_int8,
    )

    n, d, c = 1200, 512, 1200  # 3 chunks, padded tail (1200 = 2*512+176)
    rows = rng.normal(size=(n, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    g8, s8 = quantize_rows_int8(rows)
    pk, s4 = quantize_pack_int4(rows)
    q = rng.normal(size=(4, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    eng = StreamingGallerySearch(pk, s4, chunk_rows=512, packed4=True,
                                 rerank_rows=g8, rerank_scales=s8,
                                 rerank_c=c)
    assert eng._paired  # the Pallas chunk path is actually in use
    ref = StreamingGallerySearch(g8, s8, chunk_rows=512)
    v4, i4 = eng.search(q, top_k=10)
    v8, i8 = ref.search(q, top_k=10)
    np.testing.assert_array_equal(i4, i8)
    np.testing.assert_allclose(v4, v8, rtol=0, atol=1e-6)

    # mask: only even rows eligible
    mask = np.arange(n) % 2 == 0
    vm, im = eng.search(q, top_k=10, mask=mask)
    assert (im % 2 == 0).all()
    vr, ir = ref.search(q, top_k=10, mask=mask)
    np.testing.assert_array_equal(im, ir)


def test_index_streams_packed_when_over_threshold(rng):
    n, d = 1024, 32
    emb = rng.normal(size=(n, d)).astype(np.float32)
    cfg = IndexConfig(embedding_dim=d, dtype="int4", rerank_c=64,
                      stream_threshold_bytes=1000)
    idx = ShardedVectorIndex(dim=d, config=cfg)
    idx.insert([f"p{i}" for i in range(n)], emb)
    i8 = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype="int8"))
    i8.insert([f"p{i}" for i in range(n)], emb)
    q = rng.normal(size=(4, d)).astype(np.float32)
    v4, idx4 = idx.search(q, top_k=10)
    assert idx._stream is not None and idx._stream.packed4
    _, idx8 = i8.search(q, top_k=10)
    rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx4, idx8)])
    assert rec >= 0.9
    # int4 packing doubles how far the resident tier stretches: the
    # threshold is checked against the PACKED device bytes (n*d/2), so a
    # threshold of exactly n*d/2 keeps the same gallery resident where
    # int8 (n*d bytes) would stream
    at_edge = ShardedVectorIndex(
        dim=d, config=IndexConfig(embedding_dim=d, dtype="int4",
                                  stream_threshold_bytes=n * d // 2))
    at_edge.insert([f"p{i}" for i in range(n)], emb)
    assert not at_edge._stream_active()
    at_edge.search(q[0], top_k=3)
    assert at_edge._stream is None and at_edge._packed is not None


def test_blocked_screen_matches_direct():
    """screen_int4_topc tiled path == direct path, bit for bit (ids and
    scores) — including the static tail tile and masked (invalid) rows.
    The tiled form exists because XLA drops the nibble-unpack fusion on
    multi-M-row galleries (int4_scale_probe.json)."""
    import jax.numpy as jnp

    from image_retrieval_tpu.ops.int4 import quantize_pack_int4, screen_int4_topc

    rng = np.random.default_rng(17)
    n, d, c = 1000, 32, 16  # block=256: 3 full tiles + 232-row tail
    rows = rng.normal(size=(n, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    pk, sc = quantize_pack_int4(rows)
    q = rng.normal(size=(4, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    valid = np.ones(n, bool)
    valid[rng.choice(n, 100, replace=False)] = False

    q16 = jnp.asarray(q).astype(jnp.bfloat16)
    dv, di = screen_int4_topc(q16, jnp.asarray(pk), jnp.asarray(sc),
                              jnp.asarray(valid), c, block=n + 1)
    bv, bi = screen_int4_topc(q16, jnp.asarray(pk), jnp.asarray(sc),
                              jnp.asarray(valid), c, block=256)
    np.testing.assert_array_equal(np.asarray(di), np.asarray(bi))
    np.testing.assert_allclose(np.asarray(dv), np.asarray(bv), rtol=1e-6)
    # none of the returned ids may be masked rows
    assert valid[np.asarray(bi).ravel()].all()


def test_pallas_screen_kernel_matches_reference():
    """int4_screen_scores_pallas (paired-row storage, interpret mode on
    CPU) == unpack2_dots * scales bit-for-bit; the segmented top-c
    wrapper == masked argsort. The kernel exists because no XLA
    formulation of the batched packed sweep engages the MXU
    (ARCHITECTURE.md int4-at-scale; bench_results/int4_fuse*_probe.json)."""
    import jax.numpy as jnp

    from image_retrieval_tpu.ops.int4 import quantize_pack_int4, unpack2_dots
    from image_retrieval_tpu.ops.pallas_kernels import (
        int4_screen_scores_pallas,
        int4_screen_topc_pallas,
        pack_words_paired,
    )

    rng = np.random.default_rng(23)
    n, d, c = 1024, 64, 16
    rows = rng.normal(size=(n, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    pk, sc = quantize_pack_int4(rows)
    pkp = pack_words_paired(pk)
    q16 = jnp.asarray(
        rng.normal(size=(4, d)).astype(np.float32)).astype(jnp.bfloat16)
    want = np.asarray(unpack2_dots(q16, jnp.asarray(pk))) * sc[None, :]
    got = np.asarray(int4_screen_scores_pallas(
        q16, jnp.asarray(pkp), jnp.asarray(sc), block_n=128))
    np.testing.assert_array_equal(want, got)

    valid = np.ones(n, bool)
    valid[rng.choice(n, 200, replace=False)] = False
    tv, ti = int4_screen_topc_pallas(
        q16, jnp.asarray(pkp), jnp.asarray(sc), jnp.asarray(valid), c,
        block_n=128, seg_rows=512)
    masked = np.where(valid[None, :], want, -np.inf)
    oracle = np.argsort(-masked, axis=1)[:, :c]
    assert np.array_equal(np.sort(np.asarray(ti), axis=1),
                          np.sort(oracle, axis=1))
    # none of the returned ids may be masked rows
    assert valid[np.asarray(ti).ravel()].all()
    # the production selector ("approx", lax.approx_max_k — a TPU-native
    # partial reduction) lowers to exact top_k off-TPU, so this asserts
    # full result parity here; on-TPU recall is measured in
    # bench_results/int4_isolate_probe.json
    av, ai = int4_screen_topc_pallas(
        q16, jnp.asarray(pkp), jnp.asarray(sc), jnp.asarray(valid), c,
        block_n=128, seg_rows=512, selector="approx")
    np.testing.assert_array_equal(np.asarray(ai), np.asarray(ti))
    np.testing.assert_array_equal(np.asarray(av), np.asarray(tv))


def test_pallas_screen_qform_i8_exact_integer_math():
    """qform='i8' quantizes queries to int8 and runs integer MXU dots;
    selected values must equal the numpy integer simulation exactly
    (integer accumulation is exact; the f32 scaling is deterministic),
    and the returned candidate ids must rank by the simulated scores."""
    from image_retrieval_tpu.ops.pallas_kernels import (
        int4_screen_topc_pallas,
        pack_words_paired,
    )

    rng = np.random.default_rng(9)
    n, d, q_n, c = 512, 512, 3, 16
    rows = rng.normal(size=(n, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    pk, sc = quantize_pack_int4(rows)
    q = rng.normal(size=(q_n, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # numpy sim: symmetric int8 query grid, integer dots, f32 scaling
    qs = np.maximum(np.abs(q).max(axis=1, keepdims=True), 1e-12) / 127.0
    qq = np.clip(np.rint(q / qs), -127, 127).astype(np.int64)
    vals = unpack_nibbles(pk).astype(np.int64)
    sim = (qq @ vals.T).astype(np.float32) * sc[None, :] * qs.astype(
        np.float32)

    pkp = pack_words_paired(pk)
    # raw f32 queries: the i8 grid quantizes from f32 exactly as the sim
    tv, ti = int4_screen_topc_pallas(
        jnp.asarray(q), jnp.asarray(pkp),
        jnp.asarray(sc), jnp.ones((n,), bool), c,
        block_n=128, seg_rows=512, qform="i8")
    tv, ti = np.asarray(tv), np.asarray(ti)
    order = np.argsort(-sim, axis=1)[:, :c]
    for r in range(q_n):
        np.testing.assert_array_equal(np.sort(ti[r]), np.sort(order[r]))
        np.testing.assert_allclose(tv[r], sim[r][ti[r]], rtol=1e-6, atol=1e-7)
    # the i8 screen's candidate set stays a faithful screen: top-10 of the
    # bf16 form and the i8 form overlap almost completely at this size
    bv, bi = int4_screen_topc_pallas(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(pkp),
        jnp.asarray(sc), jnp.ones((n,), bool), c,
        block_n=128, seg_rows=512, qform="bf16")
    bi = np.asarray(bi)
    overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / c
                       for a, b in zip(ti, bi)])
    assert overlap >= 0.9


def test_unpack8_dots_i32_matches_unpack2():
    import jax.numpy as jnp

    from image_retrieval_tpu.ops.int4 import (
        quantize_pack_int4,
        unpack2_dots,
        unpack8_dots_i32,
    )

    rng = np.random.default_rng(29)
    rows = rng.normal(size=(300, 64)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    pk, _sc = quantize_pack_int4(rows)
    q16 = jnp.asarray(
        rng.normal(size=(3, 64)).astype(np.float32)).astype(jnp.bfloat16)
    a = np.asarray(unpack2_dots(q16, jnp.asarray(pk)))
    b = np.asarray(unpack8_dots_i32(q16, jnp.asarray(pk)))
    pk32 = np.ascontiguousarray(pk).view(np.int32)
    c = np.asarray(unpack8_dots_i32(q16, jnp.asarray(pk32)))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
