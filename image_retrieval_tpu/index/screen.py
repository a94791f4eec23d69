"""Projection-screened two-phase search: int8 sketch sweep -> exact rerank.

This is the TPU-native replacement for Milvus's compressed screening tiers
(IVF_SQ8 / IVF_PQ — the smaller-footprint siblings of the IVF_FLAT index the
reference builds, ImageEmbeddingSystem.py:56-61). Product quantization was
measured and rejected on this hardware: ADC table lookups are gathers, and
the TPU has no scatter/gather unit — 758 ms/query at 1M rows
(bench_results/pq_probe.json, ARCHITECTURE.md). The screening transform here
is therefore a dense projection — an MXU matmul — instead of a codebook:

  phase 1  q' = q @ P;  sweep the int8 (N, ds) sketch (ds << D) for the
           top-C candidates per shard. Reads ds/D of the exact sweep's HBM
           bytes, which is the whole win: the exact int8 sweep is
           HBM-bandwidth-bound (ARCHITECTURE.md), so a ds=128 sketch of
           D=512 rows bounds phase 1 at ~4x faster.
  phase 2  gather the C full-dimension stored rows per query (tiny:
           Q*C*D bytes) and rerank with EXACTLY the resident engine's
           scoring math (bf16 MXU dot x norm-preserving int8 scale — the
           same ops as parallel/collectives._masked_shard_scores), so any
           candidate set that covers the true top-k reproduces the exact
           engine's results bit-for-bit.

The projection P is either the gallery's top-ds principal subspace
("pca": eigenvectors of the uncentered second moment X^T X, the best
rank-ds dot-product preserver, computed on-device in one sharded matmul) or
a seeded random rotation ("random": data-free, for galleries that mutate
faster than a refit). Like IVF, recall is a measured property of the data's
clusteredness — numbers in ARCHITECTURE.md / bench_results/screen_probe.json.

Plugs into the app facade as SearchConfig.ann = "screen" through the same
`ann.search(q_unit, top_k) -> (cos, idx)` candidate contract as IVFIndex
(app/search.py ann_valid_candidates), and is rebuilt from the parent index
on its mutation `generation` — a rebuild is one sharded matmul, not a
k-means (seconds at 8M rows, vs ~30 min for the IVF build).

Cosine only, like the streamed tier: the multi-metric planes (L1/Linf) are
not preserved by projection; use the exact engine for those.

Beyond-HBM (streamed) galleries get a STREAMED screen mode: the sketch
(N x ds int8 — fits HBM even when the N x D gallery does not, e.g. 4 GB at
32M x 128 vs 16 GB) stays device-resident; phase 2 gathers only the query
batch's Q*C candidate rows from host RAM (~4 MB at Q=64, C=128) and
reranks them on device with the streamed engine's exact bf16 math. That
is ~1000x less host->device traffic than the streamed exact sweep
(N*D bytes — 4 GB at 8M) and ~200x less than the offloaded IVF's probed
slabs, at the sketch tier's recall. Build cost: one chunked streamed pass
(project+quantize on device) for method='random', two for 'pca' (the fit
streams the rows once more for the second moment).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from image_retrieval_tpu.ops.topk import exact_topk
from image_retrieval_tpu.parallel.collectives import _gather_merge_topk
from image_retrieval_tpu.parallel.mesh import replicate, shard_rows


def _fit_projection(
    d: int, ds: int, method: str, seed: int, cov: Optional[np.ndarray]
) -> np.ndarray:
    """(D, ds) projection: top-ds eigenvectors of the supplied uncentered
    second moment ('pca') or a seeded orthonormal rotation ('random') —
    shared by the resident and streamed builds so the fit can never
    diverge between them."""
    if method == "pca":
        _, vecs = np.linalg.eigh(np.asarray(cov, np.float64))
        return np.ascontiguousarray(vecs[:, ::-1][:, :ds]).astype(np.float32)
    if method == "random":
        rng = np.random.default_rng(seed)
        qmat, _ = np.linalg.qr(rng.standard_normal((d, ds)))
        return qmat[:, :ds].astype(np.float32)
    raise ValueError(f"unknown screen method '{method}'")


def _quantize_rows_int8(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 with a norm-preserving scale (the index's
    insert() quantizer, vector_index.py): ||q row|| * scale == ||row||, so
    int8dot * scale == f32 dot up to grid rounding."""
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-12)
    grid = (absmax / 127.0)[:, None]
    q = jnp.clip(jnp.round(x / grid), -127, 127).astype(jnp.int8)
    qn = jnp.linalg.norm(q.astype(jnp.float32), axis=1)
    xn = jnp.linalg.norm(x, axis=1)
    scale = xn / jnp.where(qn > 0, qn, 1.0)
    return q, scale.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("mesh", "axes"))
def _sharded_second_moment(
    gallery: jnp.ndarray,
    valid: jnp.ndarray,
    scales: Optional[jnp.ndarray],
    *,
    mesh: Mesh,
    axes,
) -> jnp.ndarray:
    """(D, D) uncentered second moment of the live dequantized rows.

    The gallery stays row-sharded; XLA lowers X^T X to local matmuls plus a
    psum over the row axes — one pass, no host copy."""

    def local(g, v, sc):
        x = g.astype(jnp.float32)
        if sc is not None:
            x = x * sc[0][:, None]
        x = jnp.where(v[:, None], x, 0.0)
        cov = jnp.dot(x.T, x, preferred_element_type=jnp.float32)
        return jax.lax.psum(cov, axes)

    fn = shard_map(
        lambda g, v, sc: local(g, v, None if scales is None else (sc,)),
        mesh=mesh,
        in_specs=(P(axes, None), P(axes), P(axes) if scales is not None else P()),
        out_specs=P(),
        check_vma=False,
    )
    dummy = jnp.zeros((gallery.shape[0],), jnp.float32) if scales is None else scales
    return fn(gallery, valid, dummy)


@functools.partial(jax.jit, static_argnames=("mesh", "axes"))
def _sharded_project_quantize(
    gallery: jnp.ndarray,
    scales: Optional[jnp.ndarray],
    proj: jnp.ndarray,
    *,
    mesh: Mesh,
    axes,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sketch = quantize_int8(dequant(gallery) @ P), row-sharded in, row-
    sharded out — the sketch never exists on the host."""

    def local(g, sc, p):
        x = g.astype(jnp.float32)
        if sc is not None:
            x = x * sc[0][:, None]
        sk = jnp.dot(x, p, preferred_element_type=jnp.float32)
        return _quantize_rows_int8(sk)

    fn = shard_map(
        lambda g, sc, p: local(g, None if scales is None else (sc,), p),
        mesh=mesh,
        in_specs=(P(axes, None), P(axes) if scales is not None else P(), P()),
        out_specs=(P(axes, None), P(axes)),
        check_vma=False,
    )
    dummy = jnp.zeros((gallery.shape[0],), jnp.float32) if scales is None else scales
    return fn(gallery, dummy, proj)


# Resident phase-1 row tile: above this many local rows the sketch sweep
# runs blocked with a running top-C merge instead of materializing the
# (Qbucket, nlocal) score row and lax.top_k-ing its full width — at the
# 256-query bucket over a 1M-row shard that buffer alone is 1 GB and the
# full-width top_k outweighs the ds/D-sized sketch read (TODO r3 note;
# head-to-head capture: tools/tpu_screen_probe.py `p1direct` cases →
# bench_results/screen_probe.json, pending the tunnel outage).
_RESIDENT_P1_BLOCK = 1 << 17


def _phase1_local_topc(
    qs16: jnp.ndarray,
    sketch: jnp.ndarray,
    sk_scales: jnp.ndarray,
    valid: jnp.ndarray,
    cl: int,
    block: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shard-local sketch sweep -> top-cl, blocked when the shard is large.

    Direct path (shards <= one tile, or cl too big to tile): one (Q, Nl)
    dot + full-width top_k. Blocked path: lax.scan over `block`-row tiles
    with a running (vals, ids) merge, plus one statically-sized tail step
    for the remainder rows (shard sizes are rarely tile multiples — 1M is
    not — so the tail must not force the materializing path) — same
    contract, O(Q*block) peak memory."""
    n = sketch.shape[0]

    def direct():
        s1 = jnp.dot(qs16, sketch.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32) * sk_scales[None, :]
        s1 = jnp.where(valid[None, :], s1, -jnp.inf)
        return exact_topk(s1, cl, descending=True)

    if n <= block or cl > block:
        return direct()
    nb = n // block
    tail = n - nb * block

    def scored_tile(sk, sc, v, off):
        s = jnp.dot(qs16, sk.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32) * sc[None, :]
        s = jnp.where(v[None, :], s, -jnp.inf)
        cv, ci = exact_topk(s, min(cl, sk.shape[0]), descending=True)
        return cv, ci.astype(jnp.int32) + off

    def merge(carry, cv, ci):
        vals, ids = carry
        cand_vals = jnp.concatenate([vals, cv], axis=1)
        cand_ids = jnp.concatenate([ids, ci], axis=1)
        mv, mi = jax.lax.top_k(cand_vals, cl)
        return mv, jnp.take_along_axis(cand_ids, mi, axis=1)

    def step(carry, i):
        off = i * block
        cv, ci = scored_tile(
            jax.lax.dynamic_slice_in_dim(sketch, off, block, 0),
            jax.lax.dynamic_slice_in_dim(sk_scales, off, block, 0),
            jax.lax.dynamic_slice_in_dim(valid, off, block, 0),
            off,
        )
        return merge(carry, cv, ci), None

    q_n = qs16.shape[0]
    init = (jnp.full((q_n, cl), -jnp.inf, jnp.float32),
            jnp.full((q_n, cl), 0, jnp.int32))
    carry, _ = jax.lax.scan(step, init, jnp.arange(nb))
    if tail:
        cv, ci = scored_tile(sketch[nb * block:], sk_scales[nb * block:],
                             valid[nb * block:], nb * block)
        carry = merge(carry, cv, ci)
    return carry


@functools.partial(
    jax.jit,
    static_argnames=("c", "quantized", "mesh", "slice_axis", "data_axis",
                     "p1_block"),
)
def _screened_topc(
    q_sketch: jnp.ndarray,
    q_unit: jnp.ndarray,
    sketch: jnp.ndarray,
    sk_scales: jnp.ndarray,
    gallery: jnp.ndarray,
    valid: jnp.ndarray,
    g_scales: Optional[jnp.ndarray],
    c: int,
    quantized: bool,
    *,
    mesh: Mesh,
    slice_axis: Optional[str],
    data_axis: str,
    p1_block: int = _RESIDENT_P1_BLOCK,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-phase top-C: per-shard sketch sweep -> gather -> exact rerank ->
    ICI merge (hierarchical over (slice, data) when slice_axis is set).

    Returns (values, global_indices), each (Q, K) with K = merged candidate
    count; callers slice [:top_k]. Exhausted slots (fewer than K live rows)
    carry -inf values."""
    axes = (slice_axis, data_axis) if slice_axis else data_axis
    nshards = 1
    for a in (axes if isinstance(axes, tuple) else (axes,)):
        nshards *= mesh.shape[a]
    nlocal = gallery.shape[0] // nshards
    cl = min(c, nlocal)

    def local(qs, qu, sk, sks, g, v, gs):
        if slice_axis:
            sid = jax.lax.axis_index(slice_axis)
            did = jax.lax.axis_index(data_axis)
            n_data = mesh.shape[data_axis]
            shard_id = sid * n_data + did
        else:
            shard_id = jax.lax.axis_index(data_axis)
        # phase 1: int8 sketch sweep (bf16 MXU dot, per-row dequant on the
        # (Q, Nl) result — the resident int8 scorer's layout), blocked with
        # a running top-C merge on large shards (_phase1_local_topc)
        p1v, cidx = _phase1_local_topc(
            qs.astype(jnp.bfloat16), sk, sks, v, cl, p1_block
        )  # (Q, cl)
        # phase 2: gather the candidates' full rows and rerank exactly.
        rows = jnp.take(g, cidx, axis=0)  # (Q, cl, D)
        if quantized:
            # must match _masked_shard_scores' int8 cosine bitwise:
            # bf16 MXU dot x norm-preserving scale
            r = jnp.einsum(
                "qd,qcd->qc",
                qu.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * jnp.take(gs[0], cidx, axis=0)
        else:
            r = jnp.einsum(
                "qd,qcd->qc",
                qu.astype(jnp.float32), rows.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        # phase 1 pads with arbitrary rows when live < cl (direct path:
        # -inf-score row indices; blocked path: merge placeholders, which
        # can DUPLICATE a live row) — mask on the phase-1 value as well as
        # row validity so neither kind survives the rerank
        r = jnp.where(
            jnp.take(v, cidx, axis=0) & jnp.isfinite(p1v), r, -jnp.inf
        )
        vals, ii = exact_topk(r, cl, descending=True)
        gidx = jnp.take_along_axis(cidx, ii, axis=1) + shard_id * nlocal
        if slice_axis:
            vals, gidx = _gather_merge_topk(vals, gidx, data_axis, c, True)
            return _gather_merge_topk(vals, gidx, slice_axis, c, True)
        return _gather_merge_topk(vals, gidx, data_axis, c, True)

    row = P(axes, None)
    vec = P(axes)
    fn = shard_map(
        lambda qs, qu, sk, sks, g, v, gs: local(
            qs, qu, sk, sks, g, v, None if g_scales is None else (gs,)
        ),
        mesh=mesh,
        in_specs=(P(), P(), row, vec, row, vec,
                  vec if g_scales is not None else P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    dummy = (jnp.zeros((gallery.shape[0],), jnp.float32)
             if g_scales is None else g_scales)
    return fn(q_sketch, q_unit, sketch, sk_scales, gallery, valid, dummy)


_STREAM_FIT_CHUNK = 1 << 22  # 4M rows per host->device pass, like streaming.py


@functools.partial(jax.jit, static_argnames=())
def _chunk_second_moment(rows8: jnp.ndarray, sc: jnp.ndarray) -> jnp.ndarray:
    x = rows8.astype(jnp.float32) * sc[:, None]
    return jnp.dot(x.T, x, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def _chunk_project_quantize(
    rows8: jnp.ndarray, sc: jnp.ndarray, proj: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x = rows8.astype(jnp.float32) * sc[:, None]
    return _quantize_rows_int8(jnp.dot(x, proj, preferred_element_type=jnp.float32))


_PHASE1_BLOCK = 1 << 21  # rows per score tile: (Qb, 2M) f32 <= 2 GB at Qb=256


@functools.partial(jax.jit, static_argnames=("c", "n_valid"))
def _phase1_topc(
    q_sketch: jnp.ndarray, sketch: jnp.ndarray, sk_scales: jnp.ndarray,
    c: int, n_valid: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device sketch sweep (streamed mode: all rows live).

    Blocked over row tiles with a running top-c merge so the score matrix
    never materializes (Qb, N) — at the mode's own design point (32M rows,
    Qb=64) that buffer alone would be 8 GB, past v5e HBM. The sketch is
    padded to a block multiple at build time; pad rows (>= n_valid) are
    masked here, NOT via zero scales (a zero score would still outrank
    genuinely negative cosines)."""
    n = sketch.shape[0]
    q = q_sketch.astype(jnp.bfloat16)
    cc = min(c, n_valid)
    if n <= _PHASE1_BLOCK:
        s1 = jnp.dot(q, sketch.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32) * sk_scales[None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, s1.shape, 1)
        s1 = jnp.where(col < n_valid, s1, -jnp.inf)
        return jax.lax.top_k(s1, cc)
    nb = n // _PHASE1_BLOCK  # build pads to an exact multiple
    kb = min(cc, _PHASE1_BLOCK)

    def step(carry, i):
        vals, ids = carry
        off = i * _PHASE1_BLOCK
        sk = jax.lax.dynamic_slice_in_dim(sketch, off, _PHASE1_BLOCK, 0)
        sc = jax.lax.dynamic_slice_in_dim(sk_scales, off, _PHASE1_BLOCK, 0)
        s = jnp.dot(q, sk.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32) * sc[None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + off
        s = jnp.where(col < n_valid, s, -jnp.inf)
        cv, ci = jax.lax.top_k(s, kb)
        cand_vals = jnp.concatenate([vals, cv], axis=1)
        cand_ids = jnp.concatenate([ids, ci.astype(jnp.int32) + off], axis=1)
        mv, mi = jax.lax.top_k(cand_vals, cc)
        return (mv, jnp.take_along_axis(cand_ids, mi, axis=1)), None

    q_n = q_sketch.shape[0]
    init = (jnp.full((q_n, cc), -jnp.inf, jnp.float32),
            jnp.full((q_n, cc), -1, jnp.int32))
    (vals, ids), _ = jax.lax.scan(step, init, jnp.arange(nb))
    return vals, ids


@jax.jit
def _rerank_gathered(
    q_unit: jnp.ndarray, rows8: jnp.ndarray, sc: jnp.ndarray
) -> jnp.ndarray:
    """(Q, C) exact cosines for host-gathered candidate rows — the streamed
    engine's math exactly (bf16 MXU dot x norm-preserving scale)."""
    r = jnp.einsum(
        "qd,qcd->qc",
        q_unit.astype(jnp.bfloat16), rows8.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return r * sc


class ScreenedSearch:
    """Projection-screened cosine search over a ShardedVectorIndex's rows.

    Build with `from_index`; returns exact-reranked candidates through the
    same search() contract as IVFIndex (descending cosine, -1 padding for
    exhausted slots), so it drops into every ANN consumer unchanged.

    Over a beyond-HBM (streamed) index the engine switches to the streamed
    mode documented in the module docstring: device-resident sketch,
    host-RAM candidate gathers.
    """

    def __init__(
        self,
        index,
        proj: np.ndarray,
        sketch: jnp.ndarray,
        sk_scales: jnp.ndarray,
        candidates: int,
        method: str,
        streamed: bool = False,
    ):
        if candidates < 1:
            raise ValueError(
                f"candidates must be >= 1, got {candidates} "
                "(SearchConfig.screen_candidates / --screen-candidates)"
            )
        self._index = index
        self.proj = proj  # (D, ds) host copy, queries project on host
        # resident: (capacity, ds) int8 row-sharded / streamed: (n_pad, ds)
        # int8 on the default device
        self._sketch = sketch
        self._sk_scales = sk_scales
        self.candidates = int(candidates)
        self.method = method
        self.streamed = bool(streamed)
        self.generation = index.generation
        self.sketch_dims = int(proj.shape[1])
        # resident phase-1 tile; probes override (huge => direct full-width
        # top_k, the pre-r3c behavior) — see _RESIDENT_P1_BLOCK
        self.p1_block = _RESIDENT_P1_BLOCK

    # -- construction --------------------------------------------------------

    @classmethod
    def from_index(
        cls,
        index,
        sketch_dims: int = 128,
        candidates: int = 128,
        method: str = "pca",
        seed: int = 0,
    ) -> "ScreenedSearch":
        """Build the sketch from a resident index's device gallery (one
        sharded matmul — no host-side pass over the rows).

        method: "pca" (top-ds eigenvectors of X^T X — best dot-product
        preserving subspace, needs one extra gallery sweep) or "random"
        (seeded orthonormal rotation, data-free).
        """
        if index.count == 0:
            raise ValueError("cannot screen an empty index")
        index._sync_device()
        if getattr(index, "_packed4", False):
            raise ValueError(
                "the screen tier does not stack on an int4 index — "
                "dtype='int4' is already a two-phase screened design "
                "(full-dim int4 screen -> exact rerank, index/vector_index"
                ".py _search_int4); use dtype='int8' if you want the "
                "projection screen instead"
            )
        if index._stream is not None:
            return cls._from_streamed(index, sketch_dims, candidates,
                                      method, seed)
        d = index.dim
        ds = int(min(sketch_dims, d))
        axes = index._row_axes
        cov = None
        if method == "pca":
            cov = np.asarray(
                _sharded_second_moment(
                    index._gallery, index._valid, index._scales,
                    mesh=index.mesh, axes=axes,
                )
            )
        proj = _fit_projection(d, ds, method, seed, cov)
        sketch, sk_scales = _sharded_project_quantize(
            index._gallery, index._scales, replicate(jnp.asarray(proj), index.mesh),
            mesh=index.mesh, axes=axes,
        )
        return cls(index, proj, sketch, sk_scales, candidates, method)

    @classmethod
    def _from_streamed(
        cls, index, sketch_dims: int, candidates: int, method: str, seed: int
    ) -> "ScreenedSearch":
        """Beyond-HBM build: chunked host->device passes over the gallery —
        ONE for method='random' (project+quantize), TWO for 'pca' (the fit
        streams the rows once more for the second moment). Sketch assembled
        device-resident, padded to the phase-1 block multiple."""
        rows = index._stream_rows  # (n_live, D) int8, host
        scales = index._stream_scales  # (n_live,) f32, host
        n, d = rows.shape
        ds = int(min(sketch_dims, d))
        cov = None
        if method == "pca":
            cov = np.zeros((d, d), np.float64)
            for s in range(0, n, _STREAM_FIT_CHUNK):
                e = min(s + _STREAM_FIT_CHUNK, n)
                cov += np.asarray(_chunk_second_moment(
                    jnp.asarray(rows[s:e]), jnp.asarray(scales[s:e])
                ), np.float64)
        proj = _fit_projection(d, ds, method, seed, cov)
        pdev = jnp.asarray(proj)
        # preallocate the padded host sketch and fill chunk slices in place
        # (a parts-list + concatenate would transiently hold it twice —
        # gigabytes at the sizes this tier exists for); pad rows are masked
        # by n_valid in _phase1_topc
        n_pad = (-(-n // _PHASE1_BLOCK) * _PHASE1_BLOCK
                 if n > _PHASE1_BLOCK else n)
        sk_host = np.zeros((n_pad, ds), np.int8)
        sc_host = np.zeros((n_pad,), np.float32)
        for s in range(0, n, _STREAM_FIT_CHUNK):
            e = min(s + _STREAM_FIT_CHUNK, n)
            sk, sc = _chunk_project_quantize(
                jnp.asarray(rows[s:e]), jnp.asarray(scales[s:e]), pdev
            )
            sk_host[s:e] = np.asarray(sk)
            sc_host[s:e] = np.asarray(sc)
        # one device_put of the final (n_pad, ds) sketch: fits HBM by
        # construction (ds << D) even when the gallery itself does not
        sketch = jnp.asarray(sk_host)
        sk_scales = jnp.asarray(sc_host)
        del sk_host, sc_host
        return cls(index, proj, sketch, sk_scales, candidates, method,
                   streamed=True)

    @property
    def stale(self) -> bool:
        """True when the parent index has mutated since this sketch was
        built (insert/delete/compact). Rebuild with from_index."""
        return self.generation != self._index.generation

    def recall_at(
        self, queries: np.ndarray, exact_ids: np.ndarray, k: int = 10
    ) -> float:
        """Mean top-k recall vs exact ids — the (ds, candidates) tuning
        measurement (IVFIndex.recall_at's contract, one shared helper)."""
        from image_retrieval_tpu.index.evaluation import mean_recall

        _, got = self.search(queries, top_k=k)
        return mean_recall(got, exact_ids)

    # -- search ---------------------------------------------------------------

    def search(
        self, queries: np.ndarray, top_k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(cosine scores, global row ids), each (Q, top_k) — or (top_k,)
        for a single query vector. Exhausted slots are (-inf, -1), matching
        IVFIndex.search's padding contract."""
        if self.stale:
            raise ValueError(
                "index mutated since the sketch was built "
                f"(generation {self._index.generation} != {self.generation}); "
                "rebuild with ScreenedSearch.from_index"
            )
        idx = self._index
        idx._sync_device()
        q = np.asarray(queries, np.float32)
        single = q.ndim == 1
        if single:
            q = q[None]
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qu = q / np.where(qn > 0, qn, 1.0)
        if self.streamed:
            vals, gidx = self._search_streamed(qu, top_k)
            return (vals[0], gidx[0]) if single else (vals, gidx)
        # candidate pool is static per jit signature; snap overfetched
        # top_k requests up so callers never silently truncate
        c = self.candidates
        while c < top_k:
            c *= 2
        c = min(c, idx.capacity)
        qs = qu @ self.proj  # (Q, ds) host-side: Q x D x ds is tiny
        qdev, _, nq = idx._prep_queries(qu)
        qsdev, _, _ = idx._prep_queries(qs)
        slice_axis = "slice" if idx._multislice else None
        vals, gidx = _screened_topc(
            qsdev, qdev, self._sketch, self._sk_scales,
            idx._gallery, idx._valid, idx._scales,
            c, idx._quantized,
            mesh=idx.mesh, slice_axis=slice_axis, data_axis=idx.axis,
            p1_block=int(self.p1_block),
        )
        vals = np.asarray(vals)[:nq, :top_k]
        gidx = np.asarray(gidx)[:nq, :top_k]
        gidx = np.where(np.isfinite(vals), gidx, -1)
        if single:
            return vals[0], gidx[0]
        return vals, gidx

    def _search_streamed(
        self, qu: np.ndarray, top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Streamed mode: device sketch sweep -> host gather of the Q*C
        candidate rows (the ONLY gallery bytes that move) -> device exact
        rerank -> host top-k with the exact engine's (score desc, id asc)
        tie order."""
        idx = self._index
        rows = idx._stream_rows
        scales = idx._stream_scales
        n = rows.shape[0]
        c = self.candidates
        while c < top_k:
            c *= 2
        c = min(c, n)
        nq = qu.shape[0]
        # bucket Q for compile reuse like the resident path
        buckets = type(idx)._Q_BUCKETS
        qb = next((b for b in buckets if nq <= b), nq)
        qpad = (np.concatenate([qu, np.zeros((qb - nq, qu.shape[1]),
                                             np.float32)])
                if qb > nq else qu)
        qs = qpad @ self.proj
        _, cand = _phase1_topc(jnp.asarray(qs), self._sketch,
                               self._sk_scales, c, n)
        # gather ONLY the real queries' rows (this engine's whole point is
        # minimal host->device bytes), then zero-pad back to the Q bucket
        # so the rerank jit is reused across batch sizes
        cand = np.asarray(cand)[:nq]  # (nq, c) live-row ids
        g8 = rows[cand]  # (nq, c, D) int8 host gather
        sc = scales[cand]
        if qb > nq:
            g8 = np.concatenate(
                [g8, np.zeros((qb - nq,) + g8.shape[1:], np.int8)])
            sc = np.concatenate(
                [sc, np.zeros((qb - nq, sc.shape[1]), np.float32)])
        r = np.asarray(_rerank_gathered(
            jnp.asarray(qpad), jnp.asarray(g8), jnp.asarray(sc)
        ))[:nq]
        kk = min(top_k, n)
        # (score desc, id asc) tie order, matching the exact engines
        order = np.lexsort((cand, -r), axis=1)[:, :kk]
        vals = np.take_along_axis(r, order, axis=1)
        gidx = np.take_along_axis(cand, order, axis=1)
        if idx._stream_live is not None:
            gidx = idx._stream_live[gidx]
        if kk < top_k:
            pad = top_k - kk
            vals = np.concatenate(
                [vals, np.full((nq, pad), -np.inf, np.float32)], axis=1)
            gidx = np.concatenate(
                [gidx, np.full((nq, pad), -1, gidx.dtype)], axis=1)
        return vals, gidx
