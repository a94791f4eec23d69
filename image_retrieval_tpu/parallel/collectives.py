"""Sharded search: per-shard score + top-k, ICI all-gather merge.

This is the TPU-native replacement for the Milvus client-server ANN hop
(reference image_search.py:85-95): gallery rows live sharded across the mesh
`data` axis; each device scores its shard and reduces to a local top-k; only
(k values, k indices) per device cross the interconnect, merged into the
global top-k on every device. Exact search — the reference's
overfetch-then-rerank (image_search.py:93-107) collapses into one pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

# int4 screen query form for the production sweeps (ops/pallas_kernels.py
# _int4_screen_scores_halves): "bf16" = unpack2_dots-exact scores; "i8" =
# int8-quantized queries on the MXU's double-rate integer path (ranking-
# neutral per-query scale, integer-exact vs its own sim). Flip to "i8"
# only on a captured win — bench_results/int4_prod_probe.json
# kernel_16M_approx_qi8 vs kernel_16M_approx.
INT4_SCREEN_QFORM = "bf16"

from image_retrieval_tpu.ops.metrics import pairwise_metrics
from image_retrieval_tpu.ops.topk import exact_topk, two_key_topk, DESCENDING_METRICS

def _axis_size(mesh: "Mesh", axis) -> int:
    """Total shard count along `axis`, which may be one name or a tuple of
    names (multi-slice row sharding uses ('slice', 'data'))."""
    names = axis if isinstance(axis, tuple) else (axis,)
    size = 1
    for a in names:
        size *= mesh.shape[a]
    return size


def _gather_merge_topk(
    vals: jnp.ndarray,
    gidx: jnp.ndarray,
    axis: str,
    k: int,
    descending: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inside shard_map: all_gather per-shard (Q, kk) candidates over `axis`
    and reduce to the merged top-k, replicated along that axis.

    Deterministic tie-break: equal scores order by ascending global index
    (two-key sort: index asc first, then stable score sort)."""
    all_vals = jax.lax.all_gather(vals, axis, axis=-1, tiled=True)
    all_idx = jax.lax.all_gather(gidx, axis, axis=-1, tiled=True)
    return two_key_topk(all_vals, all_idx, k, descending)


def _score_block(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    mags: Optional[jnp.ndarray],
    metric: str,
    weights: Optional[Tuple[float, ...]],
) -> jnp.ndarray:
    """(Q, D) x (Nl, D) -> (Q, Nl) scores for one gallery shard.

    `mags` carries stored magnitudes: the index stores unit vectors plus
    magnitude (reference ImageEmbeddingSystem.py:88-94); metrics that need
    unnormalized geometry (L1/L2/Linf/magnitude and the optimized combo,
    reference image_search.py:103-107 reranks with *unnormalized* query and
    stored vectors) are computed on mags-rescaled vectors."""
    if metric == "optimized_similarity":
        # One fused HBM pass over the shard (measured at HBM speed-of-light
        # on v5e; see ops/metrics.py fused_optimized_scores_xla).
        from image_retrieval_tpu.ops.metrics import fused_optimized_scores_xla

        m = mags if mags is not None else jnp.ones((gallery.shape[0],), jnp.float32)
        return fused_optimized_scores_xla(queries, gallery, m, weights)
    if metric in ("cosine_similarity", "cosine_distance", "angular_distance"):
        # Stored rows are unit-norm: cos = <g, q>/||q|| directly. Recomputing
        # per-row gallery norms (pairwise_metrics' general path) would add a
        # second full HBM sweep — measured 9.5 ms vs 2.8 ms per 1M x 512
        # query on v5e.
        q = queries.astype(jnp.float32)
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        dots = jnp.dot(q, gallery.astype(jnp.float32).T,
                       preferred_element_type=jnp.float32)
        cos = jnp.where(qn > 0, dots / jnp.where(qn > 0, qn, 1.0), 0.0)
        if metric == "cosine_similarity":
            return cos
        if metric == "cosine_distance":
            return 1.0 - cos
        return jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    g = gallery if mags is None else gallery * mags[:, None]
    return pairwise_metrics(queries, g, metrics=(metric,))[metric]


def _masked_shard_scores(q, g, v, m, sc, metric, weights, descending,
                         sh=None):
    """(Q, Nl) scores for one gallery shard, tombstones masked to +/-inf.

    `m`/`sc`/`sh` arrive as 1-tuples (or None) — the shard_map wrappers
    keep the signature uniform whether magnitudes/int8-scales/the bf16
    L1-shadow exist."""
    if sh is not None and sc is not None and metric == "optimized_similarity":
        # int8 fast path + pre-dequantized bf16 shadow for the L1/Linf
        # sweep (IndexConfig.l1_shadow): one less VPU op per (Q, Nl, D)
        # element, bitwise-identical scores (ops/metrics.py).
        from image_retrieval_tpu.ops.metrics import (
            fused_optimized_scores_int8_shadow,
        )

        mm = m[0] if m is not None else jnp.ones((g.shape[0],), jnp.float32)
        scores = fused_optimized_scores_int8_shadow(
            q, g, sc[0], mm, sh[0], weights
        )
    elif sc is not None and metric == "optimized_similarity":
        # int8 fast path: angle + L2 + mag terms come off one bf16 MXU dot
        # (norm-preserving scales make the Gram-form L2 exact); only live
        # L1/Linf terms sweep (Q, Nl, D), in bf16.
        from image_retrieval_tpu.ops.metrics import fused_optimized_scores_int8

        mm = m[0] if m is not None else jnp.ones((g.shape[0],), jnp.float32)
        scores = fused_optimized_scores_int8(q, g, sc[0], mm, weights)
    elif sc is not None and metric == "cosine_similarity":
        # int8 fast path: bf16 MXU dot, per-row scale applied to the (Q, Nl)
        # result instead of dequantizing (N, D) rows (measured 0.87 ms vs
        # 1.08 ms per 1M x 512 query on v5e).
        qf = q.astype(jnp.float32)
        qn = jnp.linalg.norm(qf, axis=-1, keepdims=True)
        qu = jnp.where(qn > 0, qf / jnp.where(qn > 0, qn, 1.0), 0.0)
        dots = jnp.dot(
            qu.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        scores = dots * sc[0][None, :]
    else:
        if sc is not None:
            # generic dequant, fused into the score sweep by XLA
            g = g.astype(jnp.float32) * sc[0][:, None]
        scores = _score_block(q, g, None if m is None else m[0], metric, weights)
    bad = jnp.float32(-jnp.inf if descending else jnp.inf)
    return jnp.where(v[0][None, :], scores, bad)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "weights", "mesh", "axis", "selector"),
)
def sharded_search_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    valid: jnp.ndarray,
    mags: Optional[jnp.ndarray],
    k: int,
    metric: str = "cosine_similarity",
    weights: Optional[Tuple[float, ...]] = None,
    scales: Optional[jnp.ndarray] = None,
    shadow: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    axis: str = "data",
    selector: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a row-sharded gallery.

    selector: "exact" (bitwise top-k, the default contract) or "approx"
    (IndexConfig.approx_select): per-shard approx_max_k/approx_min_k
    over-selects C = max(4*k, 128) candidates whose returned scores are
    the TRUE scores, then exact top-k of those — only the candidate SET
    is approximate. Measured at 16M x 512 int8, Q=64: 9.8 ms vs the
    exact sweep's 56.6 ms (5.8x) at recall@10 0.9984
    (bench_results/int8_tiled_probe.json; a tiled exact scan measured NO
    win — the fused sweep is not selection-bound the way the pre-r4 int4
    path was). The reference's own default is far more approximate
    (Milvus IVF, nprobe=10).

    Args:
        queries: (Q, D) replicated.
        gallery: (N, D) sharded over `axis` (N divisible by mesh axis size).
        valid:   (N,) bool mask for live rows (the index pads capacity).
        mags:    optional (N,) stored magnitudes.
        k: results per query.
        metric: metric name or "optimized_similarity".
        weights: 5-tuple (w_angle, w_l1, w_l2, w_inf, w_mag) when optimized.
        scales:  optional (N,) int8 norm-preserving scales.
        shadow:  optional (N, D) bf16 pre-dequantized rows
                 (IndexConfig.l1_shadow) for the optimized L1/L∞ sweep.

    Returns:
        (values, global_indices), each (Q, k), replicated on all devices.
    """
    descending = metric in DESCENDING_METRICS
    nshards = _axis_size(mesh, axis)
    nlocal = gallery.shape[0] // nshards
    kk = min(k, nlocal)

    def local(q, g, v, m, sc, sh):
        shard_id = jax.lax.axis_index(axis)
        scores = _masked_shard_scores(q, g, v, m, sc, metric, weights,
                                      descending, sh)
        if selector == "approx":
            cc = min(max(4 * k, 128), nlocal)
            sel = (jax.lax.approx_max_k if descending
                   else jax.lax.approx_min_k)
            av, ai = sel(scores, cc, recall_target=0.95)
            tv, tpos = exact_topk(av, kk, descending=descending)
            vals = tv
            idx = jnp.take_along_axis(ai, tpos, axis=1)
        else:
            vals, idx = exact_topk(scores, kk, descending=descending)
        gidx = idx + shard_id * nlocal
        # Ship only (k, k) per shard over ICI; merge replicated on all devices.
        return _gather_merge_topk(vals, gidx, axis, k, descending)

    in_specs = (
        P(),  # queries replicated
        P(axis, None),  # gallery rows sharded
        P(axis),  # valid sharded
        P(axis) if mags is not None else P(),
        P(axis) if scales is not None else P(),
        P(axis, None) if shadow is not None else P(),
    )
    # valid/mags arrive inside shard_map as (nlocal,) blocks; wrap to keep the
    # function signature uniform.
    fn = shard_map(
        lambda q, g, v, m, sc, sh: local(
            q, g, (v,), None if mags is None else (m,),
            None if scales is None else (sc,),
            None if shadow is None else (sh,),
        ),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    # tiny replicated placeholders when an operand is absent — never a
    # full-size dummy (a replicated (N,) zero buffer costs real HBM per
    # device at the 16M+ tiers; the P() specs above make (1,) legal
    # because `local` never reads the placeholder)
    dummy = jnp.zeros((1,), jnp.float32) if mags is None else mags
    dummy_sc = jnp.zeros((1,), jnp.float32) if scales is None else scales
    dummy_sh = (jnp.zeros((1, 1), jnp.bfloat16) if shadow is None else shadow)
    return fn(queries, gallery, valid, dummy, dummy_sc, dummy_sh)


@functools.partial(jax.jit, static_argnames=("k", "mesh", "axis"))
def sharded_multimetric_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    valid: jnp.ndarray,
    mags: jnp.ndarray,
    k: int,
    scales: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    axis: str = "data",
):
    """Per-metric exact top-k for all five metrics in ONE gallery pass.

    Returns {metric: (values (Q,k), indices (Q,k))} for cosine_similarity
    (descending) and l1/l2/linf/magnitude distances (ascending) — the
    single-sweep replacement for the reference's overfetch-then-sort-5-ways
    (image_search.py:163-220), exact instead of candidate-limited."""
    nshards = _axis_size(mesh, axis)
    nlocal = gallery.shape[0] // nshards
    kk = min(k, nlocal)
    metric_dirs = (
        ("cosine_similarity", True),
        ("l1_distance", False),
        ("l2_distance", False),
        ("linf_distance", False),
        ("magnitude_difference", False),
    )

    def local(q, g, v, m, sc):
        shard_id = jax.lax.axis_index(axis)
        if sc is not None:
            g = g.astype(jnp.float32) * sc[0][:, None]
        d = g.shape[-1]
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        dots = jnp.dot(q, g.T, preferred_element_type=jnp.float32)
        cos = jnp.where(qn > 0, dots / jnp.where(qn > 0, qn, 1.0), 0.0)
        diff = g[None] * m[None, :, None] - q[:, None, :]
        ad = jnp.abs(diff)
        planes = {
            "cosine_similarity": cos,
            "l1_distance": jnp.sum(ad, axis=-1) / d,
            "l2_distance": jnp.sqrt(jnp.sum(diff * diff, axis=-1))
            / jnp.sqrt(jnp.float32(d)),
            "linf_distance": jnp.max(ad, axis=-1),
            "magnitude_difference": jnp.abs(m[None, :] - qn),
        }
        outs = []
        for name, descending in metric_dirs:
            s = planes[name]
            bad = jnp.float32(-jnp.inf if descending else jnp.inf)
            s = jnp.where(v[None, :], s, bad)
            vals, idx = exact_topk(s, kk, descending=descending)
            gidx = idx + shard_id * nlocal
            outs.append(_gather_merge_topk(vals, gidx, axis, k, descending))
        return tuple(outs)

    fn = shard_map(
        lambda q, g, v, m, sc: local(
            q, g, v, m, None if scales is None else (sc,)
        ),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis),
                  P(axis) if scales is not None else P()),
        out_specs=tuple((P(), P()) for _ in metric_dirs),
        check_vma=False,
    )
    dummy_sc = jnp.zeros((1,), jnp.float32) if scales is None else scales
    outs = fn(queries, gallery, valid, mags, dummy_sc)
    return {name: out for (name, _), out in zip(metric_dirs, outs)}


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "weights", "mesh", "slice_axis", "data_axis"),
)
def multislice_search_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    valid: jnp.ndarray,
    mags: Optional[jnp.ndarray],
    k: int,
    metric: str = "cosine_similarity",
    weights: Optional[Tuple[float, ...]] = None,
    scales: Optional[jnp.ndarray] = None,
    shadow: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    slice_axis: str = "slice",
    data_axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a gallery row-sharded across a (slice, data) mesh
    with a HIERARCHICAL merge: per-shard top-k -> intra-slice merge over the
    `data` axis (ICI-speed collectives) -> cross-slice merge over the
    `slice` axis (DCN-speed).

    This is the >1-TPU-slice scale-out of sharded_search_topk (SURVEY §5:
    "DCN if the index ever exceeds one slice"): each device ships k
    candidates over ICI, but only k candidates per SLICE — not k per chip —
    ever cross the slow inter-slice DCN links. Results are identical to the
    flat single-axis merge (tested on a virtual (2, 4) mesh vs (8,)).

    `gallery`/`valid`/`mags`/`scales` are sharded P((slice_axis, data_axis))
    on their row dimension; shard linear order is slice-major, so global row
    indices are (slice_id * n_data + data_id) * rows_per_shard + local_row.
    """
    descending = metric in DESCENDING_METRICS
    n_slices = mesh.shape[slice_axis]
    n_data = mesh.shape[data_axis]
    nlocal = gallery.shape[0] // (n_slices * n_data)
    kk = min(k, nlocal)

    def local(q, g, v, m, sc, sh):
        slice_id = jax.lax.axis_index(slice_axis)
        data_id = jax.lax.axis_index(data_axis)
        scores = _masked_shard_scores(q, g, v, m, sc, metric, weights,
                                      descending, sh)
        vals, idx = exact_topk(scores, kk, descending=descending)
        gidx = idx + (slice_id * n_data + data_id) * nlocal
        # stage 1: merge the slice's shards over ICI
        vals, gidx = _gather_merge_topk(vals, gidx, data_axis, k, descending)
        # stage 2: merge k-sized per-slice results over DCN
        return _gather_merge_topk(vals, gidx, slice_axis, k, descending)

    row = P((slice_axis, data_axis))
    fn = shard_map(
        lambda q, g, v, m, sc, sh: local(
            q, g, (v,), None if mags is None else (m,),
            None if scales is None else (sc,),
            None if shadow is None else (sh,),
        ),
        mesh=mesh,
        in_specs=(
            P(),
            P((slice_axis, data_axis), None),
            row,
            row if mags is not None else P(),
            row if scales is not None else P(),
            P((slice_axis, data_axis), None) if shadow is not None else P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    dummy = jnp.zeros((1,), jnp.float32) if mags is None else mags
    dummy_sc = jnp.zeros((1,), jnp.float32) if scales is None else scales
    dummy_sh = (jnp.zeros((1, 1), jnp.bfloat16) if shadow is None else shadow)
    return fn(queries, gallery, valid, dummy, dummy_sc, dummy_sh)


@functools.partial(jax.jit, static_argnames=("c", "mesh", "axis"))
def sharded_int4_screen_topk(
    queries: jnp.ndarray,
    packed: jnp.ndarray,
    valid: jnp.ndarray,
    scales: jnp.ndarray,
    c: int,
    *,
    mesh: Mesh,
    axis="data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine SCREEN over a nibble-packed int4 row-sharded gallery.

    Phase 1 of the two-phase int4 tier (ops/int4.py): per-shard sweep ->
    local top-c -> hierarchical merge (innermost axis first, so a
    ('slice', 'data') sharding merges over ICI before DCN exactly like
    multislice_search_topk). Returns (approx scores, global indices), each
    (Q, c) replicated; feed the indices to the exact int8 rerank
    (ops/int4.py rerank_int8_topk). Rows where `valid` is False (tombstones
    or an attribute-filter mask) score -inf and surface only as padding
    when fewer than c rows are live.

    Two gallery layouts select the sweep engine:
      * (N, D/2) uint8 nibble rows — the XLA tiled two-dot sweep
        (ops/int4.py screen_int4_topc). Portable fallback.
      * (N/2, 2*D/8) int32 PAIRED rows (ops/pallas_kernels.py
        pack_words_paired, applied per shard so local ids stay
        contiguous) — the Pallas MXU screen kernel, ~29x the XLA form at
        scale (bench_results/int4_isolate_probe.json: the XLA unpack runs
        as a per-query VPU reduce). Production resident int4 uses this.
    """
    names = axis if isinstance(axis, tuple) else (axis,)
    nshards = _axis_size(mesh, names)
    paired = packed.dtype == jnp.int32
    # paired storage rows carry TWO gallery rows each
    nlocal = packed.shape[0] // nshards * (2 if paired else 1)
    cc = min(c, nlocal)
    if paired:
        from image_retrieval_tpu.ops.pallas_kernels import (
            int4_paired_block_n,
            int4_screen_topc_pallas,
        )

        bn = int4_paired_block_n(nlocal // 2)
        assert bn, (
            "paired int4 layout requires per-shard row counts in 256-row "
            f"multiples (got {nlocal} gallery rows/shard)"
        )

        def sweep(qu, g, v, sc):
            # approx selector: the screen is approximate by design (exact
            # int8 rerank follows); lax.top_k's exact selection over the
            # wide plane costs more than the whole sweep at 16M rows
            # (int4_isolate_probe.json: 6.2 vs 0.09 ms/query)
            return int4_screen_topc_pallas(qu, g, sc, v, cc, block_n=bn,
                                           selector="approx",
                                           qform=INT4_SCREEN_QFORM)
    else:
        from image_retrieval_tpu.ops.int4 import screen_int4_topc

        def sweep(qu, g, v, sc):
            # tiled sweep: the direct two-dot form loses unpack fusion
            # (and ~15x bandwidth) on multi-M-row shards — ops/int4.py
            return screen_int4_topc(qu, g, sc, v, cc)

    def local(q, g, v, sc):
        sid = jnp.int32(0)
        for a in names:
            sid = sid * mesh.shape[a] + jax.lax.axis_index(a)
        qf = q.astype(jnp.float32)
        qn = jnp.linalg.norm(qf, axis=-1, keepdims=True)
        qu = jnp.where(qn > 0, qf / jnp.where(qn > 0, qn, 1.0), 0.0)
        vals, idx = sweep(qu.astype(jnp.bfloat16), g, v, sc)
        gidx = idx + sid * nlocal
        for a in reversed(names):  # data (ICI) before slice (DCN)
            vals, gidx = _gather_merge_topk(vals, gidx, a, c, True)
        return vals, gidx

    row_axes = names if len(names) > 1 else names[0]
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(row_axes, None), P(row_axes), P(row_axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, packed, valid, scales)


@functools.partial(jax.jit, static_argnames=("c", "k", "mesh", "axis"))
def sharded_int4_two_phase_topk(
    queries: jnp.ndarray,
    packed: jnp.ndarray,
    valid: jnp.ndarray,
    scales: jnp.ndarray,
    rows8: jnp.ndarray,
    scales8: jnp.ndarray,
    c: int,
    k: int,
    *,
    mesh: Mesh,
    axis="data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int4 two-phase search in ONE dispatch: per-shard Pallas screen ->
    in-jit gather of the shard's int8 rows -> exact bf16 rerank -> ICI
    merge of EXACT k-lists (IndexConfig.rerank_device).

    Semantics vs the host-gather path (`sharded_int4_screen_topk` + host
    rerank): each shard reranks its own top-c screen candidates, so the
    candidate pool is c PER SHARD (a superset of the global-top-c pool —
    recall can only improve) and the merged scores are the identical
    exact-int8 math, making results interchangeable with dtype='int8'
    whenever the screen covers its top-k. No host hop: the device-fetch
    count per search drops from 2 (screen ids + rerank result) to 1.

    `packed` must be the PAIRED int32 layout (pack_words_paired per
    shard); `rows8`/`scales8` are the same row-sharded int8 gallery the
    resident int8 tier would hold.
    """
    from image_retrieval_tpu.ops.pallas_kernels import (
        int4_paired_block_n,
        int4_screen_topc_pallas,
    )

    names = axis if isinstance(axis, tuple) else (axis,)
    nshards = _axis_size(mesh, names)
    nlocal = packed.shape[0] // nshards * 2
    cc = min(c, nlocal)
    kk = min(k, cc)
    bn = int4_paired_block_n(nlocal // 2)
    assert bn, nlocal

    def local(q, g, v, sc, g8, s8):
        sid = jnp.int32(0)
        for a in names:
            sid = sid * mesh.shape[a] + jax.lax.axis_index(a)
        qf = q.astype(jnp.float32)
        qn = jnp.linalg.norm(qf, axis=-1, keepdims=True)
        qu = jnp.where(qn > 0, qf / jnp.where(qn > 0, qn, 1.0), 0.0)
        sv, sidx = int4_screen_topc_pallas(
            qu.astype(jnp.bfloat16), g, sc, v, cc, block_n=bn,
            selector="approx", qform=INT4_SCREEN_QFORM)
        # exact rerank of the LOCAL candidates against the shard's int8
        # rows — identical math to the resident int8 sweep (bf16 dot *
        # norm-preserving scale), so merged results match dtype='int8'
        cand = jnp.take(g8, sidx, axis=0).astype(jnp.bfloat16)  # (Q, cc, D)
        ex = jnp.einsum("qd,qcd->qc", qu.astype(jnp.bfloat16), cand,
                        preferred_element_type=jnp.float32)
        ex = ex * jnp.take(s8, sidx, axis=0)
        ex = jnp.where(jnp.isfinite(sv), ex, -jnp.inf)  # screen padding
        vals, pos = jax.lax.top_k(ex, kk)
        gidx = jnp.take_along_axis(sidx, pos, axis=1) + sid * nlocal
        for a in reversed(names):  # data (ICI) before slice (DCN)
            vals, gidx = _gather_merge_topk(vals, gidx, a, k, True)
        return vals, gidx

    row_axes = names if len(names) > 1 else names[0]
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(row_axes, None), P(row_axes), P(row_axes),
                  P(row_axes, None), P(row_axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, packed, valid, scales, rows8, scales8)


@functools.partial(jax.jit, static_argnames=("metric", "weights", "mesh", "axis"))
def sharded_scores(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    mags: Optional[jnp.ndarray],
    metric: str,
    weights: Optional[Tuple[float, ...]] = None,
    scales: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Full (Q, N) score matrix, gathered. For analysis-scale galleries."""

    def local(q, g, m, sc):
        if sc is not None:
            g = g.astype(jnp.float32) * sc[0][:, None]
        s = _score_block(q, g, None if mags is None else m[0], metric, weights)
        return jax.lax.all_gather(s, axis, axis=-1, tiled=True)

    fn = shard_map(
        lambda q, g, m, sc: local(
            q, g, None if mags is None else (m,),
            None if scales is None else (sc,),
        ),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis) if mags is not None else P(),
                  P(axis) if scales is not None else P()),
        out_specs=P(),
        check_vma=False,
    )
    dummy = jnp.zeros((1,), jnp.float32) if mags is None else mags
    dummy_sc = jnp.zeros((1,), jnp.float32) if scales is None else scales
    return fn(queries, gallery, dummy, dummy_sc)
