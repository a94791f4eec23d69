"""Batched geometric similarity metrics (pure JAX, fused, f32 accumulation).

Re-designs the reference's scalar per-pair metric library
(reference geometric_metrics.py:8-149) as vectorized kernels:

  pairwise_metrics : (Q, D) x (N, D) -> {metric: (Q, N)}   one fused pass
  pair_metrics     : (P, D) x (P, D) -> {metric: (P,)}     row-aligned pairs

Semantics preserved exactly (incl. the dimension normalizations):
  cosine_similarity      reference geometric_metrics.py:12-18 (0 when a norm is 0)
  angular_distance       :21-26  arccos(clip(cos, -1, 1))
  cosine_distance        :29-31  1 - cos
  l1_distance            :34-39  sum|a-b| / D
  l2_distance            :42-47  sqrt(sum (a-b)^2) / sqrt(D)
  linf_distance          :50-52  max|a-b|
  magnitude_difference   :55-57  | ||a|| - ||b|| |
  optimized_similarity   :60-94  w_angle*cos - w_l1*L1 - w_l2*L2 - w_inf*Linf - w_mag*dmag
  optimized_distance     :97-111 = -optimized_similarity

TPU notes: the dot-product family (cosine/angular/L2-via-Gram) rides the MXU;
L1/Linf need elementwise reductions over D and are chunked over N to bound
memory. For the speed-of-light fused single-pass version see
ops/pallas_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

METRIC_NAMES = (
    "cosine_similarity",
    "cosine_distance",
    "angular_distance",
    "l1_distance",
    "l2_distance",
    "linf_distance",
    "magnitude_difference",
)

# The five "distance" metrics used by the MI analysis engine
# (reference mi_analysis.py:183-189).
ANALYSIS_METRICS = (
    "cosine_distance",
    "l1_distance",
    "l2_distance",
    "linf_distance",
    "magnitude_difference",
)


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched cosine similarity (Q,D) x (N,D) -> (Q,N).

    Returns 0.0 where either vector has zero norm
    (reference geometric_metrics.py:16-17)."""
    a, b = _f32(a), _f32(b)
    dots = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    na = jnp.linalg.norm(a, axis=-1, keepdims=True)
    nb = jnp.linalg.norm(b, axis=-1, keepdims=True)
    denom = na * nb.T
    return jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)


def _pairwise_block(q, g, nq, ng, metrics, exact_l2):
    """Compute requested metrics for a (Q,D) x (Nb,D) block.

    nq: (Q,1) query norms, ng: (Nb,) gallery norms (precomputed)."""
    out = {}
    need_dots = any(
        m in metrics
        for m in ("cosine_similarity", "cosine_distance", "angular_distance")
    ) or ("l2_distance" in metrics and not exact_l2)
    if need_dots:
        dots = jnp.dot(q, g.T, preferred_element_type=jnp.float32)
        denom = nq * ng[None, :]
        cos = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)
        if "cosine_similarity" in metrics:
            out["cosine_similarity"] = cos
        if "cosine_distance" in metrics:
            out["cosine_distance"] = 1.0 - cos
        if "angular_distance" in metrics:
            out["angular_distance"] = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
        if "l2_distance" in metrics and not exact_l2:
            # ||a-b||^2 = ||a||^2 + ||b||^2 - 2<a,b>  (MXU-friendly Gram form)
            sq = jnp.maximum(nq**2 + (ng**2)[None, :] - 2.0 * dots, 0.0)
            out["l2_distance"] = jnp.sqrt(sq) / jnp.sqrt(jnp.float32(q.shape[-1]))
    need_diff = any(m in metrics for m in ("l1_distance", "linf_distance")) or (
        "l2_distance" in metrics and exact_l2
    )
    if need_diff:
        diff = jnp.abs(q[:, None, :] - g[None, :, :])  # (Q, Nb, D)
        if "l1_distance" in metrics:
            out["l1_distance"] = jnp.sum(diff, axis=-1) / jnp.float32(q.shape[-1])
        if "linf_distance" in metrics:
            out["linf_distance"] = jnp.max(diff, axis=-1)
        if "l2_distance" in metrics and exact_l2:
            out["l2_distance"] = jnp.sqrt(jnp.sum(diff * diff, axis=-1)) / jnp.sqrt(
                jnp.float32(q.shape[-1])
            )
    if "magnitude_difference" in metrics:
        out["magnitude_difference"] = jnp.abs(nq - ng[None, :])
    return out


@functools.partial(
    jax.jit, static_argnames=("metrics", "exact_l2", "block_n")
)
def pairwise_metrics(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    metrics: Sequence[str] = METRIC_NAMES,
    exact_l2: bool = False,
    block_n: int = 4096,
) -> Dict[str, jnp.ndarray]:
    """All requested metrics for every (query, gallery) pair in one fused pass.

    Args:
        queries: (Q, D)
        gallery: (N, D)
        metrics: subset of METRIC_NAMES to compute.
        exact_l2: compute L2 from explicit differences (bit-closer to the
            reference's np.sqrt(np.sum((a-b)**2)), geometric_metrics.py:44)
            instead of the faster Gram-matrix form.
        block_n: gallery chunk size bounding the (Q, block_n, D) broadcast.

    Returns:
        {metric_name: (Q, N) float32}
    """
    metrics = tuple(metrics)
    q = _f32(queries)
    g = _f32(gallery)
    nq = jnp.linalg.norm(q, axis=-1, keepdims=True)
    ng = jnp.linalg.norm(g, axis=-1)
    n = g.shape[0]
    if n <= block_n:
        return _pairwise_block(q, g, nq, ng, metrics, exact_l2)
    # Chunk over the gallery with lax.scan (static shapes; pad the tail).
    pad = (-n) % block_n
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    ngp = jnp.pad(ng, (0, pad))
    nblocks = gp.shape[0] // block_n
    gb = gp.reshape(nblocks, block_n, -1)
    ngb = ngp.reshape(nblocks, block_n)

    def step(_, blk):
        gi, ngi = blk
        o = _pairwise_block(q, gi, nq, ngi, metrics, exact_l2)
        return None, tuple(o[m] for m in metrics)

    _, outs = jax.lax.scan(step, None, (gb, ngb))
    result = {}
    for i, m in enumerate(metrics):
        # outs[i]: (nblocks, Q, block_n) -> (Q, N)
        arr = jnp.moveaxis(outs[i], 0, 1).reshape(q.shape[0], nblocks * block_n)
        result[m] = arr[:, :n]
    return result


@functools.partial(jax.jit, static_argnames=("metrics",))
def pair_metrics(
    a: jnp.ndarray,
    b: jnp.ndarray,
    metrics: Sequence[str] = METRIC_NAMES,
) -> Dict[str, jnp.ndarray]:
    """Row-aligned metrics: a[i] vs b[i] -> {metric: (P,)}.

    This is the vectorized replacement of the reference's per-pair loop
    calling get_all_metrics (reference mi_analysis.py:277-292)."""
    metrics = tuple(metrics)
    a, b = _f32(a), _f32(b)
    d = jnp.float32(a.shape[-1])
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    out = {}
    if any(m in metrics for m in ("cosine_similarity", "cosine_distance", "angular_distance")):
        dots = jnp.sum(a * b, axis=-1)
        denom = na * nb
        cos = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)
        if "cosine_similarity" in metrics:
            out["cosine_similarity"] = cos
        if "cosine_distance" in metrics:
            out["cosine_distance"] = 1.0 - cos
        if "angular_distance" in metrics:
            out["angular_distance"] = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    if any(m in metrics for m in ("l1_distance", "l2_distance", "linf_distance")):
        diff = jnp.abs(a - b)
        if "l1_distance" in metrics:
            out["l1_distance"] = jnp.sum(diff, axis=-1) / d
        if "l2_distance" in metrics:
            out["l2_distance"] = jnp.sqrt(jnp.sum(diff * diff, axis=-1)) / jnp.sqrt(d)
        if "linf_distance" in metrics:
            out["linf_distance"] = jnp.max(diff, axis=-1)
    if "magnitude_difference" in metrics:
        out["magnitude_difference"] = jnp.abs(na - nb)
    return out


def optimized_similarity_from_metrics(
    m: Dict[str, jnp.ndarray], params: Dict[str, float]
) -> jnp.ndarray:
    """Weighted similarity from precomputed metrics
    (reference geometric_metrics.py:85-94). Works for (Q,N) or (P,) shapes.

    Reusing one precomputed metric tensor across many weight combinations is
    what collapses the reference's grid search (mi_analysis.py:431-511) into
    a single batched contraction."""
    w_angle = params.get("w_angle", 1.0)
    w_l1 = params.get("w_l1", 0.0)
    w_l2 = params.get("w_l2", 0.0)
    w_inf = params.get("w_inf", 0.0)
    w_mag = params.get("w_mag", 0.0)
    return (
        w_angle * m["cosine_similarity"]
        - w_l1 * m["l1_distance"]
        - w_l2 * m["l2_distance"]
        - w_inf * m["linf_distance"]
        - w_mag * m["magnitude_difference"]
    )


def fused_optimized_scores_xla(
    queries: jnp.ndarray,
    gallery_unit: jnp.ndarray,
    magnitudes: jnp.ndarray,
    weights,
    exact_l2: bool = True,
) -> jnp.ndarray:
    """Weighted optimized-similarity over a (unit vector, magnitude) gallery
    in ONE fused pass — the production scorer.

    XLA fuses the dot + elementwise reductions into a single HBM sweep; on
    v5e this measures ~2.9 ms per query over 1M x 512 f32 (~speed of light,
    vs ~10 ms for separate per-metric passes). Trace-time shapes:
    queries (Q, D); gallery_unit (N, D); magnitudes (N,); weights (5,)
    tuple/array ordered (w_angle, w_l1, w_l2, w_inf, w_mag).

    Semantics identical to reference geometric_metrics.py:60-94 applied to
    the magnitude-reconstructed rows."""
    q = _f32(queries)
    g = _f32(gallery_unit)
    m = _f32(magnitudes)
    d = q.shape[-1]

    # Trace-time dead-term elimination: XLA cannot DCE `0.0 * reduction`
    # (0*inf would be nan), and the Linf max-reduction alone costs ~2.5 ms
    # per 1M x 512 sweep on v5e. Zero weights known at trace time (the
    # common case — the reference default and its discovered optimum both
    # have w_inf = 0) skip the metric entirely.
    def live(w):
        return not (isinstance(w, (int, float)) and float(w) == 0.0)

    w_angle, w_l1, w_l2, w_inf, w_mag = weights
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)  # (Q, 1)
    score = jnp.zeros((q.shape[0], g.shape[0]), jnp.float32)
    need_dots = live(w_angle) or (live(w_l2) and not exact_l2)
    if need_dots:
        dots = jnp.dot(q, g.T, preferred_element_type=jnp.float32)  # (Q, N)
    if live(w_angle):
        cos = jnp.where(qn > 0, dots / jnp.where(qn > 0, qn, 1.0), 0.0)
        score = score + jnp.float32(w_angle) * cos
    if live(w_l1) or live(w_inf) or (live(w_l2) and exact_l2):
        diff = g[None, :, :] * m[None, :, None] - q[:, None, :]  # (Q,N,D) fused
        ad = jnp.abs(diff)
        if live(w_l1):
            score = score - jnp.float32(w_l1) * (jnp.sum(ad, axis=-1) / d)
        if live(w_inf):
            score = score - jnp.float32(w_inf) * jnp.max(ad, axis=-1)
        if live(w_l2) and exact_l2:
            score = score - jnp.float32(w_l2) * (
                jnp.sqrt(jnp.sum(diff * diff, axis=-1)) / jnp.sqrt(jnp.float32(d))
            )
    if live(w_l2) and not exact_l2:
        # Gram form: ||m g - q||^2 = m^2 - 2 m <g,q> + ||q||^2 (g unit rows)
        sq = jnp.maximum(m[None, :] ** 2 - 2.0 * m[None, :] * dots + qn**2, 0.0)
        score = score - jnp.float32(w_l2) * (jnp.sqrt(sq) / jnp.sqrt(jnp.float32(d)))
    if live(w_mag):
        score = score - jnp.float32(w_mag) * jnp.abs(m[None, :] - qn)
    return score


def fused_optimized_scores_int8(
    queries: jnp.ndarray,
    gallery_int8: jnp.ndarray,
    scales: jnp.ndarray,
    magnitudes: jnp.ndarray,
    weights,
) -> jnp.ndarray:
    """Weighted optimized-similarity over an int8-quantized gallery without
    dequantizing rows to f32.

    The index stores norm-preserving per-row scales (index/vector_index.py
    insert): ``int8_row * scale`` is exactly unit norm, so the reconstructed
    row is ``int8_row * scale * mag`` with L2 norm exactly ``mag``. That
    identity moves the angle AND L2 terms onto one bf16 MXU dot:

        cos  = scale * <int8_row, q> / ||q||
        L2^2 = mag^2 - 2*mag*scale*<int8_row, q> + ||q||^2   (exact Gram form)

    leaving only L1/Linf (when their weights are live) as an elementwise
    (Q, N, D) sweep, done in bf16 (int8 values and products are exactly
    representable; reductions accumulate in f32). Semantics match
    reference geometric_metrics.py:60-94 on the dequantized rows, up to
    int8/bf16 rounding (~1e-3 relative — the quantization floor itself).
    """
    q = _f32(queries)
    m = _f32(magnitudes)
    sc = _f32(scales)
    d = q.shape[-1]

    def live(w):
        return not (isinstance(w, (int, float)) and float(w) == 0.0)

    w_angle, w_l1, w_l2, w_inf, w_mag = weights
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)  # (Q, 1)
    score = jnp.zeros((q.shape[0], gallery_int8.shape[0]), jnp.float32)
    if live(w_angle) or live(w_l2):
        dots = jnp.dot(
            q.astype(jnp.bfloat16),
            gallery_int8.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )  # (Q, N) = <q, int8 values>
        udots = dots * sc[None, :]  # <q, unit row>
    if live(w_angle):
        cos = jnp.where(qn > 0, udots / jnp.where(qn > 0, qn, 1.0), 0.0)
        score = score + jnp.float32(w_angle) * cos
    if live(w_l2):
        sq = jnp.maximum(m[None, :] ** 2 - 2.0 * m[None, :] * udots + qn**2, 0.0)
        score = score - jnp.float32(w_l2) * (jnp.sqrt(sq) / jnp.sqrt(jnp.float32(d)))
    if live(w_l1) or live(w_inf):
        row_scale = (sc * m).astype(jnp.bfloat16)  # (N,)
        diff = (
            gallery_int8.astype(jnp.bfloat16)[None, :, :] * row_scale[None, :, None]
            - q.astype(jnp.bfloat16)[:, None, :]
        )  # (Q, N, D) bf16, fused by XLA into the sweep
        ad = jnp.abs(diff)
        if live(w_l1):
            score = score - jnp.float32(w_l1) * (
                jnp.sum(ad, axis=-1, dtype=jnp.float32) / d
            )
        if live(w_inf):
            score = score - jnp.float32(w_inf) * jnp.max(ad, axis=-1).astype(
                jnp.float32
            )
    if live(w_mag):
        score = score - jnp.float32(w_mag) * jnp.abs(m[None, :] - qn)
    return score


def make_l1_shadow(
    gallery_int8: jnp.ndarray, scales: jnp.ndarray, magnitudes: jnp.ndarray
) -> jnp.ndarray:
    """(N, D) bf16 pre-dequantized rows for the L1/L∞ sweep of
    fused_optimized_scores_int8_shadow.

    bf16 multiplication rounds the product ``int8 * (scale*mag)`` the same
    whether it is stored once or recomputed per sweep element, so the
    shadow path is BIT-IDENTICAL to fused_optimized_scores_int8 — it just
    trades ~2x the sweep-read bytes (bf16 vs int8) for one less VPU op per
    (Q, N, D) element. When the sweep is VPU-bound (the live-L1 regime —
    see ARCHITECTURE.md's scorer ceiling analysis) the extra bytes hide
    behind compute and the sweep gets ~1/3 faster; measured head-to-head
    in tools/tpu_scorer_probe.py."""
    row_scale = (_f32(scales) * _f32(magnitudes)).astype(jnp.bfloat16)
    return gallery_int8.astype(jnp.bfloat16) * row_scale[:, None]


def fused_optimized_scores_int8_shadow(
    queries: jnp.ndarray,
    gallery_int8: jnp.ndarray,
    scales: jnp.ndarray,
    magnitudes: jnp.ndarray,
    shadow: jnp.ndarray,
    weights,
) -> jnp.ndarray:
    """fused_optimized_scores_int8 with the L1/L∞ sweep reading a
    pre-dequantized bf16 shadow gallery (make_l1_shadow) instead of
    dequantizing int8 rows in the sweep. Same results bitwise; +1 bf16
    gallery of HBM footprint. Only worth it when L1/L∞ weights are live —
    with a dead sweep it reduces to the int8 scorer exactly."""
    q = _f32(queries)
    m = _f32(magnitudes)
    sc = _f32(scales)
    d = q.shape[-1]

    def live(w):
        return not (isinstance(w, (int, float)) and float(w) == 0.0)

    w_angle, w_l1, w_l2, w_inf, w_mag = weights
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)  # (Q, 1)
    score = jnp.zeros((q.shape[0], gallery_int8.shape[0]), jnp.float32)
    if live(w_angle) or live(w_l2):
        dots = jnp.dot(
            q.astype(jnp.bfloat16),
            gallery_int8.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        udots = dots * sc[None, :]
    if live(w_angle):
        cos = jnp.where(qn > 0, udots / jnp.where(qn > 0, qn, 1.0), 0.0)
        score = score + jnp.float32(w_angle) * cos
    if live(w_l2):
        sq = jnp.maximum(m[None, :] ** 2 - 2.0 * m[None, :] * udots + qn**2, 0.0)
        score = score - jnp.float32(w_l2) * (jnp.sqrt(sq) / jnp.sqrt(jnp.float32(d)))
    if live(w_l1) or live(w_inf):
        ad = jnp.abs(
            shadow[None, :, :] - q.astype(jnp.bfloat16)[:, None, :]
        )  # (Q, N, D) bf16: sub+abs only — the dequant multiply is baked in
        if live(w_l1):
            score = score - jnp.float32(w_l1) * (
                jnp.sum(ad, axis=-1, dtype=jnp.float32) / d
            )
        if live(w_inf):
            score = score - jnp.float32(w_inf) * jnp.max(ad, axis=-1).astype(
                jnp.float32
            )
    if live(w_mag):
        score = score - jnp.float32(w_mag) * jnp.abs(m[None, :] - qn)
    return score


def optimized_similarity(
    queries: jnp.ndarray, gallery: jnp.ndarray, params: Dict[str, float]
) -> jnp.ndarray:
    """(Q,D) x (N,D) -> (Q,N) weighted similarity (higher = more similar)."""
    needed = ("cosine_similarity", "l1_distance", "l2_distance", "linf_distance",
              "magnitude_difference")
    m = pairwise_metrics(queries, gallery, metrics=needed)
    return optimized_similarity_from_metrics(m, params)


def optimized_distance(
    queries: jnp.ndarray, gallery: jnp.ndarray, params: Dict[str, float]
) -> jnp.ndarray:
    """Negated optimized similarity (reference geometric_metrics.py:97-111)."""
    return -optimized_similarity(queries, gallery, params)


def create_parameter_grid(granularity: int = 5) -> Dict[str, list]:
    """Uniform [0,1] weight grid (reference geometric_metrics.py:132-149)."""
    import numpy as np

    values = np.linspace(0.0, 1.0, granularity)
    return {k: list(values) for k in ("w_angle", "w_l1", "w_l2", "w_inf", "w_mag")}
