"""Exact top-k with stable (lowest-index) tie-breaking.

The reference's retrieval is two-phase: Milvus ANN candidates then an exact
rerank (reference image_search.py:88-115). With an exact on-device index the
two phases collapse into a single top-k over the full score matrix. Stable
index tie-breaking is what makes TPU rankings bit-for-bit reproducible vs a
NumPy argsort oracle (BASELINE.md parity target).

Direction conventions, matching reference sort orders
(image_search.py:199-220):
  similarity metrics (cosine_similarity, optimized_similarity): descending
  distance metrics (l1/l2/linf/magnitude/angular/cosine_distance): ascending
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Metrics ranked descending (higher = better). Everything else ascends.
DESCENDING_METRICS = frozenset({"cosine_similarity", "optimized_similarity", "score"})


@functools.partial(jax.jit, static_argnames=("k", "descending"))
def exact_topk(
    scores: jnp.ndarray, k: int, descending: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k along the last axis with deterministic lowest-index ties.

    Args:
        scores: (..., N) float scores.
        k: number of results (clipped to N).
        descending: True for similarities, False for distances.

    Returns:
        (values, indices), each (..., k).
    """
    n = scores.shape[-1]
    k = min(k, n)
    s = scores.astype(jnp.float32)
    if not descending:
        s = -s
    # lax.top_k prefers lower indices on exact ties.
    vals, idx = jax.lax.top_k(s, k)
    if not descending:
        vals = -vals
    return vals, idx


def topk_for_metric(
    scores: jnp.ndarray, k: int, metric: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k with the ranking direction implied by the metric name."""
    return exact_topk(scores, k, descending=metric in DESCENDING_METRICS)


# Backwards-friendly alias used around the codebase.
topk_with_scores = topk_for_metric


def two_key_topk(
    vals: jnp.ndarray, idx: jnp.ndarray, k: int, descending: bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select the top-k of (vals, idx) candidate lists with the canonical
    (score, ascending-global-index) tie-break — THE one merge used by every
    shard/slice/kernel combiner (parallel/collectives.py, pallas top-k),
    so tie semantics cannot drift between paths. Trace-safe (no jit here;
    callers jit)."""
    s = vals if descending else -vals
    # stable two-key sort: sort on index first (ascending), then
    # stable-sort on score
    order_idx = jnp.argsort(idx, axis=-1, stable=True)
    s2 = jnp.take_along_axis(s, order_idx, axis=-1)
    order_val = jnp.argsort(-s2, axis=-1, stable=True)
    order = jnp.take_along_axis(order_idx, order_val, axis=-1)
    top = order[..., : min(k, vals.shape[-1])]
    return (
        jnp.take_along_axis(vals, top, axis=-1),
        jnp.take_along_axis(idx, top, axis=-1),
    )


@functools.partial(jax.jit, static_argnames=("k", "descending"))
def merge_topk(
    values_a: jnp.ndarray,
    indices_a: jnp.ndarray,
    values_b: jnp.ndarray,
    indices_b: jnp.ndarray,
    k: int,
    descending: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two partial top-k lists (e.g. from two gallery shards).

    Ties between shards resolve to the lower *global* index, preserving the
    single-device ordering."""
    vals = jnp.concatenate([values_a, values_b], axis=-1)
    idx = jnp.concatenate([indices_a, indices_b], axis=-1)
    return two_key_topk(vals, idx, k, descending)
