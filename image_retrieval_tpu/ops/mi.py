"""Mutual information, digit-exact vs sklearn.metrics.mutual_info_score.

The reference computes MI between binned distances and relationship labels
(reference mi_analysis.py:348, :423, :557, :1508, :1616) using
mutual_info_score, which is contingency-table MI in *nats* (natural log),
even though the reference reports the numbers as "bits". We keep the same
units (and labeling) for parity.

  MI = sum_ij  (n_ij / N) * (log n_ij - log a_i - log b_j + log N)

Host float64 versions are canonical for reported numbers; jitted versions
serve the on-device vectorized weight-grid search (ops/optimize paths) where
thousands of MI evaluations happen in one batched pass.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from image_retrieval_tpu.ops.binning import discretize, discretize_uniform_jax


def mutual_info_binned(x_binned: np.ndarray, y: np.ndarray) -> float:
    """MI between two already-discrete label vectors (float64, host).

    Matches sklearn.metrics.mutual_info_score(labels_true=x_binned,
    labels_pred=y) to the digit."""
    x_binned = np.asarray(x_binned).ravel()
    y = np.asarray(y).ravel()
    assert x_binned.shape == y.shape
    n = x_binned.shape[0]
    if n == 0:
        return 0.0
    _, xi = np.unique(x_binned, return_inverse=True)
    _, yi = np.unique(y, return_inverse=True)
    nx = xi.max() + 1
    ny = yi.max() + 1
    contingency = np.zeros((nx, ny), dtype=np.int64)
    np.add.at(contingency, (xi, yi), 1)
    nzx, nzy = np.nonzero(contingency)
    nz_val = contingency[nzx, nzy].astype(np.float64)
    pi = contingency.sum(axis=1).astype(np.float64)
    pj = contingency.sum(axis=0).astype(np.float64)
    log_nz = np.log(nz_val)
    contingency_sum = float(n)
    outer = pi[nzx] * pj[nzy]
    log_outer = -np.log(outer) + np.log(pi.sum()) + np.log(pj.sum())
    mi = (
        nz_val / contingency_sum * (log_nz - np.log(contingency_sum))
        + nz_val / contingency_sum * log_outer
    )
    # sklearn zeroes terms where |mi| < eps against accidental -0 noise,
    # then clips the sum at 0.
    mi = np.where(np.abs(mi) < np.finfo(np.float64).eps, 0.0, mi)
    return float(np.clip(mi.sum(), 0.0, None))


def mutual_info_from_labels(
    values: np.ndarray, labels: np.ndarray, n_bins: int, strategy: str = "uniform"
) -> float:
    """Bin `values` then compute MI vs `labels` — the reference's
    KBinsDiscretizer + mutual_info_score pipeline (mi_analysis.py:344-348)."""
    values = np.asarray(values, dtype=np.float64).ravel()
    labels = np.asarray(labels).ravel()
    # NaN filtering as in reference mi_analysis.py:330-332.
    valid = ~np.isnan(values)
    values, labels = values[valid], labels[valid]
    if values.size == 0:
        return 0.0
    binned = discretize(values, n_bins, strategy)
    return mutual_info_binned(binned, labels)


# ---------------------------------------------------------------------------
# On-device versions (f32, jittable, vmap-able over a leading combos axis).
# ---------------------------------------------------------------------------


def _mi_binned_jax(xb: jnp.ndarray, y: jnp.ndarray, n_x: int, n_y: int) -> jnp.ndarray:
    """MI (nats) from int bins xb in [0,n_x) and labels y in [0,n_y)."""
    flat = xb * n_y + y
    contingency = jnp.zeros((n_x * n_y,), jnp.float32).at[flat].add(1.0)
    c = contingency.reshape(n_x, n_y)
    n = jnp.sum(c)
    pi = jnp.sum(c, axis=1, keepdims=True)
    pj = jnp.sum(c, axis=0, keepdims=True)
    p = c / n
    # Guard log(0); zero cells contribute 0.
    ratio = jnp.where(c > 0, c * n / (pi * pj), 1.0)
    mi = jnp.sum(p * jnp.log(ratio))
    return jnp.maximum(mi, 0.0)


def mutual_info_uniform_jax(
    values: jnp.ndarray, labels: jnp.ndarray, n_bins: int, n_labels: int
) -> jnp.ndarray:
    """Uniform-binned MI on device. `values`: (..., P); `labels`: (P,) int.

    vmaps over leading axes — one call evaluates a whole weight grid at once,
    replacing the reference's per-combination Python loop
    (mi_analysis.py:487-498, :1345-1359)."""
    binned = discretize_uniform_jax(values, n_bins)
    fn = lambda xb: _mi_binned_jax(xb, labels, n_bins, n_labels)
    for _ in range(values.ndim - 1):
        fn = jax.vmap(fn)
    return fn(binned)


mutual_info_uniform_jax = jax.jit(
    mutual_info_uniform_jax, static_argnames=("n_bins", "n_labels")
)
