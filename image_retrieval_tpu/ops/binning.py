"""KBinsDiscretizer-compatible binning.

The reference discretizes distance vectors with
sklearn.preprocessing.KBinsDiscretizer(n_bins, encode='ordinal',
strategy='uniform'|'quantile') before computing MI
(reference mi_analysis.py:344-345, :419-420, :553-554, :1504, :1613).

MI numerical parity requires replicating sklearn's semantics exactly:
  * uniform : edges = linspace(min, max, n_bins+1)
  * quantile: edges = percentile(x, linspace(0, 100, n_bins+1)), then edges
              closer than 1e-8 are merged (sklearn _discretization.py)
  * assignment: searchsorted(edges[1:-1], x, side='right') — values equal to
    an interior edge fall in the upper bin; everything is clipped into
    [0, n_bins-1] by construction.
  * degenerate column (min == max): a single bin.

Two implementations are provided:
  * host float64 (`bin_edges`, `discretize`) — canonical, digit-exact vs
    sklearn; used for reported MI numbers.
  * jitted f32 (`discretize_uniform_jax`) — used inside the vectorized
    weight-grid search where thousands of binnings run on-device at once.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def bin_edges(x: np.ndarray, n_bins: int, strategy: str = "uniform") -> np.ndarray:
    """Bin edges exactly as sklearn KBinsDiscretizer.fit computes them."""
    x = np.asarray(x, dtype=np.float64).ravel()
    col_min, col_max = x.min(), x.max()
    if col_min == col_max:
        return np.array([-np.inf, np.inf])
    if strategy == "uniform":
        return np.linspace(col_min, col_max, n_bins + 1)
    if strategy == "quantile":
        quantiles = np.linspace(0, 100, n_bins + 1)
        edges = np.asarray(np.percentile(x, quantiles))
        # sklearn removes bins narrower than 1e-8 (keeps first edge).
        mask = np.ediff1d(edges, to_begin=np.inf) > 1e-8
        return edges[mask]
    raise ValueError(f"Unsupported strategy: {strategy}")


def discretize(x: np.ndarray, n_bins: int, strategy: str = "uniform") -> np.ndarray:
    """Ordinal-encoded bins, digit-exact vs sklearn's transform."""
    x = np.asarray(x, dtype=np.float64).ravel()
    edges = bin_edges(x, n_bins, strategy)
    return np.searchsorted(edges[1:-1], x, side="right").astype(np.int64)


def discretize_uniform_jax(x: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Uniform-strategy binning on device, vectorizable over leading axes.

    x: (..., P) -> int32 bins (..., P) in [0, n_bins-1]. Matches sklearn's
    edges-then-searchsorted construction (linspace edges, right-closed
    interior edges) rather than the naive floor((x-min)/w) which can differ
    by one ulp at edges."""
    mn = jnp.min(x, axis=-1, keepdims=True)
    mx = jnp.max(x, axis=-1, keepdims=True)
    # linspace(min, max, n_bins+1)[1:-1] interior edges, computed the same way
    # numpy does: min + i*(max-min)/n_bins  (numpy linspace uses step*i + start)
    step = (mx - mn) / n_bins
    i = jnp.arange(1, n_bins, dtype=x.dtype)
    edges = mn[..., None] + step[..., None] * i  # (..., 1, n_bins-1)
    bins = jnp.sum(x[..., :, None] >= edges, axis=-1)
    degenerate = (mx == mn)
    return jnp.where(degenerate, 0, bins).astype(jnp.int32)


discretize_uniform_jax = jax.jit(discretize_uniform_jax, static_argnames=("n_bins",))
