"""Binning + MI vs sklearn oracles — the digit-parity core of the MI engine
(reference mi_analysis.py:344-348)."""

import numpy as np
import pytest
from sklearn.preprocessing import KBinsDiscretizer
from sklearn.metrics import mutual_info_score

from image_retrieval_tpu.ops.binning import discretize, discretize_uniform_jax
from image_retrieval_tpu.ops.mi import (
    mutual_info_binned,
    mutual_info_from_labels,
    mutual_info_uniform_jax,
)


def _sk_binned(x, n_bins, strategy):
    kw = {"quantile_method": "linear"} if strategy == "quantile" else {}
    disc = KBinsDiscretizer(n_bins=n_bins, encode="ordinal", strategy=strategy, **kw)
    return disc.fit_transform(np.asarray(x).reshape(-1, 1)).astype(int).ravel()


@pytest.mark.parametrize("strategy", ["uniform", "quantile"])
@pytest.mark.parametrize("n_bins", [5, 20])
def test_discretize_matches_sklearn(rng, strategy, n_bins):
    x = rng.normal(size=500).astype(np.float64)
    ours = discretize(x, n_bins, strategy)
    theirs = _sk_binned(x, n_bins, strategy)
    np.testing.assert_array_equal(ours, theirs)


def test_discretize_values_on_edges():
    # Values landing exactly on bin edges must go to the upper bin
    # (sklearn searchsorted side='right').
    x = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    ours = discretize(x, 4, "uniform")
    theirs = _sk_binned(x, 4, "uniform")
    np.testing.assert_array_equal(ours, theirs)
    assert ours.tolist() == [0, 1, 2, 3, 3]


def test_degenerate_constant_column():
    x = np.full(10, 3.3)
    assert discretize(x, 20, "uniform").tolist() == [0] * 10


def test_mi_matches_sklearn(rng):
    for _ in range(5):
        xb = rng.integers(0, 20, size=400)
        y = rng.integers(0, 4, size=400)
        ours = mutual_info_binned(xb, y)
        theirs = mutual_info_score(xb, y)
        assert ours == pytest.approx(theirs, abs=1e-12)


def test_mi_pipeline_matches_sklearn_pipeline(rng):
    values = rng.normal(size=600)
    labels = rng.integers(0, 4, size=600)
    # Inject NaNs — reference filters them (mi_analysis.py:330-332).
    values[::50] = np.nan
    ours = mutual_info_from_labels(values, labels, 20, "uniform")
    valid = ~np.isnan(values)
    theirs = mutual_info_score(_sk_binned(values[valid], 20, "uniform"), labels[valid])
    assert ours == pytest.approx(theirs, abs=1e-12)


def test_jax_uniform_binning_matches_host(rng):
    x = rng.normal(size=256).astype(np.float32)
    got = np.asarray(discretize_uniform_jax(x, 20))
    want = discretize(x.astype(np.float64), 20, "uniform")
    # f32 vs f64 edge placement can differ on values that sit within one ulp
    # of an edge; random data stays away from edges.
    assert (got == want).mean() > 0.99


def test_jax_mi_close_to_host(rng):
    vals = rng.normal(size=(7, 300)).astype(np.float32)  # 7 "combos"
    labels = rng.integers(0, 3, size=300).astype(np.int32)
    got = np.asarray(mutual_info_uniform_jax(vals, labels, 20, 3))
    for i in range(7):
        want = mutual_info_from_labels(vals[i], labels, 20, "uniform")
        assert got[i] == pytest.approx(want, abs=1e-4)


@pytest.mark.parametrize("values", [
    [0.0, 0.0, 0.0, 1e-300],                 # near-degenerate range
    [1.0, 1.0 + 2**-23, 2.0],                # one-ulp separation
    [-5.0, -5.0, -5.0, -5.0, 7.0],           # constant with one outlier
    list(np.linspace(0, 1, 21)),              # values exactly on edges
    [3.14] * 50,                              # fully constant
])
def test_discretize_adversarial_cases(values):
    x = np.array(values, np.float64)
    ours = discretize(x, 5, "uniform")
    theirs = _sk_binned(x, 5, "uniform")
    np.testing.assert_array_equal(ours, theirs)

# -- property-based coverage (hypothesis): binning edge semantics hold for
# arbitrary inputs, not just the sampled/adversarial cases above --

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:
    _floats = st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False,
        width=64,
    )
    _arrays = st.lists(_floats, min_size=2, max_size=200).map(
        lambda v: np.asarray(v, np.float64)
    )

    @settings(max_examples=120, deadline=None)
    @given(x=_arrays, n_bins=st.integers(2, 32),
           strategy=st.sampled_from(["uniform", "quantile"]))
    def test_property_discretize_matches_sklearn(x, n_bins, strategy):
        """For ANY finite input: digit-identical ordinal codes vs sklearn,
        including duplicate-heavy, constant, and huge-range inputs."""
        ours = discretize(x, n_bins, strategy)
        theirs = _sk_binned(x, n_bins, strategy)
        np.testing.assert_array_equal(ours, theirs)
        assert ours.min() >= 0 and ours.max() <= n_bins - 1

    @settings(max_examples=60, deadline=None)
    @given(x=_arrays, n_bins=st.integers(2, 32))
    def test_property_mi_matches_sklearn(x, n_bins):
        """MI from our contingency-table implementation == sklearn
        mutual_info_score on the same binned codes, for any labels."""
        labels = (np.arange(len(x)) % 3).astype(np.int64)
        got = mutual_info_from_labels(x, labels, n_bins, "uniform")
        want = mutual_info_score(labels, _sk_binned(x, n_bins, "uniform"))
        assert got == pytest.approx(want, rel=1e-12, abs=1e-12)

    @settings(max_examples=60, deadline=None)
    @given(
        x=st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False,
                      allow_infinity=False, width=32),
            min_size=2, max_size=100,
        ).map(lambda v: np.asarray(v, np.float32)),
        n_bins=st.integers(2, 16),
    )
    def test_property_jax_uniform_binning_tracks_host(x, n_bins):
        """The on-device f32 binning matches the f64 host path everywhere
        except values within f32 noise of an interior edge (where either
        side is defensible); such near-edge values may differ by one bin."""
        got = np.asarray(discretize_uniform_jax(x, n_bins))
        want = discretize(x, n_bins, "uniform")
        mn, mx = float(x.min()), float(x.max())
        if mn == mx:
            np.testing.assert_array_equal(got, 0)
            return
        edges = np.linspace(mn, mx, n_bins + 1)[1:-1]
        tol = max(abs(mn), abs(mx), 1.0) * 1e-5
        near_edge = np.min(
            np.abs(x[:, None].astype(np.float64) - edges[None, :]), axis=1
        ) <= tol
        mismatch = got != want
        assert not (mismatch & ~near_edge).any()
        assert np.abs(got - want).max(initial=0) <= 1
