"""Property-based tests (hypothesis) for the pure-numpy surfaces: the
vendored statistics, splitters, and the stumps kernel. No Spark session —
these run in milliseconds per example and probe edge regions (ties,
degenerate sizes, extreme values) that fixed fixtures miss."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from powershap_spark.functions.numerics import (
    betainc_reg,
    percentileofscore_rank,
    t_cdf,
)
from powershap_spark.kernel import GradientBoostedStumpsModel
from powershap_spark.splitters import KFold


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=30),
    st.integers(min_value=-5, max_value=5),
)
def test_percentileofscore_rank_property(vals, x):
    """scipy>=1.9 rank semantics: (left + right + [left < right]) * 50/n —
    equivalently the mean rank of x inserted among the values."""
    s = np.array(vals, dtype=float)
    got = percentileofscore_rank(s, float(x))
    left = int((s < x).sum())
    right = int((s <= x).sum())
    expected = (left + right + (1 if right > left else 0)) * 50.0 / len(s)
    assert got == expected
    assert 0.0 <= got <= 100.0


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_kfold_partition_properties(n, k, seed):
    """Every KFold split: val folds are disjoint, cover [0, n), and each
    train set is exactly the complement of its val fold."""
    if k > n:
        k = n
    kf = KFold(n_splits=k, shuffle=True, random_state=seed)
    seen = []
    for tr, va in kf.split(np.zeros((n, 1))):
        assert len(np.intersect1d(tr, va)) == 0
        assert len(tr) + len(va) == n
        seen.append(va)
    allva = np.concatenate(seen)
    assert len(allva) == n and len(np.unique(allva)) == n


@settings(max_examples=60, deadline=None)
@given(
    st.floats(min_value=0.05, max_value=20.0),
    st.floats(min_value=0.05, max_value=20.0),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_betainc_reg_bounds_and_edges(a, b, x):
    v = betainc_reg(a, b, x)
    assert -1e-12 <= v <= 1.0 + 1e-12
    assert betainc_reg(a, b, 0.0) == 0.0
    assert abs(betainc_reg(a, b, 1.0) - 1.0) < 1e-12


@settings(max_examples=60, deadline=None)
@given(
    st.floats(min_value=-8.0, max_value=8.0),
    st.floats(min_value=-8.0, max_value=8.0),
    st.integers(min_value=1, max_value=200),
)
def test_t_cdf_monotone_and_symmetric(x1, x2, df):
    lo, hi = sorted((x1, x2))
    assert t_cdf(lo, df) <= t_cdf(hi, df) + 1e-12
    # symmetry: F(-x) = 1 - F(x)
    assert abs(t_cdf(-x1, df) - (1.0 - t_cdf(x1, df))) < 1e-9


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_stumps_local_accuracy_property(seed):
    """Exact additive SHAP: sum_j phi_j(x) == f(x) - mean f(X_train) for
    ANY random regression data (the decomposition is algebraic, not
    approximate)."""
    rng = np.random.RandomState(seed)
    n, d = rng.randint(20, 80), rng.randint(2, 6)
    X = rng.randn(n, d)
    y = rng.randn(n) + X[:, 0] ** 2
    m = GradientBoostedStumpsModel(n_stumps=12).fit(X, y)

    def predict(Z):
        out = np.full(len(Z), m.base_)
        for j, t, lv, rv in m.stumps_[0]:
            out += np.where(Z[:, j] <= t, lv, rv)
        return out

    Xv = rng.randn(10, d)
    phi = m.shap_values(X, Xv)
    np.testing.assert_allclose(
        phi.sum(axis=1), predict(Xv) - predict(X).mean(), atol=1e-9
    )
