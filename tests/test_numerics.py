"""Vendored numeric kernels vs known values and Monte Carlo.

Golden t-table values are standard published quantiles; nct values are
checked against a seeded 2M-sample Monte Carlo (tolerance 2e-3)."""

import numpy as np
import pytest

from powershap_spark.functions.numerics import (
    nct_cdf,
    percentileofscore_rank,
    solve_power_nobs,
    t_cdf,
    t_ppf,
    ttest_power_smaller,
)


def test_percentileofscore_rank_matches_scipy_semantics():
    # scipy.stats.percentileofscore(kind='rank') goldens, incl. the +1 tie
    # correction (scipy >= 1.9: (left + right + [left < right]) * 50 / n,
    # equal to the classic mean-rank-of-ties definition).
    # scipy docs example: percentileofscore([1, 2, 3, 4], 3) -> 75.0
    assert percentileofscore_rank(np.array([1, 2, 3, 4]), 3) == 75.0
    assert percentileofscore_rank(np.array([1, 2, 3, 4]), 2.5) == 50.0
    assert percentileofscore_rank(np.array([1, 2, 2, 3]), 2) == 62.5
    assert percentileofscore_rank(np.array([1, 2, 2, 2, 3]), 2) == 60.0
    # all-equal (the degenerate all-zero-SHAP column case): mean rank 2 of 3
    assert percentileofscore_rank(np.array([5, 5, 5]), 5) == pytest.approx(200 / 3)
    assert percentileofscore_rank(np.array([1, 2, 3]), 0) == 0.0
    assert percentileofscore_rank(np.array([1, 2, 3]), 9) == 100.0


@pytest.mark.parametrize(
    "p,df,expected",
    [
        (0.01, 9, -2.821437925),
        (0.025, 10, -2.228138852),
        (0.05, 20, -1.724718243),
        (0.5, 7, 0.0),
        (0.975, 30, 2.042272456),
    ],
)
def test_t_ppf_table(p, df, expected):
    assert t_ppf(p, df) == pytest.approx(expected, abs=1e-6)


def test_t_cdf_symmetry_and_limits():
    for df in (3, 9, 40):
        assert t_cdf(0.0, df) == 0.5
        for x in (0.3, 1.7, 4.2):
            assert t_cdf(x, df) + t_cdf(-x, df) == pytest.approx(1.0, abs=1e-12)
    # large df approaches normal
    assert t_cdf(1.959964, 100000) == pytest.approx(0.975, abs=1e-4)


@pytest.mark.parametrize(
    "t,df,nc",
    [(-2.82, 9, -3.0), (-2.82, 9, -1.0), (0.5, 25, 0.3), (-2.4, 49, -5.0), (1.0, 5, 2.0)],
)
def test_nct_cdf_monte_carlo(t, df, nc):
    r = np.random.RandomState(12345)
    z = r.standard_normal(2_000_000)
    v = r.chisquare(df, 2_000_000)
    mc = np.mean((z + nc) / np.sqrt(v / df) <= t)
    assert nct_cdf(t, df, nc) == pytest.approx(mc, abs=2e-3)


def test_nct_cdf_reduces_to_t():
    for t, df in [(-2.0, 9), (1.3, 25)]:
        assert nct_cdf(t, df, 0.0) == pytest.approx(t_cdf(t, df), abs=1e-9)


def test_power_monotone_in_n_and_solve_roundtrip():
    es, alpha = -0.5, 0.01
    powers = [ttest_power_smaller(es, n, alpha) for n in (10, 30, 100, 300)]
    assert all(a < b for a, b in zip(powers, powers[1:]))
    n = solve_power_nobs(es, alpha, 0.99)
    assert ttest_power_smaller(es, n, alpha) == pytest.approx(0.99, abs=1e-6)


def test_power_alpha_floor_at_zero_effect():
    # at es=0 the test rejects with probability exactly alpha
    assert ttest_power_smaller(0.0, 50, 0.01) == pytest.approx(0.01, abs=1e-6)


def test_solve_power_nonnegative_effect_capped():
    assert solve_power_nobs(0.2, 0.01, 0.99) == 1e8
