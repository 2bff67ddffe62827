"""As-of join family vs the pandas.merge_asof oracle, plus cross-variant
equivalence (plain == bucketed == broadcast) and skewed-key behavior."""

import numpy as np
import pandas as pd
import pytest

from powershap_spark.operators.asof import (
    asof_join,
    asof_join_broadcast,
    asof_join_bucketed,
)
from tests.conftest import events_pdf


def _sides(seed=3):
    pdf = events_pdf(seed=seed)
    left = pdf[pdf.seq % 3 == 0][["k", "ts", "seq"]].reset_index(drop=True)
    right = (
        pdf[pdf.seq % 3 != 0]
        .groupby(["k", "ts"], as_index=False)
        .agg(v=("v", "max"))
    )
    return left, right


def _oracle(left, right, direction="backward", allow_exact=True, tol=None):
    kw = {}
    if tol is not None:
        kw["tolerance"] = tol
    return pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").rename(columns={"ts": "rts"}),
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        allow_exact_matches=allow_exact,
        **kw,
    )


def _check(spark, fn, direction="backward", allow_exact=True, tol=None, **kw):
    left, right = _sides()
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    args = dict(on="k", ts="ts", matched_ts_col="mts", **kw)
    if fn is asof_join:
        args.update(direction=direction, allow_exact_matches=allow_exact)
        if tol is not None:
            args.update(tolerance_seconds=tol)
    else:
        args.update(allow_exact_matches=allow_exact)
    got = (
        fn(sl, sr, **args)
        .toPandas()
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
    )
    exp = (
        _oracle(left, right, direction, allow_exact, tol)
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert np.allclose(got.v.fillna(-1), exp.v.fillna(-1))
    assert np.allclose(got.mts.fillna(-1), exp.rts.fillna(-1))


def test_backward_inclusive(spark):
    _check(spark, asof_join)


def test_backward_strict(spark):
    _check(spark, asof_join, allow_exact=False)


def test_forward_inclusive(spark):
    _check(spark, asof_join, direction="forward")


def test_tolerance(spark):
    _check(spark, asof_join, tol=100.0)


def test_bucketed_matches_plain(spark):
    _check(spark, asof_join_bucketed, bucket_seconds=500)


def test_bucketed_tiny_buckets(spark):
    # bucket smaller than typical gaps: exercises the carry-in path hard
    _check(spark, asof_join_bucketed, bucket_seconds=7)


def test_broadcast_matches_plain(spark):
    _check(spark, asof_join_broadcast)


def test_exact_ts_tie_semantics(spark):
    left = pd.DataFrame({"k": [1, 1], "ts": [10.0, 20.0], "seq": [0, 1]})
    right = pd.DataFrame({"k": [1, 1], "ts": [10.0, 15.0], "v": [1.0, 2.0]})
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    incl = asof_join(sl, sr, on="k", ts="ts").orderBy("seq").collect()
    assert [r.v for r in incl] == [1.0, 2.0]
    strict = asof_join(sl, sr, on="k", ts="ts", allow_exact_matches=False).orderBy(
        "seq"
    ).collect()
    assert [r.v for r in strict] == [None, 2.0]


def test_skewed_key(spark):
    # one key holds 90% of rows; bucketed variant must still be exact
    r = np.random.RandomState(9)
    n_hot, n_cold = 2000, 200
    left = pd.DataFrame(
        {
            "k": np.r_[np.zeros(n_hot, dtype=np.int64), r.randint(1, 20, n_cold)],
            "ts": np.round(r.uniform(0, 10000, n_hot + n_cold), 3),
            "seq": np.arange(n_hot + n_cold, dtype=np.int64),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": np.r_[np.zeros(n_hot, dtype=np.int64), r.randint(1, 20, n_cold)],
                "ts": np.round(r.uniform(0, 10000, n_hot + n_cold), 3),
                "v": np.round(r.uniform(0, 1, n_hot + n_cold), 4),
            }
        )
        .groupby(["k", "ts"], as_index=False)
        .agg(v=("v", "max"))
    )
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    plain = (
        asof_join(sl, sr, on="k", ts="ts", matched_ts_col=None)
        .toPandas()
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
    )
    bucketed = (
        asof_join_bucketed(sl, sr, on="k", ts="ts", bucket_seconds=250, matched_ts_col=None)
        .toPandas()
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
    )
    assert np.allclose(plain.v.fillna(-1), bucketed.v.fillna(-1))


def test_null_value_in_matched_row_not_skipped(spark):
    # the match's NULL value must win over an older non-null (struct payload
    # semantics, not per-column last(ignorenulls))
    left = pd.DataFrame({"k": [1], "ts": [30.0], "seq": [0]})
    right = pd.DataFrame({"k": [1, 1], "ts": [10.0, 20.0], "v": [7.0, None]})
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    out = asof_join(sl, sr, on="k", ts="ts").collect()
    assert out[0].matched_ts == 20.0 and out[0].v is None
