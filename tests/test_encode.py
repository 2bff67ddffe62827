"""past_target_encode: strictly-past categorical target encoding.

The contract under test (encode.py): a row's encoding aggregates labels
of SAME-KEY rows with STRICTLY EARLIER event time — never its own label,
never a simultaneous one, never a future one — and the three execution
paths (plain range-frame window, grouped (key, ts) partials, salted
grouped) are value-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from powershap_spark.operators.encode import past_target_encode


def _events_pdf(n=400, seed=7, ts_span_s=180):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.where(
                rng.random(n) < 0.1, np.nan, rng.normal(size=n).round(3)
            ),
            # coarse second resolution => many EXACT duplicate timestamps,
            # the case where intra-ts leakage would show
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, ts_span_s, n), unit="s"),
        }
    )


def _replica(pdf):
    cnts, means = [], []
    for _, r in pdf.iterrows():
        m = (pdf.event_type == r.event_type) & (pdf.ts < r.ts) & pdf.value.notna()
        cnts.append(int(m.sum()))
        means.append(pdf.value[m].mean() if m.sum() else np.nan)
    return np.asarray(cnts), np.asarray(means)


@pytest.fixture(scope="module")
def events(spark):
    pdf = _events_pdf()
    want_cnt, want_mean = _replica(pdf)
    return spark.createDataFrame(pdf), pdf, want_cnt, want_mean


@pytest.mark.parametrize(
    "kw",
    [{}, {"grouped": True}, {"grouped": True, "chunk_size": 30}],
    ids=["plain", "grouped", "salted_grouped"],
)
def test_matches_pandas_replica_all_paths(events, kw):
    df, pdf, want_cnt, want_mean = events
    out = (
        past_target_encode(df, "event_type", "value", "ts", **kw)
        .toPandas()
        .sort_values("event_id")
    )
    assert np.array_equal(out.te_cnt.values, want_cnt)
    assert np.isclose(
        out.te_mean.values.astype(float), want_mean, atol=1e-9, equal_nan=True
    ).all()
    # the paths must also agree on row multiplicity (the grouped join-back
    # must not duplicate or drop rows)
    assert len(out) == len(pdf)


def test_no_leakage_from_simultaneous_or_future_labels(spark, events):
    """Perturbing every label at ts >= cutoff leaves the encodings of all
    rows with ts <= cutoff bit-identical — covers both future leakage and
    the subtler simultaneous-row leakage (rows AT the cutoff must also be
    unaffected, because same-ts rows are outside each other's frames)."""
    df, pdf, _, _ = events
    cutoff = pdf.ts.quantile(0.6).floor("s")
    base = (
        past_target_encode(df, "event_type", "value", "ts")
        .toPandas()
        .sort_values("event_id")
    )
    poisoned = df.withColumn(
        "value",
        F.when(F.col("ts") >= F.lit(cutoff), F.lit(1e6)).otherwise(F.col("value")),
    )
    got = (
        past_target_encode(poisoned, "event_type", "value", "ts")
        .toPandas()
        .sort_values("event_id")
    )
    early = (pdf.sort_values("event_id").ts <= cutoff).values
    assert early.sum() > 50  # the guard is vacuous on an empty slice
    assert np.array_equal(base.te_cnt.values[early], got.te_cnt.values[early])
    b, g = base.te_mean.values[early], got.te_mean.values[early]
    assert np.array_equal(b, g) or np.isclose(b, g, equal_nan=True, atol=0).all()
    # sanity: the poison DID move later rows (the test bites)
    assert not np.isclose(
        base.te_mean.values, got.te_mean.values, equal_nan=True
    ).all()


def test_smoothing_prior_and_cold_start(events):
    df, pdf, want_cnt, want_mean = events
    prior, w = 0.5, 10.0
    out = (
        past_target_encode(
            df, "event_type", "value", "ts", prior=prior, prior_weight=w
        )
        .toPandas()
        .sort_values("event_id")
    )
    want = (np.nan_to_num(want_mean) * want_cnt + prior * w) / (want_cnt + w)
    assert np.allclose(out.te_mean.values, want, atol=1e-9)
    # cold rows (no history) get exactly the prior, not null
    assert (out.te_mean.values[want_cnt == 0] == prior).all()
    # unsmoothed cold rows stay null (honest "no information")
    base = (
        past_target_encode(df, "event_type", "value", "ts")
        .toPandas()
        .sort_values("event_id")
    )
    assert base.te_mean.isna().values[want_cnt == 0].all()


def test_argument_validation(events):
    df = events[0]
    with pytest.raises(ValueError, match="prior"):
        past_target_encode(df, "event_type", "value", "ts", prior_weight=5.0)
    with pytest.raises(ValueError, match="grouped"):
        past_target_encode(df, "event_type", "value", "ts", chunk_size=10)


def test_plain_path_plan_single_exchange_sort(events):
    """The plain path is ONE hash exchange on the key + ONE sort — the
    shape that scales (no join, no extra shuffle)."""
    df = events[0]
    plan = (
        past_target_encode(df, "event_type", "value", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_ex = plan.count("Exchange hashpartitioning")
    n_sort = plan.count("Sort [")
    assert n_ex == 1, plan
    assert n_sort == 1, plan
