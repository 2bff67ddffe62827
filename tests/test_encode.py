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


# ---------------------------------------------------------------------------
# decayed_past_mean
# ---------------------------------------------------------------------------


def _decay_replica(pdf, half_life_s, weighting):
    """Direct per-row recompute: weighted mean of strictly earlier
    same-key labels with w = 2^{-(age)/h} (exp) or 2^{-floor-bucket
    distance} via the same rebased formulation the operator uses."""
    h_us = half_life_s * 1e6
    us = pdf.ts.astype("int64") // 1000  # ns -> us
    cnts, means = [], []
    for i, r in pdf.iterrows():
        m = (pdf.event_type == r.event_type) & (us < us[i]) & pdf.value.notna()
        cnts.append(int(m.sum()))
        if not m.sum():
            means.append(np.nan)
            continue
        t0 = us[pdf.event_type == r.event_type].min()
        s = (us[m] - t0) / h_us
        if weighting == "halving":
            w = np.power(2.0, np.floor(s))
        else:
            w = np.power(2.0, s)
        means.append(float((pdf.value[m] * w).sum() / w.sum()))
    return np.asarray(cnts), np.asarray(means)


@pytest.mark.parametrize("weighting", ["exp", "halving"])
def test_decayed_past_mean_matches_replica(spark, weighting):
    from powershap_spark.operators.encode import decayed_past_mean

    pdf = _events_pdf(n=300, ts_span_s=3600)
    sdf = spark.createDataFrame(pdf)
    got = (
        decayed_past_mean(
            sdf, half_life_s=600.0, weighting=weighting
        )
        .orderBy("event_id")
        .toPandas()
    )
    want_cnt, want_mean = _decay_replica(pdf, 600.0, weighting)
    assert (got["dm_cnt"].to_numpy() == want_cnt).all()
    np.testing.assert_allclose(
        got["dm_mean"].to_numpy(), want_mean, rtol=1e-9, equal_nan=True
    )


def test_decayed_past_mean_recency_weighting_and_leakage(spark):
    """A recent past value dominates an old one; simultaneous rows never
    see each other; a row never sees itself or the future."""
    from powershap_spark.operators.encode import decayed_past_mean

    pdf = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4],
            "event_type": ["a"] * 5,
            "value": [100.0, 0.0, 50.0, 50.0, 999.0],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",  # old: 100
                    "2024-01-01 02:00:00",  # recent: 0
                    "2024-01-01 02:00:10",  # probe row
                    "2024-01-01 02:00:10",  # simultaneous with probe
                    "2024-01-01 03:00:00",  # future
                ]
            ),
        }
    )
    got = (
        decayed_past_mean(
            spark.createDataFrame(pdf), half_life_s=600.0, weighting="exp"
        )
        .orderBy("event_id")
        .toPandas()
    )
    # probe sees ONLY rows 0 and 1; the old 100 sits 12 half-lives back
    # (weight 2^-12 relative to the recent 0), so the decayed mean is
    # exactly 100 / (1 + 2^12) — vs the unweighted mean of 50
    assert got.loc[2, "dm_cnt"] == 2
    assert np.isclose(got.loc[2, "dm_mean"], 100.0 / (1 + 2**12), rtol=1e-12)
    # simultaneous rows have identical encodings (neither sees the other)
    assert got.loc[2, "dm_mean"] == got.loc[3, "dm_mean"]
    # first row has no past
    assert got.loc[0, "dm_cnt"] == 0 and np.isnan(got.loc[0, "dm_mean"])


def test_decayed_past_mean_halving_exact_integer_path(spark):
    """With an integer label the halving variant's windowed sums are exact
    long arithmetic — the engine-identical determinism path the driver
    query rides. Verify against exact python ints."""
    from powershap_spark.operators.encode import decayed_past_mean

    pdf = pd.DataFrame(
        {
            "event_id": range(6),
            "event_type": ["a"] * 6,
            "v": np.array([3, 5, 7, 11, 13, 17], dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([0, 600, 1200, 1800, 2400, 3000], unit="s"),
        }
    )
    got = (
        decayed_past_mean(
            spark.createDataFrame(pdf),
            label="v",
            half_life_s=600.0,
            weighting="halving",
        )
        .orderBy("event_id")
        .toPandas()
    )
    vals = [3, 5, 7, 11, 13, 17]
    for i in range(1, 6):
        num = sum(v * (1 << b) for b, v in enumerate(vals[:i]))
        den = sum(1 << b for b in range(i))
        assert got.loc[i, "dm_mean"] == num / den, i


def test_decayed_past_mean_validation(spark):
    from powershap_spark.operators.encode import decayed_past_mean

    sdf = spark.createDataFrame(_events_pdf(n=10))
    with pytest.raises(ValueError):
        decayed_past_mean(sdf, half_life_s=0)
    with pytest.raises(ValueError):
        decayed_past_mean(sdf, weighting="linear")


@pytest.mark.parametrize("weighting", ["exp", "halving"])
def test_decayed_past_mean_grouped_and_chunked_parity(spark, weighting):
    """The grouped (key, ts)-partials path and the salted-chunked path
    must equal the plain window path — exactly for halving (integer
    weights re-associate losslessly over integer labels), to float
    re-association tolerance for exp."""
    from powershap_spark.operators.encode import decayed_past_mean

    pdf = _events_pdf(n=300, ts_span_s=900)  # coarse ts => real groups
    if weighting == "halving":
        pdf = pdf.assign(value=np.where(
            pdf.value.isna(), np.nan, (pdf.value * 1000).round()))
    sdf = spark.createDataFrame(pdf)
    kw = dict(half_life_s=120.0, weighting=weighting)
    base = (
        decayed_past_mean(sdf, **kw).orderBy("event_id").toPandas()
    )
    for extra in ({"grouped": True}, {"grouped": True, "chunk_size": 16}):
        got = (
            decayed_past_mean(sdf, **kw, **extra)
            .orderBy("event_id")
            .toPandas()
        )
        assert (got["dm_cnt"].to_numpy() == base["dm_cnt"].to_numpy()).all()
        if weighting == "halving":
            # integer labels scaled 1e3: exact on every path
            a = got["dm_mean"].to_numpy()
            b = base["dm_mean"].to_numpy()
            both = ~(np.isnan(a) | np.isnan(b))
            assert (np.isnan(a) == np.isnan(b)).all()
            assert (a[both] == b[both]).all(), extra
        else:
            np.testing.assert_allclose(
                got["dm_mean"].to_numpy(),
                base["dm_mean"].to_numpy(),
                rtol=1e-12,
                equal_nan=True,
            )
    with pytest.raises(ValueError):
        decayed_past_mean(sdf, chunk_size=8)


def test_decayed_past_mean_chunked_halving_exact_above_2_53(spark):
    """The salted-chunked halving path must keep LONG arithmetic end to
    end: sums between 2^53 and 2^62 (inside the documented exactness
    envelope) must equal the plain window path BIT-FOR-BIT — a double
    anywhere in the cumsum plumbing would round them (the r7 review
    finding on salted_cumsum's zero literal)."""
    from powershap_spark.operators.encode import decayed_past_mean

    n = 20
    base = 1 << 36
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "event_type": ["a"] * n,
            # large integer labels: products with 2^bucket weights cross
            # 2^53 well before the 2^62 envelope
            "v": np.array([base + 7 * i for i in range(n)], dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(n) * 600, unit="s"),
        }
    )
    sdf = spark.createDataFrame(pdf)
    kw = dict(label="v", half_life_s=600.0, weighting="halving")
    plain = decayed_past_mean(sdf, **kw).orderBy("event_id").toPandas()
    chunked = (
        decayed_past_mean(sdf, **kw, grouped=True, chunk_size=5)
        .orderBy("event_id")
        .toPandas()
    )
    # exact python-int oracle for the last row confirms we are over 2^53
    num = sum((base + 7 * i) * (1 << i) for i in range(n - 1))
    assert num > 2**53
    a, b = plain["dm_mean"].to_numpy(), chunked["dm_mean"].to_numpy()
    both = ~(np.isnan(a) | np.isnan(b))
    assert (np.isnan(a) == np.isnan(b)).all()
    assert (a[both] == b[both]).all()
    den = sum(1 << i for i in range(n - 1))
    assert plain["dm_mean"].iloc[-1] == num / den


def test_decayed_past_mean_plan_single_exchange(spark):
    """Like past_target_encode's plain path: the full-frame per-key min
    and the two strictly-past sums share ONE hash exchange on the key —
    adding recency weighting must not add a shuffle."""
    sdf = spark.createDataFrame(_events_pdf(n=50))
    from powershap_spark.operators.encode import decayed_past_mean

    plan = (
        decayed_past_mean(sdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
