"""North-rule acceptance: feature vectors allclose to an independent pandas
oracle at each (conv_id, ts) probe — zero temporal leakage end to end.

The oracle recomputes every feature with pandas groupby/rolling/shift from
the raw transcript rows and attaches them to probes with pandas.merge_asof;
the engine's matrix must match allclose at every probe."""

import numpy as np
import pandas as pd
import pytest

from powershap_spark import synth
from powershap_spark.pipeline import FEATURE_COLS, point_in_time_matrix, turn_features

TAU = 1800.0


def _pandas_features(t: pd.DataFrame) -> pd.DataFrame:
    t = t.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    g = t.groupby("conv_id", sort=False)
    ep = t["ts"].astype("int64") / 1e9  # ns -> s

    out = pd.DataFrame(
        {
            "conv_id": t.conv_id,
            "turn_idx": t.turn_idx,
            "ts": t.ts,
            "text_len": t.text.str.len().astype(float),
            "n_tokens": t.text.str.split().str.len().fillna(0).astype(float),
        }
    )
    out["avg_token_len"] = np.where(
        out.n_tokens > 0,
        (out.text_len - (out.n_tokens - 1)) / out.n_tokens,
        np.nan,
    )
    out["n_punct"] = t.text.str.count(r"[\.,;:!\?]").astype(float)
    gtl = out.groupby(out.conv_id, sort=False)["text_len"]
    gnt = out.groupby(out.conv_id, sort=False)["n_tokens"]
    out["text_len_lag1"] = gtl.shift(1).fillna(0)
    out["text_len_lag2"] = gtl.shift(2).fillna(0)
    out["n_tokens_lag1"] = gnt.shift(1).fillna(0)
    out["text_len_avg_prev5"] = (
        gtl.rolling(5, min_periods=1).mean().reset_index(drop=True).groupby(out.conv_id).shift(1).fillna(0)
    )
    out["text_len_sum_prev3"] = (
        gtl.rolling(3, min_periods=1).sum().reset_index(drop=True).groupby(out.conv_id).shift(1).fillna(0)
    )
    cum_n = out.groupby(out.conv_id, sort=False).cumcount()
    cumsum_nt = gnt.cumsum() - out.n_tokens
    out["n_tokens_avg_past"] = np.where(cum_n > 0, cumsum_nt / cum_n, 0.0)
    out["n_prev_turns"] = cum_n.astype(float)

    # turns in [floor(ep)-600, floor(ep)-1] of the same conv (range frame on
    # the truncated-seconds ordering, matching the engine's cast('long'))
    epl = np.floor(ep).astype(np.int64)
    c600 = np.zeros(len(t))
    for _, idx in t.groupby("conv_id", sort=False).indices.items():
        e = epl.values[idx]
        for j, v in enumerate(e):
            c600[idx[j]] = np.sum((e >= v - 600) & (e <= v - 1))
    out["turns_last_600s"] = c600

    gap = ep.groupby(t.conv_id, sort=False).diff()
    out["session_gap_s"] = gap.fillna(0)
    out["session_seq"] = (
        ((gap > TAU) | gap.isna()).groupby(t.conv_id, sort=False).cumsum() - 1
    ).astype(float)
    tool_ff = t.groupby("conv_id", sort=False)["tool"].apply(
        lambda s: s.ffill().shift(1)
    ).reset_index(drop=True)
    out["has_prev_tool"] = tool_ff.notna().astype(float)
    return out


@pytest.mark.parametrize("skew_safe", [False, True])
def test_feature_vectors_allclose_at_each_probe(spark, skew_safe):
    t_sdf = synth.transcripts(spark, n_conv=40, mean_turns=15)
    p_sdf = synth.probes(spark, t_sdf, probe_frac=0.35)
    kw = {"chunk_size": 97, "halo_rows": 96} if skew_safe else {}
    mat = (
        point_in_time_matrix(
            turn_features(t_sdf, skew_safe=skew_safe, **kw), p_sdf, skew_safe=skew_safe,
            **({"bucket_seconds": 3600} if skew_safe else {}),
        )
        .toPandas()
        .sort_values(["conv_id", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )

    t_pdf = t_sdf.toPandas()
    p_pdf = p_sdf.toPandas()
    feats = _pandas_features(t_pdf).sort_values("ts", kind="mergesort")
    oracle = pd.merge_asof(
        p_pdf.sort_values("ts", kind="mergesort"),
        feats.rename(columns={"ts": "fts", "turn_idx": "f_turn"}),
        left_on="ts",
        right_on="fts",
        by="conv_id",
        direction="backward",
    ).sort_values(["conv_id", "ts"], kind="mergesort").reset_index(drop=True)

    assert len(mat) == len(oracle)
    # matched timestamps agree (incl. the before-first-turn null case)
    a = mat.feature_ts.astype("int64", errors="ignore")
    assert (
        mat.feature_ts.isna() == oracle.fts.isna()
    ).all(), "null-match sets differ"
    m = ~mat.feature_ts.isna()
    assert (mat.feature_ts[m].values == oracle.fts[m].values).all()

    for c in FEATURE_COLS:
        got = mat.loc[m, c].astype(float).values
        exp = oracle.loc[m.values, c].astype(float).values
        assert np.allclose(got, exp, atol=1e-9, equal_nan=True), c


def _persistent_rdd_ids(spark):
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    ids = set()
    while it.hasNext():
        ids.add(int(it.next()))
    return ids


def test_no_cached_rdds_after_select_features(spark):
    """Engine + diamond persists (salted features, bucketed as-of, matrix
    projection) must all be released when select_features returns.
    Asserted as NO NEW persistent RDDs rather than a global zero: other
    tests in the shared session legitimately leave localCheckpoint RDDs
    behind (a localCheckpoint cache cannot be dropped while its DataFrame
    may still be read; the ContextCleaner reclaims it on GC), and this
    test's contract is about select_features' OWN persists."""
    from powershap_spark import synth
    from powershap_spark.pipeline import select_features

    spark.catalog.clearCache()
    before = _persistent_rdd_ids(spark)
    t = synth.transcripts(spark, n_conv=30, mean_turns=10)
    p = synth.probes(spark, t, probe_frac=0.3)
    select_features(t, p, power_iterations=2, skew_safe=True, n_parts=2)
    leaked = _persistent_rdd_ids(spark) - before
    assert not leaked, f"select_features leaked persistent RDDs: {leaked}"
