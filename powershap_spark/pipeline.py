"""End-to-end pipeline: transcript table -> strictly-past windowed features
-> point-in-time feature matrix at (conv_id, ts) probes -> powershap
selection. This is the flagship query (SURVEY §7.1 step 3 / §3.4).

All feature engineering is JVM-side (window functions + string exprs over
ONE per-conversation shuffle); the as-of join is the sort-merge union+window
formulation; only the model kernel crosses into Python, via Arrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.asof import asof_join
from .operators.windows import (
    build_features,
    ffill,
    lag_feature,
    rolling,
    session_gap,
    sessionize,
    text_stats,
    time_rolling,
)
from .engine import PowerShapSelector

DEFAULT_TAU = 1800.0


def turn_features(transcripts: DataFrame, tau_seconds: float = DEFAULT_TAU) -> DataFrame:
    """Per-turn feature rows: scalar text stats + strictly-past windowed
    features over (conv_id, turn_idx). Returns one row per turn with only
    leakage-safe feature columns (plus keys)."""
    t = transcripts.withColumns(text_stats("text"))
    specs = [
        lag_feature("text_len", 1),
        lag_feature("text_len", 2),
        lag_feature("n_tokens", 1),
        rolling("text_len", "avg", -5, -1, name="text_len_avg_prev5"),
        rolling("text_len", "sum", -3, -1, name="text_len_sum_prev3"),
        rolling("n_tokens", "avg", None, -1, name="n_tokens_avg_past"),
        rolling("text_len", "count", None, -1, name="n_prev_turns"),
        time_rolling("text_len", "count", 600, name="turns_last_600s"),
        session_gap("ts"),
        sessionize("ts", tau_seconds),
        ffill("tool", strict_past=True, name="last_tool"),
    ]
    out = build_features(t, specs, entity="conv_id", order="turn_idx", ts="ts")
    # model-ready numeric projection (keys + features)
    return out.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.col("text_len").cast("double"),
        F.col("n_tokens").cast("double"),
        F.col("avg_token_len").cast("double"),
        F.col("n_punct").cast("double"),
        F.coalesce(F.col("text_len_lag1"), F.lit(0)).cast("double").alias("text_len_lag1"),
        F.coalesce(F.col("text_len_lag2"), F.lit(0)).cast("double").alias("text_len_lag2"),
        F.coalesce(F.col("n_tokens_lag1"), F.lit(0)).cast("double").alias("n_tokens_lag1"),
        F.coalesce(F.col("text_len_avg_prev5"), F.lit(0)).cast("double").alias("text_len_avg_prev5"),
        F.coalesce(F.col("text_len_sum_prev3"), F.lit(0)).cast("double").alias("text_len_sum_prev3"),
        F.coalesce(F.col("n_tokens_avg_past"), F.lit(0)).cast("double").alias("n_tokens_avg_past"),
        F.col("n_prev_turns").cast("double"),
        F.coalesce(F.col("turns_last_600s"), F.lit(0)).cast("double").alias("turns_last_600s"),
        F.coalesce(F.col("session_gap_s"), F.lit(0)).cast("double").alias("session_gap_s"),
        F.col("session_seq").cast("double"),
        F.when(F.col("last_tool").isNotNull(), 1.0).otherwise(0.0).alias("has_prev_tool"),
    )


FEATURE_COLS = [
    "text_len",
    "n_tokens",
    "avg_token_len",
    "n_punct",
    "text_len_lag1",
    "text_len_lag2",
    "n_tokens_lag1",
    "text_len_avg_prev5",
    "text_len_sum_prev3",
    "n_tokens_avg_past",
    "n_prev_turns",
    "turns_last_600s",
    "session_gap_s",
    "session_seq",
    "has_prev_tool",
]


def point_in_time_matrix(
    features: DataFrame, probes: DataFrame, tau_seconds: float = DEFAULT_TAU
) -> DataFrame:
    """As-of join: each probe (conv_id, ts, label) gets the latest feature
    row of its conversation with feature.ts <= probe.ts — zero temporal
    leakage by construction (features themselves are strictly-past)."""
    return asof_join(
        probes,
        features,
        on="conv_id",
        ts="ts",
        direction="backward",
        allow_exact_matches=True,
        matched_ts_col="feature_ts",
    )


def select_features(
    transcripts: DataFrame,
    probes: DataFrame,
    tau_seconds: float = DEFAULT_TAU,
    selector: PowerShapSelector | None = None,
    **selector_kw,
) -> tuple[PowerShapSelector, DataFrame]:
    """Full pipeline; returns (fitted selector, point-in-time matrix)."""
    feats = turn_features(transcripts, tau_seconds)
    mat = point_in_time_matrix(feats, probes, tau_seconds)
    mat = mat.filter(F.col("feature_ts").isNotNull())  # probes before conv start
    sel = selector or PowerShapSelector(
        sort_cols=["conv_id", "ts"], **selector_kw
    )
    sel.fit(mat, label_col="label", feature_cols=FEATURE_COLS)
    return sel, mat
