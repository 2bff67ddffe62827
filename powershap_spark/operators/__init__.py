from .asof import asof_join, asof_join_broadcast, asof_join_bucketed
from .curate import curate_corpus
from .encode import past_target_encode
from .scrub import canonicalize_url, pii_counts, scrub_pii
from .windows import (
    FeatureSpec,
    LeakageError,
    bfill,
    build_features,
    entity_window,
    ffill,
    lag_feature,
    lead_col,
    rolling,
    row_number_ordered,
    session_gap,
    sessionize,
    text_stats,
    text_stats_fast,
    time_rolling,
)

__all__ = [
    "asof_join",
    "asof_join_broadcast",
    "asof_join_bucketed",
    "canonicalize_url",
    "curate_corpus",
    "past_target_encode",
    "pii_counts",
    "scrub_pii",
    "FeatureSpec",
    "LeakageError",
    "bfill",
    "build_features",
    "entity_window",
    "ffill",
    "lag_feature",
    "lead_col",
    "rolling",
    "row_number_ordered",
    "session_gap",
    "sessionize",
    "text_stats",
    "text_stats_fast",
    "time_rolling",
]
