"""Synthetic transcript generator: determinism, partition invariance,
schema contract (BASELINE.json input_hint), planted skew."""

import numpy as np
import pytest

from powershap_spark import synth


def _collect(df):
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_schema_matches_input_hint(spark):
    t = synth.transcripts(spark, n_conv=10, mean_turns=8)
    assert [(f.name, f.dataType.simpleString()) for f in t.schema.fields] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]


def test_deterministic_and_partition_invariant(spark):
    a = _collect(synth.transcripts(spark, n_conv=30, mean_turns=10))
    b = _collect(synth.transcripts(spark, n_conv=30, mean_turns=10, n_partitions=7))
    assert a.equals(b)


def test_per_turn_text_equality_under_stable_ordering(spark):
    """north_rule invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering across two independent generations."""
    a = _collect(synth.transcripts(spark, n_conv=25, mean_turns=12))
    b = _collect(synth.transcripts(spark, n_conv=25, mean_turns=12))
    assert (a.text == b.text).all()
    assert (a.turn_idx == b.turn_idx).all()


def test_hot_conversation_planted(spark):
    t = synth.transcripts(spark, n_conv=50, mean_turns=20, hot_frac=0.10)
    counts = t.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    frac = counts["conv_00000000"] / counts.sum()
    assert 0.05 < frac < 0.2


def test_multi_session_conversations_exist(spark):
    from powershap_spark.operators.windows import build_features, sessionize

    t = synth.transcripts(spark, n_conv=40, mean_turns=25)
    s = build_features(t, [sessionize("ts", synth.TAU_SECONDS)], "conv_id", "turn_idx")
    mx = s.groupBy("conv_id").agg({"session_seq": "max"}).toPandas()
    assert (mx["max(session_seq)"] > 0).any()


def test_roles_cycle_and_tools_on_tool_turns(spark):
    t = synth.transcripts(spark, n_conv=10, mean_turns=9).toPandas()
    assert set(t.role) == {"user", "assistant", "tool"}
    assert t[t.role == "tool"].tool.notna().all()
    assert t[t.role != "tool"].tool.isna().all()


def test_probes_kinds_and_labels(spark):
    t = synth.transcripts(spark, n_conv=40, mean_turns=15)
    p = synth.probes(spark, t, probe_frac=0.3, task="classification").toPandas()
    assert set(p.label) <= {0, 1}
    assert 0.1 < p.label.mean() < 0.9
    # some probes predate the conversation (null-match case)
    tmin = t.groupBy("conv_id").agg({"ts": "min"}).toPandas().set_index("conv_id")
    joined = p.join(tmin, on="conv_id")
    assert (joined.ts < joined["min(ts)"]).any()


def test_committed_fixture_matches_generator(spark):
    """The committed parity fixture (tools/make_fixtures.py) must stay
    reproducible from the generator bit-for-bit — the transcript_features
    oracle reads the fixture, so drift here would silently decouple the
    oracle from the engine under test."""
    import pandas as pd

    from tools.make_fixtures import MEAN_TURNS, N_CONV, PROBE_FRAC, TRANSCRIPTS

    t = synth.transcripts(spark, n_conv=N_CONV, mean_turns=MEAN_TURNS)
    fresh = t.orderBy("conv_id", "turn_idx").toPandas()
    committed = pd.read_parquet(TRANSCRIPTS)
    for df in (fresh, committed):
        if getattr(df["ts"].dtype, "tz", None) is not None:
            df["ts"] = df["ts"].dt.tz_localize(None)
        df["ts"] = df["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(fresh, committed)
    # probe count sanity (full probe parity is covered via the oracle gate)
    p = synth.probes(spark, t, probe_frac=PROBE_FRAC)
    assert p.count() == len(pd.read_parquet(TRANSCRIPTS.replace("transcripts_", "probes_")))


def test_documents_deterministic_partition_invariant_and_schema(spark):
    a = synth.documents(spark, n_docs=500).toPandas().sort_values("doc_id")
    b = (
        synth.documents(spark, n_docs=500, n_partitions=7)
        .toPandas()
        .sort_values("doc_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # schema-compatible with the driver documents table
    assert list(a.columns) == ["doc_id", "text", "lang", "source", "n_chars"]
    assert (a.n_chars == a.text.str.len()).all()


def test_documents_planted_near_dups_are_found(spark):
    """The near_dup_frac plant must actually register as near-duplicates:
    each dup copies an earlier doc's word stream mutating every k-th word,
    so token-level Jaccard vs its base stays high while distinct docs stay
    low — the separation MinHash dedup relies on."""
    import pandas as pd

    pdf = synth.documents(spark, n_docs=800, near_dup_frac=0.1).toPandas()
    from powershap_spark.operators.dedup import minhash_dedup

    kept = minhash_dedup(
        spark.createDataFrame(pdf), threshold=0.6
    ).count()
    dropped = len(pdf) - kept
    # ~10% planted minus those whose mutation dips below threshold;
    # bound loosely — the point is the plant bites, not an exact rate
    assert 0.03 * len(pdf) < dropped < 0.15 * len(pdf), dropped


def test_events_deterministic_partition_invariant_and_schema(spark):
    """synth.events: driver-events-parquet-compatible schema, bit
    determinism across partitionings, the planted hot user, and values
    that are pure functions of event_id."""
    import pandas as pd

    from powershap_spark import synth

    a = synth.events(spark, n_events=5000).orderBy("event_id").toPandas()
    b = (
        synth.events(spark, n_events=5000, n_partitions=7)
        .orderBy("event_id")
        .toPandas()
    )
    assert list(a.columns) == ["user_id", "ts", "event_id", "event_type", "value"]
    assert a.equals(b)
    share = (a.user_id == 0).mean()
    assert 0.07 < share < 0.13  # hot_frac=0.10 planted on user 0
    assert set(a.event_type.unique()) <= {"view", "click", "cart", "purchase"}
    assert a.value.between(0, 500).all()
    # timestamps inside the 30-day span
    assert a.ts.min() >= pd.Timestamp("2024-01-01")
    assert a.ts.max() < pd.Timestamp("2024-01-31 00:00:01")


def test_events_rejects_single_user(spark):
    from powershap_spark import synth

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_users"):
        synth.events(spark, n_events=10, n_users=1)
