"""Streaming sessionized features: applyInPandasWithState parity with the
batch formulation, across microbatch boundaries (state continuation)."""

import os
import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from powershap_spark import synth
from powershap_spark.streaming import (
    TRANSCRIPT_SCHEMA,
    run_stream_to_table,
    stream_transcripts,
    streaming_turn_features,
)

TAU = 1800.0


def _expected(pdf: pd.DataFrame) -> pd.DataFrame:
    """Independent pandas recomputation of the streaming operator's
    contract (strictly-past running features + ts-threshold sessions)."""
    rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        n, tok_sum, last_ts, seq, last_tool = 0, 0.0, None, -1, None
        for _, r in g.iterrows():
            ep = r.ts.value / 1e9
            gap = None if last_ts is None else ep - last_ts
            if gap is None or gap > TAU:
                seq += 1
            rows.append(
                dict(
                    conv_id=conv,
                    turn_idx=r.turn_idx,
                    n_prev_turns=n,
                    n_tokens_avg_past=(tok_sum / n) if n else None,
                    session_gap_s=gap,
                    session_seq=seq,
                    last_tool=last_tool,
                )
            )
            n += 1
            txt = str(r.text)
            n_tok = 0 if not txt.strip() else txt.count(" ") + 1
            tok_sum += float(n_tok)
            last_ts = ep
            if isinstance(r.tool, str):
                last_tool = r.tool
    return pd.DataFrame(rows)


@pytest.mark.parametrize("n_batches", [1, 3])
def test_streaming_features_match_batch(spark, tmp_path, n_batches):
    t = synth.transcripts(spark, n_conv=12, mean_turns=12)
    pdf = t.toPandas()
    if getattr(pdf["ts"].dtype, "tz", None) is not None:
        pdf["ts"] = pdf["ts"].dt.tz_localize(None)

    # split into n_batches files by turn ranges so cross-file order respects
    # per-conversation turn order (one file per write -> one microbatch)
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    cuts = np.array_split(np.arange(pdf.turn_idx.max() + 1), n_batches)
    for i, chunk in enumerate(cuts):
        part = t.filter(F.col("turn_idx").isin([int(x) for x in chunk]))
        part.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mod times -> deterministic batch order

    stream = stream_transcripts(
        spark, src, max_files_per_trigger=1 if n_batches > 1 else None
    )
    # parity across slicings is the subject here, not lateness: synth convs
    # start at very different epochs, so slicing by turn ranges makes later
    # slices of old conversations artificially "late" — accept everything
    feats = streaming_turn_features(stream, tau_seconds=TAU, watermark="3650 days")
    run_stream_to_table(feats, f"stream_out_{n_batches}", str(tmp_path / "ckpt"))
    got = spark.sql(f"select * from stream_out_{n_batches}").toPandas()

    assert len(got) == len(pdf)
    exp = _expected(pdf)
    key = ["conv_id", "turn_idx"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    for c in ["n_prev_turns", "session_seq"]:
        assert (g[c].to_numpy() == e[c].to_numpy()).all(), c
    for c in ["n_tokens_avg_past", "session_gap_s"]:
        np.testing.assert_allclose(
            g[c].astype(float), e[c].astype(float), atol=1e-9, equal_nan=True
        )
    assert (g.last_tool.fillna("~") == e.last_tool.fillna("~")).all()
    # leakage guard: first turn of every conversation sees nothing
    first = g[g.turn_idx == 0]
    assert (first.n_prev_turns == 0).all()
    assert first.n_tokens_avg_past.isna().all()
    assert first.last_tool.isna().all()


def test_late_conversation_beyond_watermark_is_dropped(spark, tmp_path):
    """Documented lateness contract (streaming.py module docstring):
    cross-conversation lateness is bounded by the watermark — a whole
    conversation arriving in a later microbatch with event times older
    than (max seen ts - watermark delay) is DROPPED before the stateful
    operator; lateness inside the delay is accepted."""
    base = pd.Timestamp("2024-01-01 12:00:00")

    def conv(cid, t0, n=3):
        return pd.DataFrame(
            {
                "conv_id": [cid] * n,
                "turn_idx": np.arange(n, dtype="int32"),
                "role": ["user"] * n,
                "text": ["a b c"] * n,
                "tool": [None] * n,
                "ts": [t0 + pd.Timedelta(seconds=10 * i) for i in range(n)],
            }
        )

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    # batch 1: fresh conversation at 12:00 -> watermark advances to ~11:00
    b1 = conv("fresh", base)
    # batch 2: one conversation wholly before the watermark (09:00, 2h late
    # vs the 1h delay) and one inside the allowed lateness (11:30)
    b2 = pd.concat(
        [
            conv("too_late", base - pd.Timedelta(hours=3)),
            conv("in_grace", base - pd.Timedelta(minutes=30)),
        ]
    )
    for i, b in enumerate([b1, b2]):
        sdf = spark.createDataFrame(b, schema=TRANSCRIPT_SCHEMA)
        sdf.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mod times -> deterministic batch order

    stream = stream_transcripts(spark, src, max_files_per_trigger=1)
    feats = streaming_turn_features(stream, tau_seconds=TAU, watermark="1 hour")
    run_stream_to_table(feats, "stream_out_late", str(tmp_path / "ckpt_late"))
    got = spark.sql("select * from stream_out_late").toPandas()

    by_conv = got.groupby("conv_id").size().to_dict()
    assert by_conv.get("fresh") == 3
    assert by_conv.get("in_grace") == 3, by_conv
    assert "too_late" not in by_conv, by_conv


def test_streaming_exact_dedup(spark, tmp_path):
    """Dedup-on-arrival: one row per distinct normalized text across all
    microbatches; the first arrival survives (min doc_id within a batch),
    matching batch exact_dedup's keep-set on this arrival order."""
    from powershap_spark.streaming import streaming_exact_dedup
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    b1 = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["alpha beta", "Alpha  beta", "gamma"]}
    )  # 1 normalizes equal to 0 -> suppressed in-batch
    b2 = pd.DataFrame(
        {"doc_id": [3, 4], "text": ["gamma", "delta epsilon"]}
    )  # 3 duplicates batch-1's gamma -> suppressed cross-batch
    src = str(tmp_path / "dedup_src")
    os.makedirs(src)
    for b in [b1, b2]:
        spark.createDataFrame(b, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_exact_dedup(stream)
    from powershap_spark.streaming import run_stream_to_table

    run_stream_to_table(out, "stream_dedup_out", str(tmp_path / "ckpt_dedup"))
    got = spark.sql("select * from stream_dedup_out").toPandas()
    assert sorted(got.doc_id) == [0, 2, 4]


def test_streaming_exact_dedup_min_id_across_arrow_chunks(spark, tmp_path):
    """The min-doc_id tie-break must hold when one group spans MULTIPLE
    Arrow chunks within a microbatch (arrow.maxRecordsPerBatch) — the
    operator drains all chunks before emitting."""
    from powershap_spark.streaming import run_stream_to_table, streaming_exact_dedup
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    # one group of 9 rows; min id (2) deliberately NOT first
    b = pd.DataFrame({"doc_id": [5, 9, 7, 8, 6, 2, 4, 3, 10], "text": ["same doc"] * 9})
    src = str(tmp_path / "chunk_src")
    spark.createDataFrame(b, schema=schema).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_exact_dedup(stream)
        run_stream_to_table(out, "stream_dedup_chunked", str(tmp_path / "ckpt_c"))
        got = spark.sql("select * from stream_dedup_chunked").toPandas()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert list(got.doc_id) == [2]


@pytest.mark.parametrize("n_batches", [1, 3])
def test_streaming_pit_join_matches_batch_asof(spark, tmp_path, n_batches):
    """Online point-in-time join == batch asof_join (backward, inclusive)
    when the interleaved stream arrives in event-time order, across
    microbatch slicings (state carries the last feature)."""
    from powershap_spark.operators.asof import asof_join
    from powershap_spark.streaming import (
        run_stream_to_table,
        streaming_point_in_time_join,
    )
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    rng = np.random.RandomState(11)
    base = pd.Timestamp("2024-03-01")
    rows_f, rows_p = [], []
    for conv in ["c1", "c2", "c3"]:
        t = 0.0
        for i in range(30):
            t += float(rng.randint(1, 500))
            rows_f.append((conv, base + pd.Timedelta(seconds=t), float(rng.rand())))
            if rng.rand() < 0.5:
                pt = t + float(rng.randint(0, 300))
                rows_p.append(
                    (conv, base + pd.Timedelta(seconds=pt), float(rng.randint(0, 2)))
                )
    # one probe before any feature of its conversation (no-match case)
    rows_p.append(("c1", base - pd.Timedelta(seconds=5), 1.0))
    fpdf = pd.DataFrame(rows_f, columns=["conv_id", "ts", "fvalue"])
    ppdf = pd.DataFrame(rows_p, columns=["conv_id", "ts", "label"])

    fschema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("fvalue", DoubleType()),
        ]
    )
    pschema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("label", DoubleType()),
        ]
    )
    fsrc, psrc = str(tmp_path / "pit_f"), str(tmp_path / "pit_p")
    # event-time-ordered slicing: batch k holds the rows in the k-th global
    # time range, so features always arrive no later than the probes that
    # need them (the online == batch precondition)
    all_ts = sorted(pd.concat([fpdf.ts, ppdf.ts]))
    cuts = [all_ts[len(all_ts) * (i + 1) // n_batches - 1] for i in range(n_batches)]
    lo = pd.Timestamp.min
    for hi in cuts:
        spark.createDataFrame(
            fpdf[(fpdf.ts > lo) & (fpdf.ts <= hi)], schema=fschema
        ).coalesce(1).write.mode("append").parquet(fsrc)
        spark.createDataFrame(
            ppdf[(ppdf.ts > lo) & (ppdf.ts <= hi)], schema=pschema
        ).coalesce(1).write.mode("append").parquet(psrc)
        lo = hi
        time.sleep(1.1)

    fstream = spark.readStream.schema(fschema).option(
        "maxFilesPerTrigger", 1
    ).parquet(fsrc)
    pstream = spark.readStream.schema(pschema).option(
        "maxFilesPerTrigger", 1
    ).parquet(psrc)
    out = streaming_point_in_time_join(fstream, pstream)
    run_stream_to_table(out, f"pit_out_{n_batches}", str(tmp_path / "ckpt_pit"))
    got = spark.sql(f"select * from pit_out_{n_batches}").toPandas()

    exp = asof_join(
        spark.createDataFrame(ppdf, schema=pschema),
        spark.createDataFrame(fpdf, schema=fschema),
        on="conv_id",
        ts="ts",
        direction="backward",
        allow_exact_matches=True,
        matched_ts_col="feature_ts",
    ).toPandas()

    key = ["conv_id", "ts", "label"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)[g.columns]
    assert len(g) == len(e)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_streaming_pit_join_out_of_order_feature_dropped(spark, tmp_path):
    """A feature arriving in a LATER microbatch with an OLDER ts than the
    carried state register is dropped (single-register online contract):
    probes never match it, np.searchsorted's sortedness precondition holds,
    and the register stays monotone — it must NOT regress to the stale
    feature's ts (the pre-fix bug: last_fts <- f_ts[-1] after an unsorted
    concat regressed the 'latest feature' register)."""
    from powershap_spark.streaming import (
        run_stream_to_table,
        streaming_point_in_time_join,
    )
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    base = pd.Timestamp("2024-03-01")

    def t(s):
        return base + pd.Timedelta(seconds=s)

    fschema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("fvalue", DoubleType()),
        ]
    )
    pschema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("label", DoubleType()),
        ]
    )
    # batch 1: register becomes (100, 1.0)
    b1_f = pd.DataFrame([("c1", t(100), 1.0)], columns=["conv_id", "ts", "fvalue"])
    b1_p = pd.DataFrame([("c1", t(110), 0.0)], columns=["conv_id", "ts", "label"])
    # batch 2: stale feature ts=50 (< register 100) must be DROPPED; fresh
    # feature ts=200 advances the register; probe 60 must NOT see the stale
    # feature, probe 250 must match (200, 2.0)
    b2_f = pd.DataFrame(
        [("c1", t(50), 9.0), ("c1", t(200), 2.0)],
        columns=["conv_id", "ts", "fvalue"],
    )
    b2_p = pd.DataFrame(
        [("c1", t(60), 0.0), ("c1", t(250), 1.0)],
        columns=["conv_id", "ts", "label"],
    )
    # batch 3: probe 300 proves the register did not regress to ts=50
    b3_p = pd.DataFrame([("c1", t(300), 1.0)], columns=["conv_id", "ts", "label"])

    fsrc, psrc = str(tmp_path / "ooo_f"), str(tmp_path / "ooo_p")
    empty_f = b1_f.iloc[:0]
    for fb, pb in [(b1_f, b1_p), (b2_f, b2_p), (empty_f, b3_p)]:
        spark.createDataFrame(fb, schema=fschema).coalesce(1).write.mode(
            "append"
        ).parquet(fsrc)
        spark.createDataFrame(pb, schema=pschema).coalesce(1).write.mode(
            "append"
        ).parquet(psrc)
        time.sleep(1.1)

    fstream = spark.readStream.schema(fschema).option(
        "maxFilesPerTrigger", 1
    ).parquet(fsrc)
    pstream = spark.readStream.schema(pschema).option(
        "maxFilesPerTrigger", 1
    ).parquet(psrc)
    out = streaming_point_in_time_join(fstream, pstream)
    run_stream_to_table(out, "pit_ooo", str(tmp_path / "ckpt_ooo"))
    got = (
        spark.sql("select * from pit_ooo")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )

    assert len(got) == 4
    # probe 60: no match (stale ts=50 dropped, register held 100 > 60)
    assert pd.isna(got.loc[got.ts == t(60), "fvalue"]).all()
    # probe 110 -> (100, 1.0); probes 250/300 -> (200, 2.0), proving the
    # register advanced to 200 and never regressed to the stale (50, 9.0)
    assert got.loc[got.ts == t(110), "fvalue"].iloc[0] == 1.0
    for pts in (250, 300):
        row = got.loc[got.ts == t(pts)].iloc[0]
        assert row.fvalue == 2.0
        assert row.feature_ts == t(200)
    assert not (got.fvalue == 9.0).any()


def test_streaming_exact_dedup_event_ttl_bounded_drain(spark, tmp_path):
    """Event-time TTL (ttl_mode="event"): the seen-flag expires when the
    WATERMARK passes last-arrival + TTL, so a bounded availableNow drain
    terminates (the processing-time mode provably cannot) AND still
    re-emits a duplicate that arrives after its flag expired.

    Batches: [A@t0] -> emit; [B@t0+3ttl] -> emit, watermark jumps past
    A's expiry; [C@...] -> emit, services A's timed-out state; [A@...]
    -> RE-emitted (flag was expired). Termination of run_stream_to_table
    (availableNow + awaitTermination) is itself the bounded-drain claim."""
    from powershap_spark.streaming import run_stream_to_table, streaming_exact_dedup
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    base = pd.Timestamp("2024-05-01")
    ttl_min = 10.0  # 10 minutes of EVENT time — wall clock is irrelevant
    batches = [
        pd.DataFrame({"doc_id": [1], "text": ["aa bb"], "ts": [base]}),
        pd.DataFrame(
            {"doc_id": [2], "text": ["other doc"],
             "ts": [base + pd.Timedelta(minutes=30)]}
        ),
        pd.DataFrame(
            {"doc_id": [3], "text": ["third doc"],
             "ts": [base + pd.Timedelta(minutes=31)]}
        ),
        pd.DataFrame(
            {"doc_id": [9], "text": ["aa bb"],
             "ts": [base + pd.Timedelta(minutes=32)]}
        ),
    ]
    src = str(tmp_path / "ettl_src")
    for b in batches:
        spark.createDataFrame(b, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_exact_dedup(
        stream, state_ttl_minutes=ttl_min, ttl_mode="event", event_ts_col="ts"
    )
    # terminates because expiry is watermark-driven, not wall-clock-driven
    run_stream_to_table(out, "stream_dedup_ettl", str(tmp_path / "ckpt_ettl"))
    got = spark.sql(
        "select doc_id from stream_dedup_ettl order by doc_id"
    ).toPandas()
    # 1 first arrival, 2/3 distinct texts, 9 the post-expiry re-emission
    assert list(got.doc_id) == [1, 2, 3, 9]


def test_streaming_exact_dedup_event_ttl_suppresses_within_horizon(spark, tmp_path):
    """Within the event-time TTL horizon the duplicate stays suppressed."""
    from powershap_spark.streaming import run_stream_to_table, streaming_exact_dedup
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    base = pd.Timestamp("2024-05-01")
    batches = [
        pd.DataFrame({"doc_id": [1], "text": ["aa bb"], "ts": [base]}),
        pd.DataFrame(
            {"doc_id": [9], "text": ["aa bb"],
             "ts": [base + pd.Timedelta(minutes=5)]}
        ),
    ]
    src = str(tmp_path / "ettl2_src")
    for b in batches:
        spark.createDataFrame(b, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_exact_dedup(
        stream, state_ttl_minutes=60.0, ttl_mode="event", event_ts_col="ts"
    )
    run_stream_to_table(out, "stream_dedup_ettl2", str(tmp_path / "ckpt_ettl2"))
    got = spark.sql("select doc_id from stream_dedup_ettl2").toPandas()
    assert list(got.doc_id) == [1]


def test_streaming_exact_dedup_ttl_expires_state(spark, tmp_path):
    """TTL semantics on a CONTINUOUS query (availableNow never terminates
    with a processing-time timeout — documented): within the TTL a
    duplicate is suppressed; after the seen-flag expires the same text is
    re-emitted (the documented dedup-horizon tradeoff)."""
    from powershap_spark.streaming import streaming_exact_dedup
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = str(tmp_path / "ttl_src")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["aa bb", "aa bb"]}), schema=schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_exact_dedup(stream, state_ttl_minutes=0.03)  # ~2 s
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dedup_ttl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:

        def rows():
            return spark.sql(
                "select doc_id from stream_dedup_ttl order by doc_id"
            ).toPandas()

        deadline = time.time() + 60
        while len(rows()) < 1 and time.time() < deadline:
            time.sleep(0.5)
        assert list(rows().doc_id) == [0]  # in-batch dup suppressed

        time.sleep(4)  # let the 2 s TTL expire (empty batches fire it)
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [9], "text": ["aa bb"]}), schema=schema
        ).coalesce(1).write.mode("append").parquet(src)
        while len(rows()) < 2 and time.time() < deadline:
            time.sleep(0.5)
        # expired flag -> the post-TTL duplicate is re-emitted
        assert list(rows().doc_id) == [0, 9]
    finally:
        q.stop()


def test_streaming_exact_dedup_event_ttl_lagging_key_no_crash(spark, tmp_path):
    """A key whose latest arrival lags the global watermark by more than
    the TTL must not poison the microbatch: setTimeoutTimestamp raises
    below the current watermark, and applyInPandasWithState does NOT
    pre-drop late rows, so the naive max_ts+TTL arm crashes the query
    (and replays on restart). The operator clamps to watermark+1 instead.

    Batches: [A@t0] -> emit; [B@t0+100m] -> emit, watermark jumps far
    past A; [A-dup@t0+1m] -> a LAGGING arrival for A, > TTL behind the
    watermark — pre-clamp this batch raised PySparkValueError; with the
    clamp it completes and the duplicate stays suppressed (the flag is
    present: data handling precedes timeout handling)."""
    from powershap_spark.streaming import run_stream_to_table, streaming_exact_dedup
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    base = pd.Timestamp("2024-05-01")
    batches = [
        pd.DataFrame({"doc_id": [1], "text": ["aa bb"], "ts": [base]}),
        pd.DataFrame(
            {"doc_id": [2], "text": ["other doc"],
             "ts": [base + pd.Timedelta(minutes=100)]}
        ),
        pd.DataFrame(
            {"doc_id": [9], "text": ["aa bb"],
             "ts": [base + pd.Timedelta(minutes=1)]}
        ),
    ]
    src = str(tmp_path / "lag_src")
    for b in batches:
        spark.createDataFrame(b, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming_exact_dedup(
        stream, state_ttl_minutes=10.0, ttl_mode="event", event_ts_col="ts"
    )
    run_stream_to_table(out, "stream_dedup_lag", str(tmp_path / "ckpt_lag"))
    got = spark.sql("select doc_id from stream_dedup_lag order by doc_id").toPandas()
    assert list(got.doc_id) == [1, 2]


def test_streaming_exact_dedup_event_ttl_all_null_ts(spark, tmp_path):
    """All-null event timestamps must not kill the query: naive
    pd.Timestamp(NaT).value is a huge negative ms value that makes
    setTimeoutTimestamp raise VALUE_NOT_POSITIVE. NaT chunks are skipped
    when folding max_ts; a batch with no usable event ts falls back to
    watermark+TTL (so existing state stays expirable) or arms nothing
    while the watermark is still 0."""
    from powershap_spark.streaming import run_stream_to_table, streaming_exact_dedup
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    base = pd.Timestamp("2024-05-01")
    batches = [
        # wm==0 during this batch AND one key carries only null ts
        pd.DataFrame(
            {"doc_id": [1, 5], "text": ["aa bb", "solo"], "ts": [base, pd.NaT]}
        ),
        # duplicate with null ts after the watermark advanced to `base`
        pd.DataFrame({"doc_id": [9], "text": ["aa bb"], "ts": [pd.NaT]}),
    ]
    src = str(tmp_path / "nat_src")
    for b in batches:
        spark.createDataFrame(b, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming_exact_dedup(
        stream, state_ttl_minutes=10.0, ttl_mode="event", event_ts_col="ts"
    )
    run_stream_to_table(out, "stream_dedup_nat", str(tmp_path / "ckpt_nat"))
    got = spark.sql("select doc_id from stream_dedup_nat order by doc_id").toPandas()
    # 1 and 5 are first arrivals; 9 is a within-horizon duplicate
    assert list(got.doc_id) == [1, 5]


def test_streaming_pit_join_register_ttl_eviction(spark, tmp_path):
    """state_ttl_minutes bounds the PIT join's register store: an idle
    conversation's register is evicted once the watermark passes its last
    activity + TTL. After eviction the conversation restarts cold — a
    probe before any new feature gets a NULL match (without the TTL it
    would still match the old register), and a new feature re-seeds the
    register (documented re-arrival contract). The availableNow drain
    terminating is itself the bounded-drain claim."""
    from powershap_spark.streaming import (
        run_stream_to_table,
        streaming_point_in_time_join,
    )
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    base = pd.Timestamp("2024-03-01")

    def t(m):
        return base + pd.Timedelta(minutes=m)

    fschema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("fvalue", DoubleType()),
        ]
    )
    pschema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("label", DoubleType()),
        ]
    )
    fcols, pcols = ["conv_id", "ts", "fvalue"], ["conv_id", "ts", "label"]
    ef = pd.DataFrame(columns=fcols).astype({"fvalue": "float64"})
    ep = pd.DataFrame(columns=pcols).astype({"label": "float64"})
    batches = [
        # B1: c1 register seeded; probe matches it
        (pd.DataFrame([("c1", t(0), 1.0)], columns=fcols),
         pd.DataFrame([("c1", t(1), 0.0)], columns=pcols)),
        # B2: c2 activity jumps the watermark 100 min ahead (TTL is 10)
        (pd.DataFrame([("c2", t(100), 5.0)], columns=fcols), ep),
        # B3: c1's expired register is serviced at this batch's start
        (ef, pd.DataFrame([("c2", t(101), 0.0)], columns=pcols)),
        # B4: probe for the EVICTED c1 -> null (would match 1.0 sans TTL)
        (ef, pd.DataFrame([("c1", t(102), 0.0)], columns=pcols)),
        # B5: c1 re-seeds cold, next probe matches the new feature
        (pd.DataFrame([("c1", t(103), 7.0)], columns=fcols),
         pd.DataFrame([("c1", t(104), 0.0)], columns=pcols)),
    ]
    fsrc, psrc = str(tmp_path / "pitttl_f"), str(tmp_path / "pitttl_p")
    for fb, pb in batches:
        spark.createDataFrame(fb, schema=fschema).coalesce(1).write.mode(
            "append"
        ).parquet(fsrc)
        spark.createDataFrame(pb, schema=pschema).coalesce(1).write.mode(
            "append"
        ).parquet(psrc)
        time.sleep(1.1)

    fstream = spark.readStream.schema(fschema).option(
        "maxFilesPerTrigger", 1
    ).parquet(fsrc)
    pstream = spark.readStream.schema(pschema).option(
        "maxFilesPerTrigger", 1
    ).parquet(psrc)
    out = streaming_point_in_time_join(
        fstream, pstream, state_ttl_minutes=10.0
    )
    run_stream_to_table(out, "pit_ttl", str(tmp_path / "ckpt_pitttl"))
    got = (
        spark.sql("select * from pit_ttl")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == 4
    assert got.loc[got.ts == t(1), "fvalue"].iloc[0] == 1.0
    assert got.loc[got.ts == t(101), "fvalue"].iloc[0] == 5.0
    # the eviction claim: c1's old register is GONE
    assert pd.isna(got.loc[got.ts == t(102), "fvalue"]).all()
    # the cold-restart claim: a new feature re-seeds the register
    row = got.loc[got.ts == t(104)].iloc[0]
    assert row.fvalue == 7.0 and row.feature_ts == t(103)


def test_streaming_incremental_minhash_dedup_parity_and_restart(spark, tmp_path):
    """Continuous-ingest near-dup dedup: (1) union of per-batch kept dirs
    equals batch minhash_dedup over everything ingested so far, with the
    store growing one signature per ingested id; (2) restarting the query
    with the same checkpoint after new shards arrive processes ONLY the new
    batches and preserves the parity."""
    from powershap_spark.operators.dedup import minhash_dedup
    from powershap_spark.streaming import streaming_incremental_minhash_dedup
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    base = "the quick brown fox jumps over the lazy dog again and again"
    shards = [
        pd.DataFrame({"doc_id": [0, 1], "text": [base, "totally unrelated words about spark plans"]}),
        pd.DataFrame({"doc_id": [2, 3], "text": [base + " extra", "other fresh content entirely new"]}),
        pd.DataFrame({"doc_id": [4], "text": [base.replace("dog", "cat")]}),
    ]
    src = str(tmp_path / "inc_src")
    os.makedirs(src)
    for b in shards:
        spark.createDataFrame(b, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    store_dir = str(tmp_path / "sig_store")
    kept_dir = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt_inc")
    kw = dict(num_hashes=64, bands=16, threshold=0.5, shingle_n=2)

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_incremental_minhash_dedup(stream, store_dir, kept_dir, **kw)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    all_docs = spark.read.schema(schema).parquet(src)
    expect = set(minhash_dedup(all_docs, **kw).toPandas().doc_id)
    got = set(spark.read.parquet(kept_dir).toPandas().doc_id)
    assert got == expect
    store_ids = spark.read.option("basePath", store_dir).parquet(store_dir)
    assert sorted(r[0] for r in store_ids.select("doc_id").collect()) == [0, 1, 2, 3, 4]

    # restart continuation: a new shard with a dup of an OLD doc and a
    # fresh doc; only the new batch runs (prior kept dirs untouched)
    import glob

    n_kept_dirs = len(glob.glob(f"{kept_dir}/batch=*"))
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [5, 6], "text": [base + " ", "yet another brand new doc"]}),
        schema=schema,
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    assert len(glob.glob(f"{kept_dir}/batch=*")) == n_kept_dirs + 1
    all_docs = spark.read.schema(schema).parquet(src)
    expect = set(minhash_dedup(all_docs, **kw).toPandas().doc_id)
    got = set(spark.read.parquet(kept_dir).toPandas().doc_id)
    assert got == expect and 5 not in got and 6 in got
    store_ids = spark.read.option("basePath", store_dir).parquet(store_dir)
    assert store_ids.count() == 7 == store_ids.select("doc_id").distinct().count()


def _write_doc_batch(spark, flat_dir, rows, name):
    """One parquet file per microbatch, copied into the watched dir with
    a distinct mtime so the file source's batch order is deterministic."""
    import glob
    import shutil
    import tempfile

    pdf = pd.DataFrame(
        [
            {
                "doc_id": i,
                "ts": pd.Timestamp(t),
                "lang": lang,
                "text": text,
            }
            for i, (t, lang, text) in enumerate(rows)
        ]
    )
    stage = tempfile.mkdtemp()
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(stage)
    os.makedirs(flat_dir, exist_ok=True)
    shutil.copy(
        glob.glob(os.path.join(stage, "*.parquet"))[0],
        os.path.join(flat_dir, f"{name}.parquet"),
    )
    time.sleep(1.05)


def test_streaming_corpus_stats_parity_and_late_merge(spark, tmp_path):
    """Watermarked windowed aggregation contract: (a) streamed result ==
    the SAME function run in batch mode, restricted to finalized windows
    (end <= final watermark) — cross-microbatch accumulation included;
    (b) the unfinalized last window is withheld in append mode; (c) an
    out-of-order row arriving within watermark_delay is guaranteed merged
    into its (already-open) window."""
    from powershap_spark.streaming import run_stream_to_table, streaming_corpus_stats

    flat = str(tmp_path / "docs")
    batches = [
        [
            ("2024-01-01 00:10", "en", "the cat sat on the mat today fine"),
            ("2024-01-01 00:40", "de", "der hund ist gut und laut heute"),
        ],
        [
            ("2024-01-01 01:15", "en", "it is a fine day to code and ship"),
            # out-of-order WITHIN the 2h delay: lands back in window 0
            ("2024-01-01 00:20", "en", "you know that it is still early"),
        ],
        [
            ("2024-01-01 02:20", "de", "die katze und der hund sind da"),
            ("2024-01-01 03:05", "en", "that was the last one of the feed"),
        ],
    ]
    for i, rows in enumerate(batches):
        _write_doc_batch(spark, flat, rows, f"b{i}")

    schema = "doc_id long, ts timestamp, lang string, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = streaming_corpus_stats(stream, "1 hour", "2 hours")
    q = run_stream_to_table(out, "corpus_stats", str(tmp_path / "ck"))
    assert len(q.recentProgress) >= 3  # really ran multi-batch
    got = (
        spark.sql("select * from corpus_stats")
        .toPandas()
        .sort_values(["window_start", "lang"])
        .reset_index(drop=True)
    )

    # batch mode of the SAME function on the full input
    batch_df = streaming_corpus_stats(
        spark.read.parquet(flat), "1 hour", "2 hours"
    ).toPandas()
    # final watermark = max event time (03:05) - 2h delay = 01:05: only
    # window [00:00, 01:00) is finalized and emitted
    expected = (
        batch_df[batch_df.window_end <= pd.Timestamp("2024-01-01 01:05")]
        .sort_values(["window_start", "lang"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected)

    # the late-merged row is inside the window-0 'en' aggregate
    w0en = got[(got.lang == "en") & (got.window_start == pd.Timestamp("2024-01-01"))]
    assert int(w0en.n_docs.iloc[0]) == 2

    # append mode withheld the open windows (01:00, 02:00, 03:00 starts)
    assert len(got) < len(batch_df)
    assert got.window_start.max() == pd.Timestamp("2024-01-01 00:00:00")


@pytest.mark.parametrize("n_batches", [1, 3])
def test_streaming_decayed_mean_matches_batch(spark, tmp_path, n_batches):
    """streaming_decayed_mean == decayed_past_mean (exp weighting) across
    microbatch slicings on event-time-ordered delivery with batch cuts
    between distinct timestamps — the documented online parity contract."""
    from powershap_spark.operators.encode import decayed_past_mean
    from powershap_spark.streaming import (
        run_stream_to_table,
        streaming_decayed_mean,
    )

    rng = np.random.default_rng(5)
    n = 240
    pdf = pd.DataFrame(
        {
            "user_id": rng.choice(["u1", "u2", "u3"], n),
            # distinct timestamps (unique seconds) so slicing by time
            # ranges never cuts through a tie
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.permutation(n * 3)[:n], unit="s"),
            "value": np.where(
                rng.random(n) < 0.08, np.nan, rng.normal(size=n).round(3)
            ),
        }
    ).sort_values("ts").reset_index(drop=True)

    src = str(tmp_path / f"dm_src_{n_batches}")
    os.makedirs(src)
    for chunk in np.array_split(np.arange(n), n_batches):
        part = spark.createDataFrame(pdf.iloc[chunk])
        part.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    stream = spark.readStream.schema(
        "user_id string, ts timestamp, value double"
    ).parquet(src)
    if n_batches > 1:
        stream = spark.readStream.schema(
            "user_id string, ts timestamp, value double"
        ).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_decayed_mean(stream, half_life_s=120.0, key_col="user_id")
    run_stream_to_table(out, f"dm_out_{n_batches}", str(tmp_path / "ck"))
    got = (
        spark.sql(f"select * from dm_out_{n_batches}")
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == n
    assert got["dm_mean"].notna().sum() > 0

    exp = (
        decayed_past_mean(
            spark.createDataFrame(pdf),
            key="user_id",
            label="value",
            ts="ts",
            half_life_s=120.0,
            weighting="exp",
        )
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    assert (got["dm_cnt"].to_numpy() == exp["dm_cnt"].to_numpy()).all()
    np.testing.assert_allclose(
        got["dm_mean"].astype(float).to_numpy(),
        exp["dm_mean"].astype(float).to_numpy(),
        rtol=1e-9,
        equal_nan=True,
    )


def test_streaming_decayed_mean_late_rows_fold_but_emit_null(spark, tmp_path):
    """A row older than the register cannot be served (NULL emission) but
    still folds in at its correct sub-unit weight: the next row's mean
    includes it exactly as the batch operator would."""
    from powershap_spark.streaming import (
        run_stream_to_table,
        streaming_decayed_mean,
    )

    base = pd.Timestamp("2024-01-01 12:00:00")
    b1 = pd.DataFrame(
        {"user_id": ["u"], "ts": [base], "value": [10.0]}
    )
    b2 = pd.DataFrame(  # late vs the register (base - 60s), then a probe
        {
            "user_id": ["u", "u"],
            "ts": [base - pd.Timedelta(seconds=60), base + pd.Timedelta(seconds=60)],
            "value": [20.0, 30.0],
        }
    )
    src = str(tmp_path / "dm_late_src")
    os.makedirs(src)
    for b in (b1, b2):
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("user_id string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_decayed_mean(stream, half_life_s=60.0, key_col="user_id")
    run_stream_to_table(out, "dm_late_out", str(tmp_path / "ck_late"))
    got = (
        spark.sql("select * from dm_late_out")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(got) == 3
    # late row: folded but not served
    assert pd.isna(got.loc[0, "dm_mean"]) and pd.isna(got.loc[0, "dm_cnt"])
    # first row: cold start
    assert got.loc[1, "dm_cnt"] == 0 and pd.isna(got.loc[1, "dm_mean"])
    # probe at +60s sees BOTH values with exact batch weights:
    # w(10.0 @ -60s) = 2^-1, w(20.0 @ -120s) = 2^-2
    want = (10.0 * 0.5 + 20.0 * 0.25) / (0.5 + 0.25)
    assert got.loc[2, "dm_cnt"] == 2
    assert np.isclose(got.loc[2, "dm_mean"], want, rtol=1e-12)
