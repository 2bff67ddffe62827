"""Deterministic synthetic transcript + label tables (FIXTURES.md F1/F2).

Schema per BASELINE.json input_hint:
  transcripts(conv_id:string, turn_idx:int, role:string, text:string,
              tool:string, ts:timestamp)

Every column is a pure function of (seed, conv_id, turn_idx) via xxhash64,
so generation is order- and partition-independent: the same rows come out
at any parallelism, any scale factor, any resume point. Pure Spark
expressions end to end — no driver-side data, no Python UDFs.

Skew: conversation 0 is a planted hot key holding ~hot_frac of all rows
(exercises the salted/bucketed operators, FIXTURES.md F1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TAU_SECONDS = 1800  # session threshold used throughout tests/bench

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "python", "browser", "calculator", "editor"]
_VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega", "spark",
    "window", "join", "shuffle", "feature", "probe", "session", "turn",
]


def _h(seed: int, *cols) -> "F.Column":
    return F.xxhash64(F.lit(seed), *cols)


def _u01(seed: int, *cols) -> "F.Column":
    """Deterministic uniform [0,1) from a hash (order-independent)."""
    return (F.pmod(_h(seed, *cols), F.lit(1_000_000)).cast("double")) / 1_000_000.0


def transcripts(
    spark: SparkSession,
    n_conv: int = 200,
    mean_turns: int = 30,
    hot_frac: float = 0.10,
    seed: int = 42,
    n_partitions: int | None = None,
    skew_safe: bool = True,
) -> DataFrame:
    """Deterministic transcript table. Total rows ~ n_conv * mean_turns /
    (1 - hot_frac); conversation 0 holds ~hot_frac of them.

    skew_safe=True computes the cumulative-gap timestamp with the
    two-phase chunked prefix sum instead of one per-conversation window;
    the expensive per-row text synthesis runs AFTER that exchange,
    already spread by the cumsum's (conv_id, chunk) partitioning, so a
    hot conversation's rows never synthesize inside one task and no
    separate redistribution shuffle is needed (r8). Gaps are
    integer-valued doubles, so the chunked summation is bit-identical to
    the sequential one at any partitioning."""
    # base turns uniform in [3, 2*mean_turns+2] (mean ~= mean_turns+2), 3% of
    # convs x8 long tail -> expected per-conv ~= 1.21 * (mean_turns + 2)
    expected_total = n_conv * (mean_turns + 2) * 1.21
    hot_turns = int(expected_total * hot_frac / max(1e-9, 1.0 - hot_frac))

    conv = spark.range(n_conv).withColumnRenamed("id", "conv_nr")
    if n_partitions:
        conv = conv.repartition(n_partitions)

    h_turns = _h(seed, F.lit("nturns"), F.col("conv_nr"))
    base = (F.pmod(h_turns, F.lit(2 * mean_turns)) + 3).cast("int")
    long_tail = F.when(_u01(seed, F.lit("tail"), F.col("conv_nr")) < 0.03, 8).otherwise(1)
    n_turns = F.when(F.col("conv_nr") == 0, F.lit(max(hot_turns, 5))).otherwise(
        base * long_tail
    )

    df = (
        conv.withColumn("n_turns", n_turns)
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
        .drop("n_turns")
        .withColumn("conv_id", F.format_string("conv_%08d", F.col("conv_nr")))
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    )

    # ts: conv start + cumulative gaps; ~5% of gaps exceed tau (multi-session)
    gap_small = (F.pmod(_h(seed, F.lit("gap"), F.col("conv_id"), F.col("turn_idx")), F.lit(300)) + 5).cast("double")
    gap_big = gap_small + F.lit(float(TAU_SECONDS)) + (
        F.pmod(_h(seed, F.lit("bgap"), F.col("conv_id"), F.col("turn_idx")), F.lit(3600))
    ).cast("double")
    gap = F.when(F.col("turn_idx") == 0, F.lit(0.0)).otherwise(
        F.when(_u01(seed, F.lit("sess"), F.col("conv_id"), F.col("turn_idx")) < 0.05, gap_big).otherwise(gap_small)
    )
    conv_start = (
        F.lit(1_700_000_000).cast("double")
        + F.pmod(_h(seed, F.lit("start"), F.col("conv_id")), F.lit(86_400 * 30)).cast("double")
    )

    # shuffle-byte discipline (r8): the cumulative-gap prefix sum is the
    # only stage that needs a per-conversation exchange, so it runs over
    # NARROW rows (conv_id, turn_idx, gap, start ≈ 40 B) and the ~200 B
    # text/role/tool synthesis happens AFTER it, already distributed by
    # the cumsum's (conv_id, chunk) partitioning — the hot conversation's
    # per-row synthesis spreads over its ~n/65k chunk tasks instead of
    # one, and the explicit pre-synthesis repartition shuffle is gone.
    # Every column stays a pure function of (seed, conv_id, turn_idx), so
    # values are identical at any parallelism (parity-pinned tests).
    out = df.select(
        "conv_id",
        "turn_idx",
        gap.alias("__gap"),
        conv_start.alias("__start"),
    )
    if skew_safe:
        from .operators.salted import salted_cumsum

        out = salted_cumsum(
            out, "__gap", "__cumgap", entity="conv_id", order="turn_idx", chunk_size=65_536
        )
    else:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        out = out.withColumn(
            "__cumgap", F.sum("__gap").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )

    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]), (F.pmod(F.col("turn_idx"), F.lit(3)) + 1).cast("int")
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(_h(seed, F.lit("tool"), F.col("conv_id"), F.col("turn_idx")), F.lit(len(_TOOLS))) + 1).cast("int"),
        ),
    )

    # text: 3..42 vocab tokens, token choice hashed per (conv, turn, pos)
    n_tok = (F.pmod(_h(seed, F.lit("ntok"), F.col("conv_id"), F.col("turn_idx")), F.lit(40)) + 3).cast("int")
    vocab_arr = F.array(*[F.lit(wd) for wd in _VOCAB])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda i: F.element_at(
                vocab_arr,
                (F.pmod(_h(seed, F.lit("tok"), F.col("conv_id"), F.col("turn_idx"), i), F.lit(len(_VOCAB))) + 1).cast("int"),
            ),
        ),
        " ",
    )

    return out.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        (F.col("__start") + F.col("__cumgap")).cast("timestamp").alias("ts"),
    )


def probes(
    spark: SparkSession,
    transcripts_df: DataFrame,
    probe_frac: float = 0.25,
    task: str = "classification",
    seed: int = 42,
) -> DataFrame:
    """Label/probe table (FIXTURES.md F2): (conv_id, ts, label).

    Probe times are a deterministic mix of exact turn timestamps, mid-gap
    times (+7s), and before-first-turn times (null-match case). The label is
    correlated with the conversation's recent activity (so the windowed
    features built from the transcript are genuinely informative and the
    powershap suite has signal to find)."""
    t = transcripts_df
    u = _u01(seed, F.lit("probe"), F.col("conv_id"), F.col("turn_idx"))
    # shuffle-byte discipline (r8): the label windows only consume
    # length(text), so project the int length BEFORE the per-conversation
    # window — the window exchange then carries a 4-byte int instead of
    # the full text payload (values identical: avg over the same lengths)
    picked = t.filter(u < probe_frac).select(
        "conv_id", "turn_idx", "ts", F.length("text").alias("__tl")
    )

    kind = F.pmod(_h(seed, F.lit("pkind"), F.col("conv_id"), F.col("turn_idx")), F.lit(10))
    probe_ts = F.when(kind < 5, F.col("ts")).otherwise(
        F.when(kind < 9, F.col("ts") + F.expr("INTERVAL 7 SECONDS")).otherwise(
            F.col("ts") - F.expr("INTERVAL 365 DAYS")  # before conv start
        )
    )

    # signal: long recent texts and many recent turns push label up
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    sig = (
        F.avg("__tl").over(w.rowsBetween(-5, 0)) / 60.0
        + F.count("*").over(w.rowsBetween(Window.unboundedPreceding, 0)) / 40.0
    )
    noise = (_u01(seed, F.lit("lnoise"), F.col("conv_id"), F.col("turn_idx")) - 0.5) * 0.8
    score = sig + noise
    if task == "classification":
        med_ish = 2.2  # rough center of sig at the default generator params
        label = (score > med_ish).cast("int")
    else:
        label = score.cast("double")

    return picked.select(
        "conv_id",
        probe_ts.alias("ts"),
        label.alias("label"),
    )


def documents(
    spark: SparkSession,
    n_docs: int = 100_000,
    vocab_size: int = 64,
    mean_words: int = 60,
    near_dup_frac: float = 0.08,
    mutate_every: int = 25,
    seed: int = 13,
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic documents table, schema-compatible with the driver's
    ``documents.parquet`` (doc_id, text, lang, source, n_chars) — for
    dedup/curation benches at corpus sizes the fixed testdata doesn't
    reach.

    ``near_dup_frac`` of docs (doc_id >= 16) copy an EARLIER doc's word
    stream with every ``mutate_every``-th word replaced — planted
    near-duplicates (every 25th word mutated over 3-gram shingles lands
    around estimated Jaccard ~0.8), so MinHash/SimHash benches have
    realistic suppression work, not just identity pass-through.

    Every value is a pure function of (seed, source-id, position):
    order-, partition- and scale-independent; pure Spark expressions,
    no Python UDFs (the same contract as ``transcripts``)."""
    vocab = [f"w{i:03d}" for i in range(int(vocab_size))]
    vocab_arr = F.array(*[F.lit(w) for w in vocab])

    d = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    if n_partitions:
        d = d.repartition(n_partitions)

    is_dup = (_u01(seed, F.lit("dup"), F.col("doc_id")) < near_dup_frac) & (
        F.col("doc_id") >= 16
    )
    base_id = F.pmod(_h(seed, F.lit("base"), F.col("doc_id")), F.col("doc_id"))
    # the word STREAM is keyed by src: a near-dup inherits its base's
    # stream (and length), then mutates every mutate_every-th position
    src = F.when(is_dup, base_id).otherwise(F.col("doc_id"))
    n_words = (
        F.pmod(_h(seed, F.lit("n"), src), F.lit(2 * mean_words)) + 10
    ).cast("int")

    def word(keyed_by, i):
        return F.element_at(
            vocab_arr,
            (F.pmod(_h(seed, F.lit("w"), keyed_by, i), F.lit(len(vocab))) + 1).cast(
                "int"
            ),
        )

    src_c, dup_c, doc_c = src, is_dup, F.col("doc_id")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.when(
                dup_c & (F.pmod(i, F.lit(int(mutate_every))) == 0),
                word(doc_c, i),
            ).otherwise(word(src_c, i)),
        ),
        " ",
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
        (F.pmod(_h(seed, F.lit("lang"), src), F.lit(4)) + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.format_string("src%d", F.pmod(_h(seed, F.lit("src"), src), F.lit(5))).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text"))


def parity_matrix(
    n_samples: int = 500,
    n_features: int = 10,
    n_informative: int = 2,
    task: str = "classification",
    seed: int = 42,
):
    """Vendored stand-in for sklearn make_classification/make_regression with
    shuffle=False (FIXTURES.md F3; reference tests/conftest.py:8-33): columns
    informative_0..1 carry the signal, random_0..7 are pure noise; returns
    (X: pd.DataFrame, y: np.ndarray)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    X = rng.standard_normal((n_samples, n_features))
    z = 2.0 * X[:, 0] + 1.5 * X[:, 1]
    if task == "classification":
        y = (z + 0.6 * rng.standard_normal(n_samples) > 0).astype(np.int64)
    else:
        y = (z + 0.6 * rng.standard_normal(n_samples)).astype(np.float64)
    cols = [f"informative_{i}" for i in range(n_informative)] + [
        f"random_{i}" for i in range(n_features - n_informative)
    ]
    return pd.DataFrame(X, columns=cols), y


def events(
    spark: SparkSession,
    n_events: int = 1_000_000,
    n_users: int = 10_000,
    hot_frac: float = 0.10,
    span_days: float = 30.0,
    seed: int = 17,
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic events table, schema-compatible with the driver's
    ``events.parquet`` (user_id, ts, event_id, event_type, value) — for
    join/encoder benches at row counts the fixed testdata doesn't reach.
    ``user 0`` holds ~``hot_frac`` of all rows (the planted hot entity,
    same convention as ``transcripts``); timestamps spread uniformly over
    ``span_days`` from 2024-01-01 with microsecond jitter so RANGE frames
    and as-of/range joins see realistic ties-free ordering. Every value
    is a pure function of (seed, event_id): order-, partition- and
    scale-independent; pure Spark expressions, no Python UDFs."""
    if n_users < 2:
        # the non-hot branch draws from users 1..n_users-1: n_users=1
        # would be pmod(hash, 0) — null user_ids under non-ANSI, an error
        # under ANSI — not the "single user" a caller might expect
        raise ValueError(f"n_users must be >= 2, got {n_users}")
    e = spark.range(n_events).withColumnRenamed("id", "event_id")
    if n_partitions:
        e = e.repartition(n_partitions)
    is_hot = _u01(seed, F.lit("hot"), F.col("event_id")) < hot_frac
    user = F.when(is_hot, F.lit(0)).otherwise(
        F.pmod(_h(seed, F.lit("u"), F.col("event_id")), F.lit(n_users - 1)) + 1
    )
    span_us = int(span_days * 86400 * 1_000_000)
    off_us = F.pmod(_h(seed, F.lit("t"), F.col("event_id")), F.lit(span_us))
    ts = F.timestamp_micros(F.lit(1704067200_000000) + off_us)
    etype = F.element_at(
        F.array(*[F.lit(t) for t in ("view", "click", "cart", "purchase")]),
        (F.pmod(_h(seed, F.lit("e"), F.col("event_id")), F.lit(4)) + 1).cast("int"),
    )
    value = F.round(_u01(seed, F.lit("v"), F.col("event_id")) * 500.0, 2)
    return e.select(
        user.cast("long").alias("user_id"),
        ts.alias("ts"),
        F.col("event_id"),
        etype.alias("event_type"),
        value.alias("value"),
    )
