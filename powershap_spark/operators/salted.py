"""Two-phase salted running aggregates for skewed entities (SURVEY §4.3).

Problem: ``Window.partitionBy(conv_id)`` puts ALL rows of a conversation in
one task. AQE can split skewed JOIN partitions but never window partitions,
so a single hot conversation (FIXTURES.md plants one with ~10% of all rows)
serializes the whole feature build at 10^12-turn scale.

Fix: salt by ORDER RANGE (not hash — running aggregates need contiguous
chunks): chunk = floor(order / chunk_size). Then

  phase 1 (parallel over chunks): per-(entity, chunk) partials — a tiny
      table with one row per chunk — and a per-entity window over the CHUNK
      sequence computes each chunk's carry-in prefix;
  phase 2 (parallel over chunks): within-chunk running aggregate, window
      partitioned by (entity, chunk) — bounded task size — plus carry-in.

The result is bit-identical to the plain single-window formulation (tests
assert this); use it when hot-key detection (``detect_hot_keys``) fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["detect_hot_keys", "salted_cumsum", "salted_ffill", "sessionize_salted"]


def detect_hot_keys(
    df: DataFrame,
    entity: str = "conv_id",
    threshold_rows: int = 1_000_000,
    sample_fraction: float | None = None,
    seed: int = 42,
    margin: float = 0.8,
) -> list:
    """Entities whose row count exceeds the per-task comfort bound.

    With ``sample_fraction`` the scan reads a seeded Bernoulli sample and the
    threshold scales to ``threshold_rows * fraction * margin`` — the margin
    absorbs binomial undercounting so a genuinely hot key (expected sample
    count = thr*fraction >> its std) is still flagged. This is the policy a
    10^12-turn run uses: the full-table groupBy-count pre-pass is replaced by
    a ~fraction-cost sampled scan; false positives only cost taking the
    (correct-anyway) salted path."""
    src = df.sample(sample_fraction, seed=seed) if sample_fraction else df
    thr = threshold_rows * (sample_fraction or 1.0) * (margin if sample_fraction else 1.0)
    rows = (
        src.groupBy(entity)
        .count()
        .filter(F.col("count") > thr)
        .select(entity)
        .collect()
    )
    return [r[0] for r in rows]


def _with_chunk(df: DataFrame, order: str, chunk_size: int) -> DataFrame:
    return df.withColumn(
        "__chunk", F.floor(F.col(order).cast("long") / F.lit(int(chunk_size)))
    )


def salted_cumsum(
    df: DataFrame,
    value_col,
    out_col: str,
    entity: str = "conv_id",
    order: str = "turn_idx",
    chunk_size: int = 100_000,
    upper: int = 0,
) -> DataFrame:
    """Running sum of ``value_col`` per entity ordered by ``order`` over rows
    frame (unboundedPreceding, upper) with upper in {0, -1}; skew-safe.

    ``value_col`` may be a Column expression (e.g. a flag)."""
    if upper not in (0, -1):
        raise ValueError("upper must be 0 (inclusive) or -1 (strictly past)")
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    d = _with_chunk(df, order, chunk_size).withColumn("__v", val)

    chunk_tot = d.groupBy(entity, "__chunk").agg(F.sum("__v").alias("__chunk_sum"))
    wc = Window.partitionBy(entity).orderBy("__chunk")
    prefix = chunk_tot.withColumn(
        "__prefix",
        # the zero literal must not WIDEN the sum's type: a double zero
        # promoted LONG sums to double, silently breaking the exact-
        # integer contract of callers like decayed_past_mean's halving
        # path above 2^53 (coalesce(long, int 0) stays long;
        # coalesce(double, int 0) stays double)
        F.coalesce(
            F.sum("__chunk_sum").over(wc.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select(entity, "__chunk", "__prefix")

    w2 = Window.partitionBy(entity, "__chunk").orderBy(order)
    within = F.sum("__v").over(w2.rowsBetween(Window.unboundedPreceding, upper))
    return (
        d.join(prefix, [entity, "__chunk"], "left")
        .withColumn(out_col, F.coalesce(within, F.lit(0)) + F.col("__prefix"))
        .drop("__chunk", "__v", "__prefix")
    )


def salted_ffill(
    df: DataFrame,
    col: str,
    out_col: str,
    entity: str = "conv_id",
    order: str = "turn_idx",
    chunk_size: int = 100_000,
    strict_past: bool = True,
) -> DataFrame:
    """Skew-safe forward fill (last non-null over past rows)."""
    d = _with_chunk(df, order, chunk_size)
    chunk_last = d.groupBy(entity, "__chunk").agg(
        F.max_by(col, F.when(F.col(col).isNotNull(), F.col(order))).alias("__chunk_last")
    )
    wc = Window.partitionBy(entity).orderBy("__chunk")
    carry = chunk_last.withColumn(
        "__carry",
        F.last("__chunk_last", ignorenulls=True).over(
            wc.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).select(entity, "__chunk", "__carry")

    upper = -1 if strict_past else 0
    w2 = Window.partitionBy(entity, "__chunk").orderBy(order)
    within = F.last(col, ignorenulls=True).over(
        w2.rowsBetween(Window.unboundedPreceding, upper)
    )
    return (
        d.join(carry, [entity, "__chunk"], "left")
        .withColumn(out_col, F.coalesce(within, F.col("__carry")))
        .drop("__chunk", "__carry")
    )


def sessionize_salted(
    df: DataFrame,
    entity: str = "conv_id",
    order: str = "turn_idx",
    ts: str = "ts",
    tau_seconds: float = 1800.0,
    out_col: str = "session_seq",
    chunk_size: int = 100_000,
) -> DataFrame:
    """Skew-safe ts-threshold sessionization, identical to
    ``windows.sessionize``: new session on first turn or gap > tau.

    The chunk-boundary gap needs the PREVIOUS chunk's last ts — carried via
    the tiny per-chunk table, same two-phase shape as ``salted_cumsum``."""
    d = _with_chunk(df, order, chunk_size)

    chunk_last_ts = d.groupBy(entity, "__chunk").agg(
        F.max(F.col(ts).cast("timestamp_ltz").cast("double")).alias("__chunk_last_ts")
    )
    wc = Window.partitionBy(entity).orderBy("__chunk")
    prev_ts = chunk_last_ts.withColumn(
        "__prev_chunk_ts", F.lag("__chunk_last_ts").over(wc)
    ).select(entity, "__chunk", "__prev_chunk_ts")

    w2 = Window.partitionBy(entity, "__chunk").orderBy(order)
    d = d.join(prev_ts, [entity, "__chunk"], "left")
    ep = F.col(ts).cast("timestamp_ltz").cast("double")
    gap = ep - F.coalesce(F.lag(ep).over(w2), F.col("__prev_chunk_ts"))
    is_new = ((gap > F.lit(float(tau_seconds))) | gap.isNull()).cast("int")
    d = d.withColumn("__is_new", is_new).drop("__prev_chunk_ts")

    out = salted_cumsum(
        d, "__is_new", out_col, entity=entity, order=order, chunk_size=chunk_size, upper=0
    )
    return out.withColumn(out_col, (F.col(out_col) - 1).cast("long")).drop("__is_new")


def chunked_window_apply(
    df: DataFrame,
    entity: str,
    order: str,
    build: "callable",
    halo_rows: int,
    chunk_size: int = 100_000,
):
    """Generic skew-safe evaluator for BOUNDED-frame window features.

    Any window expression whose frame only reaches back ``halo_rows`` rows
    (lag k, rolling [-k, -1], row-bounded range frames) can be computed per
    (entity, chunk) instead of per entity, provided each chunk also sees the
    previous ``halo_rows`` rows. Mechanism:

      1. chunk = floor(order / chunk_size)
      2. halo rows = the last ``halo_rows`` rows of each chunk, duplicated
         into the NEXT chunk with ``__halo = 1``
      3. ``build(df, window)`` computes its features over
         Window.partitionBy(entity, chunk).orderBy(order) — bounded task
         size regardless of how hot the entity is
      4. halo duplicates are dropped

    ``build`` receives (df, window_spec) and must return df with feature
    columns added. Results are bit-identical to the plain per-entity window
    for frames with lower bound >= -halo_rows (tests assert this).
    """
    if halo_rows >= chunk_size:
        raise ValueError(
            f"halo_rows ({halo_rows}) must be < chunk_size ({chunk_size}): the "
            "halo is drawn from the immediately previous chunk only"
        )
    # explode-based halo duplication: one scan of the input (filter+union
    # would recompute the whole upstream twice)
    own = F.floor(F.col(order).cast("long") / F.lit(int(chunk_size)))
    boundary = chunk_size - halo_rows
    in_tail = F.pmod(F.col(order).cast("long"), F.lit(int(chunk_size))) >= boundary
    u = (
        df.withColumn("__own", own)
        .withColumn(
            "__chunk",
            F.explode(
                F.when(in_tail, F.array(own, own + 1)).otherwise(F.array(own))
            ),
        )
        .withColumn("__halo", (F.col("__chunk") != F.col("__own")).cast("int"))
        .drop("__own")
    )
    w = Window.partitionBy(entity, "__chunk").orderBy(order)
    built = build(u, w)
    return built.filter(F.col("__halo") == 0).drop("__halo", "__chunk")
