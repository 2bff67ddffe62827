"""Point-in-time (as-of) joins — the north-rule operator family (J1-J3).

Spark has no native ASOF JOIN; the idiomatic formulation here is
union-both-sides + one window pass per key:

    union(left tagged, right tagged)
      -> Window.partitionBy(keys).orderBy(ts, side)
           .rowsBetween(unboundedPreceding, 0)
      -> F.last(payload, ignorenulls=True)
      -> keep left rows

This IS a sort-merge as-of join by construction: one shuffle on the key,
one sort on (ts, side) per partition, a single forward scan. Right-row
values are carried inside ONE struct payload so a right row whose value
column is genuinely NULL is still "the match" (a naive per-column
last(ignorenulls) would leak older values through NULLs).

Semantics match pandas.merge_asof / DuckDB ASOF JOIN:
  backward: latest right row with right.ts <= left.ts (strict: <)
  forward : earliest right row with right.ts >= left.ts (strict: >)
  tolerance: match discarded when |left.ts - right.ts| > tolerance

Scale notes (100 TB / 10^12 turns):
- the union+window plan shuffles each side ONCE on the key; no row
  explosion, no range cross-join;
- a single hot conv_id serializes its window partition (AQE cannot split
  a window partition) -> use ``asof_join_bucketed``: two-phase over
  (key, ts-bucket) with a tiny per-bucket prefix table, which bounds any
  task's work by the bucket width;
- a small probe side -> ``asof_join_broadcast`` avoids shuffling the big
  side entirely (broadcast hash join + per-probe top-1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_broadcast", "asof_join_bucketed"]

_TS_FIELD = "__asof_ts"


def _as_list(on) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _payload_and_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_side_order: int,
    suffix: str,
):
    """Build the tagged union and return (union_df, out_value_cols, payload_fields)."""
    rv_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    # suffix right value columns that collide with left's
    out_names = {c: (c + suffix if c in left.columns else c) for c in rv_cols}

    payload = F.struct(
        F.col(right_ts).alias(_TS_FIELD),
        *[F.col(c).alias(out_names[c]) for c in rv_cols],
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__asof_t"),
        payload.alias("__asof_p"),
        F.lit(right_side_order).alias("__asof_side"),
    )
    payload_type = r2.schema["__asof_p"].dataType

    l2 = left.select(
        "*",
        F.col(left_ts).alias("__asof_t"),
        F.lit(None).cast(payload_type).alias("__asof_p"),
        F.lit(1).alias("__asof_side"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    return u, [out_names[c] for c in rv_cols], list(left.columns)


def _emit(u: DataFrame, matched: Column, left_cols, out_vals, ts_out: str | None):
    # materialize the windowed match BEFORE dropping right rows — a filter
    # first would remove the very rows the window reads the payload from
    w = u.withColumn("__asof_m", matched).filter(F.col("__asof_side") == 1)
    m = F.col("__asof_m")
    sel = [F.col(c) for c in left_cols]
    if ts_out:
        sel.append(m[_TS_FIELD].alias(ts_out))
    sel += [m[c].alias(c) for c in out_vals]
    return w.select(*sel)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on="conv_id",
    ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
    matched_ts_col: str | None = "matched_ts",
) -> DataFrame:
    """Sort-merge as-of join (SURVEY §2.3 J1). Left = probes, right = feature
    rows. Output: all left columns + matched right value columns (+ the
    matched right timestamp as ``matched_ts_col``)."""
    on = _as_list(on)
    right_ts = right_ts or ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    backward = direction == "backward"
    # side ordering places equal-ts right rows inside/outside the frame:
    #   backward inclusive: right(0) < left(1)  -> in (-inf, 0]
    #   backward strict   : right(2) > left(1)  -> out
    #   forward  inclusive: right(2) > left(1)  -> in [0, +inf)
    #   forward  strict   : right(0) < left(1)  -> out
    include = allow_exact_matches
    right_order = (0 if include else 2) if backward else (2 if include else 0)

    u, out_vals, left_cols = _payload_and_union(left, right, on, ts, right_ts, right_order, suffix)

    w = Window.partitionBy(*on).orderBy(F.col("__asof_t").asc(), F.col("__asof_side").asc())
    if backward:
        matched = F.last("__asof_p", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        matched = F.first("__asof_p", ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )

    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__asof_t").cast("timestamp_ltz").cast("double")
            - matched[_TS_FIELD].cast("timestamp_ltz").cast("double")
        )
        matched = F.when(gap <= F.lit(float(tolerance_seconds)), matched)

    return _emit(u, matched, left_cols, out_vals, matched_ts_col)


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on="conv_id",
    ts: str = "ts",
    right_ts: str | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_r",
    matched_ts_col: str | None = "matched_ts",
) -> DataFrame:
    """Backward as-of join for a SMALL probe (left) side (SURVEY J2).

    Broadcasts the probes, hash-joins the big right side against them with
    the ts inequality, then keeps the max-ts right row per probe via
    ``max_by`` — the big side is never shuffled on the key (the final
    per-probe reduction moves only one candidate row per (probe, partition)
    thanks to partial aggregation)."""
    on = _as_list(on)
    right_ts = right_ts or ts

    # unique per-row id (partition-deterministic) so duplicate probe rows
    # keep their multiplicity, like pandas.merge_asof
    p = left.withColumn("__probe_id", F.monotonically_increasing_id())

    rv_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rv_cols}
    payload = F.struct(
        F.col(f"__r.{right_ts}").alias(_TS_FIELD),
        *[F.col(f"__r.{c}").alias(out_names[c]) for c in rv_cols],
    )

    cond = F.col(f"__r.{right_ts}") <= F.col(f"__p.{ts}") if allow_exact_matches else (
        F.col(f"__r.{right_ts}") < F.col(f"__p.{ts}")
    )
    for k in on:
        cond = cond & (F.col(f"__r.{k}") == F.col(f"__p.{k}"))

    cand = (
        right.alias("__r")
        .join(F.broadcast(p.alias("__p")), cond, "inner")
        .select(F.col("__p.__probe_id").alias("__probe_id"), payload.alias("__asof_p"))
    )
    best = cand.groupBy("__probe_id").agg(
        F.max_by("__asof_p", F.col("__asof_p")[_TS_FIELD]).alias("__asof_p")
    )

    joined = p.join(best, "__probe_id", "left")
    matched = F.col("__asof_p")
    sel = [F.col(c) for c in left.columns]
    if matched_ts_col:
        sel.append(matched[_TS_FIELD].alias(matched_ts_col))
    sel += [matched[out_names[c]].alias(out_names[c]) for c in rv_cols]
    return joined.select(*sel)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on="conv_id",
    ts: str = "ts",
    right_ts: str | None = None,
    bucket_seconds: int = 3600,
    allow_exact_matches: bool = True,
    suffix: str = "_r",
    matched_ts_col: str | None = "matched_ts",
) -> DataFrame:
    """Skew-safe backward as-of join (SURVEY J3) — two-phase over
    (key, time-bucket):

    phase 1: per (key, bucket) keep only the max-ts right payload, then a
             window over the per-key BUCKET sequence (tiny: rows = buckets,
             not turns) computes each bucket's carry-in = latest payload of
             any EARLIER bucket;
    phase 2: windows partition by (key, bucket) — bounded work per task no
             matter how hot the key — and coalesce(in-bucket match, carry-in).

    Equal-ts semantics match ``asof_join(allow_exact_matches=...)``.
    """
    on = _as_list(on)
    right_ts = right_ts or ts
    include = allow_exact_matches
    right_order = 0 if include else 2

    u, out_vals, left_cols = _payload_and_union(left, right, on, ts, right_ts, right_order, suffix)
    u = u.withColumn(
        "__bucket",
        F.floor(
            F.col("__asof_t").cast("timestamp_ltz").cast("double")
            / F.lit(float(bucket_seconds))
        ),
    )
    # the union feeds both the per-bucket aggregate and the carry join — a
    # diamond plan whose shared child would otherwise execute twice (with a
    # potentially expensive upstream); materialize it once. Registered for
    # release via caching.release_tracked() (pipeline entry points call it).
    from ..caching import tracked_persist

    u = tracked_persist(u)

    # phase 1: ONE aggregation pass over the union computes, per (key,
    # bucket), the max-ts right payload — rows per bucket regardless of side,
    # so buckets holding only left rows are present too (null payload) and
    # still receive a carry. carry-in for bucket b = latest payload of any
    # STRICTLY earlier bucket; the per-key window here has one row per
    # BUCKET, not per turn, so it is tiny even for the hottest conversation.
    bucket_last = u.groupBy(*on, "__bucket").agg(
        F.max_by(
            F.when(F.col("__asof_side") != 1, F.col("__asof_p")),
            F.when(F.col("__asof_side") != 1, F.col("__asof_p")[_TS_FIELD]),
        ).alias("__bucket_last")
    )
    wb = Window.partitionBy(*on).orderBy("__bucket")
    carry_full = bucket_last.select(
        *on,
        "__bucket",
        F.last("__bucket_last", ignorenulls=True)
        .over(wb.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__carry_in"),
    )

    # no broadcast hint: the carry table is one row per (key, bucket) and can
    # be large at 10^12 scale; Catalyst/AQE picks broadcast when it fits
    u2 = u.join(carry_full, on + ["__bucket"], "left")

    # phase 2: in-bucket window (partition includes the bucket -> no skew)
    w2 = Window.partitionBy(*(on + ["__bucket"])).orderBy(
        F.col("__asof_t").asc(), F.col("__asof_side").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    in_bucket = F.last("__asof_p", ignorenulls=True).over(w2)
    matched = F.coalesce(in_bucket, F.col("__carry_in"))

    return _emit(u2, matched, left_cols, out_vals, matched_ts_col)
