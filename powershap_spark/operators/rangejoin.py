"""Time-range (interval / proximity) joins — the companion to asof.py.

A range join pairs a left row (key, ts) with EVERY right row of the same
key whose timestamp falls in ``[ts - before, ts + after]`` — the
"context window" join a transcript pipeline uses to attach all events
near a probe (as-of attaches only the latest one). The reference
(predict-idlab/powershap) consumes a ready feature matrix
(powershap.py:222-496) and ships no joins; this is part of the
beyond-reference feature-store surface, named alongside as-of in the
engine's operator charter.

Spark has no native range join, and the naive formulation

    left.join(right, on=key).where(right.ts between ...)

is an equi-join on the KEY ALONE: Catalyst evaluates the range predicate
post-join, so one hot key (the planted hot conversation) builds its full
per-key cross product before filtering — O(n_l * n_r) rows for that key.

``range_join`` instead TIME-BUCKETS the range condition (the classic
bucketed range join, the same trick Databricks' range-join optimization
applies with bin hints): with bucket width ``W``, each LEFT row lands in
bucket floor(ts/W) and each RIGHT row is replicated to the buckets its
[ts-after, ts+before]-dilated interval overlaps — at most
ceil((before+after)/W) + 1 copies, a CONSTANT chosen by W. The join is
then a plain equi-join on (key, bucket) with the exact range predicate
as a residual filter: every candidate pair shares a bucket, so the
per-task work is bounded by bucket population, not key population — a
hot key's timeline spreads across ITS TIME BUCKETS in parallel, the
same hot-key escape hatch as ``asof_join_bucketed``.

Default ``bucket_width = before + after``: right rows replicate to at
most 2 buckets (amplification <= 2x), and every matching pair is within
1 bucket of each other. Pass a smaller W only when match windows are
rare and sparse (lower selectivity per bucket, more copies).

Scale shape (10^12 turns): one projection + explode on the right
(bounded amplification), one shuffle per side on (key, bucket), a
sort-merge or hash equi-join, residual predicate pushed into the join —
no CartesianProduct, no per-key cross product (plan-asserted in
test_plans.py). Timestamps compare on integer event-time microseconds
(exact arithmetic, same convention as windows.py / encode.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._time import event_micros as _micros

__all__ = ["range_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts: str = "ts",
    right_ts: str = "ts",
    before: float = 0.0,
    after: float = 0.0,
    bucket_width: float | None = None,
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """All (left, right) same-key pairs with
    ``right.ts in [left.ts - before, left.ts + after]`` (bounds in
    SECONDS, inclusive). ``how='left'`` keeps unmatched left rows with
    null right columns. Right value columns colliding with left names
    get ``suffix``; the right timestamp is emitted as ``right_ts+suffix``
    when names collide (it always survives — callers need the match
    distance).

    ``before``/``after`` must be >= 0 and not both 0; ``bucket_width``
    (seconds) defaults to ``before + after`` (<= 2 copies per right
    row)."""
    on = [on] if isinstance(on, str) else list(on)
    if before < 0 or after < 0:
        raise ValueError(f"before/after must be >= 0, got {before}/{after}")
    span = float(before) + float(after)
    if span <= 0:
        raise ValueError("a zero-width window is an equi-join on ts; use join()")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    w_us = int(round((bucket_width if bucket_width else span) * 1e6))
    if w_us <= 0:
        raise ValueError(f"bucket_width must be > 0 seconds, got {bucket_width}")
    before_us = int(round(float(before) * 1e6))
    after_us = int(round(float(after) * 1e6))

    lt = _micros(left_ts)
    rt = _micros(right_ts)

    l = left.withColumn("__lus", lt).withColumn(
        "__bkt", F.floor(F.col("__lus") / w_us).cast("long")
    )

    # right rows replicate to every bucket their dilated interval
    # [ts - after, ts + before] overlaps: a left row in bucket b can only
    # match right rows whose dilated interval touches b's time range
    rv_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rv_cols}
    ts_out = right_ts + suffix if right_ts in left.columns else right_ts
    r = right.withColumn("__rus", rt).select(
        *on,
        F.col("__rus"),
        F.col(right_ts).alias(ts_out),
        *[F.col(c).alias(out_names[c]) for c in rv_cols],
        F.explode(
            F.sequence(
                F.floor((F.col("__rus") - after_us) / w_us).cast("long"),
                F.floor((F.col("__rus") + before_us) / w_us).cast("long"),
            )
        ).alias("__bkt"),
    )

    cond = [l[c] == r[c] for c in on] + [
        l["__bkt"] == r["__bkt"],
        r["__rus"] >= l["__lus"] - before_us,
        r["__rus"] <= l["__lus"] + after_us,
    ]
    joined = l.join(r, cond, how)
    keep_left = [l[c] for c in left.columns]
    keep_right = [r[ts_out]] + [r[out_names[c]] for c in rv_cols]
    return joined.select(*keep_left, *keep_right)
