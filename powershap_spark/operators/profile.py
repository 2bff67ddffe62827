"""Column profiling — the data-quality gate a training pipeline runs before
(and after) every transform: per-column row/null counts, moments, range,
and exact quantiles, in ONE scan.

Scale shape: all statistics for all requested columns are computed in a
single partial+final aggregate (one job, one row out — no per-column scan
loop, no driver-side iteration over columns); the per-column rows the
caller sees come from exploding that one aggregate row, which is free.
Exact percentiles use Spark's ``percentile`` (sort-based within the
aggregate buffer); at extreme scale swap ``approx=True`` to ride
``percentile_approx`` (GK sketch, mergeable, bounded memory) — same
output shape, documented error bound, no longer oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_numeric"]


def profile_numeric(
    df: DataFrame,
    cols: list[str],
    percentiles: tuple[float, ...] = (0.5, 0.95),
    approx: bool = False,
    round_to: int = 4,
) -> DataFrame:
    """One row per column: ``(column, n_rows, n_null, mean, min, max,
    p<q>...)`` — all numeric stats as rounded doubles so reruns and engines
    agree bit-wise. ``n_rows`` counts the table, ``n_null`` the column's
    nulls (nulls are excluded from every other statistic, matching SQL
    aggregate semantics)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    for q in percentiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"percentile {q} outside [0, 1]")
    pnames = [f"p{str(q).replace('0.', '').ljust(2, '0')}" for q in percentiles]

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        d = F.col(c).cast("double")
        aggs.append(F.count(d).alias(f"{c}__nv"))
        aggs.append(F.round(F.avg(d), round_to).alias(f"{c}__mean"))
        aggs.append(F.round(F.min(d), round_to).alias(f"{c}__min"))
        aggs.append(F.round(F.max(d), round_to).alias(f"{c}__max"))
        fn = "percentile_approx" if approx else "percentile"
        for q, pn in zip(percentiles, pnames):
            aggs.append(
                F.round(F.expr(f"{fn}(cast(`{c}` as double), {q!r})"), round_to)
                .alias(f"{c}__{pn}")
            )

    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"{c}__nv")).alias("n_null"),
                F.col(f"{c}__mean").alias("mean"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                *[F.col(f"{c}__{pn}").alias(pn) for pn in pnames],
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")
