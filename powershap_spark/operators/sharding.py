"""Global prefix-sum and token-budget sharding — writing BALANCED training
shards from a deduplicated corpus.

The naive Spark spelling of a corpus-wide running sum,
``Window.orderBy(order)`` with no ``partitionBy``, plans an
``Exchange SinglePartition``: every row moves to ONE task and the job is
sequential no matter how many executors exist — the canonical
does-not-survive-100x plan. ``global_running_sum`` computes the identical
values with the classic two-phase scan:

  1. range-bucket rows on the order key (boundary estimation only — the
     RESULT is boundary-independent, so approxQuantile's sampling noise
     cannot change a single output value);
  2. an in-bucket window cumsum (parallel across buckets);
  3. per-bucket totals -> driver (n_buckets scalars, the same
     scalar-sized-action discipline as salted.py) -> exclusive offsets
     folded back in as a literal CASE.

``token_budget_shards`` is the consumer: shard_id = exclusive-cumsum DIV
budget over deterministic id order, so each training shard holds a
contiguous id range with token mass ~= the budget (a document straddling a
boundary stays in the shard where it starts — shards never split a
document). Pure functions of the data: rerunning on any partitioning or
cluster size reproduces the same shard assignment bit-for-bit, which is
what makes shard manifests resumable/diffable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_running_sum", "token_budget_shards"]


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "running_sum",
    inclusive: bool = True,
    n_buckets: int | None = None,
) -> DataFrame:
    """Corpus-wide running sum of ``value_col`` over total ``order_col``
    order WITHOUT an Exchange SinglePartition (plan-asserted in
    test_sharding.py). ``order_col`` must be numeric, non-null, and unique
    (a total order — ties would make "running" ill-defined); values are
    summed as longs. ``inclusive=False`` gives the exclusive prefix sum
    (0 for the first row).

    Triggers two scalar-sized driver actions (boundary estimation +
    n_buckets bucket totals); at 10^12 rows both remain O(n_buckets).
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_buckets = max(1, int(n_buckets))

    if n_buckets > 1:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        boundaries = sorted(set(df.stat.approxQuantile(order_col, qs, 0.001)))
    else:
        boundaries = []
    # bucket = #boundaries strictly below the key: contiguous ranges in
    # order-key order, so bucket-major + in-bucket order == global order
    bkt: Column = F.lit(0)
    for b in boundaries:
        bkt = bkt + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    with_bkt = df.withColumn("__bkt", bkt)

    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    local = with_bkt.withColumn(
        out_col,
        F.coalesce(F.sum(F.col(value_col).cast("long")).over(w), F.lit(0).cast("long")),
    )

    totals = {
        r["__bkt"]: r["t"]
        for r in with_bkt.groupBy("__bkt")
        .agg(F.sum(F.col(value_col).cast("long")).alias("t"))
        .collect()
    }
    offset, offsets = 0, {}
    for k in sorted(totals):
        offsets[k] = offset
        offset += int(totals[k] or 0)
    off: Column = F.lit(0).cast("long")
    for k, v in offsets.items():
        if v:
            off = F.when(F.col("__bkt") == k, F.lit(v).cast("long")).otherwise(off)
    return local.withColumn(out_col, F.col(out_col) + off).drop("__bkt")


def token_budget_shards(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Assign each document to a training shard of ~``budget_tokens``
    whitespace tokens, contiguous in ``id_col`` order:
    ``shard_id = (exclusive token cumsum) DIV budget``. Returns
    ``(id_col, n_tokens, shard_id)``. Pass ``token_count_col`` to shard on
    a precomputed count (e.g. a real tokenizer's) instead of the built-in
    whitespace count."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    if token_count_col is None:
        from .text import token_count

        toks = docs.select(
            F.col(id_col), token_count(text_col).alias("n_tokens")
        )
    else:
        toks = docs.select(
            F.col(id_col), F.col(token_count_col).cast("long").alias("n_tokens")
        )
    cum = global_running_sum(
        toks, "n_tokens", id_col, out_col="__cum_excl",
        inclusive=False, n_buckets=n_buckets,
    )
    return cum.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.expr(f"__cum_excl div {int(budget_tokens)}").alias("shard_id"),
    )
