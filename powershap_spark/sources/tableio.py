"""TableIO seam (SURVEY §7.6): Iceberg when a catalog is configured, plain
parquet directories otherwise — identical call sites either way, so engine
code never branches on the storage format.

No Iceberg runtime jar ships in this sandbox; the parquet fallback lays
tables out directory-per-table with append-only writes, and the
checkpoint/lineage contract (powershap_spark.engine.CheckpointStore) rides
on data columns rather than catalog metadata, so both backends honor the
north-rule resume semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        return impl is not None and "iceberg" in str(impl).lower()
    except Exception:
        return False


class TableIO:
    """``TableIO(spark, base)``: read/write/append named tables.

    base is an Iceberg namespace (``catalog.db``) when the catalog resolves
    to Iceberg, else a filesystem directory of parquet tables."""

    def __init__(self, spark: SparkSession, base: str, catalog: str = "spark_catalog"):
        self.spark = spark
        self.base = base.rstrip("/")
        self.iceberg = iceberg_available(spark, catalog)

    def _ident(self, name: str) -> str:
        return f"{self.base}.{name}" if self.iceberg else f"{self.base}/{name}"

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.format("iceberg").load(self._ident(name))
        return self.spark.read.parquet(self._ident(name))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None):
        if self.iceberg:
            w = df.writeTo(self._ident(name))
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self._ident(name))

    def append(self, df: DataFrame, name: str):
        if self.iceberg:
            df.writeTo(self._ident(name)).append()
        else:
            df.write.mode("append").parquet(self._ident(name))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key —
    the co-located-join strategy for repeated big-big joins at scale: two
    tables bucketed by the same key into the same bucket count join with
    ZERO exchange (Spark matches bucket spec to the join's required
    distribution), so the 100-TB shuffle is paid once at write time
    instead of on every join. Requires a metastore table
    (``saveAsTable``); plain parquet directories cannot carry bucket
    metadata."""
    w = df.write.mode("overwrite").bucketBy(int(n_buckets), *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_bucketed_skew_bounded(
    df: DataFrame,
    table: str,
    key: str,
    order_col: str,
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    rows_per_key_bound: int = 1_000_000,
    hot_keys: list | None = None,
) -> list:
    """Bucketed store with a per-key row bound — the shipped mitigation for
    the round-5 finding that bucketing CO-LOCATES skew at scan time (a hot
    key's whole history lands in one bucket file, so its decode + regex +
    sort + window all serialize in the single bucket task; measured 1.6x
    slower end-to-end under a 10%% hot conversation, BENCH/ANALYSIS_r05 §4).

    Split policy: keys whose row count exceeds ``rows_per_key_bound`` are
    diverted OUT of the bucketed table into a side table at ``{path}_hot``,
    written spread over (key, floor(order/bound)) sub-chunks — many files,
    so the scan and everything pipelined onto it parallelize. Cold keys are
    written bucketed+sorted exactly as ``write_bucketed`` (with the
    one-file-per-bucket pre-repartition folded in), so the cold path keeps
    the ZERO-Exchange window build. Consumers run the plain single-window
    build over the cold table and the two-phase salted pass
    (``operators.salted``) over the hot table, then union — conversations
    are wholly cold or wholly hot, so per-entity features compose exactly
    (value-parity pytest in test_compat_io.py).

    ``hot_keys`` overrides detection (e.g. from a sampled
    ``detect_hot_keys`` pre-pass at 100-TB scale, where the exact groupBy
    count below would be a full-table pass). Returns the hot key list;
    it is also persisted to ``{path}_hotkeys`` for later readers."""
    from pyspark.sql import functions as F

    if path is None:
        raise ValueError("write_bucketed_skew_bounded requires an explicit path")
    if hot_keys is None:
        hot_keys = [
            r[0]
            for r in df.groupBy(key)
            .count()
            .filter(F.col("count") > int(rows_per_key_bound))
            .select(key)
            .collect()
        ]
    spark = df.sparkSession
    if hot_keys:
        cold = df.filter(~F.col(key).isin(hot_keys))
        hot = df.filter(F.col(key).isin(hot_keys))
        sub = F.floor(
            F.col(order_col).cast("long") / F.lit(int(rows_per_key_bound))
        )
        (
            hot.withColumn("__sub", sub)
            .repartition(F.col(key), F.col("__sub"))
            .drop("__sub")
            .sortWithinPartitions(*(sort_cols or [key, order_col]))
            .write.mode("overwrite")
            .parquet(path + "_hot")
        )
    else:
        cold = df
        df.limit(0).write.mode("overwrite").parquet(path + "_hot")
    spark.createDataFrame(
        [(k,) for k in hot_keys], df.select(key).schema
    ).write.mode("overwrite").parquet(path + "_hotkeys")
    # one file per bucket (same Murmur3 partitioning bucketBy uses) so the
    # bucketed scan exposes both the distribution AND the sort order
    write_bucketed(
        cold.repartition(int(n_buckets), key),
        table,
        [key],
        n_buckets=n_buckets,
        sort_cols=sort_cols,
        path=path,
    )
    return hot_keys


def read_skew_bounded(spark: SparkSession, table: str, path: str):
    """Read a skew-bounded store back as ``(cold, hot, hot_keys)``: the
    bucketed cold table (zero-exchange window builds), the sub-chunked hot
    side table (feed it the salted two-phase operators), and the persisted
    hot-key list."""
    cold = spark.table(table)
    hot = spark.read.parquet(path + "_hot")
    hot_keys = [r[0] for r in spark.read.parquet(path + "_hotkeys").collect()]
    return cold, hot, hot_keys


def write_training_shards(
    docs: DataFrame,
    assignment: DataFrame,
    path: str,
    id_col: str = "doc_id",
    max_records_per_file: int | None = None,
):
    """Materialize a curated corpus as training shards: join the documents
    to a shard ``assignment`` (``token_budget_shards`` or
    ``pack_sequences`` output) and write ``path/shard_id=N/...`` via
    dynamic partitioning, one directory per shard, so the trainer's data
    loader maps shard -> file set with no index service. Returns the
    MANIFEST DataFrame (shard_id, n_docs, n_tokens[, n_bins]) and writes
    it to ``path/_manifest`` — the artifact that makes shard sets
    diffable/resumable (re-running on the same corpus reproduces the
    row-identical manifest because the assignment is deterministic).

    Scale shape: one broadcast-or-shuffle join on the id, one
    ``repartition(shard_id)`` so each shard's rows land in the task that
    writes its directory (otherwise every task appends a file into every
    shard directory — file-count explosion at 10^5+ shards), and the
    manifest is a partial+final aggregate of the same joined frame.
    ``max_records_per_file`` caps file size inside a shard for
    loader-side parallelism."""
    from pyspark.sql import functions as F

    cols = [c for c in assignment.columns if c != id_col]
    joined = docs.join(assignment, id_col)
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    ]
    if "bin_id" in cols:
        aggs.append(F.countDistinct("bin_id").alias("n_bins"))
    manifest = joined.groupBy("shard_id").agg(*aggs).orderBy("shard_id")

    w = joined.repartition(F.col("shard_id")).write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.partitionBy("shard_id").parquet(path)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest
