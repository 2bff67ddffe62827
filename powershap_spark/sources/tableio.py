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
