"""JSONL (newline-delimited JSON) ingest — the lingua franca of LLM
training corpora (one document object per line, frequently with a few
malformed lines per shard at web scale).

Built on ``spark.read.json`` with an explicit schema (schema inference
over 100 TB means a full extra pass — never rely on it at scale) and an
explicit corrupt-record policy:

- mode="permissive" (default): malformed lines land in a
  ``_corrupt_record`` column (the raw line) with every typed column null —
  the pipeline can count/quarantine them instead of dying mid-job;
- mode="dropmalformed": malformed lines are silently dropped;
- mode="failfast": any malformed line fails the read (CI / small inputs).

Scale shape: JSONL is splittable by line, so a directory of .jsonl(.gz per
file) shards parallelizes by file; the parse is JVM-side Jackson inside
whole-stage codegen — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DOCUMENT_SCHEMA", "read_jsonl", "corrupt_stats"]

# the documents-table shape (TESTDATA.md) as the default corpus schema
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _validated_mode_and_schema(
    schema: T.StructType, mode: str
) -> tuple[T.StructType, str]:
    """Shared corrupt-policy plumbing for the line-oriented sources
    (JSONL/CSV): validate the mode and, in permissive mode, append the
    ``_corrupt_record`` column to the schema."""
    mode = mode.lower()
    if mode not in ("permissive", "dropmalformed", "failfast"):
        raise ValueError(f"unknown mode {mode!r}")
    s = schema
    if mode == "permissive" and _CORRUPT not in s.fieldNames():
        s = T.StructType(list(s.fields) + [T.StructField(_CORRUPT, T.StringType())])
    return s, mode


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    mode: str = "permissive",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema + corrupt-record
    policy. In permissive mode the returned frame carries the raw offending
    line in ``_corrupt_record`` (null for clean rows)."""
    s, mode = _validated_mode_and_schema(schema, mode)
    return (
        spark.read.schema(s)
        .option("mode", mode.upper())
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def corrupt_stats(df: DataFrame) -> DataFrame:
    """One-row quarantine summary for a permissive read: total lines,
    parsed lines, corrupt lines, corrupt fraction.

    Deliberately references a typed column alongside ``_corrupt_record``:
    Spark refuses queries whose only referenced file column is the internal
    corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    if _CORRUPT not in df.columns:
        raise ValueError("corrupt_stats needs a permissive read_jsonl frame")
    # n_parsed counts corrupt-free rows, NOT rows with a non-null first
    # field: under partial-results parsing (spark.sql.json.enablePartialResults,
    # default on since 3.4) a corrupt line can still populate some typed
    # columns, and n_parsed + n_corrupt must equal n_lines. The probe
    # references EVERY typed column (cast to string, coalesced): for CSV
    # sources, permissive corrupt-tagging is PROJECTION-DEPENDENT — a row
    # short on trailing columns is corrupt only when those columns are
    # actually parsed — so touching all of them makes the accounting
    # full-schema (and, like JSONL's whole-line parse, projection-stable).
    # It also satisfies Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN rule.
    typed = [c for c in df.columns if c != _CORRUPT]
    probe = F.coalesce(*[F.col(c).cast("string") for c in typed], F.lit("1"))
    return df.agg(
        F.count("*").alias("n_lines"),
        F.count(F.when(F.col(_CORRUPT).isNull(), probe)).alias("n_parsed"),
        F.sum(F.col(_CORRUPT).isNotNull().cast("long")).alias("n_corrupt"),
        (
            F.sum(F.col(_CORRUPT).isNotNull().cast("int"))
            / F.greatest(F.count("*"), F.lit(1))
        )
        .cast("double")
        .alias("corrupt_frac"),
    )
