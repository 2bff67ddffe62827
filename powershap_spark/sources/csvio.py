"""CSV ingest — the other interchange format training corpora arrive in
(metadata tables, label exports, crawl manifests), with the same two
at-scale rules as the JSONL source: an EXPLICIT schema (inference over
100 TB is a full extra pass) and an explicit corrupt-record policy
(malformed lines must be countable/quarantinable, not job-fatal).

Built on ``spark.read.csv``; the parse is JVM-side Univocity inside
whole-stage codegen — no Python. ``multiLine`` stays OFF by default: a
multiline-quoted CSV file is NOT splittable (one task per file at any
cluster size), so documents with embedded newlines belong in JSONL or
parquet, not CSV — ``multi_line=True`` is the explicit opt-in for that
cost, and with it off a quoted embedded newline splits the record
mid-field (the halves are quarantined/dropped by the corrupt policy,
they do not mis-parse silently into wrong columns).

Shares ``corrupt_stats`` semantics with the JSONL source (same
quarantine summary over the ``_corrupt_record`` column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .jsonl import (  # noqa: F401  (corrupt_stats/DOCUMENT_SCHEMA re-exported)
    _CORRUPT,
    DOCUMENT_SCHEMA,
    _validated_mode_and_schema,
    corrupt_stats,
)

__all__ = ["read_csv", "corrupt_stats", "DOCUMENT_SCHEMA"]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    mode: str = "permissive",
    header: bool = True,
    sep: str = ",",
    multi_line: bool = False,
) -> DataFrame:
    """Read CSV with an explicit schema + corrupt-record policy
    (permissive | dropmalformed | failfast — same contract as
    ``read_jsonl``). In permissive mode the raw offending line lands in
    ``_corrupt_record`` (null for clean rows). ``multi_line=True`` must
    be opted into explicitly: it makes files unsplittable (one task per
    file), which is almost never the right trade at corpus scale."""
    s, mode = _validated_mode_and_schema(schema, mode)
    return (
        spark.read.schema(s)
        .option("mode", mode.upper())
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(bool(header)).lower())
        .option("sep", sep)
        .option("multiLine", str(bool(multi_line)).lower())
        .option("enforceSchema", "true")
        .csv(path)
    )
