"""CSV ingest — the other interchange format training corpora arrive in
(metadata tables, label exports, crawl manifests), with the same two
at-scale rules as the JSONL source: an EXPLICIT schema (inference over
100 TB is a full extra pass) and an explicit corrupt-record policy
(malformed lines must be countable/quarantinable, not job-fatal).

Built on ``spark.read.csv``; the parse is JVM-side Univocity inside
whole-stage codegen — no Python. ``multiLine`` stays OFF by default: a
multiline-quoted CSV file is NOT splittable (one task per file at any
cluster size), so documents with embedded newlines belong in JSONL or
parquet, not CSV — the reader raises unless the caller explicitly
accepts that cost.

Shares ``corrupt_stats`` semantics with the JSONL source (same
quarantine summary over the ``_corrupt_record`` column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .jsonl import DOCUMENT_SCHEMA, corrupt_stats  # noqa: F401  (re-export)

__all__ = ["read_csv", "corrupt_stats", "DOCUMENT_SCHEMA"]

_CORRUPT = "_corrupt_record"


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
    mode = mode.lower()
    if mode not in ("permissive", "dropmalformed", "failfast"):
        raise ValueError(f"unknown mode {mode!r}")
    s = schema
    if mode == "permissive" and _CORRUPT not in s.fieldNames():
        s = T.StructType(list(s.fields) + [T.StructField(_CORRUPT, T.StringType())])
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
