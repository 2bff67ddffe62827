"""WARC ingest — the Common Crawl container (ISO 28500), the format the
actual 100-TB web corpora arrive in. A WARC file is a concatenation of
records, each ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n\\r\\n`` +
``Content-Length`` bytes of payload + ``\\r\\n\\r\\n``.

Spark-splittable reading: ``spark.read.option("lineSep",
"\\r\\n\\r\\nWARC/1.0\\r\\n").text(path)`` — the text source's custom
record delimiter splits INSIDE the file, so a 1-GB uncompressed WARC
parallelizes across tasks like any text file, and all header parsing is
JVM regexp inside whole-stage codegen (no Python). Two documented
caveats, both inherent to delimiter-splitting a length-prefixed format:

- a payload that happens to CONTAIN the delimiter byte sequence
  false-splits that record; the parser flags both halves malformed
  (header parse fails / length mismatches) rather than mis-attributing
  content — quarantine, not corruption. Real-world HTML/text payloads
  containing a literal ``\\r\\n\\r\\nWARC/1.0\\r\\n`` are rare; for
  adversarial inputs use a record-boundary-aware preprocessor.
- ``.warc.gz`` (per-record gzip members) decodes correctly through
  Spark's gzip codec but is NOT splittable — one task per file, the
  standard Hadoop gzip trade; Common Crawl ships ~1-GB .gz shards
  precisely so file-level parallelism suffices.

Returns one row per record: ``(warc_type, target_uri, warc_date,
record_id, content_length, payload, _warc_malformed)``; malformed
records (no parsable header block, or declared Content-Length
disagreeing with the observed payload) carry ``_warc_malformed=true``
and their raw text in ``payload`` for quarantine — the same
count-don't-crash policy as the JSONL/CSV sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_warc", "read_warc_stream", "warc_stats"]

_SEP = "\r\n\r\nWARC/1.0\r\n"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC record(s) from ``path`` (file, directory, or glob).
    Header fields are extracted with anchored multiline regexes;
    ``payload`` is everything after the first blank line. A record is
    flagged malformed when it lacks a ``WARC-Type`` header or when the
    declared ``Content-Length`` differs from the observed payload length
    (the false-split signature)."""
    return _parse_warc(spark.read.option("lineSep", _SEP).text(path))


def read_warc_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of :func:`read_warc` — continuous crawl ingestion:
    new ``.warc`` files landing in ``path`` become micro-batches of
    parsed records (the FileStreamSource tracks per-file progress, so a
    restart never re-parses completed shards; ``max_files_per_trigger``
    bounds each micro-batch — it is a SOURCE option, set here, not on
    the writer where it would be silently ignored). The record-splitting
    and parse expressions are byte-identical to the batch reader (shared
    ``_parse_warc``); stream==batch parity is pytest-asserted. Compose
    with ``extract_html_text`` + ``streaming_exact_dedup`` for the
    arrival-time curation pipeline."""
    reader = spark.readStream.option("lineSep", _SEP)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return _parse_warc(reader.text(path))


def _parse_warc(raw: DataFrame) -> DataFrame:
    # the FIRST record of each file keeps its leading magic (no separator
    # precedes it) — strip it so every row is "headers\r\n\r\npayload"
    rec = F.regexp_replace(F.col("value"), r"\AWARC/1\.0\r\n", "")
    header = F.substring_index(rec, "\r\n\r\n", 1)
    # payload = rec minus "header + blank line"; empty when no blank line
    payload = F.when(
        F.length(rec) > F.length(header) + 4,
        F.substring(rec, F.length(header) + 5, F.length(rec)),
    ).otherwise(F.lit(""))

    def hfield(name: str):
        v = F.regexp_extract(header, rf"(?mi)^{name}:[ \t]*(.*?)\r?$", 1)
        return F.when(v != "", v)

    warc_type = hfield("WARC-Type")
    content_length = hfield("Content-Length").cast("long")
    # Content-Length is OCTETS (ISO 28500), not characters: validate and
    # slice on the UTF-8 byte representation — F.length/F.substring on
    # the string would mis-validate every non-ASCII payload (most of a
    # real web crawl) and could leak trailer bytes into the parsed text.
    pbytes = F.encode(payload, "UTF-8")
    blen = F.octet_length(payload)
    # trailing record separators the split consumed are not part of the
    # payload; tolerate the final record's retained trailer (<= 4 bytes)
    length_ok = (
        content_length.isNotNull()
        & (blen >= content_length)
        & (blen <= content_length + 4)
    )
    malformed = warc_type.isNull() | ~F.coalesce(length_ok, F.lit(False))
    return raw.select(
        warc_type.alias("warc_type"),
        hfield("WARC-Target-URI").alias("target_uri"),
        hfield("WARC-Date").alias("warc_date"),
        hfield("WARC-Record-ID").alias("record_id"),
        content_length.alias("content_length"),
        F.when(malformed, F.col("value"))
        .otherwise(
            F.when(
                content_length.isNotNull(),
                F.decode(F.substring(pbytes, 1, content_length), "UTF-8"),
            ).otherwise(payload)
        )
        .alias("payload"),
        malformed.alias("_warc_malformed"),
    )


def warc_stats(df: DataFrame) -> DataFrame:
    """One-row quarantine summary: total records, parsed, malformed,
    malformed fraction, plus per-parse byte mass — the shard-health
    numbers an ingest job logs per WARC file batch."""
    if "_warc_malformed" not in df.columns:
        raise ValueError("warc_stats needs a read_warc frame")
    bad = F.col("_warc_malformed").cast("long")
    return df.agg(
        F.count("*").alias("n_records"),
        F.sum(1 - bad).alias("n_parsed"),
        F.sum(bad).alias("n_malformed"),
        (F.sum(bad) / F.greatest(F.count("*"), F.lit(1)))
        .cast("double")
        .alias("malformed_frac"),
        F.sum(F.when(bad == 0, F.octet_length("payload")).otherwise(0)).alias(
            "payload_bytes"
        ),
    )
