from .jsonl import DOCUMENT_SCHEMA, corrupt_stats, read_jsonl
from .tableio import (
    TableIO,
    iceberg_available,
    read_skew_bounded,
    write_bucketed,
    write_bucketed_skew_bounded,
)

__all__ = [
    "DOCUMENT_SCHEMA",
    "corrupt_stats",
    "read_jsonl",
    "TableIO",
    "iceberg_available",
    "read_skew_bounded",
    "write_bucketed",
    "write_bucketed_skew_bounded",
]
