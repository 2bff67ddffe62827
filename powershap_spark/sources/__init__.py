from .jsonl import DOCUMENT_SCHEMA, corrupt_stats, read_jsonl
from .tableio import TableIO, iceberg_available, write_bucketed

__all__ = [
    "DOCUMENT_SCHEMA",
    "corrupt_stats",
    "read_jsonl",
    "TableIO",
    "iceberg_available",
    "write_bucketed",
]
