"""The repo's ONE event-time-micros convention.

Every operator that compares or frames on event time (windows.py RANGE
frames, encode.py strictly-past encoders, rangejoin.py bucket membership)
must use the SAME integer microseconds expression — a double epoch loses
sub-microsecond exactness at 1.7e9 s magnitudes, and two drifting copies
of the cast chain would silently break the exact-arithmetic match
contract between operators (r7 review finding)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["event_micros"]


def event_micros(ts) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(c.cast("timestamp_ltz"))
