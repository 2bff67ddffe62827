"""The integer event-time-micros convention for EXACT-ARITHMETIC frames.

Shared by the operators whose correctness contract is exact integer
time comparison: encode.py's strictly-past encoders (RANGE frames where
simultaneous rows must never see each other) and rangejoin.py's bucket
membership + inclusive bounds. One expression, one place — a double
epoch loses sub-microsecond exactness at 1.7e9 s magnitudes, and
drifting copies of the cast chain would silently break the cross-
operator match contract (r7 review finding).

Deliberately NOT used by windows.py's time_rolling / asof.py / salted.py:
those predate it with a double epoch-SECONDS cast whose semantics are
pinned by green driver oracles (their frames are second-granularity
windows where sub-micro exactness is not part of the contract);
migrating them would change oracle-matched plans for no behavioral
need."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["event_micros"]


def event_micros(ts) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(c.cast("timestamp_ltz"))
