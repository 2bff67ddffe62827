"""Tracked persists: the diamond plans (salted feature build, bucketed
as-of join) must materialize a shared subtree once, but a library operator
cannot know when its caller's last action over the result has run — so it
registers the persisted DataFrame here and the pipeline-level entry points
release everything when their work completes.

Unpersisting is always safe: a released DataFrame that is re-executed later
just recomputes its lineage.
"""

from __future__ import annotations

from pyspark import StorageLevel

_TRACKED: list = []


def tracked_persist(df, level: StorageLevel = StorageLevel.MEMORY_AND_DISK):
    """persist + register for later release_tracked()."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame (blocking=False); returns count."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
