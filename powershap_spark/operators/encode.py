"""Leakage-safe categorical encodings over event time.

Target encoding is the canonical feature-engineering leak: representing a
categorical key by statistics of the LABEL must not let a row see its own
label, any simultaneous label, or any future label. This module makes the
no-leak contract structural, the same way ``windows.py`` does for entity
features (SURVEY §2.5): the aggregation frame is a RANGE frame over
integer event-time microseconds ending at ``-1``, so only STRICTLY
EARLIER rows contribute. Rows sharing a timestamp never see each other —
order within a timestamp is storage-dependent, so any intra-ts visibility
would be nondeterministic AND leaky.

The reference (predict-idlab/powershap) consumes a ready feature matrix
(powershap.py:222-496) and ships no encoder; this is part of the
beyond-reference feature-store surface a transcript pipeline needs
(e.g. encode ``tool`` or ``role`` by the running outcome mean).

Scale shape (10^12 rows):
- plain path: ONE window over ``key`` ordered by event time — one
  shuffle, one sort. A hot category (one key covering ~all rows)
  serializes that window task, exactly like a hot conversation.
- ``grouped=True``: aggregate (key, ts) partials first (partially
  aggregable — map-side combine bounds the shuffle to distinct
  (key, ts) pairs), run the expanding window over the GROUPED rows
  (partition size = distinct timestamps per key, not rows), then join
  the encodings back on (key, ts). Value-identical to the plain path
  (pytest-pinned).
- ``grouped=True, chunk_size=N``: the expanding pass over the grouped
  partials runs through ``salted.salted_cumsum`` — contiguous ts-range
  chunks with carry-in prefixes — so even a key with billions of
  DISTINCT timestamps never serializes. Value-identical (pytest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._time import event_micros as _event_micros
from .salted import salted_cumsum

__all__ = ["decayed_past_mean", "past_target_encode"]


def _smooth(sum_past: Column, cnt_past: Column, prior, prior_weight) -> Column:
    if prior_weight:
        return (sum_past + F.lit(float(prior)) * F.lit(float(prior_weight))) / (
            cnt_past + F.lit(float(prior_weight))
        )
    return F.when(cnt_past > 0, sum_past / cnt_past)


def past_target_encode(
    df: DataFrame,
    key: str = "event_type",
    label: str = "value",
    ts: str = "ts",
    prior: float | None = None,
    prior_weight: float = 0.0,
    out_prefix: str = "te",
    grouped: bool = False,
    chunk_size: int | None = None,
) -> DataFrame:
    """Append strictly-past target-encoding columns for ``key``:

    - ``{out_prefix}_cnt``: count of non-null ``label`` values on rows of
      the same key with STRICTLY EARLIER ``ts`` (long, 0 when none);
    - ``{out_prefix}_mean``: their mean, optionally smoothed toward
      ``prior`` with pseudo-count ``prior_weight``:
      ``(sum + prior*prior_weight) / (cnt + prior_weight)``.
      Unsmoothed (``prior_weight=0``): null when no past rows exist —
      an honest "no information" marker rather than a fabricated value.

    Null labels contribute to neither count nor sum (a row whose label is
    not yet known is simply absent from the statistic).

    ``grouped`` / ``chunk_size`` select the scale paths documented in the
    module docstring; all paths are value-identical.
    """
    if prior_weight and prior is None:
        raise ValueError("prior_weight > 0 requires an explicit prior")
    if chunk_size is not None and not grouped:
        raise ValueError("chunk_size only applies to the grouped path")
    cnt_col, mean_col = f"{out_prefix}_cnt", f"{out_prefix}_mean"

    if not grouped:
        w = (
            Window.partitionBy(key)
            .orderBy(_event_micros(ts))
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        # both aggregates in ONE select over the SAME spec so Catalyst
        # collapses them into a single Window operator (one sort, not two)
        d = df.select(
            "*",
            F.count(label).over(w).alias(cnt_col),
            F.sum(label).over(w).alias("__sum_past"),
        )
        return d.withColumn(
            mean_col,
            _smooth(
                F.coalesce(F.col("__sum_past"), F.lit(0.0)),
                F.col(cnt_col),
                prior,
                prior_weight,
            ),
        ).drop("__sum_past")

    g = df.groupBy(key, ts).agg(
        F.sum(label).alias("__s"), F.count(label).alias("__c")
    )
    if chunk_size is None:
        # ts is DISTINCT within a key post-group, so the exclusive ROWS
        # frame over ts order IS the strictly-past RANGE frame
        wg = (
            Window.partitionBy(key)
            .orderBy(_event_micros(ts))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        gp = g.select(
            key,
            ts,
            F.coalesce(F.sum("__s").over(wg), F.lit(0.0)).alias("__sum_past"),
            F.coalesce(F.sum("__c").over(wg), F.lit(0)).alias("__cnt_past"),
        )
    else:
        gp = salted_cumsum(
            g, F.coalesce(F.col("__s"), F.lit(0.0)), "__sum_past",
            entity=key, order=ts, chunk_size=chunk_size, upper=-1,
        )
        gp = salted_cumsum(
            gp, "__c", "__cnt_past",
            entity=key, order=ts, chunk_size=chunk_size, upper=-1,
        ).select(
            key, ts, "__sum_past", F.col("__cnt_past").cast("long").alias("__cnt_past")
        )
    out = df.join(gp, [key, ts], "left")
    return (
        out.withColumn(cnt_col, F.coalesce(F.col("__cnt_past"), F.lit(0)))
        .withColumn(
            mean_col,
            _smooth(
                F.coalesce(F.col("__sum_past"), F.lit(0.0)),
                F.col(cnt_col),
                prior,
                prior_weight,
            ),
        )
        .drop("__sum_past", "__cnt_past")
    )


def decayed_past_mean(
    df: DataFrame,
    key: str = "event_type",
    label: str = "value",
    ts: str = "ts",
    half_life_s: float = 86400.0,
    out_prefix: str = "dm",
    weighting: str = "exp",
    grouped: bool = False,
    chunk_size: int | None = None,
) -> DataFrame:
    """Strictly-past EXPONENTIALLY-DECAYED mean of ``label`` per ``key`` —
    the recency-weighted sibling of ``past_target_encode``: a row's
    encoding is ``sum(v_i * w_i) / sum(w_i)`` over STRICTLY EARLIER
    same-key rows, where ``w_i`` halves per ``half_life_s`` of age. The
    leakage contract is identical (RANGE frame on integer event-time
    micros ending at -1; simultaneous rows never see each other).

    The per-row normalization cancels: with ``s_i = (t_i - t0) / h``
    (``t0`` = per-key min event time, a full-frame window min on the
    SAME partitioning — no extra shuffle), ``w_i = 2^{s_i}`` gives
    ``sum(v_i 2^{s_i}) / sum(2^{s_i})`` whose implicit ``2^{-t/h}``
    factor divides out — so the decayed mean is TWO windowed sums and
    one division, no per-row recompute over history. The ``t0`` rebase
    keeps ``2^{s}`` in double range; spans beyond ~900 half-lives per
    key overflow to inf (document/raise at the pipeline layer; a
    chunked renormalization belongs to salted_cumsum territory if ever
    needed).

    ``weighting``:

    - ``"exp"`` — continuous decay ``2^{(t_i - t0)/h}`` (float weights;
      the numerically honest variant, pinned against a pandas replica).
    - ``"halving"`` — DISCRETE decay by whole half-life buckets:
      ``2^{floor((t_i - t0)/h)}`` as an exact BIGINT weight (a power of
      two is exact in double and in the long cast). With an integer
      label both windowed sums are exact integer arithmetic —
      order-independent and bit-identical across engines, the same
      determinism trick as the ``past_target_encode`` driver query
      (keep each ``|label| * 2^{span/h}`` product under 2^63 — ANSI
      mode errors on long overflow — and the summed products under
      2^62; exactness holds on every path, chunked included).

    Appends ``{out_prefix}_cnt`` (past non-null labels) and
    ``{out_prefix}_mean`` (null when no past rows). Null labels
    contribute to neither sum.

    ``grouped`` / ``chunk_size`` select the same hot-key scale paths as
    ``past_target_encode``: the weight is CONSTANT within a (key, ts)
    group, so partials collapse map-side to ``(w*sum_v, w*cnt, cnt)``
    per distinct timestamp — the expanding pass then runs over the
    grouped rows (partition size = distinct timestamps per key), and
    ``chunk_size`` routes it through ``salted_cumsum`` so a key with
    billions of distinct timestamps never serializes. halving+integer
    labels stay exact on every path; the exp path's float sums re-
    associate across groups (allclose, pinned)."""
    if half_life_s <= 0:
        raise ValueError(f"half_life_s must be > 0, got {half_life_s}")
    if weighting not in ("exp", "halving"):
        raise ValueError(f"unknown weighting {weighting!r}")
    if chunk_size is not None and not grouped:
        raise ValueError("chunk_size only applies to the grouped path")
    cnt_col, mean_col = f"{out_prefix}_cnt", f"{out_prefix}_mean"

    def _weight(em: Column, t0: Column) -> Column:
        s = (em - t0) / F.lit(float(half_life_s) * 1e6)
        if weighting == "halving":
            return F.pow(F.lit(2.0), F.floor(s).cast("double")).cast("long")
        return F.pow(F.lit(2.0), s)

    lab = F.col(label)
    if not grouped:
        em = _event_micros(ts)
        w = _weight(em, F.min(em).over(Window.partitionBy(key)))
        d = df.select(
            "*",
            F.when(lab.isNotNull(), lab * w).alias("__dm_vw"),
            F.when(lab.isNotNull(), w).alias("__dm_w"),
            em.alias("__dm_us"),
        )
        wp = (
            Window.partitionBy(key)
            .orderBy(F.col("__dm_us"))
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        num = F.sum("__dm_vw").over(wp)
        den = F.sum("__dm_w").over(wp)
        out = d.select(
            "*",
            F.count("__dm_w").over(wp).alias(cnt_col),
            F.when(den > 0, num.cast("double") / den.cast("double")).alias(
                mean_col
            ),
        )
        return out.drop("__dm_vw", "__dm_w", "__dm_us")

    # grouped path: map-side-combined (key, ts) partials; ts is DISTINCT
    # within a key post-group, so the exclusive ROWS frame over ts order
    # IS the strictly-past RANGE frame
    g = df.groupBy(key, ts).agg(
        F.sum(lab).alias("__s"), F.count(lab).alias("__c")
    )
    gem = _event_micros(ts)
    w = _weight(gem, F.min(gem).over(Window.partitionBy(key)))
    g = g.select(
        key,
        ts,
        F.when(F.col("__c") > 0, F.col("__s") * w).alias("__vw"),
        F.when(F.col("__c") > 0, w * F.col("__c")).alias("__ww"),
        F.col("__c"),
    )
    if chunk_size is None:
        wg = (
            Window.partitionBy(key)
            .orderBy(_event_micros(ts))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        gp = g.select(
            key,
            ts,
            F.sum("__vw").over(wg).alias("__num"),
            F.sum("__ww").over(wg).alias("__den"),
            F.coalesce(F.sum("__c").over(wg), F.lit(0)).alias("__cnt"),
        )
    else:
        zero = F.lit(0).cast("long") if weighting == "halving" else F.lit(0.0)
        gp = salted_cumsum(
            g, F.coalesce(F.col("__vw"), zero), "__num",
            entity=key, order=ts, chunk_size=chunk_size, upper=-1,
        )
        gp = salted_cumsum(
            gp, F.coalesce(F.col("__ww"), zero), "__den",
            entity=key, order=ts, chunk_size=chunk_size, upper=-1,
        )
        gp = salted_cumsum(
            gp, "__c", "__cnt",
            entity=key, order=ts, chunk_size=chunk_size, upper=-1,
        ).select(
            key, ts, "__num", "__den",
            F.col("__cnt").cast("long").alias("__cnt"),
        )
    out = df.join(gp.select(key, ts, "__num", "__den", "__cnt"), [key, ts], "left")
    return (
        out.withColumn(cnt_col, F.coalesce(F.col("__cnt"), F.lit(0)))
        .withColumn(
            mean_col,
            F.when(
                F.col("__den") > 0,
                F.col("__num").cast("double") / F.col("__den").cast("double"),
            ),
        )
        .drop("__num", "__den", "__cnt")
    )
