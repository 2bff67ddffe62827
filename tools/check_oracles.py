"""Local stand-in for the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() against DuckDB at a
given sf dir and compare row count, column names, and order-insensitive
values. Usage: python tools/check_oracles.py [sf_dir] [only_query ...]"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """DRIVER-PARITY canonicalization (VERDICT r6 #3): the driver sorts the
    RAW column values and hashes them — it does not stringify objects, does
    not round floats, and crashes on array-typed cells. So this gate must
    (a) REJECT list/ndarray cells the way the driver would (its sort raises
    ``unhashable type: 'list'``), and (b) compare exactly, no atol rescue —
    queries are responsible for emitting pre-rounded / tie-free scalars on
    BOTH sides."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            bad = pdf[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()
            if bad:
                raise TypeError(
                    f"column {c!r} holds array-typed cells; the driver "
                    "canonicalizer cannot sort these — emit scalars "
                    "(concat_ws / array_to_string)"
                )
            pdf[c] = pdf[c].astype(str)
        elif "datetime" in str(pdf[c].dtype):
            s = pd.to_datetime(pdf[c])
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[ns]").astype("int64")
    return pdf.sort_values(list(pdf.columns), na_position="first").reset_index(
        drop=True
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from powershap_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: spark failed: {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"[rows] {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: duckdb failed: {str(e)[:200]}")
            continue
        try:
            a, b = normalize(sdf), normalize(odf)
        except TypeError as e:
            failures.append(name)
            print(f"[ERR ] {name}: canonicalize failed: {e}")
            continue
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        # DTYPE-KIND-STRICT equality after canonicalization (VERDICT r7
        # #2): the driver's value hash is dtype-KIND-sensitive — an
        # int64-vs-float64 frame with equal values (DuckDB SUM(int) ->
        # HUGEINT -> float64 vs Spark bigint) was a DRIVER FAILURE in r7 —
        # but width-insensitive: nine r7 driver-GREEN rows differ only in
        # integer width (Spark int32 rank vs DuckDB BIGINT row_number).
        # So: require matching kind, then widen both sides to the kind's
        # canonical width and require exact (NaN==NaN) equality. Queries
        # are responsible for emitting matching KINDS on both sides (cast
        # the Spark side when the oracle aggregate widens int -> float).
        ok_kinds = ok_cols and all(
            a[c].dtype.kind == b[c].dtype.kind for c in a.columns
        )
        if ok_rows and ok_cols and not ok_kinds:
            kind_diffs = [
                f"{c}: spark {a[c].dtype} vs duck {b[c].dtype}"
                for c in a.columns
                if a[c].dtype.kind != b[c].dtype.kind
            ]
            print(f"  dtype-kind mismatch: {kind_diffs}")
        _wide = {"i": "int64", "u": "uint64", "f": "float64"}

        def _col_equal(x: pd.Series, y: pd.Series) -> bool:
            try:
                w = _wide.get(x.dtype.kind)
                if w:
                    # nullable ints arrive as float64 via pandas; kind
                    # already matched, so widening within the kind is
                    # value-exact
                    xv, yv = x.astype(w), y.astype(w)
                    return bool(
                        np.array_equal(
                            xv.values, yv.values, equal_nan=(w == "float64")
                        )
                    )
                return bool(x.equals(y))
            except (TypeError, ValueError):
                # e.g. pd.NA in a nullable-int column: record THIS query
                # as FAIL and keep the gate running over the rest
                return False

        ok_vals = (
            ok_rows
            and ok_cols
            and ok_kinds
            and all(_col_equal(a[c], b[c]) for c in a.columns)
        )
        status = "OK  " if ok_vals else "FAIL"
        if not ok_vals:
            failures.append(name)
        print(f"[{status}] {name}: spark={len(sdf)} duck={len(odf)} cols_ok={ok_cols}")
        if not ok_vals and ok_rows and ok_cols:
            diff_mask = ~(a.fillna("~") == b.fillna("~")).all(axis=1)
            print("  first diffs (spark vs duck):")
            print(pd.concat([a[diff_mask].head(3), b[diff_mask].head(3)]).to_string())
        elif not ok_rows or not ok_cols:
            print(f"  spark cols: {list(a.columns)}")
            print(f"  duck  cols: {list(b.columns)}")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
