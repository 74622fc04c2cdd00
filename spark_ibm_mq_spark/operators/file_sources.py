"""CSV and JSON-lines scans (SURVEY.md §2.2 Scans/sources).

The fixtures are parquet; these queries materialize deterministic CSV/JSONL
exports once per sf_dir (DuckDB does the export so both engines read the
exact same bytes) and then run schema'd `spark.read.csv` / `spark.read.json`
scans against SQL oracles over the same files.

Scale notes: both readers are splittable line formats — schema is always
declared (inference costs an extra pass and guesses types); at 100 TB these
land as staging reads that immediately re-materialize to parquet.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table

_SCRATCH: list[str] = []


def _track_scratch(d: str) -> str:
    if not _SCRATCH:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH]
        )
    _SCRATCH.append(d)
    return d


def _tag(sf_dir: str, tables: tuple[str, ...]) -> str:
    """Cache key for a derived export: fixture path PLUS a content
    fingerprint (size + mtime) of every source parquet involved — the
    scale_layout._tag convention (ADVICE r5/r8): a path-only marker would
    silently serve a stale derived copy if the fixture at the same path is
    regenerated, while the oracle reads the fresh parquet."""
    parts = [sf_dir]
    for t in tables:
        src = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(src)
            parts.append(f"{t}|{st.st_size}|{st.st_mtime_ns}")
        except OSError:
            parts.append(t)
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def _export_dir(sf_dir: str) -> str:
    tag = _tag(sf_dir, ("nation", "orders"))
    d = os.path.join(tempfile.gettempdir(), f"file_sources_{tag}")
    marker = os.path.join(d, ".complete")
    if os.path.exists(marker):
        return d
    import duckdb

    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT n_nationkey, n_name, n_regionkey
                 FROM read_parquet('{sf_dir}/nation.parquet') ORDER BY n_nationkey)
            TO '{d}/nation.csv' (HEADER, DELIMITER ',')"""
    )
    con.execute(
        f"""COPY (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                 FROM read_parquet('{sf_dir}/orders.parquet') ORDER BY o_orderkey)
            TO '{d}/orders.jsonl' (FORMAT JSON)"""
    )
    con.close()
    open(marker, "w").close()
    return _track_scratch(d)


@register(
    "scan_csv_nation",
    oracle="""
    SELECT n.n_name, count(*) AS n_customers
    FROM nation n JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def scan_csv_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with declared schema + header, joined against a parquet
    table — mixed-format federation, the classic staging shape."""
    d = _export_dir(sf_dir)
    nation = spark.read.csv(
        os.path.join(d, "nation.csv"),
        header=True,
        schema="n_nationkey int, n_name string, n_regionkey int",
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        F.broadcast(nation)
        .join(cust, nation.n_nationkey == cust.c_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "scan_jsonl_orders",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def scan_jsonl_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with declared schema — the reference's payloads are
    JSON text (README.md:12-15); this is the bulk-file form."""
    d = _export_dir(sf_dir)
    orders = spark.read.json(
        os.path.join(d, "orders.jsonl"),
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total")
    )


@register(
    "scan_orc_roundtrip_region",
    oracle="""
    SELECT r.r_regionkey, r.r_name,
           CAST(count(n.n_nationkey) AS BIGINT) AS n_nations
    FROM region r LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_regionkey, r.r_name
    """,
)
def scan_orc_roundtrip_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source coverage via a full round-trip: region + nation
    re-materialize as ORC (Spark's built-in columnar sibling to parquet),
    are read BACK through `spark.read.orc`, and the joined rollup must
    match the oracle computed from the original parquet — proving the
    write path, the read path, and type fidelity (bigint/string survive
    the format) in one query. DuckDB cannot read ORC, so the oracle
    states the result over the source-of-truth parquet instead — which
    is exactly the invariant a format round-trip should satisfy.

    Scale notes: ORC, like parquet, is a splittable columnar format with
    predicate pushdown and column pruning in Spark's native reader; at
    100 TB the choice between them is ecosystem (Hive/Trino affinity),
    not capability — this query exists so a user migrating an ORC lake
    has a tested path."""
    tag = _tag(sf_dir, ("region", "nation"))
    d = os.path.join(tempfile.gettempdir(), f"orc_export_{tag}")
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, "region").write.mode("overwrite").orc(
            os.path.join(d, "region")
        )
        load_table(spark, sf_dir, "nation").write.mode("overwrite").orc(
            os.path.join(d, "nation")
        )
        open(marker, "w").close()
        _track_scratch(d)
    r = spark.read.orc(os.path.join(d, "region"))
    n = spark.read.orc(os.path.join(d, "nation"))
    return (
        r.join(n, n.n_regionkey == r.r_regionkey, "left")
        .groupBy("r_regionkey", "r_name")
        .agg(F.count("n_nationkey").cast("bigint").alias("n_nations"))
    )
