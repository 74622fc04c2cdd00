"""Local replica of the driver's correctness gate: run every registered
query on Spark and its oracle SQL on DuckDB, compare row-count, column
names, and (order-insensitively) values. Strict by default — floats must
match bit-for-bit after the query's own round(), which is the convention
(FIXTURES.md) that makes the driver's value-hash stable."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from spark_ibm_mq_spark import registry
from spark_ibm_mq_spark.tables import TABLES

registry.load_all_modules()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_NAMES = sorted(registry.ORACLE)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact: driver hashes values; we demand bit-identical doubles
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, name):
    q = registry.QUERIES[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(SF_DIR)
    res = con.execute(registry.ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _norm_rows(spark_cols, spark_rows)
    d = _norm_rows(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_every_query_has_runnable_entry(spark):
    # queries without an oracle still must run and return a schema
    for name, q in registry.QUERIES.items():
        df = q(spark, SF_DIR)
        assert df.columns, f"{name}: empty schema"
