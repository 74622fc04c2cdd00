"""Physical-plan inspection over the formatted explain output.

These read the *executed* plan (post-AQE) so assertions reflect what
actually ran, not the initial estimate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_explain(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all parquet scans in the plan."""
    text = formatted_explain(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each parquet scan (pruning check)."""
    text = formatted_explain(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def num_broadcast_joins(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def num_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the executed plan (broadcast exchanges excluded)."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hash|range|rebalance|Single)", plan))


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in executed_plan(df)


def wholestage_codegen_ids(df: DataFrame) -> set[int]:
    return {int(x) for x in re.findall(r"\*\((\d+)\)", executed_plan(df))}
