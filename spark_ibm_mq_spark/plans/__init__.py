"""Plan-inspection helpers (used by tests and bench to enforce the scale
posture: pushdown reached the scan, dims broadcast, no accidental
cartesians, codegen live)."""

from spark_ibm_mq_spark.plans.inspect import (
    executed_plan,
    formatted_explain,
    has_cartesian,
    num_broadcast_joins,
    num_exchanges,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_ids,
)

__all__ = [
    "executed_plan",
    "formatted_explain",
    "has_cartesian",
    "num_broadcast_joins",
    "num_exchanges",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_ids",
]
