"""Operator surface (SURVEY.md §2.2). Importing this package registers
every named query + oracle into spark_ibm_mq_spark.registry."""

from spark_ibm_mq_spark.operators import (  # noqa: F401
    aggregations,
    dedup,
    file_sources,
    flagship,
    joins,
    mq_envelope,
    mq_source,
    multimodal,
    pipeline,
    projections,
    scale_layout,
    similarity,
    sorts_sets,
    streaming_analytics,
    text_analysis,
    tpch_suite,
    udfs,
    windows,
)

_ALL_MODULES = [
    "aggregations",
    "dedup",
    "file_sources",
    "flagship",
    "joins",
    "mq_envelope",
    "mq_source",
    "multimodal",
    "pipeline",
    "projections",
    "scale_layout",
    "similarity",
    "sorts_sets",
    "streaming_analytics",
    "text_analysis",
    "tpch_suite",
    "udfs",
    "windows",
]
