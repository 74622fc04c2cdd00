"""Query/oracle registry.

Every operator from SURVEY.md §2.2 registers a named query callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB oracle
SQL string. ``__spark_entry__.py`` re-exports the merged dicts; the driver
hash-compares each pair at sf0.01.

Conventions (FIXTURES.md): alias every computed column identically in both
engines; round float aggregates to 4 decimals; UTC session timezone.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_ibm_mq_spark.session import tune_for_oracle

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(tune_for_oracle(spark), sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # lets tooling reach the operator source
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every operator module so registrations run."""
    import spark_ibm_mq_spark.operators  # noqa: F401  (imports submodules)
