"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over yaml_pipe_spark.entrypoints — the query registry lives there so
library code, tests, and bench share one source of truth.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from yaml_pipe_spark import entrypoints as _ep


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _ep.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ep.queries()


def oracle_sql() -> dict[str, str]:
    return _ep.oracle_sql()
