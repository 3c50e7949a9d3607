"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`reactive_kinesis_spark.queries` — the engine's query
registry. Each registered query is a ``(spark, sf_dir) -> DataFrame``
callable with (where SQL-expressible) a DuckDB oracle producing identical
columns/values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reactive_kinesis_spark.queries import oracle_sql as _oracle_sql
from reactive_kinesis_spark.queries import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the star-schema revenue
    rollup (broadcast dims + partial/final agg + exact-decimal numerics)."""
    from reactive_kinesis_spark.queries import load_all

    return load_all()["q04_star_join"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
