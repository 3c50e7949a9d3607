"""Operator library — every operator is ``DataFrame -> DataFrame`` so batch
and streaming share one code path (SURVEY.md §7 design rule)."""

from reactive_kinesis_spark.operators.async_map import map_async
from reactive_kinesis_spark.operators.relational import asof_join, range_join, top_k_per_group

__all__ = ["asof_join", "map_async", "range_join", "top_k_per_group"]
