"""Batch source/sink builders (SURVEY.md §2.2 scans/sinks rows).

Thin, typed wrappers over ``spark.read``/``df.write`` that enforce the
engine's scan discipline:

* always pass an explicit schema for text formats (CSV/JSON) — schema
  inference is a full extra pass over 100 TB and type-drifts silently;
* parquet scans go through :mod:`reactive_kinesis_spark.tables` for the
  driver tables, or here for ad-hoc paths;
* writers default to snappy parquet with optional partitioning — the shape
  every downstream scan benefits from (partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

BATCH_FORMATS = ("parquet", "csv", "json", "orc")


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Batch scan of ``path``. CSV defaults: header=true. Explicit schema
    required for csv/json (no silent inference pass)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported batch format: {fmt!r} (use {BATCH_FORMATS})")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(
            f"{fmt} scans require an explicit schema — inference costs a "
            "full extra pass and type-drifts at scale"
        )
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_batch(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Batch write. Parquet+snappy default; ``partition_by`` produces the
    directory layout partition pruning needs."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported batch format: {fmt!r} (use {BATCH_FORMATS})")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    buckets: int,
    bucket_by: list[str],
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (optionally sorted-within-bucket) table.

    Bucketing is the 100 TB answer to *recurring* joins/aggregations on the
    same key: both sides pre-hashed into the same number of buckets join
    with ZERO shuffle on every subsequent query — the exchange is paid once
    at write time instead of once per query. ``sort_by`` additionally
    pre-sorts within buckets so sort-merge joins skip their sort.

    Bucketed layout requires a catalog table (``saveAsTable``); pass
    ``path`` to keep the data external at an explicit location.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog-table scan — bucketing metadata (bucket count/columns) rides
    along, letting Catalyst elide the shuffle in bucket-aligned joins."""
    return spark.table(table_name)
