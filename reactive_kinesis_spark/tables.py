"""Catalog of the driver's synthetic tables (TESTDATA.md).

All readers go through :func:`load_table` so filters/projections written on
top of them reach the parquet scan (predicate pushdown + column pruning are
preserved — we never cache or materialize here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor the
#: reference targets (region/nation are bounded by geography; supplier/part/
#: customer are broadcastable at test SFs — joins take an explicit
#: ``broadcast()`` hint only for the bounded ones and let AQE decide for the
#: rest, which is the correct posture at 100 TB).
BROADCAST_ALWAYS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: SQL confs every query needs, settable at runtime — applied defensively so
#: the engine works on ANY caller-provided SparkSession (the driver builds
#: its own vanilla session; session.get_spark also sets these at build time).
RUNTIME_CONFS = {
    # events.parquet uses TIMESTAMP(NANOS); read as long, converted below.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic timestamp rendering, matches the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build — session.get_spark covers it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # Parquet TIMESTAMP(NANOS) columns surface as long under
    # spark.sql.legacy.parquet.nanosAsLong; restore TimestampType (the
    # driver's data is microsecond-resolution, so ns→µs is lossless).
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
