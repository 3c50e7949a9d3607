"""SparkSession factory with a 100 TB-scale-minded default configuration.

Tests run on ``local[N]`` but every knob here is chosen so the same session
config is what you would deploy on a 1000-executor cluster:

* AQE on (runtime partition coalescing, skew-join splitting, dynamic
  broadcast-join demotion/promotion) — the single biggest lever at scale.
* Shuffle partition count sized from cores locally; on a real cluster this is
  overridden upward (AQE coalesces back down, so over-provisioning is safe).
* Arrow enabled for every pandas-UDF / ``mapInPandas`` exchange.
* UTC session timezone so results are reproducible and match the DuckDB
  oracle byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "reactive-kinesis-spark"


def _default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or all cores). On a
    real cluster pass ``master=None`` with an externally-configured session —
    all settings below remain valid at 1000-executor scale.
    """
    cores = _default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- Adaptive query execution: the scale-survival kit -------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
        # --- Shuffle sizing ----------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Target split size for file scans; 128 MB is the right default for
        # parquet at 100 TB (≈800k tasks — fine with AQE coalescing).
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- Python/Arrow boundary ---------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- Determinism / oracle parity ---------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # Read driver-generated INT96/µs timestamps as-is.
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # Parquet TIMESTAMP(NANOS) columns (e.g. events.ts) read as long;
        # tables.load_table converts back to TimestampType losslessly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- Quieter local runs ------------------------------------------
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
