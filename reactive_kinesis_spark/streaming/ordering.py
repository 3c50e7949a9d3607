"""Per-shard ordering helpers (O1 in SURVEY.md §2.1).

The reference guarantees in-order processing *within a shard* (one worker
per shard, single-threaded batches — ConsumerProcessingManager.scala:77-80);
order across shards is undefined (README.md:669-672). After any Spark
shuffle the analog must be re-established explicitly — these helpers are
that discipline.

Ordering key is the (sequence_number, sub_sequence_number) tuple — the
reference's canonical Ordering (models/ConsumerEvent.scala:43-44), NOT its
buggy string-concatenation comparators (:29-39; "9"+"1" > "10"+"2"
lexicographically). Kinesis sequence numbers are fixed-width decimal
strings, so string ordering of the first component is numeric ordering; for
safety with variable-width sources, compare by (length, value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reactive_kinesis_spark.schemas import ORDER_COLS


def _seq_sort_cols() -> list:
    # (length, value) ordering makes variable-width decimal strings sort
    # numerically without overflow (sequence numbers can exceed int64).
    return [
        F.length("sequence_number"),
        F.col("sequence_number"),
        F.col("sub_sequence_number"),
    ]


def ordered_within_key(df: DataFrame, key: str = "shard_id") -> DataFrame:
    """Repartition by key and sort within partitions by sequence — restores
    the reference's per-shard processing order after any shuffle. One
    shuffle; no global sort."""
    return df.repartition(F.col(key)).sortWithinPartitions(F.col(key), *_seq_sort_cols())


def with_shard_order(df: DataFrame, key: str = "shard_id", out_col: str = "shard_seq") -> DataFrame:
    """Dense per-shard position (1-based) by sequence order — the rank used
    by contiguity checks (the reliability test's pit-stop sort,
    it/.../SimpleKinesisConsumer.scala:99-121)."""
    w = Window.partitionBy(key).orderBy(*_seq_sort_cols())
    return df.withColumn(out_col, F.row_number().over(w).cast("long"))
