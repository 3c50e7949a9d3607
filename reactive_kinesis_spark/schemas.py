"""Canonical stream-record schema (SURVEY.md §1.2).

Mirrors everything the reference can observe of a Kinesis record
(reference consumer/ConsumerProcessingManager.scala:82-89: sequence number,
sub-sequence number, payload bytes, approximate arrival timestamp; plus
shard id / partition key per README.md:669-686).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("stream_name", StringType()),
        StructField("shard_id", StringType()),
        StructField("partition_key", StringType()),
        StructField("sequence_number", StringType()),
        StructField("sub_sequence_number", LongType()),
        StructField("payload", BinaryType()),
        StructField("approximate_arrival_timestamp", TimestampType()),
    ]
)

#: Columns that uniquely order records within a shard. Kinesis sequence
#: numbers are fixed-width decimal strings in practice; ordering is the
#: (sequence_number, sub_sequence_number) tuple — NOT string concatenation
#: (the reference's comparison operators at models/ConsumerEvent.scala:29-39
#: concatenate strings, a latent bug; its canonical tuple Ordering at :43-44
#: is what tests exercise and what we implement).
ORDER_COLS = ("sequence_number", "sub_sequence_number")
