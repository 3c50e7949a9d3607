"""Structured-Streaming surface of the engine (SURVEY.md §2.1 mappings).

The reference's ack/retry/checkpoint machinery collapses into Spark's
micro-batch model (offset WAL + commit log); what remains genuinely custom
is implemented here: record (de)aggregation, the tolerate-or-halt DLQ
operator, the partition-key-batched producer sink, and per-shard ordering
helpers.
"""

from reactive_kinesis_spark.streaming.deaggregate import aggregate_records, deaggregate
from reactive_kinesis_spark.streaming.ordering import ordered_within_key, with_shard_order
from reactive_kinesis_spark.streaming.replay_source import register_replay_source
from reactive_kinesis_spark.streaming.source import file_stream_source, rate_stream_source
from reactive_kinesis_spark.streaming.tolerance import (
    ToleranceExceededError,
    split_by_predicate,
    tolerant_foreach_batch,
)

__all__ = [
    "aggregate_records",
    "deaggregate",
    "ordered_within_key",
    "with_shard_order",
    "file_stream_source",
    "rate_stream_source",
    "ToleranceExceededError",
    "split_by_predicate",
    "tolerant_foreach_batch",
]
