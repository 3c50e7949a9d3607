"""Config layer replicating the reference's resolution semantics (U1/U2).

The reference resolves a named consumer/producer block against a
``default-consumer`` / ``default-producer`` block via HOCON ``withFallback``
(reference consumer/KinesisConsumer.scala:60-101,
producer/ProducerConf.scala:53-86) and derives the checkpoint application
name as ``"$application-name-$stream-name"`` (KinesisConsumer.scala:71-72).

Here: plain dict merge with the same name→default fallback, typed
dataclasses, and emission as Spark reader/writer options. Defaults mirror
reference.conf (cited per field).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any

DEFAULT_CONSUMER_KEY = "default-consumer"
DEFAULT_PRODUCER_KEY = "default-producer"


def resolve_block(config: dict[str, Any], name: str, default_key: str) -> dict[str, Any]:
    """Named block with fallback to the default block (shallow merge,
    named block wins) — dict form of HOCON ``withFallback``."""
    merged = dict(config.get(default_key) or {})
    merged.update(config.get(name) or {})
    return merged


@dataclass
class ConsumerConfig:
    """Typed consumer config. Field ↔ reference.conf mapping cited inline."""

    stream_name: str
    application_name: str = "reactive-kinesis-spark"
    # TRIM_HORIZON | LATEST | AT_TIMESTAMP (reference.conf:469-477); a
    # checkpoint dir always wins if present (README.md:675-683 semantics).
    initial_position: str = "TRIM_HORIZON"
    at_timestamp: str | None = None
    # KCL maxRecords — max records per fetch batch (reference.conf:479-482)
    max_records: int = 10_000
    # worker.batchTimeoutSeconds (reference.conf:413-417)
    batch_timeout_seconds: int = 10
    # worker.failedMessageRetries (reference.conf:419-422)
    failed_message_retries: int = 1
    # worker.failureTolerancePercentage (reference.conf:424-430)
    failure_tolerance_percentage: float = 0.25
    # checkpointer.intervalMillis / backoffMillis (reference.conf:441-446)
    checkpoint_interval_millis: int = 2_000
    checkpoint_backoff_millis: int = 3_000
    # engine-side: Structured Streaming checkpoint dir (replaces DynamoDB)
    checkpoint_location: str | None = None
    # pass-through options for a real Kinesis connector
    extra_options: dict[str, str] = field(default_factory=dict)

    @property
    def checkpoint_app_name(self) -> str:
        """DynamoDB-table-name analog (KinesisConsumer.scala:71-72)."""
        return f"{self.application_name}-{self.stream_name}"

    @classmethod
    def from_dict(cls, config: dict[str, Any], name: str) -> "ConsumerConfig":
        block = resolve_block(config, name, DEFAULT_CONSUMER_KEY)
        known = {f.name for f in fields(cls)}
        kwargs = {k: v for k, v in block.items() if k in known}
        extra = {k: str(v) for k, v in block.items() if k not in known}
        if "stream_name" not in kwargs:
            raise ValueError(f"consumer block {name!r} missing stream_name")
        kwargs.setdefault("extra_options", {}).update(extra)
        return cls(**kwargs)

    def reader_options(self) -> dict[str, str]:
        """Options for ``spark.readStream`` (connector-agnostic names)."""
        opts = {
            "streamName": self.stream_name,
            "startingPosition": (
                self.at_timestamp
                if self.initial_position == "AT_TIMESTAMP" and self.at_timestamp
                else self.initial_position.lower()
            ),
            "maxFetchRecordsPerShard": str(self.max_records),
        }
        opts.update(self.extra_options)
        return opts


@dataclass
class ProducerConfig:
    """Typed producer config ↔ the KPL knobs the engine honors.

    The reference exposes all 31 KPL settings
    (producer/KinesisProducerConfig.scala:27-171); the engine implements the
    ones with Spark-side meaning and passes the rest through.
    """

    stream_name: str
    # KPL AggregationEnabled / AggregationMaxCount / AggregationMaxSize
    # (reference.conf:57-91)
    aggregation_enabled: bool = True
    aggregation_max_count: int = 4_294_967_295
    aggregation_max_size: int = 51_200
    # KPL CollectionMaxCount / CollectionMaxSize — PutRecords packing caps
    # (reference.conf:93-114)
    collection_max_count: int = 500
    collection_max_size: int = 5_242_880
    # akka.max-outstanding-requests (stream/Kinesis.scala:195-200).
    # Optional in the reference too (reference.conf:38-44, commented out =
    # no throttle configured). None ⇒ strict sequential send: concurrency
    # is OPT-IN because it requires a thread-safe transport and relaxes
    # intra-key ordering across requests.
    max_outstanding_requests: int | None = None
    # KPL RecordTtl (reference.conf:325-343) — per-record retry budget
    record_ttl_millis: int = 30_000
    # KPL RateLimit % of shard capacity (reference.conf:283-301)
    rate_limit_percent: int = 150
    extra_options: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, config: dict[str, Any], name: str) -> "ProducerConfig":
        block = resolve_block(config, name, DEFAULT_PRODUCER_KEY)
        known = {f.name for f in fields(cls)}
        kwargs = {k: v for k, v in block.items() if k in known}
        extra = {k: str(v) for k, v in block.items() if k not in known}
        if "stream_name" not in kwargs:
            raise ValueError(f"producer block {name!r} missing stream_name")
        kwargs.setdefault("extra_options", {}).update(extra)
        return cls(**kwargs)
