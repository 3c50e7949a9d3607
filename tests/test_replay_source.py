"""Custom Python DataSource (kinesis_replay) — per-shard parallel replay
with KCL-style paging and positions.

Reference parity being tested (SURVEY.md §2.1): S1/S2 per-shard parallel
consumption, B1 maxRecords batch caps (reference.conf:479-482), C3 initial
position + checkpoint-wins precedence (reference.conf:469-477), O1
per-shard ordering, and the read-position-across-restarts behavior of
KinesisSourceGraphStageIntegrationSpec.scala:66-97.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.streaming.replay_source import register_replay_source

N, SHARDS = 20_000, 4


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    """A sharded replay directory: shard-<i>.parquet, EVENT_SCHEMA, rows
    ordered by sequence number within each shard."""
    register_replay_source(spark)
    tmp = tmp_path_factory.mktemp("replay_src")
    df = spark.range(N).select(
        F.lit("replay").alias("stream_name"),
        F.concat(F.lit("shard-"), (F.col("id") % SHARDS).cast("string")).alias("shard_id"),
        (F.col("id") % SHARDS).cast("string").alias("partition_key"),
        F.lpad((F.col("id") / SHARDS).cast("long").cast("string"), 20, "0").alias(
            "sequence_number"
        ),
        F.lit(0).cast("long").alias("sub_sequence_number"),
        F.col("id").cast("string").cast("binary").alias("payload"),
        F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("id")).alias(
            "approximate_arrival_timestamp"
        ),
    )
    for s in range(SHARDS):
        stage = str(tmp / f"stage_{s}")
        (
            df.where(F.col("shard_id") == f"shard-{s}")
            .coalesce(1)
            .orderBy("sequence_number")
            .write.parquet(stage)
        )
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        shutil.move(os.path.join(stage, part), str(tmp / f"shard-{s}.parquet"))
        shutil.rmtree(stage)
    return str(tmp)


def test_batch_read_full_replay(spark, replay_dir):
    df = spark.read.format("kinesis_replay").option("path", replay_dir).load()
    assert df.count() == N
    assert df.columns == [
        "stream_name",
        "shard_id",
        "partition_key",
        "sequence_number",
        "sub_sequence_number",
        "payload",
        "approximate_arrival_timestamp",
    ]
    # one input partition per shard — the reference's parallelism unit
    assert df.rdd.getNumPartitions() == SHARDS


def test_stream_drains_exactly_once_with_restart_and_paging(spark, replay_dir, tmp_path):
    """Rate-limited paging + mid-stream restart: every payload exactly once,
    per-shard batch caps respected, per-shard order preserved across
    batches (the reference reliability-test invariants,
    SimpleKinesisConsumer.scala:99-121)."""
    ckpt = str(tmp_path / "ckpt")
    # keyed by batch id: a batch interrupted before its commit is re-executed
    # on restart with the SAME id (foreachBatch is at-least-once; an
    # idempotent sink dedupes on batch id — streaming.sink.idempotent_
    # foreach_batch does exactly this in production)
    seen: dict[int, list[int]] = {}

    def sink(bdf, bid):
        seen[bid] = [int(bytes(r.payload)) for r in bdf.select("payload").collect()]

    def start(interval):
        return (
            spark.readStream.format("kinesis_replay")
            .option("path", replay_dir)
            .option("maxRecordsPerBatch", 1000)
            .option("cursorPath", str(tmp_path / "cursor.json"))
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=interval)
            .start()
        )

    q = start("1 seconds")
    t0 = time.time()
    while not seen and time.time() - t0 < 60:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    mid = sum(len(b) for b in seen.values())
    assert 0 < mid <= N

    q2 = start("0 seconds")
    t0 = time.time()
    while sum(len(b) for b in seen.values()) < N and time.time() - t0 < 120:
        time.sleep(0.5)
    q2.stop()
    q2.awaitTermination()

    flat = [v for b in seen.values() for v in b]
    assert len(flat) == N and len(set(flat)) == N  # exactly once, no loss
    assert max(len(b) for b in seen.values()) <= SHARDS * 1000  # B1 cap
    # per-shard order across batches (ascending batch id): max seq of shard
    # s in batch k is below the min in any later batch
    high: dict[int, int] = {}
    for bid in sorted(seen):
        per: dict[int, list[int]] = {}
        for v in seen[bid]:
            per.setdefault(v % SHARDS, []).append(v)
        for s, vals in per.items():
            if s in high:
                assert min(vals) > high[s]
            high[s] = max(vals)


def test_starting_position_latest_sees_nothing(spark, replay_dir, tmp_path):
    counts: list[int] = []
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", replay_dir)
        .option("startingPosition", "latest")
        .load()
        .writeStream.foreachBatch(lambda bdf, _i: counts.append(bdf.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt_latest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(counts) == 0


def test_unthrottled_stream_drains_in_one_batch(spark, replay_dir, tmp_path):
    counts: list[int] = []
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", replay_dir)
        .load()
        .writeStream.foreachBatch(lambda bdf, _i: counts.append(bdf.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt_all"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(counts) == N


def test_stream_writer_round_trip_and_idempotent_commit(spark, replay_dir, tmp_path):
    """Producer sink (S3-S6): stream from the replay source into the
    kinesis_replay writer; every producer event is published exactly once
    and the commit marker makes batch replay a no-op."""
    out = str(tmp_path / "producer_out")
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", replay_dir)
        .load()
        .select("partition_key", "payload")
        .writeStream.format("kinesis_replay")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(os.path.join(out, "data"))
    vals = sorted(int(bytes(r.payload)) for r in back.collect())
    assert vals == list(range(N))
    # replaying the same batch id must not duplicate
    import glob
    import json

    marker = sorted(glob.glob(os.path.join(out, "_commits", "*.json")))
    assert marker, "commit marker missing"
    with open(marker[0]) as fh:
        assert json.load(fh)["rows"] == N
