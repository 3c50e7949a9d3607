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


def test_cursor_file_persisted_and_covers_committed_offsets(spark, replay_dir, tmp_path):
    """Round-1 regression: commit() must persist the durable planning cursor
    on EVERY commit (latestOffset pre-advances the in-memory cursor, so a
    changed-only guard never fires). After stopping a throttled query
    mid-stream the cursor file must exist and be >= the offsets of every
    batch in Spark's commit log (checkpoint monotonicity,
    consumer/ConsumerWorker.scala:515-531)."""
    import json

    cursor = tmp_path / "cursor.json"
    ckpt = tmp_path / "ckpt"
    batches: list[int] = []
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", replay_dir)
        .option("maxRecordsPerBatch", 500)
        .option("cursorPath", str(cursor))
        .load()
        .writeStream.foreachBatch(lambda bdf, _i: batches.append(bdf.count()))
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="0 seconds")
        .start()
    )
    t0 = time.time()
    while len(batches) < 3 and time.time() - t0 < 60:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    assert cursor.exists(), "durable cursor file was never written"
    cur = {k: int(v) for k, v in json.loads(cursor.read_text()).items()}
    committed = sorted(int(p.name) for p in (ckpt / "commits").iterdir() if p.name.isdigit())
    assert committed, "no committed batches"
    last = committed[-1]
    # offset log entry for the last committed batch: v1 line, metadata line,
    # then one serialized offset json per source
    lines = (ckpt / "offsets" / str(last)).read_text().strip().splitlines()
    end = {k: int(v) for k, v in json.loads(lines[-1]).items()}
    for sid, off in end.items():
        assert cur.get(sid, 0) >= off, f"cursor below committed offset for {sid}"


def test_paging_without_cursor_path_rejected(replay_dir):
    from reactive_kinesis_spark.streaming.replay_source import _ReplayStreamReader

    with pytest.raises(ValueError, match="cursorPath"):
        _ReplayStreamReader({"path": replay_dir, "maxrecordsperbatch": "10"})


def _drain(spark, replay_dir, tmp_path, name, **opts):
    counts: list[int] = []
    reader = spark.readStream.format("kinesis_replay").option("path", replay_dir)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(lambda bdf, _i: counts.append(bdf.count()))
        .option("checkpointLocation", str(tmp_path / name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(counts)


def test_parse_timestamp_exact_integer_arithmetic():
    """Epoch-seconds forms resolve with integer arithmetic: fractional
    seconds don't round through a float, negative epochs scale
    symmetrically, and inf/nan are rejected naming the option."""
    from reactive_kinesis_spark.streaming.replay_source import _parse_timestamp_us

    assert _parse_timestamp_us("1700000000") == 1_700_000_000_000_000
    assert _parse_timestamp_us("1700000000.000001") == 1_700_000_000_000_001
    # 16 correct significant digits — the float path would drift here
    assert _parse_timestamp_us("1700000000.123456") == 1_700_000_000_123_456
    assert _parse_timestamp_us("-1.5") == -1_500_000
    # valid float literals beyond plain decimal: scientific notation and
    # underscore separators resolve exactly (Decimal, not binary float)
    assert _parse_timestamp_us("1.7e9") == 1_700_000_000_000_000
    assert _parse_timestamp_us("1_700_000_000") == 1_700_000_000_000_000
    assert _parse_timestamp_us("1.7000000001234567e9") == 1_700_000_000_123_456
    assert _parse_timestamp_us("1970-01-01T00:00:01+00:00") == 1_000_000
    for bad in ("inf", "nan", "-inf", "tomorrow"):
        with pytest.raises(ValueError, match="startingTimestamp"):
            _parse_timestamp_us(bad)


def test_unsorted_shard_file_rejected_for_position_search(spark, tmp_path):
    """searchsorted on an unsorted column silently returns arbitrary
    offsets (skipped/re-delivered rows); the layout contract is now
    validated and violations raise."""
    from reactive_kinesis_spark.streaming.replay_source import _resolve_start_offsets

    src = tmp_path / "bad"
    src.mkdir()
    df = spark.range(100).select(
        F.lit("s").alias("stream_name"),
        F.lit("shard-0").alias("shard_id"),
        F.lit("0").alias("partition_key"),
        # DESCENDING sequence numbers — violates the contract
        F.lpad((99 - F.col("id")).cast("string"), 20, "0").alias("sequence_number"),
        F.lit(0).cast("long").alias("sub_sequence_number"),
        F.col("id").cast("string").cast("binary").alias("payload"),
        F.timestamp_micros(F.lit(1_700_000_000_000_000) - F.col("id")).alias(
            "approximate_arrival_timestamp"
        ),
    )
    stage = str(tmp_path / "stage")
    df.coalesce(1).write.parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), str(src / "shard-0.parquet"))
    files = {"shard-0": str(src / "shard-0.parquet")}
    with pytest.raises(ValueError, match="not sorted ascending"):
        _resolve_start_offsets(files, {"shard-0": 100}, "at_sequence_number", None, "0" * 20)
    with pytest.raises(ValueError, match="not sorted ascending"):
        _resolve_start_offsets(files, {"shard-0": 100}, "at_timestamp", 1, None)


def test_start_resolution_lazy_and_skipped_with_complete_cursor(replay_dir, tmp_path):
    """Reader construction does no start-position file scan; a restart
    whose durable cursor covers every shard never resolves start offsets
    at all (ADVICE round 2: wasted init-time I/O growing with shard
    count)."""
    import json as _json

    from reactive_kinesis_spark.streaming.replay_source import _ReplayStreamReader

    cursor = tmp_path / "cursor.json"
    cursor.write_text(_json.dumps({f"shard-{s}": 1000 for s in range(SHARDS)}))
    reader = _ReplayStreamReader(
        {
            "path": replay_dir,
            "maxrecordsperbatch": "500",
            "cursorpath": str(cursor),
            "startingposition": "at_timestamp",
            "startingtimestamp": "1700000000",
        }
    )
    assert reader._start_offsets_cache is None  # nothing resolved eagerly
    reader.latestOffset()  # cursor covers all shards → still no resolution
    assert reader._start_offsets_cache is None
    assert reader.initialOffset()  # fresh-query path resolves on demand
    assert reader._start_offsets_cache is not None


def test_starting_position_at_timestamp(spark, replay_dir, tmp_path):
    """AT_TIMESTAMP (reference.conf:474-477): replay starts at the first
    record whose arrival timestamp is >= the given instant. Arrival ts is
    1_700_000_000s + id µs, so the midpoint instant admits ids >= N/2."""
    from datetime import datetime, timedelta, timezone

    mid = datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(
        seconds=1_700_000_000, microseconds=N // 2
    )
    got = _drain(
        spark, replay_dir, tmp_path, "ckpt_ts",
        startingPosition="at_timestamp", startingTimestamp=mid.isoformat(),
    )
    assert got == N - N // 2


def test_starting_position_sequence_number(spark, replay_dir, tmp_path):
    """(AT|AFTER)_SEQUENCE_NUMBER (reference.conf:469-473): per-shard
    sequence numbers are zero-padded row indices 0..N/SHARDS-1; AT includes
    the matching record, AFTER excludes it — KCL iterator semantics."""
    seq = str(2500).zfill(20)
    at = _drain(
        spark, replay_dir, tmp_path, "ckpt_at_seq",
        startingPosition="at_sequence_number", startingSequenceNumber=seq,
    )
    after = _drain(
        spark, replay_dir, tmp_path, "ckpt_after_seq",
        startingPosition="after_sequence_number", startingSequenceNumber=seq,
    )
    per_shard = N // SHARDS
    assert at == SHARDS * (per_shard - 2500)
    assert after == SHARDS * (per_shard - 2501)


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


# ---------------------------------------------------------------------------
# Multi-consumer shard split + failover (L1 analog)
# ---------------------------------------------------------------------------


def test_two_consumers_split_shards_union_exactly_once(spark, replay_dir, tmp_path):
    """The lease-rebalancing analog (reference it/.../
    ConsumerProcessingManagerIntegrationSpec.scala:33-69 proves shards
    redistribute across concurrent workers): two CONCURRENT queries over one
    stream hold disjoint shard subsets via the ``shards`` option (the lease
    split), each with its own checkpoint+cursor (the lease state). Worker A
    dies mid-stream; a replacement pointed at A's shard set + A's
    checkpoint/cursor takes over (lease takeover) and finishes A's shards.
    Union of both workers' deliveries = every record exactly once; neither
    worker ever touches the other's shards."""
    seen_a: dict[int, list[int]] = {}
    seen_b: dict[int, list[int]] = {}

    def sink(store):
        def f(bdf, bid):
            store[bid] = [int(bytes(r.payload)) for r in bdf.select("payload").collect()]

        return f

    def start(worker, shards, store, interval="0 seconds"):
        return (
            spark.readStream.format("kinesis_replay")
            .option("path", replay_dir)
            .option("shards", shards)
            .option("maxRecordsPerBatch", 1000)
            .option("cursorPath", str(tmp_path / f"cursor_{worker}.json"))
            .load()
            .writeStream.foreachBatch(sink(store))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{worker}"))
            .trigger(processingTime=interval)
            .start()
        )

    half = N // 2
    qa = start("a", "shard-0,shard-1", seen_a, "1 seconds")
    qb = start("b", "shard-2,shard-3", seen_b)

    # A makes partial progress, then fails mid-stream
    t0 = time.time()
    while not seen_a and time.time() - t0 < 60:
        time.sleep(0.2)
    qa.stop()
    qa.awaitTermination()
    assert 0 < sum(len(b) for b in seen_a.values()) <= half

    # B drains its half concurrently, unaffected by A's failure
    t0 = time.time()
    while sum(len(b) for b in seen_b.values()) < half and time.time() - t0 < 120:
        time.sleep(0.2)
    qb.stop()
    qb.awaitTermination()

    # failover: replacement consumer adopts A's shard set + lease state
    qa2 = start("a", "shard-0,shard-1", seen_a)
    t0 = time.time()
    while sum(len(b) for b in seen_a.values()) < half and time.time() - t0 < 120:
        time.sleep(0.2)
    qa2.stop()
    qa2.awaitTermination()

    flat_a = [v for b in seen_a.values() for v in b]
    flat_b = [v for b in seen_b.values() for v in b]
    # shard ownership respected (id % SHARDS is the shard by construction)
    assert all(v % SHARDS in (0, 1) for v in flat_a)
    assert all(v % SHARDS in (2, 3) for v in flat_b)
    union = flat_a + flat_b
    assert len(union) == N and len(set(union)) == N  # exactly once, no loss


def test_batch_read_shard_subset(spark, replay_dir):
    df = (
        spark.read.format("kinesis_replay")
        .option("path", replay_dir)
        .option("shards", "shard-1,shard-3")
        .load()
    )
    assert df.count() == N // 2
    assert df.rdd.getNumPartitions() == 2  # one partition per owned shard
    got = {r.shard_id for r in df.select("shard_id").distinct().collect()}
    assert got == {"shard-1", "shard-3"}


def test_unknown_shard_rejected(spark, replay_dir):
    with pytest.raises(Exception, match="unknown shard ids"):
        (
            spark.read.format("kinesis_replay")
            .option("path", replay_dir)
            .option("shards", "shard-9")
            .load()
            .count()
        )
