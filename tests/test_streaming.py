"""Streaming-semantics tests mirroring the reference's integration specs
(SURVEY.md §5): restart-from-checkpoint / no-commit-no-progress
(KinesisSourceGraphStageIntegrationSpec.scala:66-129), tolerate-or-halt
(ConsumerWorkerSpec.scala:302-461), producer round-trip + packing caps
(KinesisSinkGraphStageIntegrationSpec.scala:23-33), deaggregation
(KinesisTestConsumer.scala:83-90), and per-shard contiguity (the
reliability test's pit stops, SimpleKinesisConsumer.scala:99-121)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.config import ConsumerConfig, ProducerConfig
from reactive_kinesis_spark.schemas import EVENT_SCHEMA
from reactive_kinesis_spark.streaming import (
    ToleranceExceededError,
    aggregate_records,
    deaggregate,
    file_stream_source,
    tolerant_foreach_batch,
    with_shard_order,
)
from reactive_kinesis_spark.streaming.checkpoint import (
    has_committed_checkpoint,
    resolve_starting_position,
    run_pipeline,
)
from reactive_kinesis_spark.streaming.deaggregate import pack_records, unpack_records
from reactive_kinesis_spark.streaming.sink import (
    LocalDirTransport,
    TransportError,
    write_batch,
)

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def make_events(spark, n, shards=2, start=0, stream="s1"):
    rows = [
        (
            stream,
            f"shardId-{i % shards:012d}",
            str(i % shards),
            f"{start + i:020d}",
            0,
            str(start + i).encode(),
            T0 + dt.timedelta(seconds=i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


# ---------------------------------------------------------------------------
# Checkpoint / restart semantics (C1–C3)
# ---------------------------------------------------------------------------


def test_restart_from_checkpoint_processes_only_remainder(spark, tmp_path):
    src = str(tmp_path / "stream")
    ckpt = str(tmp_path / "ckpt")
    make_events(spark, 10, start=0).write.parquet(src, mode="append")

    seen: list[bytes] = []

    def collect(batch_df, batch_id):
        seen.extend(r.payload for r in batch_df.collect())

    q = run_pipeline(spark, file_stream_source(spark, src), collect, ckpt)
    q.awaitTermination()
    assert sorted(int(p) for p in seen) == list(range(10))
    assert has_committed_checkpoint(ckpt)

    # new data arrives while stopped; restart must process ONLY the remainder
    make_events(spark, 5, start=100).write.parquet(src, mode="append")
    seen.clear()
    q = run_pipeline(spark, file_stream_source(spark, src), collect, ckpt)
    q.awaitTermination()
    assert sorted(int(p) for p in seen) == list(range(100, 105))


def test_no_commit_means_full_replay(spark, tmp_path):
    src = str(tmp_path / "stream")
    make_events(spark, 8).write.parquet(src, mode="append")
    for run in range(2):  # fresh checkpoint dir each run ⇒ full replay
        seen = []
        q = run_pipeline(
            spark,
            file_stream_source(spark, src),
            lambda b, i: seen.extend(r.payload for r in b.collect()),
            str(tmp_path / f"ckpt{run}"),
        )
        q.awaitTermination()
        assert len(seen) == 8


def test_starting_position_precedence(tmp_path):
    conf = ConsumerConfig(
        stream_name="s1",
        initial_position="LATEST",
        checkpoint_location=str(tmp_path / "nope"),
    )
    assert resolve_starting_position(conf) == "latest"  # no checkpoint yet
    commits = tmp_path / "ck" / "commits"
    commits.mkdir(parents=True)
    (commits / "0").write_text("{}")
    conf.checkpoint_location = str(tmp_path / "ck")
    assert resolve_starting_position(conf) is None  # checkpoint wins


# ---------------------------------------------------------------------------
# Tolerate-or-halt (B3–B5)
# ---------------------------------------------------------------------------


def test_tolerance_within_budget_diverts_to_dlq(spark):
    df = make_events(spark, 100)
    good_rows, dlq_rows = [], []
    fn = tolerant_foreach_batch(
        ok=F.col("payload").cast("string").cast("int") != 13,
        process=lambda b, i: good_rows.extend(b.collect()),
        dlq=lambda b, i: dlq_rows.extend(b.collect()),
        tolerance_pct=1.0,
    )
    fn(df, 0)
    assert len(good_rows) == 99
    assert [bytes(r.payload) for r in dlq_rows] == [b"13"]


def test_tolerance_exceeded_halts(spark):
    df = make_events(spark, 100)
    fn = tolerant_foreach_batch(
        ok=F.col("payload").cast("string").cast("int") >= 10,  # 10% bad
        process=lambda b, i: None,
        tolerance_pct=0.25,
    )
    with pytest.raises(ToleranceExceededError) as ei:
        fn(df, 7)
    assert ei.value.failed == 10
    assert ei.value.batch_id == 7


def _flaky_predicate(marker_dir: str):
    """Boolean UDF that fails the FIRST evaluation of each multiple-of-5
    payload and succeeds afterwards — a transient per-record failure
    (the retry matrix the reference exercises in
    ConsumerWorkerSpec.scala:302-461)."""
    import os

    from pyspark.sql.functions import udf

    def f(v: str) -> bool:
        if int(v) % 5 != 0:
            return True
        p = os.path.join(marker_dir, v)
        if os.path.exists(p):
            return True
        open(p, "w").close()
        return False

    return udf(f, "boolean").asNondeterministic()


def test_tolerance_retry_recovers_transient_failures(spark, tmp_path):
    # 4/20 rows fail on first evaluation (>> 0.25% tolerance) but succeed on
    # the in-batch retry: the batch must commit with ZERO dlq rows
    # (reference consumer/ConsumerWorker.scala:385-394 retries unconfirmed
    # events failed-message-retries times before tolerance accounting)
    marker = tmp_path / "attempts"
    marker.mkdir()
    flaky = _flaky_predicate(str(marker))
    df = make_events(spark, 20)
    good, dlq = [], []
    fn = tolerant_foreach_batch(
        ok=flaky(F.col("payload").cast("string")),
        process=lambda b, i: good.extend(b.collect()),
        dlq=lambda b, i: dlq.extend(b.collect()),
        tolerance_pct=0.25,
        failed_message_retries=1,
    )
    fn(df, 0)
    assert len(good) == 20 and len(dlq) == 0


def test_tolerance_no_retries_halts_on_transient_failures(spark, tmp_path):
    # same flaky batch with the retry budget at 0: 4/20 = 20% > 0.25% ⇒ halt
    marker = tmp_path / "attempts"
    marker.mkdir()
    flaky = _flaky_predicate(str(marker))
    df = make_events(spark, 20)
    fn = tolerant_foreach_batch(
        ok=flaky(F.col("payload").cast("string")),
        process=lambda b, i: None,
        tolerance_pct=0.25,
        failed_message_retries=0,
    )
    with pytest.raises(ToleranceExceededError) as ei:
        fn(df, 3)
    assert ei.value.failed == 4


def test_tolerance_null_predicate_counts_failed(spark):
    df = make_events(spark, 4).withColumn(
        "maybe", F.when(F.col("payload").cast("string") == "0", F.lit(None)).otherwise(F.lit(True))
    )
    good, dlq = [], []
    fn = tolerant_foreach_batch(
        ok=F.col("maybe"),
        process=lambda b, i: good.extend(b.collect()),
        dlq=lambda b, i: dlq.extend(b.collect()),
        tolerance_pct=50.0,
    )
    fn(df, 0)
    assert len(good) == 3 and len(dlq) == 1


# ---------------------------------------------------------------------------
# Aggregation / deaggregation (O2/O3)
# ---------------------------------------------------------------------------


def test_pack_unpack_roundtrip():
    recs = [("k1", b"a"), ("k1", b"bb"), ("k2", b"\x00\xff")]
    assert unpack_records(pack_records(recs)) == recs


def test_unpack_passthrough_for_plain_record():
    assert unpack_records(b"plain-bytes") == [("", b"plain-bytes")]


def test_aggregate_then_deaggregate_dataframe_roundtrip(spark):
    df = make_events(spark, 50, shards=2)
    agg = aggregate_records(df, max_count=7, max_size=51_200)
    n_agg = agg.count()
    assert n_agg < 50  # actually packed
    back = deaggregate(agg)
    got = sorted((r.partition_key, bytes(r.payload)) for r in back.collect())
    want = sorted((r.partition_key, bytes(r.payload)) for r in df.collect())
    assert got == want
    # sub-sequence numbers are 0..k-1 within each aggregated record
    subs = [r.sub_sequence_number for r in back.collect()]
    assert min(subs) == 0 and max(subs) >= 1


def test_deaggregate_assigns_contiguous_subsequences(spark):
    df = make_events(spark, 12, shards=1)
    agg = aggregate_records(df, max_count=100)
    back = deaggregate(agg).collect()
    by_seq = {}
    for r in back:
        by_seq.setdefault(r.sequence_number, []).append(r.sub_sequence_number)
    for seq, subs in by_seq.items():
        assert sorted(subs) == list(range(len(subs)))


# ---------------------------------------------------------------------------
# Producer sink (S3–S6, T1/T2)
# ---------------------------------------------------------------------------


def test_sink_roundtrip_all_records_delivered(spark, tmp_path):
    df = make_events(spark, 200, shards=4)
    transport = LocalDirTransport(str(tmp_path / "out"))
    conf = ProducerConfig(stream_name="s1", aggregation_enabled=True, aggregation_max_count=10)
    write_batch(df, conf, transport)
    got = []
    for pk, blob in transport.read_back():
        got.extend(unpack_records(blob))
    assert sorted(int(d) for _, d in got) == list(range(200))


def test_sink_respects_collection_caps(spark, tmp_path):
    df = make_events(spark, 300, shards=1)
    out = tmp_path / "out"
    transport = LocalDirTransport(str(out))
    conf = ProducerConfig(
        stream_name="s1", aggregation_enabled=False, collection_max_count=50
    )
    write_batch(df, conf, transport)
    import json as _json

    for f in out.iterdir():
        n_lines = sum(1 for line in f.read_text().splitlines() if line.strip())
        assert n_lines <= 50
    got = [int(d) for _, d in transport.read_back()]
    assert sorted(got) == list(range(300))


def test_sink_fails_after_ttl_on_persistent_transport_failure(spark, tmp_path):
    df = make_events(spark, 10, shards=1)
    transport = LocalDirTransport(str(tmp_path / "out"), fail_pks=("0",))
    conf = ProducerConfig(stream_name="s1", aggregation_enabled=False, record_ttl_millis=200)
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        write_batch(df, conf, transport)
    assert "RecordTtl" in str(ei.value) or "TransportError" in str(ei.value)


def test_bounded_sender_never_exceeds_max_outstanding():
    """In-flight requests stay ≤ max_outstanding while sends run
    concurrently (reference KinesisSinkGraphStageSpec.scala:82-91:
    'does not produce more than maxOutstanding unacked messages')."""
    import threading
    import time as _time

    from reactive_kinesis_spark.streaming.sink import BoundedSender

    lock = threading.Lock()
    inflight = 0
    seen_max = 0
    sent = []

    def slow_send(entries):
        nonlocal inflight, seen_max
        with lock:
            inflight += 1
            seen_max = max(seen_max, inflight)
        _time.sleep(0.05)
        with lock:
            inflight -= 1
            sent.append(entries)

    sender = BoundedSender(slow_send, max_outstanding=4)
    for i in range(20):
        sender.submit([(str(i), b"x")])
    sender.close()
    assert len(sent) == 20
    assert seen_max <= 4  # the throttle bound
    assert seen_max >= 2  # and sends genuinely overlapped


def test_bounded_sender_propagates_send_failure():
    from reactive_kinesis_spark.streaming.sink import BoundedSender, TransportError

    def failing_send(entries):
        raise TransportError("boom")

    sender = BoundedSender(failing_send, max_outstanding=2)
    with pytest.raises(TransportError):
        sender.submit([("0", b"x")])
        sender.close()


def test_bounded_sender_abort_reclaims_pool_without_raising():
    """The error path (task failing for any reason mid-partition) must
    reclaim the sender: queued requests cancelled, pool shut down, no
    secondary exception masking the original — and no thread left calling
    the transport after the task has failed (it would race the retry)."""
    import threading

    from reactive_kinesis_spark.streaming.sink import BoundedSender, TransportError

    release = threading.Event()
    calls = []

    def slow_failing_send(entries):
        calls.append(entries)
        release.wait(5)
        raise TransportError("boom")

    sender = BoundedSender(slow_failing_send, max_outstanding=2)
    sender.submit([("0", b"x")])
    sender.submit([("1", b"y")])
    release.set()
    sender.abort()  # must not raise despite failed sends
    assert not sender._inflight
    assert sender._pool._shutdown
    n_after_abort = len(calls)
    import time as _time

    _time.sleep(0.2)
    assert len(calls) == n_after_abort  # no zombie thread still sending


def test_sink_concurrent_roundtrip_all_records_delivered(spark, tmp_path):
    # bounded-concurrency path (max_outstanding > 1): every record still
    # delivered exactly once per send, collection caps still honored
    df = make_events(spark, 200, shards=2)
    transport = LocalDirTransport(str(tmp_path / "out"))
    conf = ProducerConfig(
        stream_name="s1", aggregation_enabled=False, collection_max_count=10
    )
    write_batch(df, conf, transport, max_outstanding=3)
    got = [int(d) for _, d in transport.read_back()]
    assert sorted(got) == list(range(200))


def test_streaming_sink_end_to_end(spark, tmp_path):
    src = str(tmp_path / "stream")
    make_events(spark, 40, shards=2).write.parquet(src, mode="append")
    transport = LocalDirTransport(str(tmp_path / "sunk"))
    conf = ProducerConfig(stream_name="s1", aggregation_max_count=8)
    from reactive_kinesis_spark.streaming.sink import kinesis_like_sink

    q = kinesis_like_sink(
        file_stream_source(spark, src), conf, transport, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination()
    got = []
    for pk, blob in transport.read_back():
        got.extend(unpack_records(blob))
    assert sorted(int(d) for _, d in got) == list(range(40))


# ---------------------------------------------------------------------------
# Ordering / contiguity (O1 + reliability-test analog)
# ---------------------------------------------------------------------------


@pytest.mark.slow_e2e
def test_per_shard_contiguity_soak(spark):
    """Pit-stop check: sequential payloads per shard arrive gap-free and
    duplicate-free after a shuffle + reorder (SimpleKinesisConsumer
    .scala:99-121 analog, scaled down)."""
    n, shards = 10_000, 4
    df = make_events(spark, n, shards=shards).repartition(16)  # scramble
    ordered = with_shard_order(df)
    per_shard = (
        ordered.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("sequence_number").alias("dcnt"),
            F.min(F.col("payload").cast("string").cast("long")).alias("lo"),
            F.max(F.col("payload").cast("string").cast("long")).alias("hi"),
        )
        .collect()
    )
    assert len(per_shard) == shards
    for r in per_shard:
        assert r.cnt == r.dcnt == n // shards  # no dups
        # payloads are i where i % shards == shard index ⇒ arithmetic check
        assert (r.hi - r.lo) // shards + 1 == r.cnt  # no gaps
    # shard_seq is 1..cnt contiguous per shard
    ranks = ordered.groupBy("shard_id").agg(
        F.min("shard_seq").alias("mn"), F.max("shard_seq").alias("mx"), F.count("*").alias("c")
    )
    for r in ranks.collect():
        assert r.mn == 1 and r.mx == r.c


# ---------------------------------------------------------------------------
# Config resolution (U1/U2)
# ---------------------------------------------------------------------------


def test_consumer_config_fallback_resolution():
    cfg = {
        "default-consumer": {
            "application_name": "app",
            "max_records": 5000,
            "failure_tolerance_percentage": 0.25,
        },
        "my-consumer": {"stream_name": "s1", "max_records": 100},
    }
    c = ConsumerConfig.from_dict(cfg, "my-consumer")
    assert c.stream_name == "s1"
    assert c.max_records == 100  # named block wins
    assert c.application_name == "app"  # fallback applies
    assert c.checkpoint_app_name == "app-s1"  # KinesisConsumer.scala:71-72
    assert c.reader_options()["maxFetchRecordsPerShard"] == "100"
    # worker/checkpointer typed surface matches reference.conf defaults
    # (reference types exactly these; the kcl block is passthrough there too)
    assert c.graceful_shutdown_hook is True
    assert c.shutdown_timeout_seconds == 25
    assert c.checkpoint_notification_delay_millis == 1_000


def test_producer_config_extra_options_passthrough():
    cfg = {
        "default-producer": {"rate_limit_percent": 150},
        "p": {"stream_name": "s2", "SomeKplKnob": "42"},
    }
    p = ProducerConfig.from_dict(cfg, "p")
    assert p.stream_name == "s2"
    assert p.rate_limit_percent == 150
    assert p.extra_options["SomeKplKnob"] == "42"


def test_idempotent_sink_replay_produces_no_duplicates(spark, tmp_path):
    """At-least-once foreachBatch + batch-id overwrite = exactly-once
    output: simulate a crash-replay by invoking the same batchId twice
    (with partial first output), then a second batch."""
    from reactive_kinesis_spark.streaming.sink import idempotent_foreach_batch

    out = str(tmp_path / "out")
    sinkfn = idempotent_foreach_batch(out)

    b0 = make_events(spark, 10)
    sinkfn(b0.limit(6), 0)   # partial write before simulated crash
    sinkfn(b0, 0)            # replay of the SAME batch id
    sinkfn(make_events(spark, 5, start=100), 1)

    got = spark.read.parquet(out)
    assert got.count() == 15  # 10 + 5, no duplicates from the replay
    seqs = sorted(r.sequence_number for r in got.collect())
    assert seqs == sorted(
        [f"{i:020d}" for i in range(10)] + [f"{100+i:020d}" for i in range(5)]
    )


def test_idempotent_sink_end_to_end_streaming(spark, tmp_path):
    from reactive_kinesis_spark.streaming.sink import idempotent_foreach_batch

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    make_events(spark, 20).write.parquet(src, mode="append")
    q = (
        file_stream_source(spark, src)
        .writeStream.foreachBatch(idempotent_foreach_batch(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 20


def test_rate_stream_source_produces_event_schema(spark, tmp_path):
    from reactive_kinesis_spark.streaming import rate_stream_source

    df = rate_stream_source(spark, rows_per_second=500, num_shards=2)
    assert df.isStreaming
    # literal-derived columns are non-nullable — stricter is fine; the
    # contract is names + types
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in EVENT_SCHEMA.fields
    ]
    q = (
        df.writeStream.format("memory")
        .queryName("rate_src")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 30
        n = 0
        while _t.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM rate_src").collect()[0].n
            if n >= 100:
                break
            _t.sleep(0.5)
        assert n >= 100
        rows = spark.sql("SELECT * FROM rate_src LIMIT 50").collect()
        assert {r.shard_id for r in rows} <= {"shardId-000000000000", "shardId-000000000001"}
        assert all(r.payload == r.sequence_number.lstrip("0").encode() or
                   int(r.payload) == int(r.sequence_number) for r in rows)
    finally:
        q.stop()


def test_producer_config_full_kpl_knob_round_trip():
    """Full typed KPL knob surface (U2): every setting of the reference's
    KinesisProducerConfig (producer/KinesisProducerConfig.scala:27-60) has a
    typed field, a KPL-named emission (toAwsConfig analog), and survives the
    round trip from_dict → kpl_config → from_kpl_config — the engine's form
    of ProducerConfSpec.scala:223-392."""
    from reactive_kinesis_spark.config import _KPL_FIELD_MAP

    block = {
        "stream_name": "s-full",
        "aggregation_enabled": False,
        "aggregation_max_count": 1000,
        "aggregation_max_size": 40_000,
        "collection_max_count": 123,
        "collection_max_size": 1_000_000,
        "max_outstanding_requests": 7,
        "record_ttl_millis": 12_345,
        "rate_limit_percent": 90,
        "kinesis_endpoint": "localhost",
        "kinesis_port": 4567,
        "region": "us-east-1",
        "connect_timeout_millis": 1111,
        "request_timeout_millis": 2222,
        "min_connections": 2,
        "max_connections": 9,
        "verify_certificate": False,
        "fail_if_throttled": True,
        "record_max_buffered_time_millis": 250,
        "credentials_provider": "profile-a",
        "metrics_credentials_provider": "profile-b",
        "credentials_refresh_delay_millis": 4000,
        "cloudwatch_endpoint": "cw.local",
        "cloudwatch_port": 4568,
        "metrics_granularity": "stream",
        "metrics_level": "summary",
        "metrics_namespace": "MyNS",
        "metrics_upload_delay_millis": 30_000,
        "additional_metric_dimensions": [
            {"key": "env", "value": "test", "granularity": "stream"}
        ],
        "log_level": "warning",
        "enable_core_dumps": True,
        "native_executable": "/opt/kpl",
        "temp_directory": "/tmp/kpl",
        "threading_model": "POOLED",
        "thread_pool_size": 16,
    }
    conf = ProducerConfig.from_dict({"default-producer": {}, "p1": block}, "p1")
    # every typed field got its value (none fell into extra_options)
    for k, v in block.items():
        assert getattr(conf, k) == v, k
    assert conf.extra_options == {}

    kpl = conf.kpl_config()
    # every KPL knob of the reference surface is emitted under its KPL name
    assert set(kpl) == set(_KPL_FIELD_MAP.values())
    assert kpl["AggregationMaxCount"] == 1000
    assert kpl["ThreadingModel"] == "POOLED"

    back = ProducerConfig.from_kpl_config("s-full", kpl)
    for field_name in _KPL_FIELD_MAP:
        assert getattr(back, field_name) == getattr(conf, field_name), field_name


def test_producer_config_defaults_match_kpl_defaults():
    """Defaults mirror the public KPL defaults (reference.conf:57-395)."""
    conf = ProducerConfig(stream_name="s")
    kpl = conf.kpl_config()
    assert kpl["AggregationEnabled"] is True
    assert kpl["AggregationMaxCount"] == 4_294_967_295
    assert kpl["AggregationMaxSize"] == 51_200
    assert kpl["CollectionMaxCount"] == 500
    assert kpl["CollectionMaxSize"] == 5_242_880
    assert kpl["ConnectTimeout"] == 6_000
    assert kpl["RequestTimeout"] == 6_000
    assert kpl["CloudwatchPort"] == 443
    assert kpl["KinesisPort"] == 443
    assert kpl["MinConnections"] == 1
    assert kpl["MaxConnections"] == 24
    assert kpl["RateLimit"] == 150
    assert kpl["RecordMaxBufferedTime"] == 100
    assert kpl["RecordTtl"] == 30_000
    assert kpl["MetricsGranularity"] == "shard"
    assert kpl["MetricsLevel"] == "detailed"
    assert kpl["MetricsNamespace"] == "KinesisProducerLibrary"
    assert kpl["MetricsUploadDelay"] == 60_000
    assert kpl["LogLevel"] == "info"
    assert kpl["VerifyCertificate"] is True
    assert kpl["FailIfThrottled"] is False
    assert kpl["EnableCoreDumps"] is False
    assert kpl["ThreadingModel"] == "PER_REQUEST"
    assert kpl["ThreadPoolSize"] == 0
    # unset Optionals are absent, exactly like the reference's Option folds
    for absent in ("KinesisEndpoint", "CloudwatchEndpoint", "Region",
                   "NativeExecutable", "TempDirectory", "CredentialsProvider",
                   "MetricsCredentialsProvider"):
        assert absent not in kpl


def test_producer_config_rejects_invalid_enums_and_caps():
    with pytest.raises(ValueError, match="threading_model"):
        ProducerConfig(stream_name="s", threading_model="FIBERS")
    with pytest.raises(ValueError, match="metrics_level"):
        ProducerConfig(stream_name="s", metrics_level="verbose")
    with pytest.raises(ValueError, match="metrics_granularity"):
        ProducerConfig(stream_name="s", metrics_granularity="galaxy")
    with pytest.raises(ValueError, match="log_level"):
        ProducerConfig(stream_name="s", log_level="loud")
    with pytest.raises(ValueError, match="collection_max_count"):
        ProducerConfig(stream_name="s", collection_max_count=501)
