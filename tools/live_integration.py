#!/usr/bin/env python
"""End-to-end live-AWS integration harness against a localstack Kinesis.

The engine analog of the reference's `it:test` suite (it/.../common/
KinesisSuite.scala:283-302 creates streams and seeds per-shard messages
against a local endpoint; it/.../stream/KinesisSourceGraphStageIntegrationSpec
.scala:26-129 asserts delivery, read-position-maintained-across-restarts, and
no-commit-no-progress). Three legs, same assertions, Spark-native machinery:

1. **produce** — a Spark batch pushed through the real producer path
   (`write_batch` → RequestPacker/BoundedSender/TTL retry →
   `Boto3Transport.put_records`), with KPL aggregation ON so the wire
   carries real aggregated records.
2. **consume (transport)** — `Boto3GetRecordsTransport` + `read_shard`
   polling loop + KPL deaggregation: every payload back exactly once,
   in order per partition key.
3. **consume (Spark source)** — `kinesis_live` readStream into a memory
   sink; then MORE records are produced and the SAME checkpoint resumed:
   only the new records may appear (read position maintained — the
   restart contract of the reference's integration spec).

Requires a reachable Kinesis endpoint (default the localstack compose in
localstack/docker-compose.yml):

    docker compose -f localstack/docker-compose.yml up -d
    python tools/live_integration.py

Environment: RKS_LIVE_ENDPOINT (default http://localhost:4566),
RKS_LIVE_REGION (default us-east-1). Dummy credentials are injected if the
environment carries none (localstack accepts any).

Exit codes: 0 = all legs pass, 2 = endpoint unreachable (instructions
printed), 1 = assertion failure.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.parse
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENDPOINT = os.environ.get("RKS_LIVE_ENDPOINT", "http://localhost:4566")
REGION = os.environ.get("RKS_LIVE_REGION", "us-east-1")
SHARDS = 2
N_MESSAGES = 400
N_EXTRA = 60


def _probe(endpoint: str) -> bool:
    import socket

    u = urllib.parse.urlparse(endpoint)
    host, port = u.hostname, u.port or (443 if u.scheme == "https" else 80)
    try:
        with socket.create_connection((host, port), timeout=3):
            return True
    except OSError:
        return False


def _client():
    import boto3

    return boto3.session.Session(region_name=REGION).client(
        "kinesis", endpoint_url=ENDPOINT
    )


def _wait_active(client, stream: str, timeout_s: float = 60.0) -> None:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        desc = client.describe_stream_summary(StreamName=stream)
        if desc["StreamDescriptionSummary"]["StreamStatus"] == "ACTIVE":
            return
        time.sleep(0.5)
    raise TimeoutError(f"stream {stream} not ACTIVE after {timeout_s}s")


def produce_leg(spark, stream: str, start: int, count: int) -> None:
    from pyspark.sql import functions as F

    from reactive_kinesis_spark.config import ProducerConfig
    from reactive_kinesis_spark.streaming.aws import Boto3Transport
    from reactive_kinesis_spark.streaming.sink import write_batch

    conf = ProducerConfig(
        stream_name=stream,
        kinesis_endpoint=ENDPOINT,
        region=REGION,
        aggregation_enabled=True,
        record_ttl_millis=30_000,
    )
    batch = spark.range(start, start + count).select(
        (F.col("id") % SHARDS).cast("string").alias("partition_key"),
        F.col("id").cast("string").cast("binary").alias("payload"),
    )
    write_batch(batch, conf, Boto3Transport.from_producer_config(conf))


def consume_transport_leg(stream: str, expect: list[int]) -> dict:
    from reactive_kinesis_spark.streaming.consumer_aws import (
        Boto3GetRecordsTransport,
        read_shard,
    )
    from reactive_kinesis_spark.streaming.deaggregate import unpack_records

    transport = Boto3GetRecordsTransport(
        region_name=REGION, endpoint_url=ENDPOINT
    )
    got: list[tuple[str, int]] = []
    for shard_id in transport.list_shards(stream):
        for rec in read_shard(
            transport,
            stream,
            shard_id,
            last_sequence_number=None,
            position="trim_horizon",
            max_empty_pages=2,
        ):
            for _pk, data in unpack_records(bytes(rec["Data"])):
                got.append((rec["PartitionKey"], int(data.decode())))
    values = sorted(v for _, v in got)
    assert values == sorted(expect), (
        f"transport leg: got {len(values)} msgs, expected {len(expect)}; "
        f"first diff near {next((a for a, b in zip(values, sorted(expect)) if a != b), None)}"
    )
    # per-key ordering: within a partition key, payloads ascend
    per_key: dict[str, list[int]] = {}
    for pk, v in got:
        per_key.setdefault(pk, []).append(v)
    for pk, vs in per_key.items():
        assert vs == sorted(vs), f"shard-order violation for key {pk}"
    return {"messages": len(values), "keys": len(per_key)}


def _run_spark_pass(spark, stream: str, workdir: str, expect_total: int) -> list[int]:
    """Start (or resume) the kinesis_live → parquet pipeline against the
    shared checkpoint, poll the sink until ``expect_total`` distinct rows
    landed, stop, and return every payload value written so far. The
    parquet sink is used (not memory) because checkpoint RECOVERY is the
    thing under test and the memory sink does not support it."""
    from reactive_kinesis_spark.streaming.live_source import register_live_source

    register_live_source(spark)
    ckpt = os.path.join(workdir, "ckpt")
    out = os.path.join(workdir, "out")
    q = (
        spark.readStream.format("kinesis_live")
        .option("streamName", stream)
        .option("transport", "boto3")
        .option("endpointUrl", ENDPOINT)
        .option("region", REGION)
        .option("deaggregate", "true")
        .option("startingPosition", "trim_horizon")
        .load()
        .selectExpr("CAST(payload AS STRING) AS v")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.monotonic() + 120.0
        while time.monotonic() < deadline:
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            if n >= expect_total:
                break
            time.sleep(1.0)
    finally:
        q.stop()
        q.awaitTermination(30)
    return sorted(int(r.v) for r in spark.read.parquet(out).collect())


def consume_spark_leg(spark, stream: str, workdir: str) -> dict:
    vals = _run_spark_pass(spark, stream, workdir, N_MESSAGES)
    assert vals == list(range(N_MESSAGES)), (
        f"spark leg pass 1: {len(vals)} msgs, expected {N_MESSAGES}"
    )
    return {"first_pass": len(vals)}


def resume_spark_leg(spark, stream: str, workdir: str) -> dict:
    """Restart from the same checkpoint after more records were produced:
    the sink must end with every message EXACTLY once — the resumed query
    may only append the new ones (read position maintained across
    restarts — KinesisSourceGraphStageIntegrationSpec.scala:66-97)."""
    vals = _run_spark_pass(spark, stream, workdir, N_MESSAGES + N_EXTRA)
    expected = list(range(N_MESSAGES + N_EXTRA))
    assert vals == expected, (
        f"resume leg replayed or lost data: {len(vals)} rows in sink, "
        f"expected {len(expected)} distinct (dups/gaps near "
        f"{next((a for a, b in zip(vals, expected) if a != b), None)})"
    )
    return {"total_exactly_once": len(vals)}


def main() -> int:
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "test")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "test")
    if not _probe(ENDPOINT):
        print(
            f"Kinesis endpoint {ENDPOINT} unreachable.\n"
            "Start one with:  docker compose -f localstack/docker-compose.yml up -d\n"
            "or point RKS_LIVE_ENDPOINT at an existing endpoint.",
            file=sys.stderr,
        )
        return 2

    import tempfile

    from reactive_kinesis_spark.session import get_spark

    stream = f"rks-it-{uuid.uuid4().hex[:8]}"
    client = _client()
    client.create_stream(StreamName=stream, ShardCount=SHARDS)
    _wait_active(client, stream)
    summary: dict = {"endpoint": ENDPOINT, "stream": stream, "shards": SHARDS}
    spark = get_spark(app_name="rks-live-integration")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="rks_live_")
    try:
        produce_leg(spark, stream, 0, N_MESSAGES)
        summary["transport_leg"] = consume_transport_leg(
            stream, list(range(N_MESSAGES))
        )
        summary["spark_leg"] = consume_spark_leg(spark, stream, workdir)
        produce_leg(spark, stream, N_MESSAGES, N_EXTRA)
        summary["resume_leg"] = resume_spark_leg(spark, stream, workdir)
        summary["result"] = "PASS"
        print(json.dumps(summary, indent=2))
        return 0
    finally:
        try:
            client.delete_stream(StreamName=stream, EnforceConsumerDeletion=True)
        except Exception:
            pass


if __name__ == "__main__":
    sys.exit(main())
