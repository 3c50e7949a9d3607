"""Capstone integration test: the full LLM-ingest pipeline, streaming.

stream source → KPL deaggregation → payload decode → text stats →
quality/tolerance gate (DLQ) → in-batch exact dedup → exactly-once sink,
with a crash-restart in the middle. Every stage is an engine operator;
nothing is test-local logic.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from reactive_kinesis_spark.operators import text as T
from reactive_kinesis_spark.schemas import EVENT_SCHEMA
from reactive_kinesis_spark.streaming import file_stream_source
from reactive_kinesis_spark.streaming.deaggregate import aggregate_records, deaggregate
from reactive_kinesis_spark.streaming.sink import idempotent_foreach_batch
from reactive_kinesis_spark.streaming.tolerance import split_by_predicate
from tests.test_streaming import T0


def _doc_events(spark, docs: list[tuple[int, str]], start_seq=0):
    rows = [
        (
            "ingest",
            f"shardId-{i % 2:012d}",
            str(i % 2),
            f"{start_seq + i:020d}",
            0,
            text.encode(),
            T0 + dt.timedelta(seconds=i),
        )
        for i, (doc_id, text) in enumerate(docs)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_llm_ingest_pipeline_with_restart(spark, tmp_path):
    src, out, dlq, ckpt = (str(tmp_path / d) for d in ("src", "out", "dlq", "ckpt"))

    good = [(i, f"document number {i} with plenty of useful words the and of in a") for i in range(20)]
    dupes = [(100 + i, good[i][1]) for i in range(5)]          # exact dups of good docs
    junk = [(200 + i, "x") for i in range(2)]                  # fails quality gate
    batch1 = _doc_events(spark, good[:10] + junk)
    batch2 = _doc_events(spark, good[10:] + dupes, start_seq=1000)

    # producer side: KPL-style aggregation (what arrives on the wire)
    aggregate_records(batch1, max_size=4096).write.parquet(src, mode="append")

    def run():
        stream = deaggregate(file_stream_source(spark, src))
        docs = stream.select(
            F.col("sequence_number"),
            F.col("partition_key"),
            F.col("approximate_arrival_timestamp"),
            F.col("payload").cast("string").alias("text"),
        )
        scored = docs.withColumn("quality", T.quality_score("text")).withColumn(
            "fp", T.fingerprint("text")
        )
        # cross-batch exact dedup: fingerprint state lives in the checkpoint,
        # so replays/dups drop even across the restart below
        from reactive_kinesis_spark.streaming.windows import dedup_within_watermark

        deduped = dedup_within_watermark(scored, keys=("fp",), watermark="1 hour")

        def batch_fn(bdf, bid):
            ok, bad = split_by_predicate(bdf, F.col("quality") > 0.4)
            bad.write.mode("append").parquet(dlq)
            idempotent_foreach_batch(out)(ok, bid)

        q = (
            deduped.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got1 = spark.read.parquet(out)
    assert got1.count() == 10  # 10 good docs, junk diverted
    # the two junk docs are byte-identical → dedup (upstream of the gate)
    # collapses them; exactly one reaches the DLQ
    assert spark.read.parquet(dlq).count() == 1

    # "restart": new data lands (incl. exact dups), same checkpoint
    aggregate_records(batch2, max_size=4096).write.parquet(src, mode="append")
    run()
    got2 = spark.read.parquet(out)
    # batch 2 adds 10 new good docs; its 5 dup payloads (copies of batch-1
    # docs) are dropped by the checkpointed dedup state across the restart
    texts = [r.text for r in got2.collect()]
    assert len(texts) == 20
    assert sorted(texts) == sorted(t for _, t in good)
