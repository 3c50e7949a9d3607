#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Timing = full query execution to driver-side collect (aggregated outputs are
small; the work measured is scan+shuffle+agg/join, which is what scales).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries: one per major operator family (scan-agg, join-agg,
#: star join, window, set-op, event window, as-of, exact dedup, MinHash-LSH,
#: trigram-Jaccard, cosine top-k, ANN, text stats, correlated subquery,
#: statistical moments, exact percentiles).
HEADLINE = [
    "q01_pricing_summary",
    "q03_join_agg_topk",
    "q04_star_join",
    "q08_window_topk_per_group",
    "q12_set_ops",
    "q17_events_hourly_window",
    "q19_events_asof_join",
    "q20_events_sessions",
    "q21_dedup_exact",
    "q22_dedup_ngram_jaccard",
    "q23_dedup_minhash_lsh",
    "q25_text_stats_by_lang",
    "q29_embedding_cosine_topk",
    "q30_embedding_ann_lsh",
    "q32_media_decode",
    "q37_range_join",
    "q45_correlated_subquery",
    "q50_stats_moments",
    "q51_percentiles",
]


def main() -> None:
    from reactive_kinesis_spark.queries import load_all
    from reactive_kinesis_spark.session import get_spark

    spark = get_spark(app_name="rks-bench")
    registry = load_all()

    # JVM/codegen warmup outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # One untimed warm pass per query: first execution pays one-time JIT,
    # whole-stage-codegen compilation, and file-listing costs (2-4s each
    # locally) that a long-lived cluster amortizes to zero — steady-state
    # latency is what scales to the 100 TB deployment.
    for name in HEADLINE:
        registry[name].fn(spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        qd = registry[name]
        t0 = time.perf_counter()
        rows = qd.fn(spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({len(rows)} rows)", file=sys.stderr)

    streaming = _streaming_throughput(spark)
    print(f"# streaming: {streaming['msgs_per_sec']:.0f} msg/s", file=sys.stderr)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "streaming": streaming,
            }
        )
    )


def _streaming_throughput(spark, n: int = 400_000, shards: int = 4) -> dict:
    """Reliability-test analog (reference sample.conf:10-22 pumps 5M
    sequential ints through 2 shards; floor = 1,000 msg/s/shard,
    reference.conf:413-417,479-482): pump ``n`` sequential integer payloads
    through source → per-shard ordering → count, verify per-shard
    contiguity, report end-to-end msg/s."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from reactive_kinesis_spark.streaming import file_stream_source

    tmp = tempfile.mkdtemp(prefix="rks_bench_stream_")
    src, ckpt = f"{tmp}/src", f"{tmp}/ckpt"
    try:
        (
            spark.range(n)
            .select(
                F.lit("bench").alias("stream_name"),
                F.concat(F.lit("shardId-"), F.lpad((F.col("id") % shards).cast("string"), 12, "0")).alias("shard_id"),
                (F.col("id") % shards).cast("string").alias("partition_key"),
                F.lpad((F.col("id") / shards).cast("long").cast("string"), 20, "0").alias("sequence_number"),
                F.lit(0).cast("long").alias("sub_sequence_number"),
                F.col("id").cast("string").cast("binary").alias("payload"),
                F.current_timestamp().alias("approximate_arrival_timestamp"),
            )
            .repartition(shards)
            .write.parquet(src)
        )
        t0 = time.perf_counter()
        stream = file_stream_source(spark, src)
        seq = F.col("sequence_number").cast("long")
        agg = stream.groupBy("shard_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.min(seq).alias("min_seq"),
            F.max(seq).alias("max_seq"),
            F.sum(seq).alias("sum_seq"),
            F.sum(seq * seq).alias("sum_sq"),
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("bench_stream")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        rows = spark.sql("SELECT * FROM bench_stream").collect()
        p = n // shards
        # contiguity without COUNT(DISTINCT) (unsupported on streams):
        # count + min/max + first two moments pin the multiset to exactly
        # {0..p-1} — any duplicate-for-missing swap shifts sum or sum_sq.
        contiguous = len(rows) == shards and all(
            r.n == p
            and r.min_seq == 0
            and r.max_seq == p - 1
            and r.sum_seq == p * (p - 1) // 2
            and r.sum_sq == (p - 1) * p * (2 * p - 1) // 6
            for r in rows
        )
        return {
            "msgs": n,
            "shards": shards,
            "msgs_per_sec": round(n / dt, 1),
            "contiguity_ok": contiguous,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
