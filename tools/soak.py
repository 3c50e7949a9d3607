#!/usr/bin/env python
"""The reference's reliability test, engine-shaped, at FULL scale.

Reference protocol (README.md:631-648 + src/it/resources/sample.conf:10-22 +
SimpleKinesisConsumer.scala:52-121): send 5,000,000 sequential integer
messages through a 2-shard stream; the consumer verifies at every 150,000
message "pit stop" that the received set is contiguous and duplicate-free,
and logs records/sec; implied processing floor ≥1,000 msg/s/shard
(reference.conf:413-417,479-482).

Here: the same 5M × 2-shard pump through the ``kinesis_replay`` custom
DataSource with KCL-style paging (maxRecordsPerBatch = the kcl.maxRecords
default of 10,000), per-shard pit-stop checks from streaming aggregates, and
a final exact contiguity proof (count + min/max + first two moments pin the
multiset to {0..N/shards-1} per shard — no COUNT(DISTINCT) on streams).

Usage: python tools/soak.py [n_messages] [shards]   (defaults 5_000_000, 2)
Prints one JSON line; exits non-zero if contiguity fails.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PITSTOP = 150_000  # sample.conf:14 consumer.pitstopCount
PAGE = 10_000  # reference.conf:479-482 kcl.maxRecords default


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from bench import _event_frame
    from reactive_kinesis_spark.session import get_spark
    from reactive_kinesis_spark.streaming.replay_source import register_replay_source

    spark = get_spark(app_name="rks-soak")
    register_replay_source(spark)
    tmp = tempfile.mkdtemp(prefix="rks_soak_")
    src, ckpt, cursor = f"{tmp}/src", f"{tmp}/ckpt", f"{tmp}/cursor.json"
    os.makedirs(src)
    try:
        import pyarrow.parquet as pq

        base = _event_frame(spark, n, shards)
        for s in range(shards):
            sid = f"shardId-{s:012d}"
            stage = f"{tmp}/stage-{s}"
            (
                base.where(F.col("shard_id") == sid)
                .orderBy("sequence_number")
                .coalesce(1)
                .write.parquet(stage)
            )
            part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
            pq.write_table(
                pq.read_table(f"{stage}/{part}"),
                f"{src}/shard-{s:04d}.parquet",
                row_group_size=PAGE,
            )
            shutil.rmtree(stage)

        # shuffle partitions = shard count: every state-store partition
        # costs a commit per micro-batch; 32 partitions for a 2-shard
        # stream dominated the pipeline (measured 2.7x on the bench replay
        # leg — see bench._pump_and_score)
        spark.conf.set("spark.sql.shuffle.partitions", str(shards))
        seq = F.col("sequence_number").cast("long")
        agg = (
            spark.readStream.format("kinesis_replay")
            .option("path", src)
            .option("maxRecordsPerBatch", PAGE)
            .option("cursorPath", cursor)
            .load()
            .groupBy("shard_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min(seq).alias("min_seq"),
                F.max(seq).alias("max_seq"),
                F.sum(seq).alias("sum_seq"),
                # decimal(38,0): sum of squares overflows int64 for
                # p >~ 3.07M rows/shard (non-ANSI sum wraps silently, while
                # the Python-side closed form is an exact big int — spurious
                # contiguity failure). Decimal sum is exact to 38 digits.
                F.sum(seq.cast("decimal(38,0)") * seq).alias("sum_sq"),
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("soak")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        t0 = time.perf_counter()
        pitstops, next_pit = [], PITSTOP
        deadline = time.time() + 3600
        done = 0
        while time.time() < deadline:
            done = spark.sql("SELECT coalesce(sum(n),0) AS t FROM soak").collect()[0].t
            while done >= next_pit:
                dt = time.perf_counter() - t0
                pitstops.append({"msgs": next_pit, "rate": round(next_pit / dt, 1)})
                print(
                    f"# pit stop {next_pit:>9,d} msgs  {next_pit / dt:>9,.0f} msg/s",
                    file=sys.stderr,
                )
                next_pit += PITSTOP
            if done >= n:
                break
            time.sleep(0.1)
        q.stop()
        q.awaitTermination()
        dt = time.perf_counter() - t0
        rows = spark.sql("SELECT * FROM soak").collect()
        p = n // shards
        contiguous = len(rows) == shards and all(
            r.n == p
            and r.min_seq == 0
            and r.max_seq == p - 1
            and r.sum_seq == p * (p - 1) // 2
            and int(r.sum_sq) == (p - 1) * p * (2 * p - 1) // 6
            for r in rows
        )
        out = {
            "metric": "reliability_soak",
            "msgs": n,
            "shards": shards,
            "page_per_shard": PAGE,
            "pitstop_every": PITSTOP,
            "elapsed_sec": round(dt, 1),
            "msgs_per_sec": round(n / dt, 1),
            "msgs_per_sec_per_shard": round(n / dt / shards, 1),
            "floor_per_shard": 1000,
            "pitstops": len(pitstops),
            "contiguity_ok": contiguous,
        }
        print(json.dumps(out))
        return 0 if contiguous and done >= n else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
