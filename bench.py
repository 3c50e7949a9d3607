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
#: trigram-Jaccard, cosine top-k, ANN, text stats).
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
]


def main() -> None:
    from reactive_kinesis_spark.queries import load_all
    from reactive_kinesis_spark.session import get_spark

    spark = get_spark(app_name="rks-bench")
    registry = load_all()

    # JVM/codegen warmup outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

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
            }
        )
    )


if __name__ == "__main__":
    main()
