#!/usr/bin/env python
"""A/B the r15 size-gated LSH signature persist inside one session:
arm 'gate' = default (persist skipped below SPARK_GRAFT_LSH_PERSIST_MIN_ROWS),
arm 'always' = threshold 1 (r14 behavior: always persist).
Interleaved, median of 3 per arm."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ARMS = [("gate", None), ("always", "1")]

QUERIES = [
    "q30_embedding_ann_lsh",
    "q42_embedding_neardup",
    "q63_embedding_neardup_clusters",
    "q60_dedup_clusters",
    "q100_ann_lsh_recall",
    "q190_ann_lsh_derived",
    "q29_embedding_cosine_topk",
    "q148_semantic_dedup",
]


def main() -> None:
    from reactive_kinesis_spark import tables
    from reactive_kinesis_spark.queries import load_all
    from reactive_kinesis_spark.session import get_spark

    spark = get_spark(app_name="rks-opt-ab-persist")
    registry = load_all()
    names = sys.argv[1:] or QUERIES
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(name: str, thresh: str | None) -> float:
        if thresh is None:
            os.environ.pop("SPARK_GRAFT_LSH_PERSIST_MIN_ROWS", None)
        else:
            os.environ["SPARK_GRAFT_LSH_PERSIST_MIN_ROWS"] = thresh
        tables.clear_table_memo()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).collect()
        return time.perf_counter() - t0

    totals = {a: 0.0 for a, _ in ARMS}
    for name in names:
        try:
            for _, thresh in ARMS:
                run(name, thresh)
            res = {a: [] for a, _ in ARMS}
            for _ in range(3):
                for a, thresh in ARMS:
                    res[a].append(run(name, thresh))
            out = {a: round(statistics.median(v), 3) for a, v in res.items()}
            for a in totals:
                totals[a] += out[a]
            print(json.dumps({name: out}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({name: {"err": str(exc)[:200]}}), flush=True)
    print(json.dumps({"totals": {a: round(v, 2) for a, v in totals.items()}}))


if __name__ == "__main__":
    main()
