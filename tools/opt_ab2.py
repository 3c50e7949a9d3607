#!/usr/bin/env python
"""3-arm interleaved A/B: off / keys-v1 (join keys) / keys-v2 (group keys),
single session so host-speed drift cancels."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

V1 = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
V2 = {
    "lineitem": "l_partkey",
    "orders": "o_custkey",
    "events": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

QUERIES = [
    "q01_pricing_summary",
    "q03_join_agg_topk",
    "q04_star_join",
    "q08_window_topk_per_group",
    "q12_set_ops",
    "q17_events_hourly_window",
    "q19_events_asof_join",
    "q20_events_sessions",
    "q37_range_join",
    "q45_correlated_subquery",
    "q50_stats_moments",
    "q51_percentiles",
]


def main() -> None:
    from reactive_kinesis_spark import tables
    from reactive_kinesis_spark.queries import load_all
    from reactive_kinesis_spark.session import get_spark

    spark = get_spark(app_name="rks-opt-ab2")
    registry = load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    names = sys.argv[1:] or QUERIES

    def run(name: str, flag: str, keys: dict) -> float:
        os.environ["SPARK_GRAFT_SCAN_PARALLELIZE"] = flag
        tables._FACT_SCAN_KEYS.clear()
        tables._FACT_SCAN_KEYS.update(keys)
        tables._TABLE_MEMO.clear()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).collect()
        return time.perf_counter() - t0

    arms = [("off", "0", V1), ("v1", "1", V1), ("v2", "1", V2)]
    for name in names:
        try:
            for _, flag, keys in arms:
                run(name, flag, keys)  # warm each plan shape
            res = {a: [] for a, _, _ in arms}
            for _ in range(3):
                for a, flag, keys in arms:
                    res[a].append(run(name, flag, keys))
            out = {a: round(statistics.median(v), 3) for a, v in res.items()}
            out["raw"] = {a: [round(x, 3) for x in v] for a, v in res.items()}
            print(json.dumps({name: out}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({name: {"err": str(exc)[:200]}}), flush=True)


if __name__ == "__main__":
    main()
