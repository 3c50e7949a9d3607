#!/usr/bin/env python
"""Round-15 arm sweep for the derived scan-repartition size: interleaved
same-session A/B over SPARK_GRAFT_SCAN_PARTITION_BYTES values (plus the
r14 raw-defaultParallelism shape as target=1), median of 3 per arm, so the
host's oscillating CPU speed cancels out of the comparison."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: (label, SPARK_GRAFT_SCAN_PARALLELIZE, SPARK_GRAFT_SCAN_PARTITION_BYTES)
ARMS = [
    ("r14_32p", "1", "1"),          # ceil(bytes/1) caps at defaultParallelism
    ("t128k", "1", "131072"),
    ("t256k", "1", "262144"),
    ("t512k", "1", "524288"),
]


def main() -> None:
    names = sys.argv[1:]
    from bench import HEADLINE

    from reactive_kinesis_spark import tables
    from reactive_kinesis_spark.queries import load_all
    from reactive_kinesis_spark.session import get_spark

    spark = get_spark(app_name="rks-opt-ab-target")
    registry = load_all()
    names = names or HEADLINE
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(name: str, flag: str, target: str) -> float:
        os.environ["SPARK_GRAFT_SCAN_PARALLELIZE"] = flag
        os.environ["SPARK_GRAFT_SCAN_PARTITION_BYTES"] = target
        tables.clear_table_memo()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).collect()
        return time.perf_counter() - t0

    totals = {a: 0.0 for a, _, _ in ARMS}
    for name in names:
        try:
            for _, flag, target in ARMS:
                run(name, flag, target)  # warm every plan shape
            res = {a: [] for a, _, _ in ARMS}
            for _ in range(3):
                for a, flag, target in ARMS:
                    res[a].append(run(name, flag, target))
            out = {a: round(statistics.median(v), 3) for a, v in res.items()}
            for a in totals:
                totals[a] += out[a]
            print(json.dumps({name: out}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({name: {"err": str(exc)[:200]}}), flush=True)
    print(json.dumps({"totals": {a: round(v, 2) for a, v in totals.items()}}))


if __name__ == "__main__":
    main()
