#!/usr/bin/env python
"""A/B the deficient-scan repartition (SPARK_GRAFT_SCAN_PARALLELIZE) per
query inside ONE session, so the host's oscillating CPU speed cancels.
Interleaved runs: off,on,off,on,... median each arm."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from bench import HEADLINE

    from reactive_kinesis_spark import tables
    from reactive_kinesis_spark.queries import load_all
    from reactive_kinesis_spark.session import get_spark

    spark = get_spark(app_name="rks-opt-ab")
    registry = load_all()
    names = names or HEADLINE
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(name: str, flag: str) -> float:
        os.environ["SPARK_GRAFT_SCAN_PARALLELIZE"] = flag
        tables._TABLE_MEMO.clear()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).collect()
        return time.perf_counter() - t0

    for name in names:
        try:
            run(name, "0")  # warm both plan shapes
            run(name, "1")
            offs, ons = [], []
            for _ in range(3):
                offs.append(run(name, "0"))
                ons.append(run(name, "1"))
            off_m = statistics.median(offs)
            on_m = statistics.median(ons)
            print(
                json.dumps(
                    {
                        name: {
                            "off": round(off_m, 3),
                            "on": round(on_m, 3),
                            "delta": round(on_m - off_m, 3),
                            "offs": [round(x, 3) for x in offs],
                            "ons": [round(x, 3) for x in ons],
                        }
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({name: {"err": str(exc)[:200]}}), flush=True)


if __name__ == "__main__":
    main()
