#!/usr/bin/env python
"""Optimization measurement harness (guide §1; r14, reused in r15).

For each named query: one warm pass, then N timed runs of (a) the bench's
`.collect()` action and (b) the noop sink (`format("noop")` — computes every
column, §1.4), caches cleared before every timed run exactly like bench.py.
Also dumps `.explain("formatted")` to ``plans/<round>/<query>_<tag>.txt``.

Usage:
  python tools/opt_measure.py [--tag before|after] [--runs 3] [--plans-only]
                              [--round r15] [q01_pricing_summary ...]
With no query names: the full bench HEADLINE list.
Output: one JSON line per query on stdout + a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--round", default="r15")
    args = ap.parse_args()

    from bench import HEADLINE

    from reactive_kinesis_spark.queries import load_all
    from reactive_kinesis_spark.session import get_spark

    spark = get_spark(app_name="rks-opt-measure")
    registry = load_all()
    names = args.names or HEADLINE

    plans_dir = os.path.join(REPO, "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    # codegen/JIT warm-up outside any timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # host-speed calibration probe (bench.py's instrument): this box's
    # effective CPU speed oscillates; cross-session comparisons divide by it
    import numpy as np

    arr = np.random.default_rng(0).standard_normal((2048, 2048))
    probes = []
    for _ in range(5):
        t0 = time.perf_counter()
        (arr @ arr).sum()
        probes.append(time.perf_counter() - t0)
    print(json.dumps({"blas_probe_min": round(min(probes), 3)}), flush=True)

    out: dict[str, dict] = {}
    for name in names:
        qd = registry[name]
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        df = qd.fn(spark, SF_DIR)
        if not args.no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        if args.plans_only:
            continue
        try:
            qd.fn(spark, SF_DIR).collect()  # warm
            coll, noop, build = [], [], []
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qdf = qd.fn(spark, SF_DIR)
                build.append(time.perf_counter() - t0)
                qdf.collect()
                coll.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qd.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                noop.append(time.perf_counter() - t0)
            import statistics

            rec = {
                "collect_med": round(statistics.median(coll), 3),
                "noop_med": round(statistics.median(noop), 3),
                "build_med": round(statistics.median(build), 3),
                "collect_all": [round(x, 3) for x in coll],
                "noop_all": [round(x, 3) for x in noop],
            }
        except Exception as exc:  # noqa: BLE001
            rec = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    if not args.plans_only:
        total = sum(r.get("collect_med", 0) for r in out.values())
        print(
            json.dumps(
                {
                    "total_collect_med": round(total, 3),
                    "n": len(out),
                    "tag": args.tag,
                }
            )
        )


if __name__ == "__main__":
    main()
