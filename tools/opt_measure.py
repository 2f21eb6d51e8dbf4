#!/usr/bin/env python
"""Per-query optimization harness (rounds 10+).

For each named query: time N noop-sink runs (clearCache between, same
methodology as bench.py) and dump `.explain("formatted")` to
``plans/<round>/<name>_<tag>.txt``.

Usage: python tools/opt_measure.py [--round rNN] [--tag before|after]
       [--runs N] name...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velib_lakehouse_spark import registry
from velib_lakehouse_spark.session import get_spark

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", default="r11", dest="round_dir")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(app_name="opt-measure")
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    plan_dir = os.path.join(HERE, "plans", args.round_dir)
    os.makedirs(plan_dir, exist_ok=True)
    results = {}
    for name in args.names:
        fn = registry.QUERIES[name]
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        results[name] = samples
        print(f"{name}: min={min(samples)} samples={samples}", flush=True)
        if not args.no_plan:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
    print("SUMMARY " + " ".join(f"{k}={min(v)}" for k, v in results.items()))
    spark.stop()


if __name__ == "__main__":
    main()
