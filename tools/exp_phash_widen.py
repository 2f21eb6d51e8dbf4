#!/usr/bin/env python
"""Same-session interleaved A/D: current _phash_bits vs the repo's
standard narrow-scan widening (repartition(defaultParallelism, doc_id)
before the CPU-bound DCT explode). Identical bits asserted."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.operators import multimodal as M
from velib_lakehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(app_name="exp-phash2")
    spark.range(1000).selectExpr("sum(id)").collect()
    d = load_table(spark, SF_DIR, "documents")
    n = spark.sparkContext.defaultParallelism
    variants = {
        "A": lambda: M._phash_bits(spark, d),
        "D": lambda: M._phash_bits(spark, d.repartition(n, "doc_id")),
    }
    ref = None
    times = {k: [] for k in variants}
    for i in range(3):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            rows = fn().collect()
            dt = round(time.perf_counter() - t0, 3)
            got = {(r["doc_id"], r["bits"]) for r in rows}
            if ref is None:
                ref = got
            else:
                assert got == ref, f"variant {name} diverged!"
            times[name].append(dt)
            print(f"round{i} {name}: {dt}s n={len(got)}", flush=True)
            spark.catalog.clearCache()
    print("RESULT", {k: (min(v), v) for k, v in times.items()})
    spark.stop()


if __name__ == "__main__":
    main()
