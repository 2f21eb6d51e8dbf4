#!/usr/bin/env python
"""Same-session A/B: HDFS-backed vs RocksDB state store for the
stream-stream left-outer join (r10 VERDICT next-round #3).

Interleaved runs (H,R,H,R,...) so host drift cannot masquerade as a
provider effect; also checksums the output under each provider to prove
value identity.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from velib_lakehouse_spark.registry import QUERIES
from velib_lakehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(app_name="rocksdb-loj-probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    fn = QUERIES["streaming_join_left_outer"]

    def run(provider: str) -> tuple[float, int, int]:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", provider
        )
        spark.sparkContext.setJobDescription(f"loj:{provider.rsplit('.',1)[-1]}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: 20k 64-bit hashes overflow a long under ANSI
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        spark.catalog.clearCache()
        return round(dt, 3), agg["n"], agg["h"]

    res: dict[str, list] = {"hdfs": [], "rocks": []}
    sums: dict[str, set] = {"hdfs": set(), "rocks": set()}
    for _ in range(3):
        for key, prov in (("hdfs", HDFS), ("rocks", ROCKS)):
            dt, n, h = run(prov)
            res[key].append(dt)
            sums[key].add((n, h))
            print(f"{key}: {dt}s rows={n} hash={h}", flush=True)
    print("RESULT", {k: (min(v), v) for k, v in res.items()})
    print("CHECKSUMS", sums)
    assert sums["hdfs"] == sums["rocks"], "provider changed the result!"
    spark.stop()


if __name__ == "__main__":
    main()
