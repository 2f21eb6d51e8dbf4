#!/usr/bin/env python
"""Pre-flight the driver's CORRECTNESS gate at sf0.01.

pytest's oracle-parity suite runs at sf0.001 for speed; the driver runs
at sf0.01.  Scale-dependent divergence (quantile interpolation, caps,
rounding at bigger sums, LSH band occupancy) would only surface in the
driver's own run — too late.  This script runs EVERY registered oracle
query at sf0.01 through the same compare used in tests and prints one
line per failure.

Usage: python tools/verify_sf001.py [first_n | name1 name2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velib_lakehouse_spark import registry
from velib_lakehouse_spark.session import get_spark
from tests.oracle_harness import compare

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    argv = sys.argv[1:]
    if argv and not argv[0].isdigit():
        names = argv
        unknown = [n for n in names if n not in registry.QUERIES]
        if unknown:
            sys.exit(f"unknown queries: {unknown}")
    else:
        first_n = int(argv[0]) if argv else len(registry.QUERIES)
        names = list(registry.QUERIES)[:first_n]
    spark = get_spark(app_name="verify-sf001")
    n_fail = 0
    t_start = time.time()
    for i, name in enumerate(names):
        sql = registry.ORACLE.get(name)
        t0 = time.time()
        try:
            df = registry.QUERIES[name](spark, SF_DIR)
            if sql is None:
                n = df.count()
                status = f"rows-only ({n} rows)"
                problems = []
            else:
                problems = compare(df, sql, SF_DIR)
                status = "OK" if not problems else "FAIL"
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {e!r}"[:300]]
            status = "ERR"
        dt = time.time() - t0
        if problems:
            n_fail += 1
            print(f"[{i+1}/{len(names)}] {name}: {status} ({dt:.1f}s)")
            for p in problems[:4]:
                print(f"    {p[:500]}")
        else:
            print(f"[{i+1}/{len(names)}] {name}: {status} ({dt:.1f}s)")
        sys.stdout.flush()
    print(f"DONE: {len(names) - n_fail}/{len(names)} ok in {time.time()-t_start:.0f}s")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
