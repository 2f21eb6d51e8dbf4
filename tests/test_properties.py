"""Property-based invariants (SURVEY.md §5 strategy 4) via hypothesis.

Random inputs pin the invariants the fixed fixtures can't sweep:
ordering determinism of the collect idiom, partitioning-invariance of
the exact-sum convention, window-vs-pandas agreement for the history
enrichment.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from velib_lakehouse_spark.functions.collections import ordered_collect
from velib_lakehouse_spark.functions.exact import dec_sum
from velib_lakehouse_spark.functions.timeseries import net_flow

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),  # ts seconds
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_ordered_collect_matches_python_sort(spark, rows):
    data = [(i, int(ts), float(v)) for i, (ts, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, ts long, v double")
    got = df.agg(
        ordered_collect(F.col("v"), F.col("ts"), F.col("id")).alias("xs")
    ).collect()[0]["xs"]
    # ts order; ties (equal ts) break on insertion id, matching enumerate
    expected = [v for ts, i, v in sorted((int(ts), i, float(v))
                                         for i, (ts, v) in enumerate(rows))]
    assert got == expected


@given(rows=st.lists(
    st.floats(min_value=-1e7, max_value=1e7, allow_nan=False,
              allow_infinity=False),
    min_size=1, max_size=60,
))
@settings(**SETTINGS)
def test_dec_sum_is_partitioning_invariant(spark, rows):
    data = [(float(v),) for v in rows]
    df = spark.createDataFrame(data, "v double")
    one = df.repartition(1).agg(dec_sum("v", "s")).collect()[0]["s"]
    many = df.repartition(7).agg(dec_sum("v", "s")).collect()[0]["s"]
    assert one == many  # exact equality, not approx


@given(rows=st.lists(
    st.integers(min_value=-10**6, max_value=10**6),
    min_size=0, max_size=30,
))
@settings(**SETTINGS)
def test_csv_scaled_is_lossless_for_centi_grid_values(spark, rows):
    """csv_scaled(col, 100) must reproduce the exact centi-integers even
    after the values round-trip through double storage (x/100.0 is the
    worst case the events fixture exercises)."""
    from velib_lakehouse_spark.functions.collections import csv_scaled

    data = [[[c / 100.0 for c in rows]]]
    df = spark.createDataFrame(data, "xs array<double>")
    got = df.select(csv_scaled("xs", 100).alias("s")).collect()[0]["s"]
    assert got == ",".join(str(c) for c in rows)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_net_flow_matches_pandas_diff(spark, rows):
    data = [(i, int(ts), float(v)) for i, (ts, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, ts long, v double")
    got = (
        df.select("id", net_flow(F.lit("k").cast("string"), "ts", "id", "v")
                  .alias("nf"))
        .orderBy("id")
        .collect()
    )
    pdf = pd.DataFrame(data, columns=["id", "ts", "v"]).sort_values(["ts", "id"])
    pdf["nf"] = pdf["v"].diff()
    expected = pdf.sort_values("id")["nf"].tolist()
    for (r, e) in zip(got, expected):
        if pd.isna(e):
            assert r.nf is None
        else:
            assert r.nf == e


@given(rows=st.lists(
    st.integers(min_value=0, max_value=2 * 10**8),  # 2-decimal cents
    min_size=1, max_size=40,
))
@settings(**SETTINGS)
def test_micro_sum_2dp_matches_python_half_up(spark, rows):
    """The fixed-point fast path, its wide (decimal-accumulator) twin,
    and pure-Python integer arithmetic must all agree — and the 2dp
    half-up step must be exact in integer math (ADVICE r2: the earlier
    floor((s+50)/100.0) double division breaks past 2^53)."""
    from velib_lakehouse_spark.functions.exact import (
        micro_sum_2dp,
        micro_sum_2dp_wide,
    )

    micros = [c * 100 for c in rows]  # scale-4 units of 2-decimal values
    df = spark.createDataFrame([(m,) for m in micros], "m long")
    fast = df.repartition(5).agg(micro_sum_2dp(F.col("m"), "s")).collect()[0]["s"]
    wide = df.repartition(3).agg(
        micro_sum_2dp_wide(F.col("m"), "s")
    ).collect()[0]["s"]
    expected = float((sum(micros) + 50) // 100) / 100.0
    assert fast == expected
    assert wide == expected


def test_micro_sum_2dp_exact_past_2pow53(spark):
    """Sums beyond 2^53 keep exact cents (the double-division bug this
    guards against loses the low bits silently)."""
    from velib_lakehouse_spark.functions.exact import (
        micro_sum_2dp,
        micro_sum_2dp_wide,
    )

    # 1e9-unit rows x 10_000_019 would be slow; instead use few huge
    # legal long values whose sum is > 2^53 and NOT a multiple of 2^k,
    # so double division would visibly round.
    micros = [9_007_199_254_740_993, 9_007_199_254_740_991, 123_457]
    s = sum(micros)
    assert s > 2**53
    df = spark.createDataFrame([(m,) for m in micros], "m long")
    expected = float((s + 50) // 100) / 100.0
    got = df.agg(micro_sum_2dp(F.col("m"), "s")).collect()[0]["s"]
    wide = df.agg(micro_sum_2dp_wide(F.col("m"), "s")).collect()[0]["s"]
    assert got == expected
    assert wide == expected
