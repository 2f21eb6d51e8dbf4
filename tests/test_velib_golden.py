"""Golden pipeline tests on hand-built fixtures (SURVEY.md §5 strategy 2).

Tiny series with hand-computable expectations pin the reconstructed
history semantics (net_flow/moving_avg, FIXTURES.md §A3) and the alert
business rules: drain-to-zero alerts, refilling stations don't, the
bikes<threshold boundary is exclusive, NULL trend never alerts, dedup
tie-breaks deterministically.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from velib_lakehouse_spark.functions.timeseries import (
    latest_per_key,
    net_flow,
    trailing_avg_seconds,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(eid, sc, T0 + dt.timedelta(minutes=m), float(v)) for eid, sc, m, v in rows],
        "event_id long, station_code string, ts timestamp, value double",
    )


def test_net_flow_lag_and_null_first_row(spark):
    df = _mk(spark, [(1, "a", 0, 10), (2, "a", 5, 7), (3, "a", 10, 9), (4, "b", 0, 5)])
    out = df.withColumn(
        "nf", net_flow("station_code", "ts", "event_id", "value")
    ).orderBy("event_id")
    flows = [r.nf for r in out.collect()]
    assert flows == [None, -3.0, 2.0, None]


def test_trailing_avg_range_frame_inclusive_boundary(spark):
    # 12:00=10, 12:30=20, 13:00=30: at 13:00 the 1h frame includes 12:00
    # (RANGE is inclusive at both ends) -> avg(10,20,30)=20
    df = _mk(spark, [(1, "a", 0, 10), (2, "a", 30, 20), (3, "a", 60, 30)])
    out = df.withColumn(
        "ma", trailing_avg_seconds("station_code", "ts", "value", 3600)
    ).orderBy("event_id")
    assert [r.ma for r in out.collect()] == [10.0, 15.0, 20.0]
    # one second past the hour drops the first reading
    df2 = _mk(spark, [(1, "a", 0, 10), (3, "a", 61, 30)])
    out2 = df2.withColumn(
        "ma", trailing_avg_seconds("station_code", "ts", "value", 3600)
    ).orderBy("event_id")
    assert [r.ma for r in out2.collect()] == [10.0, 30.0]


def test_dedup_latest_tiebreak(spark):
    # two readings at the identical timestamp: highest event_id wins
    df = _mk(spark, [(1, "a", 0, 10), (2, "a", 0, 20), (3, "b", 0, 1)])
    out = latest_per_key(df, "station_code", "ts", "event_id")
    got = {r.station_code: (r.event_id, r.value) for r in out.collect()}
    assert got == {"a": (2, 20.0), "b": (3, 1.0)}


@pytest.mark.parametrize(
    "series,expect_alert,expect_level",
    [
        # monotone drain to zero -> CRITICAL (value<10, trend<=0)
        ([(1, 0, 30), (2, 30, 10), (3, 60, 0)], True, "CRITICAL_EMPTY"),
        # low but refilling (trend>0) -> no alert
        ([(1, 0, 10), (2, 30, 20), (3, 60, 40)], False, None),
        # exactly at the threshold -> no alert (strict <)
        ([(1, 0, 60), (2, 30, 50), (3, 60, 50.0)], False, None),
        # low-ish, flat trend -> WARNING
        ([(1, 0, 30), (2, 30, 30), (3, 60, 30)], True, "WARNING_LOW"),
        # single reading: NULL trend never alerts (pinned null policy)
        ([(1, 0, 5)], False, None),
    ],
)
def test_alert_rules(spark, series, expect_alert, expect_level):
    from velib_lakehouse_spark.operators.velib import ALERT_MAX, CRITICAL_MAX

    df = _mk(spark, [(eid, "s", m, v) for eid, m, v in series])
    h = df.withColumn("nf", net_flow("station_code", "ts", "event_id", "value"))
    latest = latest_per_key(h, "station_code", "ts", "event_id")
    alerts = latest.filter(
        (F.col("value") < ALERT_MAX) & (F.col("nf") <= 0)
    ).withColumn(
        "level",
        F.when(F.col("value") < CRITICAL_MAX, "CRITICAL_EMPTY").otherwise(
            "WARNING_LOW"
        ),
    )
    rows = alerts.collect()
    assert bool(rows) == expect_alert
    if expect_alert:
        assert rows[0].level == expect_level
