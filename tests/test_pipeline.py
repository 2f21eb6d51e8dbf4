"""End-to-end medallion integration: one call, bronze -> serving."""

from __future__ import annotations

import os

from velib_lakehouse_spark.pipeline import run_medallion
from velib_lakehouse_spark.sources.snapshots import list_versions, read_snapshot
from tests.conftest import SF_DIR


def test_medallion_end_to_end(spark, tmp_path):
    lake = str(tmp_path / "lake")
    meta = run_medallion(spark, SF_DIR, lake, retention_min_date="2024-01-10")

    expected_rows = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert meta["silver_rows"] == expected_rows
    assert meta["gold_version"] == 0
    assert meta["alerts"] >= meta["critical"] >= 0
    assert meta["partitions_retired"] > 0

    # silver landed partitioned, with old partitions retired
    silver_dir = os.path.join(lake, "silver", "velib_stats")
    parts = [d for d in os.listdir(silver_dir) if d.startswith("date=")]
    assert parts and all(d.split("=")[1] >= "2024-01-10" for d in parts)

    # gold is a committed snapshot with the alert schema
    gold = read_snapshot(spark, meta["gold_table"])
    assert set(gold.columns) == {
        "station_code",
        "bikes_available",
        "net_flow",
        "moving_avg_1h",
        "last_reported",
        "alert_level",
    }
    levels = {r.alert_level for r in gold.select("alert_level").distinct().collect()}
    assert levels <= {"CRITICAL_EMPTY", "WARNING_LOW"}

    # a second run: streaming reprocesses nothing, gold gets version 1
    meta2 = run_medallion(spark, SF_DIR, lake)
    assert meta2["silver_rows"] == 0  # checkpoint made the restart a no-op
    assert meta2["gold_version"] == 1
    assert list_versions(meta["gold_table"]) == [0, 1]
    # both gold versions remain queryable (time travel)
    assert read_snapshot(spark, meta["gold_table"], version=0).count() >= 0
