"""Streaming behaviour tests (SURVEY.md §5 strategy 3).

AvailableNow + checkpoint gives run-to-completion semantics that are
deterministic and testable (the reference's own design choice,
reference src/assets/silver.py:62-63): assert the partitioned layout,
and that restarting from the same checkpoint is idempotent (T2).
"""

from __future__ import annotations

import os
import tempfile

from velib_lakehouse_spark.streaming.silver import run_silver_stream
from tests.conftest import SF_DIR


def test_silver_stream_partitioned_layout_and_idempotent_restart(spark):
    out = tempfile.mkdtemp(prefix="t_silver_out_")
    ckpt = tempfile.mkdtemp(prefix="t_silver_ckpt_")

    meta = run_silver_stream(spark, SF_DIR, out, ckpt)
    first = spark.read.parquet(out)
    n1 = first.count()
    expected = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert n1 == expected > 0
    assert meta["rows_processed"] == expected  # T5 progress introspection

    # hive layout: date=YYYY-MM-DD partition directories
    parts = [d for d in os.listdir(out) if d.startswith("date=")]
    assert len(parts) > 1
    assert all(len(d.split("=")[1]) == 10 for d in parts)

    # restart from the same checkpoint: nothing reprocessed
    meta2 = run_silver_stream(spark, SF_DIR, out, ckpt)
    assert spark.read.parquet(out).count() == n1
    assert meta2["rows_processed"] == 0

    # schema contract of the silver table
    assert set(first.columns) == {
        "event_id",
        "station_code",
        "k",
        "event_type",
        "bikes_available",
        "last_reported",
        "date",
    }


def test_streaming_sessions_agree_with_batch(spark):
    """Every session the stream closes must exist identically in the
    batch sessionization (same gap): same (station, start, end, count)."""
    from velib_lakehouse_spark.operators.relational2 import sessionize_events
    from velib_lakehouse_spark.streaming.silver import streaming_session_windows

    streamed = {
        (r.station_code, r.session_start_ms, r.n_events)
        for r in streaming_session_windows(spark, SF_DIR).collect()
    }
    assert streamed  # the 30-day fixture must close plenty of sessions
    batch = {
        (r.user_id, r.session_start_ms, r.n_events)
        for r in sessionize_events(spark, SF_DIR).collect()
    }
    assert streamed <= batch
