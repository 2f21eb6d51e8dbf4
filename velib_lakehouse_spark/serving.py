"""Serving layer: the reference's API endpoints as Spark-backed functions.

The reference serves two analytical endpoints from a per-request DuckDB
over the lake (reference src/api.py:37-84 ``/alerts/critical``,
src/api.py:87-142 ``/health/pipeline``).  Here the same payloads are
produced by the Spark engine itself — each endpoint is a function
returning the JSON-able dict the FastAPI handler would emit, and
``build_app`` wires them onto FastAPI when it is installed (it is not in
this build, so the wiring is import-gated; the payload functions are
fully tested without it).

The driver-side Python post-aggregation the reference does (count-if
bands, src/api.py:73-74) is folded into the engine queries — the handler
only serializes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from velib_lakehouse_spark.operators.velib import alert_bands, health, sparkline


def critical_alerts_payload(spark: SparkSession, sf_dir: str) -> dict:
    """``/alerts/critical``: per-station sparklines + severity bands."""
    stations = [
        {
            "station_code": r.station_code,
            "current_bikes": r.current_bikes,
            "sparkline": list(r.sparkline_data),
        }
        for r in sparkline(spark, sf_dir).orderBy("current_bikes").collect()
    ]
    bands = alert_bands(spark, sf_dir).collect()[0]
    return {
        "stations": stations,
        "critical_count": bands.critical_count,
        "warning_count": bands.warning_count,
        "total_stations": bands.total_stations,
    }


def pipeline_health_payload(spark: SparkSession, sf_dir: str) -> dict:
    """``/health/pipeline``: expected-vs-observed reconciliation audit."""
    row = health(spark, sf_dir).collect()[0]
    return {
        "total_expected": row.total_expected,
        "active_stations": row.active_stations,
        "zombie_stations": row.zombie_stations,
        "latest_sync_ms": row.latest_sync_ms,
        "total_value": row.total_value,
        "status": "degraded" if row.zombie_stations > 0 else "healthy",
    }


def build_app(spark: SparkSession, sf_dir: str):
    """Mount the endpoints on FastAPI when available (reference
    src/api.py routes, same paths)."""
    try:
        from fastapi import FastAPI
    except ImportError as exc:  # pragma: no cover - not in this build
        raise ImportError(
            "fastapi is not installed; use the *_payload functions directly"
        ) from exc

    app = FastAPI(title="velib-lakehouse-spark")

    @app.get("/alerts/critical")
    def alerts_route():  # pragma: no cover - needs fastapi
        return critical_alerts_payload(spark, sf_dir)

    @app.get("/health/pipeline")
    def health_route():  # pragma: no cover - needs fastapi
        return pipeline_health_payload(spark, sf_dir)

    return app
