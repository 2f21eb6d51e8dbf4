"""The reference's query semantics, re-expressed on the ``events`` table.

Column mapping (FIXTURES.md §B): ``user_id`` ≈ station_code, ``value`` ≈
bikes_available, ``ts`` ≈ last_reported, ``props`` ≈ raw JSON payload.
Thresholds are rescaled to the events value domain (0..~200):
``bikes <= 5`` -> ``value <= 60``, ``bikes < 3`` -> ``value < 50``,
``bikes == 0`` -> ``value < 10``.

Determinism rules (SURVEY.md §7 hard parts):
* no wall-clock — every time cutoff is derived from max(ts) in the data;
* every window order includes a unique tiebreak (event_id);
* timestamps are emitted as epoch-millis BIGINT; dates as 'YYYY-MM-DD'
  strings; double aggregates go through functions/exact.py.

Scale notes: each query shuffles at most once per distinct key
(station), dimension joins are broadcast, and the time filter lands on
the scan (predicate pushdown) so a date-partitioned production layout
would partition-prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.collections import csv_scaled, ordered_collect
from velib_lakehouse_spark.functions.exact import dec_sum
from velib_lakehouse_spark.functions.timeseries import (
    latest_per_key,
    net_flow,
    trailing_avg_seconds,
)

# Rescaled business-rule thresholds (events.value plays bikes_available).
TARGET_MAX = 60.0  # reference: gold scan keeps bikes <= 5 (src/api.py:45)
ALERT_MAX = 50.0  # reference: bikes < 3 (src/assets/velib_alerte.py:61)
CRITICAL_MAX = 10.0  # reference: bikes == 0 (src/api.py:73)


def silver_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze->silver parse+derive (reference src/assets/silver.py:40-49).

    JSON payload decode (P1: from_json + projection), timestamp
    derivation (P2: to_timestamp) and partition-date derivation (P3:
    to_date).  ``props`` plays the raw Kafka value; the extracted ``k``
    plays the typed payload fields.  Pure map-side — no shuffle.
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("event_id"),
        F.col("user_id").alias("station_code"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.col("event_type"),
        F.col("value").alias("bikes_available"),
        F.unix_millis("ts").alias("last_reported_ms"),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("date"),
    )


def history_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reconstructed ``velib_stats_history_silver`` (SURVEY.md §2.9).

    Renames + per-station ``net_flow`` (lag, W3) + trailing 1h moving
    average (RANGE frame over epoch seconds, W4).  Both windows share one
    hash partitioning on station_code: a single shuffle feeds both.
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").alias("station_code"),
        F.col("value").alias("bikes_available"),
        net_flow("user_id", "ts", "event_id", "value").alias("net_flow"),
        trailing_avg_seconds("user_id", "ts", "value", 3600).alias("moving_avg_1h"),
        F.unix_millis("ts").alias("last_reported_ms"),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("date"),
    )


def dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-to-latest per station (W1; reference src/assets/velib_alerte.py:45-48)."""
    e = load_table(spark, sf_dir, "events")
    d = latest_per_key(e, "user_id", "ts", "event_id")
    return d.select(
        F.col("user_id").alias("station_code"),
        F.col("value").alias("bikes_available"),
        F.unix_millis("ts").alias("last_reported_ms"),
    )


def alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gold-building query Q3 (reference src/assets/velib_alerte.py:19-75).

    history (lag over full data) -> last-4h time filter (P4, cutoff
    derived from max(ts), never wall clock) -> dedup-to-latest (W1) ->
    business rule (P5: bikes<thr AND trend<=0; NULL trend non-alerting)
    -> alert level (P6: when/otherwise).  The 1-row max(ts) side is
    broadcast, so the only shuffle is the station window.
    """
    e = load_table(spark, sf_dir, "events")
    h = e.withColumn("net_flow", net_flow("user_id", "ts", "event_id", "value"))
    cutoff = e.agg(F.max("ts").alias("max_ts"))
    recent = (
        h.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 4 HOURS"))
        .drop("max_ts")
    )
    latest = latest_per_key(recent, "user_id", "ts", "event_id")
    return (
        latest.filter((F.col("value") < ALERT_MAX) & (F.col("net_flow") <= 0))
        .select(
            F.col("user_id").alias("station_code"),
            F.col("value").alias("bikes_available"),
            F.col("net_flow"),
            F.unix_millis("ts").alias("last_reported_ms"),
            F.when(F.col("value") < CRITICAL_MAX, "CRITICAL_EMPTY")
            .otherwise("WARNING_LOW")
            .alias("alert_level"),
        )
    )


def sparkline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving query Q1 ``/alerts/critical`` (reference src/api.py:37-84).

    target stations (latest value <= threshold) -> left-semi join of
    history onto targets (J2) -> top-5-recent per station (W2) ->
    ordered list-agg of readings by time asc (A5, the LIST(ORDER BY)
    idiom) -> current value from rank 1.  The semi-join side is tiny
    (distinct stations) and broadcast; one window shuffle total.
    """
    e = load_table(spark, sf_dir, "events")
    latest = latest_per_key(e, "user_id", "ts", "event_id")
    targets = latest.filter(F.col("value") <= TARGET_MAX).select("user_id")

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = (
        e.join(F.broadcast(targets), "user_id", "left_semi")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    return ranked.groupBy(F.col("user_id").alias("station_code")).agg(
        ordered_collect(
            F.col("value"), F.unix_millis("ts"), F.col("event_id")
        ).alias("sparkline_data"),
        F.max(F.when(F.col("rank") == 1, F.col("value"))).alias("current_bikes"),
    )


def sparkline_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface for :func:`sparkline`: identical plan, but the
    ordered reading list is serialized to a comma-joined centi-unit
    string so the driver's pandas canonicalizer can hash it (lists are
    unhashable there).  Serving keeps the array form via
    :func:`sparkline`; readings are 2-decimal so ``scale=100`` is exact.
    """
    return sparkline(spark, sf_dir).select(
        "station_code",
        csv_scaled("sparkline_data", 100).alias("sparkline_csv"),
        "current_bikes",
    )


def alert_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver-side count-if bands folded into the engine (A7;
    reference src/api.py:73-74 computes them in Python post-hoc)."""
    e = load_table(spark, sf_dir, "events")
    latest = latest_per_key(e, "user_id", "ts", "event_id")
    return latest.agg(
        F.count_if(F.col("value") < CRITICAL_MAX).alias("critical_count"),
        F.count_if(
            (F.col("value") >= CRITICAL_MAX) & (F.col("value") < ALERT_MAX)
        ).alias("warning_count"),
        F.count(F.lit(1)).alias("total_stations"),
    )


def health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving query Q2 ``/health/pipeline`` (reference src/api.py:87-142).

    Two single-row aggregate CTEs (A8) cross-joined (J3): expected
    station count from the dimension (customer plays the GBFS reference
    doc) vs. observed activity from events; ``zombie_stations`` is the
    data-loss audit (reference src/api.py:121).
    """
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    ref = c.agg(F.count(F.lit(1)).alias("total_expected"))
    obs = e.agg(
        F.max(F.unix_millis("ts")).alias("latest_sync_ms"),
        F.countDistinct("user_id").alias("active_stations"),
        dec_sum("value", "total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return ref.crossJoin(obs).withColumn(
        "zombie_stations", F.col("total_expected") - F.col("active_stations")
    )


def zombie_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join generalization of the zombie-station audit: the actual
    list of dimension rows with no observed events (SURVEY.md §2.4 notes
    the reference computes only the count, reference src/api.py:121)."""
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    active = e.select(F.col("user_id").alias("c_custkey")).distinct()
    return (
        c.join(active, "c_custkey", "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The latent dimension-enrichment join J4 (reference
    src/assets/station_reference.py:26-31 stores the dimension "pour
    enrichir" but never joins it): latest state per station, left-joined
    to the broadcast dimension."""
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    latest = latest_per_key(e, "user_id", "ts", "event_id")
    dim = c.select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_acctbal", "c_mktsegment"
    )
    return (
        latest.join(F.broadcast(dim), "user_id", "left")
        .select(
            F.col("user_id").alias("station_code"),
            F.col("value").alias("bikes_available"),
            F.unix_millis("ts").alias("last_reported_ms"),
            "c_name",
            "c_acctbal",
            "c_mktsegment",
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

_DEDUP_LATEST_CTE = """
  SELECT * FROM events
  QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""

ORACLE: dict[str, str | None] = {
    "velib_silver_parse": """
        SELECT event_id,
               user_id AS station_code,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               event_type,
               value AS bikes_available,
               epoch_ms(ts) AS last_reported_ms,
               strftime(ts, '%Y-%m-%d') AS "date"
        FROM events
    """,
    "velib_history_enrich": """
        SELECT user_id AS station_code,
               value AS bikes_available,
               value - lag(value) OVER w AS net_flow,
               ROUND(
                 CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER wr AS DOUBLE)
                 / COUNT(value) OVER wr, 6) AS moving_avg_1h,
               epoch_ms(ts) AS last_reported_ms,
               strftime(ts, '%Y-%m-%d') AS "date"
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
               wr AS (PARTITION BY user_id
                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "velib_dedup_latest": f"""
        SELECT user_id AS station_code,
               value AS bikes_available,
               epoch_ms(ts) AS last_reported_ms
        FROM ({_DEDUP_LATEST_CTE})
    """,
    "velib_alerts": f"""
        WITH h AS (
          SELECT *, value - lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ) AS net_flow
          FROM events
        ),
        m AS (SELECT max(ts) AS max_ts FROM events),
        recent AS (
          SELECT h.* FROM h CROSS JOIN m
          WHERE h.ts >= m.max_ts - INTERVAL 4 HOUR
        ),
        latest AS (
          SELECT * FROM recent
          QUALIFY row_number() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        )
        SELECT user_id AS station_code,
               value AS bikes_available,
               net_flow,
               epoch_ms(ts) AS last_reported_ms,
               CASE WHEN value < {CRITICAL_MAX} THEN 'CRITICAL_EMPTY'
                    ELSE 'WARNING_LOW' END AS alert_level
        FROM latest
        WHERE value < {ALERT_MAX} AND net_flow <= 0
    """,
    "velib_sparkline": f"""
        WITH latest AS ({_DEDUP_LATEST_CTE}),
        targets AS (SELECT user_id FROM latest WHERE value <= {TARGET_MAX}),
        ranked AS (
          SELECT e.*, row_number() OVER (
                   PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC
                 ) AS rank
          FROM events e
          WHERE e.user_id IN (SELECT user_id FROM targets)
        )
        SELECT user_id AS station_code,
               array_to_string(list_transform(
                   list(value ORDER BY ts ASC, event_id ASC),
                   x -> CAST(CAST(round(x * 100) AS BIGINT) AS VARCHAR)
               ), ',') AS sparkline_csv,
               max(CASE WHEN rank = 1 THEN value END) AS current_bikes
        FROM ranked
        WHERE rank <= 5
        GROUP BY user_id
    """,
    "velib_alert_bands": f"""
        WITH latest AS ({_DEDUP_LATEST_CTE})
        SELECT CAST(count_if(value < {CRITICAL_MAX}) AS BIGINT)
                 AS critical_count,
               CAST(count_if(value >= {CRITICAL_MAX} AND value < {ALERT_MAX})
                    AS BIGINT) AS warning_count,
               count(*) AS total_stations
        FROM latest
    """,
    "velib_health": """
        WITH ref AS (SELECT count(*) AS total_expected FROM customer),
        obs AS (
          SELECT max(epoch_ms(ts)) AS latest_sync_ms,
                 count(DISTINCT user_id) AS active_stations,
                 CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_value,
                 count(*) AS n_events
          FROM events
        )
        SELECT ref.total_expected, obs.latest_sync_ms, obs.active_stations,
               obs.total_value, obs.n_events,
               ref.total_expected - obs.active_stations AS zombie_stations
        FROM ref CROSS JOIN obs
    """,
    "velib_zombie_anti": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (SELECT DISTINCT user_id FROM events)
    """,
    "velib_enrich_join": f"""
        WITH latest AS ({_DEDUP_LATEST_CTE})
        SELECT l.user_id AS station_code,
               l.value AS bikes_available,
               epoch_ms(l.ts) AS last_reported_ms,
               c.c_name, c.c_acctbal, c.c_mktsegment
        FROM latest l
        LEFT JOIN customer c ON l.user_id = c.c_custkey
    """,
}

QUERIES = {
    "velib_silver_parse": silver_parse,
    "velib_history_enrich": history_enrich,
    "velib_dedup_latest": dedup_latest,
    "velib_alerts": alerts,
    "velib_sparkline": sparkline_export,
    "velib_alert_bands": alert_bands,
    "velib_health": health,
    "velib_zombie_anti": zombie_anti,
    "velib_enrich_join": enrich_join,
}
