"""Materialized-rollup and slowly-changing-dimension patterns.

* ``hypertable_rollup`` — the continuous-aggregate pattern (hypertable
  rollups): maintain a fine-grained (hourly) pre-aggregate and answer
  coarser (daily) queries by *re-aggregating the rollup* instead of the
  raw events.  The exact-decimal sum convention makes the two-level
  aggregation literally equal to the direct computation (associativity),
  which the oracle asserts by computing the daily answer straight from
  the raw table.  At 100 TB this is the difference between scanning the
  events table and scanning 1/300th of it.

* ``scd2_merge`` — MERGE-less slowly-changing-dimension type 2: apply a
  deterministic change-batch to a dimension with the classic anti-join +
  union + window composition (close the old row, open the new one).
  This is the CDC/upsert shape Delta's MERGE INTO performs; expressed
  relationally it runs on any Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily stats answered from an hourly pre-aggregate (rollup reuse)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("bucket_hour"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("v"),
            F.max("value").alias("mx"),
        )
    )
    # the coarser query consumes ONLY the rollup
    return (
        hourly.groupBy(
            F.date_format("bucket_hour", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("v"), 2).cast("double").alias("total_value"),
            F.max("mx").alias("max_value"),
        )
    )


# The deterministic "change batch": every customer in BUILDING moves to
# segment WEB, and every custkey divisible by 10 gets a 100.0 balance
# bump.  Derived from the dimension itself so the operator needs no
# side-channel input.
def _changes(c: DataFrame) -> DataFrame:
    changed = c.filter(
        (F.col("c_mktsegment") == "BUILDING") | (F.col("c_custkey") % 10 == 0)
    )
    return changed.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(F.col("c_mktsegment") == "BUILDING", "WEB")
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.round(
            F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal")),
            2,
        ).alias("c_acctbal"),
    )


def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 upsert without MERGE: anti-join + union + validity flags.

    Output: one row per (custkey, version) with is_current; changed keys
    carry two versions (the closed v1 and the open v2), unchanged keys
    one open v1.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )
    updates = _changes(load_table(spark, sf_dir, "customer"))

    # rows that actually differ from the current dimension row
    diff = updates.alias("u").join(
        c.alias("d"), "c_custkey"
    ).filter(
        (F.col("u.c_mktsegment") != F.col("d.c_mktsegment"))
        | (F.col("u.c_acctbal") != F.col("d.c_acctbal"))
    ).select("u.c_custkey", "u.c_name", "u.c_nationkey",
             "u.c_mktsegment", "u.c_acctbal")

    closed_old = c.join(diff.select("c_custkey"), "c_custkey", "left_semi").select(
        "*",
        F.lit(1).alias("version"),
        F.lit(False).alias("is_current"),
    )
    untouched = c.join(diff.select("c_custkey"), "c_custkey", "left_anti").select(
        "*", F.lit(1).alias("version"), F.lit(True).alias("is_current")
    )
    opened_new = diff.select(
        "*", F.lit(2).alias("version"), F.lit(True).alias("is_current")
    )
    return closed_old.unionByName(untouched).unionByName(opened_new)


ORACLE: dict[str, str | None] = {
    "hypertable_rollup": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               event_type,
               count(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
    "scd2_merge": """
        WITH dim AS (
          SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                 ROUND(c_acctbal, 2) AS c_acctbal
          FROM customer
        ),
        updates AS (
          SELECT c_custkey, c_name, c_nationkey,
                 CASE WHEN c_mktsegment = 'BUILDING' THEN 'WEB'
                      ELSE c_mktsegment END AS c_mktsegment,
                 ROUND(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                            ELSE c_acctbal END, 2) AS c_acctbal
          FROM customer
          WHERE c_mktsegment = 'BUILDING' OR c_custkey % 10 = 0
        ),
        diff AS (
          SELECT u.* FROM updates u JOIN dim d USING (c_custkey)
          WHERE u.c_mktsegment <> d.c_mktsegment
             OR u.c_acctbal <> d.c_acctbal
        )
        SELECT d.*, 1 AS version, false AS is_current
        FROM dim d WHERE c_custkey IN (SELECT c_custkey FROM diff)
        UNION ALL
        SELECT d.*, 1 AS version, true AS is_current
        FROM dim d WHERE c_custkey NOT IN (SELECT c_custkey FROM diff)
        UNION ALL
        SELECT diff.*, 2 AS version, true AS is_current FROM diff
    """,
}

QUERIES = {
    "hypertable_rollup": hypertable_rollup,
    "scd2_merge": scd2_merge,
}
