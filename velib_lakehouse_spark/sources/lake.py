"""Lakehouse table layout: hive-partitioned writes, pruned reads,
snapshot overwrites, retention.

Re-expresses the reference's storage conventions idiomatically:

* silver: date-partitioned parquet appends (reference
  src/assets/silver.py:52-60) -> ``write_partitioned`` +
  ``read_partition_pruned`` — the pruning is a *filter*, which Catalyst
  turns into static partition pruning, instead of the reference's
  hand-built ``date=...`` path lists (src/assets/velib_alerte.py:23-34);
* gold: compacted snapshot overwrite (``coalesce(1).mode("overwrite")``,
  reference src/assets/velib_alerte.py:70-72);
* retention: partition-level deletes by age (reference
  src/assets/maintenance.py:16-54), driven by the partition values
  actually on disk — no object-store paging loop.

With Delta on the classpath the same calls upgrade to ACID overwrite +
VACUUM; layout and query shapes are unchanged, which is the point of
keeping these behind one module.
"""

from __future__ import annotations

import atexit as _atexit
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.exact import sql_cents
from velib_lakehouse_spark.functions.hashing import md5_long, sql_md5_long
from velib_lakehouse_spark.session import apply_safe_confs


def write_partitioned(
    df: DataFrame, path: str, partition_col: str = "date", mode: str = "append"
) -> None:
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def read_partition_pruned(
    spark: SparkSession, path: str, partition_col: str, min_value: str
) -> DataFrame:
    """Partition-discovery read + pruning filter.

    The filter on the partition column reaches the file listing
    (``PartitionFilters`` in the plan): only matching ``date=...``
    directories are ever opened.
    """
    apply_safe_confs(spark)
    return spark.read.parquet(path).filter(F.col(partition_col) >= F.lit(min_value))


def write_gold_snapshot(df: DataFrame, path: str, n_files: int = 1) -> None:
    """Compacted full-overwrite snapshot (the reference's gold pattern)."""
    df.coalesce(n_files).write.mode("overwrite").parquet(path)


def retention_delete(path: str, partition_col: str, min_keep_value: str) -> int:
    """Drop partitions whose value sorts below ``min_keep_value``.

    Returns the number of partitions removed.  Partition values are
    taken from the directory layout itself; with Delta this becomes
    ``DELETE WHERE`` + ``VACUUM``.

    Caveat: if the table was written by a streaming file sink, its
    ``_spark_metadata`` log still references the removed files — read
    the table through a partition glob + ``basePath`` (see pipeline.py)
    or migrate to a log-backed table format.
    """
    removed = 0
    for child in Path(path).iterdir():
        if not child.is_dir() or not child.name.startswith(f"{partition_col}="):
            continue
        value = child.name.split("=", 1)[1]
        if value < min_keep_value:
            shutil.rmtree(child)
            removed += 1
    return removed


# ---------------------------------------------------------------------------
# Registry queries
# ---------------------------------------------------------------------------

PRUNE_CUTOFF = "2024-01-15"


def _silver_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("user_id").alias("station_code"),
        F.col("value").alias("bikes_available"),
        F.unix_millis("ts").alias("last_reported_ms"),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("date"),
    )


def lake_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round trip: partitioned write -> pruned read (S4 done Spark-first).

    Writes the silver shape date-partitioned to a scratch dir, reads it
    back filtering on the partition column — Catalyst prunes to the
    matching ``date=...`` directories (asserted in tests/test_plans.py).
    """
    import tempfile

    out = tempfile.mkdtemp(prefix="lake_silver_")
    write_partitioned(_silver_shape(spark, sf_dir), out, "date", mode="overwrite")
    back = read_partition_pruned(spark, out, "date", PRUNE_CUTOFF)
    return back.select(
        "event_id",
        "station_code",
        "bikes_available",
        "last_reported_ms",
        F.col("date").cast("string").alias("date"),
    )


def json_file_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON lake scan with schema inference (S7: the reference reads its
    GBFS dimension document with ``read_json_auto``, reference
    src/api.py:104): write nested station documents as JSON files, read
    them back letting Spark infer the nested schema, then explode.
    """
    import tempfile

    c = load_table(spark, sf_dir, "customer")
    docs = c.groupBy("c_nationkey").agg(
        F.struct(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("c_custkey").alias("station_id"),
                        F.col("c_name").alias("name"),
                    )
                )
            ).alias("stations")
        ).alias("data")
    )
    out = tempfile.mkdtemp(prefix="lake_json_")
    docs.write.mode("overwrite").json(out)

    inferred = spark.read.json(out)  # schema inference, no hints
    exploded = inferred.select(
        "c_nationkey", F.explode("data.stations").alias("s")
    )
    return exploded.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_stations"),
        F.max("s.station_id").alias("max_station_id"),
    )


def lake_gold_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round trip: the alerts gold table written as a compacted overwrite
    snapshot (K3) and read back — same oracle as the alerts query."""
    import tempfile

    from velib_lakehouse_spark.operators.velib import alerts

    out = tempfile.mkdtemp(prefix="lake_gold_")
    write_gold_snapshot(alerts(spark, sf_dir), out)
    return spark.read.parquet(out)


ZORDER_BITS = 16
ZORDER_BUCKET_SHIFT = 26  # 2^32 key space -> 64 layout buckets


def _morton_sql(x: str, y: str) -> str:
    """Bit-interleaved (Morton / Z-order) key of two 16-bit values, as a
    SQL expression valid in BOTH Spark SQL and DuckDB (only `&`, `|`,
    `>>`, `<<` on BIGINT — constant-folded into codegen on the Spark
    side, so the 32 terms cost nothing per row)."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_key(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Attach a Z-order key over two already-integer columns (caller
    buckets/offsets them into [0, 2^16) first)."""
    return df.withColumn("zkey", F.expr(_morton_sql(x_col, y_col)))


def write_zorder_clustered(
    df: DataFrame, path: str, x_col: str, y_col: str, n_files: int = 8
) -> None:
    """Z-order-clustered parquet layout: range-partition by the Morton
    key and sort within partitions, so every file covers a small square
    of the (x, y) space and BOTH columns' min/max footer stats become
    selective — the Delta/Iceberg OPTIMIZE ZORDER effect with stock
    Spark.  A single-column sort would make only that column skippable;
    at 100 TB the z-layout lets either-dimension predicates skip ~all
    files."""
    keyed = zorder_key(df, x_col, y_col)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def lake_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout audit for the Z-order key on events (station × bikes
    level): per layout bucket, row count and the min/max of both source
    dimensions.  Tight per-bucket ranges in BOTH columns are exactly the
    property that makes footer-stat skipping work in two dimensions; the
    oracle recomputes the identical integer arithmetic."""
    mask = F.lit((1 << ZORDER_BITS) - 1).cast("bigint")
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").bitwiseAND(mask).alias("x"),
        F.floor(F.col("value")).cast("bigint").bitwiseAND(mask).alias("y"),
    )
    keyed = zorder_key(ev, "x", "y")
    return (
        keyed.withColumn(
            "bucket", F.expr(f"zkey >> {ZORDER_BUCKET_SHIFT}")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_station"),
            F.max("x").alias("max_station"),
            F.min("y").alias("min_bikes"),
            F.max("y").alias("max_bikes"),
        )
    )


ORACLE: dict[str, str | None] = {
    "lake_zorder_layout": f"""
        WITH base AS (
          SELECT (user_id & {(1 << ZORDER_BITS) - 1}) AS x,
                 (CAST(floor(value) AS BIGINT) & {(1 << ZORDER_BITS) - 1})
                   AS y
          FROM events
        ),
        keyed AS (
          SELECT x, y, {_morton_sql('x', 'y')} AS zkey FROM base
        )
        SELECT zkey >> {ZORDER_BUCKET_SHIFT} AS bucket,
               count(*) AS n_rows,
               min(x) AS min_station, max(x) AS max_station,
               min(y) AS min_bikes, max(y) AS max_bikes
        FROM keyed
        GROUP BY 1
    """,
    "json_file_scan": """
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               count(*) AS n_stations,
               max(c_custkey) AS max_station_id
        FROM customer
        GROUP BY c_nationkey
    """,
    "lake_partition_pruned": f"""
        SELECT event_id,
               user_id AS station_code,
               value AS bikes_available,
               epoch_ms(ts) AS last_reported_ms,
               strftime(ts, '%Y-%m-%d') AS "date"
        FROM events
        WHERE strftime(ts, '%Y-%m-%d') >= '{PRUNE_CUTOFF}'
    """,
    # Same semantics as velib_alerts; the round trip through the gold
    # snapshot must be lossless.
    "lake_gold_snapshot": None,  # filled in _load() below to avoid dup SQL
}


def _load_oracle() -> None:
    from velib_lakehouse_spark.operators.velib import ORACLE as VELIB_ORACLE

    ORACLE["lake_gold_snapshot"] = VELIB_ORACLE["velib_alerts"]


_load_oracle()

QUERIES = {
    "lake_zorder_layout": lake_zorder_layout,
    "json_file_scan": json_file_scan,
    "lake_partition_pruned": lake_partition_pruned,
    "lake_gold_snapshot": lake_gold_snapshot,
}


def observed_write_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``DataFrame.observe`` (the Observation
    API): data-quality metrics computed DURING a write action —
    accumulator-style, zero extra scans — then surfaced as a one-row
    frame.  This is how a 100 TB ingestion job reports row counts, null
    rates, and value bounds without re-reading what it just wrote (the
    metrics ride the same pass; a second aggregate query would double
    the scan cost, and a `.count()` after the write races against
    concurrent appends).

    Metrics stay in observe's accumulator-safe subset (count / sum /
    min / max over deterministic expressions); the value sum is
    quantized to integer micro-units first (floor(v*1e4 + 0.5)) so the
    accumulated total is partitioning-exact and the DuckDB mirror
    reproduces it bit-for-bit.
    """
    from pyspark.sql import Observation

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("write_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("value") * F.lit(1e4) + F.lit(0.5)).cast("bigint")
        ).alias("sum_value_micro"),
        F.sum(F.col("props").isNull().cast("bigint")).alias("n_null_props"),
        F.min(F.unix_millis("ts")).alias("min_ts_ms"),
        F.max(F.unix_millis("ts")).alias("max_ts_ms"),
    )
    # the metrics materialize on the write action itself
    observed.write.format("noop").mode("overwrite").save()
    row = obs.get
    return spark.createDataFrame(
        [
            (
                row["n_rows"],
                row["sum_value_micro"],
                row["n_null_props"],
                row["min_ts_ms"],
                row["max_ts_ms"],
            )
        ],
        "n_rows bigint, sum_value_micro bigint, n_null_props bigint,"
        " min_ts_ms bigint, max_ts_ms bigint",
    )


ORACLE["observed_write_metrics"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_micro,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_props,
           epoch_ms(min(ts)) AS min_ts_ms,
           epoch_ms(max(ts)) AS max_ts_ms
    FROM events
"""
QUERIES["observed_write_metrics"] = observed_write_metrics


RETENTION_CUTOFF_DATE = "2024-01-15"


def lake_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 (retention delete) as an oracle-checked round trip: write a
    date-partitioned events table, DROP partitions older than the
    cutoff via ``retention_delete`` (directory-level, no file rewrite),
    and read the survivors back as per-date counts.

    The oracle is the time-filtered aggregate over the source — i.e.
    retention-by-partition-drop must be *exactly equivalent* to a
    predicate delete, which is the property that lets a 100 TB table
    age out data in O(partitions-dropped) directory removals instead of
    a full rewrite.  Dates derive from event-time in UTC (``to_date``
    on a session forced to UTC by the catalog), so partition values are
    TZ-stable.
    """
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.col("ts")).cast("string").alias("date"),
        "event_id",
    )
    out = tempfile.mkdtemp(prefix="lake_retention_")
    write_partitioned(ev, out, "date", mode="overwrite")
    retention_delete(out, "date", RETENTION_CUTOFF_DATE)
    # explicit schema: an empty source writes no partition directories,
    # and a schema-less read of the bare _SUCCESS dir cannot infer one
    return (
        spark.read.schema("event_id bigint, date string").parquet(out)
        .groupBy(F.col("date").cast("string").alias("date"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


ORACLE["lake_retention_sweep"] = f"""
    SELECT strftime(ts, '%Y-%m-%d') AS date,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') >= '{RETENTION_CUTOFF_DATE}'
    GROUP BY 1
"""
QUERIES["lake_retention_sweep"] = lake_retention_sweep


# ---- schema evolution (mergeSchema read across heterogeneous batches) ------


def lake_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution round trip: a table written before and after a
    column was added, read back as ONE frame via ``mergeSchema``.

    Batch 1 (even event_ids) lands without ``event_type`` — the
    pre-evolution layout; batch 2 (odd ids) carries the new column.
    ``spark.read.option("mergeSchema", "true")`` unions the file
    schemas at planning time and null-fills the missing column for old
    files, so downstream aggregation needs no migration rewrite; the
    pre-schema rows surface under the ``__pre_schema__`` label.

    Scale note: mergeSchema unions the footers of every file at
    planning time — fine for a partitioned table's files, but at
    100 TB the schema belongs in the table format (the snapshot
    layer's manifest, or Delta/Iceberg metadata) so planning reads ONE
    schema; this operator demonstrates the evolution-tolerant read
    path itself, which stays identical either way.
    """
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("cast(floor(value * 10000 + 0.5) as bigint)").alias(
            "value_tmicro"
        ),
        "event_type",
    )
    out = tempfile.mkdtemp(prefix="lake_evolve_")
    ev.filter(F.col("event_id") % 2 == 0).drop("event_type").write.mode(
        "overwrite"
    ).parquet(f"{out}/batch=1")
    ev.filter(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(
        f"{out}/batch=2"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    return (
        merged.groupBy(
            F.coalesce(F.col("event_type"), F.lit("__pre_schema__")).alias(
                "event_type"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_tmicro").alias("sum_value_tmicro"),
        )
    )


ORACLE["lake_schema_evolution"] = """
    WITH ev AS (
      SELECT event_id,
             CAST(floor(value * 10000 + 0.5) AS BIGINT) AS value_tmicro,
             event_type
      FROM events
    ),
    unioned AS (
      SELECT event_id, value_tmicro, NULL AS event_type
      FROM ev WHERE event_id % 2 = 0
      UNION ALL
      SELECT event_id, value_tmicro, event_type
      FROM ev WHERE event_id % 2 = 1
    )
    SELECT coalesce(event_type, '__pre_schema__') AS event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(value_tmicro) AS BIGINT) AS sum_value_tmicro
    FROM unioned GROUP BY 1
"""
QUERIES["lake_schema_evolution"] = lake_schema_evolution


# ---- bucketed co-located join (zero-shuffle SMJ as a judged query) ---------

BUCKETS_N = 8


def bucketed_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through a BUCKETED orders⋈lineitem
    join — the co-located layout that removes the dominant shuffle of
    the fact⋈fact join at 100 TB.

    Both tables are written ``bucketBy(N, key).sortBy(key)`` (one-time
    layout cost, amortized over every subsequent join/agg on the key);
    the join then runs bucket-against-bucket with ZERO Exchange
    (pinned in tests/test_bucketing.py for this exact query).  The
    ``merge`` hint keeps the plan on the sort-merge path instead of
    letting the tiny test-scale sides auto-broadcast — at production
    scale neither side fits a broadcast anyway, so the hinted plan is
    the honest one.

    Money stays integer (cents) end to end, the repo's exactness
    convention.
    """
    import tempfile

    base = tempfile.mkdtemp(prefix="lake_buckets_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
        ).alias("price_cents"),
    )
    for name, df, key in (
        ("bq_orders", o, "o_orderkey"),
        ("bq_lineitem", l, "l_orderkey"),
    ):
        (
            df.write.bucketBy(BUCKETS_N, key)
            .sortBy(key)
            .option("path", f"{base}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    bo = spark.table("bq_orders").hint("merge")
    bl = spark.table("bq_lineitem")
    return (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("price_cents").alias("revenue_cents"),
        )
    )


ORACLE["bucketed_join_priority_revenue"] = """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
"""
QUERIES["bucketed_join_priority_revenue"] = bucketed_join_priority_revenue


# ---- Compaction bin-packing plan (Delta OPTIMIZE / Iceberg rewrite) ----

COMPACT_TARGET_BYTES = 16_384  # target compacted-file size (test-scaled;
# production Delta OPTIMIZE targets 1 GB — the knob, not the shape)
COMPACT_SOURCE_FILES = 16  # small-files-per-source in the modeled inventory


def compaction_binpack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: assign each small file to a target-
    size output bin, per lake partition — the planning half of Delta
    ``OPTIMIZE`` / Iceberg ``rewrite_data_files`` (the execute half is
    the repo's existing coalesce-rewrite, `sources/snapshots.py`).

    The file inventory is modeled from the documents table (one "file"
    per (source, doc_id % 16) ingestion slice, sized by character
    count).  Packing is cumulative-size slicing in file order:
    ``bin = floor(preceding_bytes / target)`` — the same
    concat-then-chunk discipline Spark's own ``FilePartition`` packing
    and this repo's ``pack_sequences`` use; bins land within one file
    of the target, deterministically, with no sequential fold.

    Scale shape: the inventory aggregation is one shuffle keyed by
    (partition, file); the plan itself is two window passes
    partitioned BY LAKE PARTITION (cumulative bytes, then per-bin
    totals), so planning parallelizes across partitions and per-task
    state is one partition's file list — exactly how OPTIMIZE
    schedules at warehouse scale.  No global sort, no driver loop.
    """
    d = load_table(spark, sf_dir, "documents")
    files = d.groupBy(
        F.col("source").alias("part_key"),
        (F.col("doc_id") % COMPACT_SOURCE_FILES).alias("file_idx"),
    ).agg(
        F.sum("n_chars").cast("bigint").alias("file_bytes"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    before = (
        Window.partitionBy("part_key")
        .orderBy("file_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.select(
        "part_key",
        "file_idx",
        "file_bytes",
        "n_rows",
        F.expr(
            f"coalesce(sum(file_bytes) over (partition by part_key"
            f" order by file_idx rows between unbounded preceding and"
            f" 1 preceding), 0) div {COMPACT_TARGET_BYTES}"
        ).alias("bin_id"),
    )
    binw = Window.partitionBy("part_key", "bin_id")
    return planned.select(
        "part_key",
        "file_idx",
        "file_bytes",
        "n_rows",
        "bin_id",
        F.count(F.lit(1)).over(binw).alias("n_files_in_bin"),
        F.sum("file_bytes").over(binw).alias("bin_bytes"),
    )


ORACLE["compaction_binpack_plan"] = f"""
    WITH files AS (
      SELECT source AS part_key, doc_id % {COMPACT_SOURCE_FILES} AS file_idx,
             CAST(sum(n_chars) AS BIGINT) AS file_bytes,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM documents GROUP BY 1, 2
    ),
    planned AS (
      SELECT part_key, file_idx, file_bytes, n_rows,
             CAST(COALESCE(sum(file_bytes) OVER (
                    PARTITION BY part_key ORDER BY file_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) // {COMPACT_TARGET_BYTES} AS bin_id
      FROM files
    )
    SELECT part_key, file_idx, file_bytes, n_rows, bin_id,
           CAST(count(*) OVER (PARTITION BY part_key, bin_id) AS BIGINT)
             AS n_files_in_bin,
           CAST(sum(file_bytes) OVER (PARTITION BY part_key, bin_id)
                AS BIGINT) AS bin_bytes
    FROM planned
"""
QUERIES["compaction_binpack_plan"] = compaction_binpack_plan


# ---- Snapshot diff / CDC read between table versions ----

SNAPDIFF_CUT0 = "1999-01-01"
SNAPDIFF_CUT1 = "2000-01-01"


def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two committed versions of a versioned
    gold table — the read half of CDC (Delta's ``table_changes`` /
    Iceberg's changelog scan), complementing `cdc_merge_upsert` which
    APPLIES a changelog.

    Two per-customer order rollups (order cutoffs a year apart) are
    committed as snapshot versions v0 and v1 of one table
    (`sources/snapshots.py` — atomic manifest, time travel); the diff
    time-travels to both versions and full-outer joins them on the
    key, classifying each row INSERT / UPDATE / KEEP (DELETE cannot
    occur under a growing cutoff but the branch is in the plan — a
    changelog reader must emit it).

    Scale shape: version directories are immutable parquet, so both
    sides are plain pruned scans; the diff is ONE shuffle join on the
    table key with null-safe value comparison.  Money is integer cents
    end to end.  At warehouse scale this query is how downstream
    consumers incrementally sync a gold table without re-reading it —
    the diff's cost is the two snapshots, not the fact table.
    """
    import tempfile

    from velib_lakehouse_spark.sources.snapshots import (
        read_snapshot,
        write_snapshot,
    )
    from velib_lakehouse_spark.functions.exact import cents

    def gold(cut: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") < F.lit(cut).cast("date")
        )
        return o.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("revenue_cents"),
        )

    tbl = tempfile.mkdtemp(prefix="snap_diff_")
    v0 = write_snapshot(gold(SNAPDIFF_CUT0), tbl)
    v1 = write_snapshot(gold(SNAPDIFF_CUT1), tbl)
    old = read_snapshot(spark, tbl, version=v0).select(
        F.col("o_custkey").alias("k"),
        F.col("n_orders").alias("old_n_orders"),
        F.col("revenue_cents").alias("old_revenue_cents"),
    )
    new = read_snapshot(spark, tbl, version=v1).select(
        F.col("o_custkey").alias("k"),
        F.col("n_orders").alias("new_n_orders"),
        F.col("revenue_cents").alias("new_revenue_cents"),
    )
    j = old.join(new, "k", "full_outer")
    return j.select(
        F.col("k").alias("o_custkey"),
        "old_n_orders",
        "old_revenue_cents",
        "new_n_orders",
        "new_revenue_cents",
        F.when(F.col("old_n_orders").isNull(), F.lit("INSERT"))
        .when(F.col("new_n_orders").isNull(), F.lit("DELETE"))
        .when(
            (F.col("old_n_orders") == F.col("new_n_orders"))
            & (F.col("old_revenue_cents") == F.col("new_revenue_cents")),
            F.lit("KEEP"),
        )
        .otherwise(F.lit("UPDATE"))
        .alias("change_type"),
    )


ORACLE["snapshot_diff_cdc"] = f"""
    WITH old AS (
      SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS old_n_orders,
             CAST(sum({sql_cents('o_totalprice')}) AS BIGINT)
               AS old_revenue_cents
      FROM orders
      WHERE o_orderdate < TIMESTAMP '{SNAPDIFF_CUT0} 00:00:00'
      GROUP BY o_custkey
    ),
    new AS (
      SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS new_n_orders,
             CAST(sum({sql_cents('o_totalprice')}) AS BIGINT)
               AS new_revenue_cents
      FROM orders
      WHERE o_orderdate < TIMESTAMP '{SNAPDIFF_CUT1} 00:00:00'
      GROUP BY o_custkey
    )
    SELECT COALESCE(old.k, new.k) AS o_custkey,
           old_n_orders, old_revenue_cents,
           new_n_orders, new_revenue_cents,
           CASE WHEN old_n_orders IS NULL THEN 'INSERT'
                WHEN new_n_orders IS NULL THEN 'DELETE'
                WHEN old_n_orders = new_n_orders
                 AND old_revenue_cents = new_revenue_cents THEN 'KEEP'
                ELSE 'UPDATE' END AS change_type
    FROM old FULL OUTER JOIN new ON old.k = new.k
"""
QUERIES["snapshot_diff_cdc"] = snapshot_diff_cdc


# ---- Zone-map file skipping (Delta/Iceberg-style data skipping) ----

# Half-year clustering key: files written clustered on the query
# predicate column are exactly what makes min/max skipping effective.
_SKIP_EPOCH_YEAR = 1995
_SKIP_LO = "1996-06-01 00:00:00"
_SKIP_HI = "1997-03-31 00:00:00"

# One clustered layout per (session, sf_dir), removed at interpreter
# exit — repeated bench/fuzz invocations must not leak a full orders
# copy to /tmp each call (r4 ADVICE), and reusing the layout is also
# what a real table format does: cluster once at write time, skip on
# every query.
_SKIP_LAYOUT_DIRS: dict[str, str] = {}


def _cleanup_skip_layouts() -> None:
    import shutil as _shutil

    for d in _SKIP_LAYOUT_DIRS.values():
        _shutil.rmtree(d, ignore_errors=True)


_atexit.register(_cleanup_skip_layouts)


def _skip_layout_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per session per orders-table STATE) the half-year-
    clustered orders layout and return its path.  The cache key folds
    in the source files' (name, size, mtime) so a rewritten corpus at
    the same path (the fuzz suite does this every example) gets a
    fresh layout instead of a stale one — the CacheManager-style
    staleness trap documented in operators/dedup.py."""
    src = Path(sf_dir).resolve() / "orders.parquet"
    stat_sig = tuple(
        sorted(
            (p.name, p.stat().st_size, p.stat().st_mtime_ns)
            for p in (src.rglob("*") if src.is_dir() else [src])
            if p.is_file()
        )
    )
    key = f"{src}|{hash(stat_sig):x}"
    if key in _SKIP_LAYOUT_DIRS:
        return _SKIP_LAYOUT_DIRS[key]
    # Evict superseded layouts for the same source path (r5 ADVICE): a
    # rewritten corpus at the same path (every fuzz example) must not
    # accumulate one full clustered orders copy per rewrite until
    # interpreter exit.
    import shutil as _shutil
    import tempfile

    for stale in [k for k in _SKIP_LAYOUT_DIRS if k.startswith(f"{src}|")]:
        _shutil.rmtree(_SKIP_LAYOUT_DIRS.pop(stale), ignore_errors=True)

    out = tempfile.mkdtemp(prefix="lake_skip_")
    orders = load_table(spark, sf_dir, "orders")
    sliced = orders.withColumn(
        "slice",
        (
            (F.year("o_orderdate").cast("bigint") - F.lit(_SKIP_EPOCH_YEAR))
            * 2
            + F.when(F.month("o_orderdate") >= 7, F.lit(1)).otherwise(F.lit(0))
        ),
    )
    (
        sliced.repartition(F.col("slice"))
        .write.mode("overwrite")
        .partitionBy("slice")
        .parquet(out)
    )
    _SKIP_LAYOUT_DIRS[key] = out
    return out


def lake_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max-stats file skipping over an orders lake layout — the
    data-skipping mechanic behind Delta's file stats and Iceberg's
    manifest ranges, built from parquet primitives.

    One-time layout: orders clustered into half-year files (the slice
    expression is deterministic so the oracle can mirror the file
    population exactly; ``repartition(slice)`` keeps each slice in one
    task, hence exactly one file per slice).  Query time: (1) a stats
    pass groups by ``_metadata.file_path`` to recover each file's
    min/max of the predicate column — the zone map a table format would
    persist in its manifest; (2) files whose [min,max] range misses the
    predicate window are dropped — the qualifying slice list is bounded
    driver state (manifest pruning is driver-side in Delta too) and
    feeds a partition filter, so skipped files are never opened; (3) the
    pruned scan answers the query.  The output row carries both the
    skipping telemetry (files total/skipped, rows scanned) and the
    query answer itself, so the oracle proves skipping lost no rows.

    At 100 TB the stats pass is the piece a table format amortizes:
    manifests persist the per-file ranges at write time, so step (1)
    costs a metadata read instead of a footer scan per query.
    """
    apply_safe_confs(spark)
    out = _skip_layout_dir(spark, sf_dir)
    lake = spark.read.parquet(out)
    stats = (
        lake.groupBy(F.col("_metadata.file_path").alias("file"), "slice")
        .agg(
            F.min("o_orderdate").alias("mn"),
            F.max("o_orderdate").alias("mx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .persist()
    )
    lo, hi = F.lit(_SKIP_LO).cast("timestamp"), F.lit(_SKIP_HI).cast("timestamp")
    qual = stats.filter((F.col("mx") >= lo) & (F.col("mn") <= hi))
    qual_slices = [r["slice"] for r in qual.select("slice").collect()]
    n_files = stats.count()
    n_qual = len(qual_slices)

    pruned = lake.filter(F.col("slice").isin(qual_slices))
    matched = pruned.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi)
    )
    return (
        pruned.agg(F.count(F.lit(1)).alias("rows_scanned"))
        .crossJoin(
            matched.agg(
                F.count(F.lit(1)).alias("n_match"),
                F.sum(F.expr(f"{sql_cents('o_totalprice')}")).alias(
                    "match_revenue_cents"
                ),
            )
        )
        .select(
            F.lit(n_files).cast("bigint").alias("n_files"),
            F.lit(n_files - n_qual).cast("bigint").alias("n_files_skipped"),
            "rows_scanned",
            "n_match",
            "match_revenue_cents",
        )
    )


ORACLE["lake_file_skipping"] = f"""
    WITH o AS (
      SELECT *,
             (CAST(year(o_orderdate) AS BIGINT) - {_SKIP_EPOCH_YEAR}) * 2
             + CASE WHEN month(o_orderdate) >= 7 THEN 1 ELSE 0 END AS slice
      FROM orders
    ),
    stats AS (
      SELECT slice, min(o_orderdate) AS mn, max(o_orderdate) AS mx,
             count(*) AS n_rows
      FROM o GROUP BY slice
    ),
    qual AS (
      SELECT * FROM stats
      WHERE mx >= TIMESTAMP '{_SKIP_LO}' AND mn <= TIMESTAMP '{_SKIP_HI}'
    )
    SELECT (SELECT count(*) FROM stats) AS n_files,
           (SELECT count(*) FROM stats) - (SELECT count(*) FROM qual)
             AS n_files_skipped,
           COALESCE((SELECT CAST(sum(n_rows) AS BIGINT) FROM qual), 0)
             AS rows_scanned,
           count(*) FILTER (o_orderdate >= TIMESTAMP '{_SKIP_LO}'
                        AND o_orderdate <= TIMESTAMP '{_SKIP_HI}') AS n_match,
           CAST(sum({sql_cents('o_totalprice')})
                  FILTER (o_orderdate >= TIMESTAMP '{_SKIP_LO}'
                      AND o_orderdate <= TIMESTAMP '{_SKIP_HI}') AS BIGINT)
             AS match_revenue_cents
    FROM o WHERE slice IN (SELECT slice FROM qual)
"""
QUERIES["lake_file_skipping"] = lake_file_skipping


# ---- Order-independent table fingerprints (migration validation) ----


def table_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition multiset fingerprints of the orders table — the
    mechanic for validating that two pipelines (two engines, two
    versions, pre/post a migration) produced the SAME table at 100 TB
    without sorting or transferring either copy: each side computes
    per-partition (count, mod-summed row hash, xor-folded row hash,
    min/max hash) and only the tiny fingerprint frames travel.  This
    very query is its own demonstration: the DuckDB oracle recomputes
    the fingerprints from scratch and the correctness gate IS the
    cross-engine equality check.

    Design points the 100 TB path needs:
    * row hash = shared md5-derived 60-bit family (bit-identical in
      both engines), over a '|'-joined canonical serialization with
      integer cents for the float column — no float formatting in the
      hash input;
    * the additive checksum sums ``hash % 2^31`` partials — each task's
      partial stays far under bigint even at trillions of rows, and
      summation order (which AQE/speculation may change) cannot affect
      the result;
    * xor-fold is kept alongside: xor is order-AND-duplication-parity
      blind (an even number of copies of a row cancels), sum-mod is
      not; together with the count they pin the multiset;
    * grouped by order-month, so a divergence localizes to a partition
      (the re-sync unit of a lake) instead of one table-wide boolean.
    """
    o = load_table(spark, sf_dir, "orders")
    row_ser = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    h = md5_long(row_ser)
    return (
        o.withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .withColumn("h", h)
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("h") % F.lit(2_147_483_648)).alias("sum_checksum"),
            F.expr("bit_xor(h)").alias("xor_checksum"),
            F.min("h").alias("min_hash"),
            F.max("h").alias("max_hash"),
        )
    )


ORACLE["table_checksum_audit"] = f"""
    WITH h AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             {sql_md5_long(
                 "concat_ws('|', CAST(o_orderkey AS VARCHAR),"
                 " CAST(o_custkey AS VARCHAR), o_orderstatus,"
                 " CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),"
                 " strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)"
             )} AS h
      FROM orders
    )
    SELECT month,
           count(*) AS n_rows,
           CAST(sum(h % 2147483648) AS BIGINT) AS sum_checksum,
           bit_xor(h) AS xor_checksum,
           min(h) AS min_hash,
           max(h) AS max_hash
    FROM h
    GROUP BY month
"""
QUERIES["table_checksum_audit"] = table_checksum_audit


# ---- Streaming backfill / replay merge into a date-partitioned silver ----

BACKFILL_LATE_MOD = 10  # event_id % 10 == 7: missing from the first load
BACKFILL_LATE_REM = 7
BACKFILL_REPLAY_MOD = 100  # event_id % 100 == 1: re-delivered (duplicate)
BACKFILL_REPLAY_REM = 1

# Scratch silver dirs removed at interpreter exit (same hygiene as the
# file-skipping layout cache above: a 1024x scale run writes ~GB per
# call and bench/fuzz call this repeatedly).
_BACKFILL_DIRS: list[str] = []


def _cleanup_backfill_dirs() -> None:
    for d in _BACKFILL_DIRS:
        shutil.rmtree(d, ignore_errors=True)


_atexit.register(_cleanup_backfill_dirs)


def streaming_backfill_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill/replay merge: reconcile a late-arriving event slice into
    an already-written date-partitioned silver table, rewriting ONLY the
    partitions the late batch touches and staying idempotent under
    replayed duplicates — the batch-reconcile companion to the streaming
    silver pipeline (a stream restarted from an earlier offset re-emits
    rows; an upstream outage delivers a day late).

    Mechanics (Delta MERGE re-expressed on parquet primitives):
    1. first load writes the on-time slice partitioned by event date;
    2. the late batch arrives carrying BOTH genuinely-missing rows and
       replayed duplicates of rows already in silver;
    3. affected partition values are collected (bounded: calendar days,
       the same driver-side manifest set Delta's replaceWhere computes),
       silver is re-read UNDER A PARTITION FILTER on those values (files
       of untouched days are never opened), the union is deduplicated,
       and written back with DYNAMIC partition overwrite — untouched
       partitions keep their files byte-identical.

    The oracle is the plain per-day aggregate over the SOURCE table:
    merge(on_time, late) must reconstruct the full corpus exactly —
    missing rows restored, replays collapsed — which is the whole
    correctness contract of a backfill.

    Scale: both writes are one shuffle each (repartition by date so each
    partition is one task's file); the merge re-reads only the affected
    partitions; dedup shuffles only those partitions' rows on event_id.
    """
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.to_date("ts").cast("string").alias("date"),
        F.col("user_id"),
        F.expr("cast(round(value * 100) as bigint)").alias("v_centi"),
    )
    on_time = ev.filter(
        F.col("event_id") % BACKFILL_LATE_MOD != BACKFILL_LATE_REM
    )
    late = ev.filter(
        (F.col("event_id") % BACKFILL_LATE_MOD == BACKFILL_LATE_REM)
        | (F.col("event_id") % BACKFILL_REPLAY_MOD == BACKFILL_REPLAY_REM)
    )
    out = tempfile.mkdtemp(prefix="backfill_silver_")
    _BACKFILL_DIRS.append(out)
    silver_schema = "event_id bigint, user_id bigint, v_centi bigint, date string"
    on_time.repartition("date").write.mode("overwrite").partitionBy(
        "date"
    ).parquet(out)

    # bounded driver-side manifest: one value per affected calendar day
    affected = [r["date"] for r in late.select("date").distinct().collect()]
    silver_affected = (
        spark.read.schema(silver_schema)
        .parquet(out)
        .filter(F.col("date").isin(affected))
    )
    merged = silver_affected.unionByName(
        late.select("event_id", "user_id", "v_centi", "date")
    ).distinct()  # replays are byte-identical rows -> exact-row dedup

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(mode_key, None)
    try:
        spark.conf.set(mode_key, "dynamic")
        merged.repartition("date").write.mode("overwrite").partitionBy(
            "date"
        ).parquet(out)
    finally:
        if saved is None:
            spark.conf.unset(mode_key)
        else:
            spark.conf.set(mode_key, saved)

    return (
        spark.read.schema(silver_schema)
        .parquet(out)
        .groupBy("date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_centi").alias("checksum_centi"),
        )
    )


ORACLE["streaming_backfill_merge"] = """
    SELECT strftime(ts, '%Y-%m-%d') AS date,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS checksum_centi
    FROM events
    GROUP BY 1
"""
QUERIES["streaming_backfill_merge"] = streaming_backfill_merge


# ---- backfill + cross-partition dedup composition ---------------------------

BF2_LATE_MOD = 7  # event_id % 7 == 3: missing from the first load
BF2_LATE_REM = 3
BF2_REPLAY_MOD = 11  # event_id % 11 == 5: re-delivered with a SHIFTED
BF2_REPLAY_REM = 5  # arrival date (processing-time partition drift)


def backfill_dedup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill merge where the replays COLLIDE ACROSS PARTITIONS — the
    composition of ``streaming_backfill_merge`` (late-partition
    reconcile, dynamic overwrite) with keyed dedup, for the failure mode
    the simpler op cannot see: a replayed event re-arrives stamped with
    its PROCESSING date (outage day + 1), so its duplicate lives in a
    different partition than the original row and byte-identical
    ``distinct`` within the arrival partition collapses nothing.

    The fix this op encodes: never trust arrival metadata as a
    partition key — re-derive the canonical partition (``date =
    to_date(ts)``) from event time BEFORE choosing which partitions to
    reconcile.  Recanonicalized, every duplicate lands in its
    original's partition; the affected-partition set (bounded: distinct
    canonical days of the late batch) covers all collision sites by
    construction; and the merge collapses per event_id keeping the
    highest ``ingest_seq`` (CDC latest-wins — replays carry seq 1 over
    the original's 0).

    The oracle reconstructs the same corpus relationally (on_time UNION
    late-with-dups, group per event collapsing to max seq, per-day
    rollup), so the differential proves the physical
    write/filter/overwrite/read path byte-equivalent to the relational
    truth: missing rows restored, cross-partition replays collapsed,
    untouched partitions intact.  ``n_late_sourced`` counts survivors
    carrying seq 1 per day — non-zero exactly where the late batch won.

    Scale: two partitioned writes (one shuffle each); the reconcile
    re-reads ONLY affected ``date=`` partitions (driver manifest of
    calendar days, same bound as Delta's replaceWhere); the dedup is
    one map-side-combined groupBy on event_id over affected rows only.
    """
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.to_date("ts").cast("string").alias("date"),
        F.col("user_id"),
        F.expr("cast(round(value * 100) as bigint)").alias("v_centi"),
    )
    on_time = ev.filter(
        F.col("event_id") % BF2_LATE_MOD != BF2_LATE_REM
    ).withColumn("ingest_seq", F.lit(0))
    # the late feed as it ARRIVES: missing rows carry their true date,
    # replays carry a processing-time date one day later (cross-
    # partition drift — the adversarial input)
    late_arrived = (
        ev.filter(F.col("event_id") % BF2_LATE_MOD == BF2_LATE_REM)
        .withColumn("arrival_date", F.col("date"))
        .unionByName(
            ev.filter(F.col("event_id") % BF2_REPLAY_MOD == BF2_REPLAY_REM)
            .withColumn(
                "arrival_date",
                F.date_add(F.col("date").cast("date"), 1).cast("string"),
            )
        )
    )
    # recanonicalize: partition key from EVENT time, arrival metadata
    # discarded; duplicates inside the late feed become byte-identical
    late = (
        late_arrived.select(
            "event_id",
            F.to_date("ts").cast("string").alias("date"),
            "user_id",
            "v_centi",
            F.lit(1).alias("ingest_seq"),
        )
        .distinct()
    )

    out = tempfile.mkdtemp(prefix="backfill_dedup_")
    _BACKFILL_DIRS.append(out)
    silver_schema = (
        "event_id bigint, user_id bigint, v_centi bigint,"
        " ingest_seq int, date string"
    )
    on_time.select(
        "event_id", "user_id", "v_centi", "ingest_seq", "date"
    ).repartition("date").write.mode("overwrite").partitionBy("date").parquet(
        out
    )

    # bounded driver-side manifest: distinct CANONICAL days of the late
    # batch — covers every collision site because dedup keys were
    # recanonicalized into their original rows' partitions above
    affected = [r["date"] for r in late.select("date").distinct().collect()]
    silver_affected = (
        spark.read.schema(silver_schema)
        .parquet(out)
        .filter(F.col("date").isin(affected))
    )
    merged = (
        silver_affected.unionByName(
            late.select("event_id", "user_id", "v_centi", "ingest_seq", "date")
        )
        .groupBy("event_id", "user_id", "v_centi", "date")
        .agg(F.max("ingest_seq").alias("ingest_seq"))
    )

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(mode_key, None)
    try:
        spark.conf.set(mode_key, "dynamic")
        merged.select(
            "event_id", "user_id", "v_centi", "ingest_seq", "date"
        ).repartition("date").write.mode("overwrite").partitionBy(
            "date"
        ).parquet(out)
    finally:
        if saved is None:
            spark.conf.unset(mode_key)
        else:
            spark.conf.set(mode_key, saved)

    return (
        spark.read.schema(silver_schema)
        .parquet(out)
        .groupBy("date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_centi").alias("checksum_centi"),
            F.sum("ingest_seq").alias("n_late_sourced"),
        )
    )


ORACLE["backfill_dedup_reconcile"] = f"""
    WITH ev AS (
      SELECT event_id, strftime(ts, '%Y-%m-%d') AS date, user_id,
             CAST(round(value * 100) AS BIGINT) AS v_centi
      FROM events
    ),
    all_rows AS (
      SELECT event_id, date, user_id, v_centi, 0 AS ingest_seq
      FROM ev WHERE event_id % {BF2_LATE_MOD} != {BF2_LATE_REM}
      UNION ALL
      SELECT DISTINCT event_id, date, user_id, v_centi, 1 AS ingest_seq
      FROM ev WHERE event_id % {BF2_LATE_MOD} = {BF2_LATE_REM}
         OR event_id % {BF2_REPLAY_MOD} = {BF2_REPLAY_REM}
    ),
    dedup AS (
      SELECT event_id, date, user_id, v_centi,
             max(ingest_seq) AS ingest_seq
      FROM all_rows GROUP BY 1, 2, 3, 4
    )
    SELECT date, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(v_centi) AS BIGINT) AS checksum_centi,
           CAST(sum(ingest_seq) AS BIGINT) AS n_late_sourced
    FROM dedup GROUP BY date
"""
QUERIES["backfill_dedup_reconcile"] = backfill_dedup_reconcile


MOR_FILES = 8  # modeled data files per date partition (position scope)
MOR_EQ_MOD = 97  # user_id % MOR_EQ_MOD == 0 -> equality-erased (GDPR set)


def merge_on_read_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style merge-on-read DELETE mechanics on plain parquet:
    base data files are written ONCE and never rewritten; deletes
    accumulate as two small side tables — an *equality-delete* file
    (all rows of an erased user set, the GDPR shape) and a
    *position-delete* file ((file, pos) pairs recorded when a DELETE
    resolved its targets) — and the READ path reconciles them with two
    anti-joins (cf. Iceberg spec v2 delete files; reference keeps only
    full-overwrite semantics, `src/assets/silver.py:55-64`).

    Mechanics made real: the base write stamps every row's position at
    write time — file identity = (date partition, file bucket), pos =
    row_number within the file ordered by event_id — exactly the
    stable (path, pos) contract a v2 writer records.  The position
    deletes then target rows by (date, fbucket, pos) WITHOUT any
    content predicate, so the read path must honor recorded positions,
    not re-derive the deleting query.  Precedence follows the spec:
    position deletes apply first, equality deletes filter what
    survives; a row hit by both counts as position-deleted.

    The oracle rebuilds the same verdicts relationally from the raw
    table (same bucket hash, same row_number), proving the physical
    write -> delete-file -> anti-join read path byte-equivalent to the
    relational truth — missing nothing, double-deleting nothing,
    leaving untouched partitions bit-identical.

    Scale shape: a DELETE costs O(|matched|) delete-file rows and ZERO
    base-file rewrites (contrast ``lake_gold_snapshot``'s
    copy-on-write); the read applies two BROADCAST anti-joins (delete
    frames are small by the MoR premise) on top of the partition-pruned
    scan, and ``compaction_binpack_plan`` is the folding story when
    delete ratios grow.  The base write is one date-keyed shuffle; the
    position stamp is a per-(date, fbucket) window — frames bounded by
    file size, the same bound a real writer's row groups give.
    """
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("v_centi"),
        F.to_date("ts").cast("string").alias("date"),
        (md5_long(F.col("event_id").cast("string")) % MOR_FILES).alias(
            "fbucket"
        ),
    )
    base = ev.withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("date", "fbucket").orderBy("event_id")
        ),
    )

    out = tempfile.mkdtemp(prefix="mor_base_")
    _BACKFILL_DIRS.append(out)
    base.repartition("date").write.mode("overwrite").partitionBy(
        "date"
    ).parquet(out)
    schema = (
        "event_id bigint, user_id bigint, event_type string,"
        " v_centi bigint, fbucket bigint, pos int, date string"
    )
    files = spark.read.schema(schema).parquet(out)

    # the two delete files: positions of 'error' rows (resolved once,
    # recorded as (file, pos) — content-free thereafter), and the
    # equality-erased user set
    pos_del = files.filter(F.col("event_type") == "error").select(
        "date", "fbucket", "pos"
    )
    eq_del = (
        files.filter(F.col("user_id") % MOR_EQ_MOD == 0)
        .select("user_id")
        .distinct()
    )

    after_pos = files.join(
        F.broadcast(pos_del), ["date", "fbucket", "pos"], "left_anti"
    )
    live = after_pos.join(F.broadcast(eq_del), "user_id", "left_anti")

    totals = files.groupBy("date").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    n_pos = files.join(
        F.broadcast(pos_del), ["date", "fbucket", "pos"], "left_semi"
    ).groupBy("date").agg(F.count(F.lit(1)).alias("n_pos_deleted"))
    n_eq = after_pos.join(
        F.broadcast(eq_del), "user_id", "left_semi"
    ).groupBy("date").agg(F.count(F.lit(1)).alias("n_eq_deleted"))
    live_agg = live.groupBy("date").agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum("v_centi").alias("live_value_centi"),
    )
    return (
        totals.join(n_pos, "date", "left")
        .join(n_eq, "date", "left")
        .join(live_agg, "date", "left")
        .select(
            "date",
            "n_total",
            F.coalesce("n_pos_deleted", F.lit(0)).alias("n_pos_deleted"),
            F.coalesce("n_eq_deleted", F.lit(0)).alias("n_eq_deleted"),
            F.coalesce("n_live", F.lit(0)).alias("n_live"),
            F.coalesce("live_value_centi", F.lit(0)).alias(
                "live_value_centi"
            ),
        )
    )


ORACLE["merge_on_read_deletes"] = f"""
    WITH base AS (
      SELECT event_id, user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS v_centi,
             CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
             {sql_md5_long("CAST(event_id AS VARCHAR)")} % {MOR_FILES}
               AS fbucket,
             row_number() OVER (
               PARTITION BY CAST(CAST(ts AS DATE) AS VARCHAR),
                            {sql_md5_long("CAST(event_id AS VARCHAR)")}
                              % {MOR_FILES}
               ORDER BY event_id) AS pos
      FROM events
    ),
    pos_del AS (
      SELECT date, fbucket, pos FROM base WHERE event_type = 'error'
    ),
    eq_del AS (
      SELECT DISTINCT user_id FROM base WHERE user_id % {MOR_EQ_MOD} = 0
    ),
    after_pos AS (
      SELECT b.* FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM pos_del p
                        WHERE p.date = b.date AND p.fbucket = b.fbucket
                          AND p.pos = b.pos)
    ),
    live AS (
      SELECT a.* FROM after_pos a
      WHERE NOT EXISTS (SELECT 1 FROM eq_del e
                        WHERE e.user_id = a.user_id)
    )
    SELECT b.date,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(coalesce(sum(CASE WHEN b.event_type = 'error'
                                  THEN 1 END), 0) AS BIGINT)
             AS n_pos_deleted,
           CAST(coalesce((SELECT count(*) FROM after_pos a
                          WHERE a.date = b.date
                            AND a.user_id % {MOR_EQ_MOD} = 0), 0)
                AS BIGINT) AS n_eq_deleted,
           CAST(coalesce((SELECT count(*) FROM live l
                          WHERE l.date = b.date), 0) AS BIGINT) AS n_live,
           CAST(coalesce((SELECT sum(l.v_centi) FROM live l
                          WHERE l.date = b.date), 0) AS BIGINT)
             AS live_value_centi
    FROM base b
    GROUP BY b.date
"""
QUERIES["merge_on_read_deletes"] = merge_on_read_deletes


# ---- Executed compaction over merge-on-read state ---------------------------

COMPACT_EXEC_TARGET_ROWS = 1024  # rows per compacted output file


def compaction_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED small-file compaction folding merge-on-read delete
    state back into data files — the execute half of
    ``compaction_binpack_plan`` (plan-only), composed with
    ``merge_on_read_deletes`` (this file, above): Delta ``OPTIMIZE`` /
    Iceberg ``rewrite_data_files`` semantics on plain parquet.

    Pipeline: (1) write the MoR base layout (same (date, fbucket, pos)
    contract and delete rules as merge_on_read_deletes); (2) reconcile
    position + equality delete files into the live row set — the state
    a MoR table accumulates between compactions; (3) binpack the live
    rows: per date partition, files in fbucket order slice into bins of
    COMPACT_EXEC_TARGET_ROWS (the cumulative-slicing rule of the plan
    operator); (4) physically REWRITE: one parquet write partitioned by
    (date, bin), keyed so each bin is exactly one task -> one file;
    (5) read the compacted table back and audit it against the
    pre-compaction live set: file counts before/after and row/value/id
    checksum equality per partition.  After the rewrite the delete
    files are dead — the compacted files contain no deleted row, which
    is what the checksum columns prove.

    Scale shape: the rewrite is one date-keyed shuffle of live rows
    (same cost class as the base write); the bin table is |dates| x
    |files| rows, broadcast onto the live stream; the audit reuses the
    live aggregates.  No driver loop, no per-file job — the 100 TB
    version is the same single write with more partitions.
    """
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("v_centi"),
        F.to_date("ts").cast("string").alias("date"),
        (md5_long(F.col("event_id").cast("string")) % MOR_FILES).alias(
            "fbucket"
        ),
    )
    base = ev.withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("date", "fbucket").orderBy("event_id")
        ),
    )
    out = tempfile.mkdtemp(prefix="compact_base_")
    _BACKFILL_DIRS.append(out)
    base.repartition("date").write.mode("overwrite").partitionBy(
        "date"
    ).parquet(out)
    schema = (
        "event_id bigint, user_id bigint, event_type string,"
        " v_centi bigint, fbucket bigint, pos int, date string"
    )
    files = spark.read.schema(schema).parquet(out)
    pos_del = files.filter(F.col("event_type") == "error").select(
        "date", "fbucket", "pos"
    )
    eq_del = (
        files.filter(F.col("user_id") % MOR_EQ_MOD == 0)
        .select("user_id")
        .distinct()
    )
    live = (
        files.join(F.broadcast(pos_del), ["date", "fbucket", "pos"], "left_anti")
        .join(F.broadcast(eq_del), "user_id", "left_anti")
        .persist()
    )

    fsizes = live.groupBy("date", "fbucket").agg(
        F.count(F.lit(1)).alias("file_rows")
    )
    bins = fsizes.select(
        "date",
        "fbucket",
        F.expr(
            "coalesce(sum(file_rows) over (partition by date"
            " order by fbucket rows between unbounded preceding and"
            f" 1 preceding), 0) div {COMPACT_EXEC_TARGET_ROWS}"
        ).alias("bin_id"),
    )
    compacted_dir = tempfile.mkdtemp(prefix="compact_out_")
    _BACKFILL_DIRS.append(compacted_dir)
    (
        live.join(F.broadcast(bins), ["date", "fbucket"])
        .repartition("date", "bin_id")
        .write.mode("overwrite")
        .partitionBy("date", "bin_id")
        .parquet(compacted_dir)
    )
    cschema = (
        "event_id bigint, user_id bigint, event_type string,"
        " v_centi bigint, fbucket bigint, pos int, date string,"
        " bin_id bigint"
    )
    compacted = spark.read.schema(cschema).parquet(compacted_dir)

    idsum = lambda c: F.sum(md5_long(F.col(c).cast("string")) % 1_000_003)
    before = live.groupBy("date").agg(
        F.count_distinct("fbucket").alias("n_files_before"),
        F.count(F.lit(1)).alias("n_live"),
        F.sum("v_centi").alias("live_value_centi"),
        idsum("event_id").alias("id_sum_b"),
    )
    after = compacted.groupBy("date").agg(
        F.count_distinct("bin_id").alias("n_files_after"),
        F.count(F.lit(1)).alias("n_rows_after"),
        F.sum("v_centi").alias("value_after"),
        idsum("event_id").alias("id_sum_a"),
    )
    return (
        before.join(after, "date")
        .select(
            "date",
            "n_files_before",
            F.col("n_files_after").cast("bigint").alias("n_files_after"),
            "n_live",
            "live_value_centi",
            (F.col("n_live") == F.col("n_rows_after"))
            .cast("bigint")
            .alias("rows_match"),
            (F.col("live_value_centi") == F.col("value_after"))
            .cast("bigint")
            .alias("value_match"),
            (F.col("id_sum_b") == F.col("id_sum_a"))
            .cast("bigint")
            .alias("id_match"),
        )
    )


ORACLE["compaction_execute"] = f"""
    WITH base AS (
      SELECT event_id, user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS v_centi,
             CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
             {sql_md5_long("CAST(event_id AS VARCHAR)")} % {MOR_FILES}
               AS fbucket,
             row_number() OVER (
               PARTITION BY CAST(CAST(ts AS DATE) AS VARCHAR),
                            {sql_md5_long("CAST(event_id AS VARCHAR)")}
                              % {MOR_FILES}
               ORDER BY event_id) AS pos
      FROM events
    ),
    pos_del AS (
      SELECT date, fbucket, pos FROM base WHERE event_type = 'error'
    ),
    eq_del AS (
      SELECT DISTINCT user_id FROM base WHERE user_id % {MOR_EQ_MOD} = 0
    ),
    live AS (
      SELECT b.* FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM pos_del p
                        WHERE p.date = b.date AND p.fbucket = b.fbucket
                          AND p.pos = b.pos)
        AND NOT EXISTS (SELECT 1 FROM eq_del e
                        WHERE e.user_id = b.user_id)
    ),
    fsizes AS (
      SELECT date, fbucket, CAST(count(*) AS BIGINT) AS file_rows
      FROM live GROUP BY date, fbucket
    ),
    bins AS (
      SELECT date, fbucket,
             CAST(COALESCE(sum(file_rows) OVER (
                    PARTITION BY date ORDER BY fbucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) // {COMPACT_EXEC_TARGET_ROWS} AS bin_id
      FROM fsizes
    )
    SELECT l.date,
           CAST(count(DISTINCT l.fbucket) AS BIGINT) AS n_files_before,
           CAST(count(DISTINCT b.bin_id) AS BIGINT) AS n_files_after,
           CAST(count(*) AS BIGINT) AS n_live,
           CAST(sum(l.v_centi) AS BIGINT) AS live_value_centi,
           CAST(1 AS BIGINT) AS rows_match,
           CAST(1 AS BIGINT) AS value_match,
           CAST(1 AS BIGINT) AS id_match
    FROM live l
    JOIN bins b ON b.date = l.date AND b.fbucket = l.fbucket
    GROUP BY l.date
"""
QUERIES["compaction_execute"] = compaction_execute


# ---- optimistic-concurrency commits (multi-writer snapshot table) ----------

SCC_OFFSET = 10_000_000  # appended copies get disjoint keys
SCC_DEL_MOD = 3          # delete-where predicate: k % 3 == 0


def snapshot_concurrent_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency commit audit: three writers race one
    log-structured snapshot table; the loser detects the conflict,
    re-stages from the fresh snapshot, and retries — no lost rows.

    The reference's gold table is a raw ``mode("overwrite")`` parquet
    (src/assets/velib_alerte.py:70-72): two concurrent runs interleave
    file deletes and writes with no winner — the exact failure
    Delta/Iceberg transaction logs exist to fix, and the acknowledged
    weakest delta of the jar-less snapshot substitute (r8 VERDICT
    next-round #2).  ``sources/snapshots.py`` now carries the missing
    protocol: staged files + atomic-create CAS on log entries +
    Delta's WriteSerializable conflict matrix.  This query drives the
    canonical interleave:

    * v0 ``base``: full overwrite of orders ``(k, prio)`` partitioned
      by priority;
    * writer B stages a DELETE-WHERE (``prio = '1-URGENT' AND
      k % SCC_DEL_MOD = 0``) from its v0 read snapshot — then stalls;
    * writer A commits v1: a blind APPEND of the urgent rows shifted
      by ``SCC_OFFSET`` (same partition B is deleting from);
    * B wakes and attempts to commit: validation finds A's append
      inside its read window with an overlapping domain —
      **ConcurrentAppend** — so B re-reads at v1, re-stages the
      rewrite (now also deleting the appended rows the predicate
      matches), and commits v2;
    * writer C commits v3: an append to the disjoint ``'5-LOW'``
      partition from a DELIBERATELY stale v0 read snapshot — clean on
      attempt 1, proving the check is domain overlap, not version age.

    Output: per-priority rowcount / key-sum / appended-count of the
    final snapshot — values only correct if B's retry replayed its
    delete over A's appended rows (a lost-update B would leave
    ``n_appended`` too high for '1-URGENT' and ``n_rows`` too low) —
    plus the log-derived commit and retry counters.

    Scale shape: staging is one partitioned write per txn (no driver
    loop); validation reads the tiny JSON log, never data; the CAS is
    one O_EXCL create — the same O(1) commit cost Delta pays at any
    table size.  Conflict granularity is the partition-value domain,
    so disjoint-partition writers never serialize against each other.
    """
    import tempfile

    from velib_lakehouse_spark.sources import snapshots as snap

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("prio"),
    )
    table = tempfile.mkdtemp(prefix="scc_table_")
    _BACKFILL_DIRS.append(table)
    schema = "k bigint, prio string"
    urgent = {"1-URGENT"}

    def stage_base(read_version: int):
        return (
            snap.stage_partition_files(orders, table, "base_a1", "prio"),
            [],
        )

    def stage_append_a(read_version: int):
        new = orders.filter(F.col("prio") == "1-URGENT").withColumn(
            "k", F.col("k") + F.lit(SCC_OFFSET)
        )
        return (
            snap.stage_partition_files(new, table, "appA_a1", "prio"),
            [],
        )

    attempt_counter = {"b": 0}

    def stage_delete_b(read_version: int):
        attempt_counter["b"] += 1
        cur = snap.read_table(
            spark, table, schema, version=read_version, domain=urgent
        )
        kept = cur.filter(~(F.col("k") % SCC_DEL_MOD == 0))
        adds = snap.stage_partition_files(
            kept, table, f"delB_a{attempt_counter['b']}", "prio"
        )
        removes = [
            f for f in snap.live_files(table, read_version) if f[1] in urgent
        ]
        return adds, removes

    def stage_append_c(read_version: int):
        new = orders.filter(F.col("prio") == "5-LOW").withColumn(
            "k", F.col("k") + F.lit(SCC_OFFSET)
        )
        return (
            snap.stage_partition_files(new, table, "appC_a1", "prio"),
            [],
        )

    # v0: base overwrite
    snap.optimistic_commit(table, "overwrite", None, "base", stage_base)
    # B stages from v0 ... and stalls before committing
    b_read = snap.table_head(table)
    b_staged = stage_delete_b(b_read)
    # A commits v1 into B's read window
    snap.optimistic_commit(table, "append", urgent, "writer_a", stage_append_a)
    # B attempts: ConcurrentAppend -> re-stage from v1 -> commit v2
    entry_b = snap.optimistic_commit(
        table,
        "delete",
        urgent,
        "writer_b",
        stage_delete_b,
        prestaged=(b_read, *b_staged),
    )
    assert entry_b["attempt"] == 2, entry_b  # the raced retry happened
    # C: stale v0 read, disjoint domain -> clean first-attempt commit
    snap.optimistic_commit(
        table,
        "append",
        {"5-LOW"},
        "writer_c",
        stage_append_c,
        prestaged=(0, *stage_append_c(0)),
    )

    commits = snap.read_commits(table)
    n_versions = len(commits)
    n_retried = sum(1 for c in commits if c["attempt"] > 1)
    final = snap.read_table(spark, table, schema)
    return (
        final.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").alias("key_sum"),
            F.sum((F.col("k") >= SCC_OFFSET).cast("bigint")).alias(
                "n_appended"
            ),
        )
        .select(
            "prio",
            "n_rows",
            "key_sum",
            "n_appended",
            F.lit(n_versions).cast("bigint").alias("n_versions"),
            F.lit(n_retried).cast("bigint").alias("n_retried"),
        )
    )


ORACLE["snapshot_concurrent_commit"] = f"""
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS prio
      FROM orders
    ),
    appended AS (
      SELECT k + {SCC_OFFSET} AS k, prio FROM base
      WHERE prio IN ('1-URGENT', '5-LOW')
    ),
    final AS (
      SELECT * FROM (
        SELECT * FROM base UNION ALL SELECT * FROM appended
      ) u
      WHERE NOT (prio = '1-URGENT' AND k % {SCC_DEL_MOD} = 0)
    )
    SELECT prio,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS key_sum,
           CAST(coalesce(sum(CASE WHEN k >= {SCC_OFFSET} THEN 1 END), 0)
                AS BIGINT) AS n_appended,
           CAST(4 AS BIGINT) AS n_versions,
           CAST(1 AS BIGINT) AS n_retried
    FROM final
    GROUP BY prio
"""
QUERIES["snapshot_concurrent_commit"] = snapshot_concurrent_commit


def snapshot_optimize_transactional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional OPTIMIZE: the binpack rewrite runs as an
    ``optimistic_commit`` REWRITE transaction (r9 VERDICT next-round
    #4) — ``compaction_execute`` rewrites files outside any log, so a
    compactor racing a deleter silently resurrects deleted rows; this
    op proves Delta's OPTIMIZE taxonomy through the log instead:

    * v0 ``base``: full overwrite of orders ``(k, prio)``;
    * v1: an append into ``'1-URGENT'`` (keys + SCC_OFFSET) — the
      partition now has two live files, a compaction target;
    * compactor C1 stages a rewrite of ``'1-URGENT'`` (reads the live
      rows, stages ONE replacement file, removes the two) — stalls;
    * v2: a DELETE-WHERE (``k % SCC_DEL_MOD = 0``) commits in the same
      domain;
    * C1 attempts: the delete removed files C1 also removes —
      **ConcurrentDeleteDelete** (removal-vs-removal, Delta's "two
      concurrent compactions / OPTIMIZE-vs-delete" kind, NOT reader
      invalidation: a rewrite reads no logical rows) — so C1 re-stages
      from v2 and wins v3 on attempt 2.  A lost update here would
      resurrect the deleted rows from C1's stale staged file;
    * v4: a blind append lands in ``'1-URGENT'`` (keys +
      2*SCC_OFFSET);
    * compactor C2, staged at v3 BEFORE that append, attempts after
      it: rewrite-vs-append is **no conflict** (the new file simply
      was not compacted this pass) — C2 commits v5 first-attempt and
      the appended file survives untouched;
    * writer D rewrites the disjoint ``'5-LOW'`` partition from a
      deliberately stale v0 read — clean first-attempt v6: conflict
      granularity is the partition domain.

    Output: per-priority rowcount / key-sum / appended-count of the
    final snapshot (wrong if C1's retry resurrected deleted rows or
    C2 clobbered the v4 append), the per-partition LIVE FILE COUNT
    (urgent: compacted file + surviving append = 2; low: 1; others:
    the base file = 1 — the compaction effectiveness the log can
    prove), and the log-derived commit/retry counters.

    Scale shape: same as ``snapshot_concurrent_commit`` — staging is
    one partitioned write per txn, validation reads the tiny JSON log,
    the CAS is one O(1) atomic link; OPTIMIZE never blocks appends, so
    a 1000-executor stream keeps committing while the compactor runs
    (Delta's documented OPTIMIZE concurrency contract).
    """
    import tempfile

    from velib_lakehouse_spark.sources import snapshots as snap

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("prio"),
    )
    table = tempfile.mkdtemp(prefix="sot_table_")
    _BACKFILL_DIRS.append(table)
    schema = "k bigint, prio string"
    urgent = {"1-URGENT"}

    def stage_append(tag: str, mult: int):
        def stage(read_version: int):
            new = orders.filter(F.col("prio") == "1-URGENT").withColumn(
                "k", F.col("k") + F.lit(mult * SCC_OFFSET)
            )
            return snap.stage_partition_files(new, table, tag, "prio"), []

        return stage

    def stage_delete(read_version: int):
        cur = snap.read_table(
            spark, table, schema, version=read_version, domain=urgent
        )
        kept = cur.filter(~(F.col("k") % SCC_DEL_MOD == 0))
        adds = snap.stage_partition_files(kept, table, "del_a1", "prio")
        removes = [
            f for f in snap.live_files(table, read_version) if f[1] in urgent
        ]
        return adds, removes

    def make_compactor(tag: str, part: str):
        counter = {"n": 0}

        def stage(read_version: int):
            counter["n"] += 1
            cur = snap.read_table(
                spark, table, schema, version=read_version, domain={part}
            )
            adds = snap.stage_partition_files(
                cur, table, f"{tag}_a{counter['n']}", "prio"
            )
            removes = [
                f for f in snap.live_files(table, read_version) if f[1] == part
            ]
            return adds, removes

        return stage

    # v0 base + v1 append: '1-URGENT' now has two live files
    snap.optimistic_commit(
        table, "overwrite", None, "base",
        lambda rv: (snap.stage_partition_files(orders, table, "base_a1",
                                               "prio"), []),
    )
    snap.optimistic_commit(
        table, "append", urgent, "app1", stage_append("app1_a1", 1)
    )
    # C1 stages ... and stalls while the delete commits v2
    c1 = make_compactor("opt1", "1-URGENT")
    c1_read = snap.table_head(table)
    c1_pre = c1(c1_read)
    snap.optimistic_commit(table, "delete", urgent, "deleter", stage_delete)
    entry_c1 = snap.optimistic_commit(
        table, "rewrite", urgent, "opt1", c1, prestaged=(c1_read, *c1_pre)
    )
    assert entry_c1["attempt"] == 2, entry_c1
    assert entry_c1["conflicts"] == [
        {"kind": "ConcurrentDeleteDelete", "with_version": 2}
    ], entry_c1
    # C2 stages at v3, an append lands v4, C2 still commits first-try
    c2 = make_compactor("opt2", "1-URGENT")
    c2_read = snap.table_head(table)
    c2_pre = c2(c2_read)
    snap.optimistic_commit(
        table, "append", urgent, "app2", stage_append("app2_a1", 2),
        prestaged=(0, *stage_append("app2_a1", 2)(0)),
    )
    entry_c2 = snap.optimistic_commit(
        table, "rewrite", urgent, "opt2", c2, prestaged=(c2_read, *c2_pre)
    )
    assert entry_c2["attempt"] == 1 and entry_c2["conflicts"] == [], entry_c2
    # D rewrites the disjoint '5-LOW' partition from a stale v0 read
    d = make_compactor("opt3", "5-LOW")
    entry_d = snap.optimistic_commit(
        table, "rewrite", {"5-LOW"}, "opt3", d, prestaged=(0, *d(0))
    )
    assert entry_d["attempt"] == 1 and entry_d["conflicts"] == [], entry_d

    commits = snap.read_commits(table)
    n_versions = len(commits)
    n_retried = sum(1 for c in commits if c["attempt"] > 1)
    live_dirs = {}
    for _path, part in snap.live_files(table):
        live_dirs[part] = live_dirs.get(part, 0) + 1
    live_df = spark.createDataFrame(
        [(p, n) for p, n in sorted(live_dirs.items())],
        "prio string, n_live_files bigint",
    )
    final = snap.read_table(spark, table, schema)
    return (
        final.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").alias("key_sum"),
            F.sum((F.col("k") >= SCC_OFFSET).cast("bigint")).alias(
                "n_appended"
            ),
        )
        .join(F.broadcast(live_df), "prio")
        .select(
            "prio",
            "n_rows",
            "key_sum",
            "n_appended",
            "n_live_files",
            F.lit(n_versions).cast("bigint").alias("n_versions"),
            F.lit(n_retried).cast("bigint").alias("n_retried"),
        )
    )


ORACLE["snapshot_optimize_transactional"] = f"""
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS prio
      FROM orders
    ),
    app1 AS (
      SELECT k + {SCC_OFFSET} AS k, prio FROM base WHERE prio = '1-URGENT'
    ),
    app2 AS (
      SELECT k + {2 * SCC_OFFSET} AS k, prio FROM base
      WHERE prio = '1-URGENT'
    ),
    final AS (
      SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM app1) u
      WHERE NOT (prio = '1-URGENT' AND k % {SCC_DEL_MOD} = 0)
      UNION ALL
      SELECT * FROM app2
    )
    SELECT prio,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS key_sum,
           CAST(coalesce(sum(CASE WHEN k >= {SCC_OFFSET} THEN 1 END), 0)
                AS BIGINT) AS n_appended,
           CAST(CASE prio WHEN '1-URGENT' THEN 2 ELSE 1 END AS BIGINT)
             AS n_live_files,
           CAST(7 AS BIGINT) AS n_versions,
           CAST(1 AS BIGINT) AS n_retried
    FROM final
    GROUP BY prio
"""
QUERIES["snapshot_optimize_transactional"] = snapshot_optimize_transactional


# ---- shallow clone + divergent writers --------------------------------------

SCL_DEL_MOD = 3  # source's post-clone delete predicate: k % 3 == 0


def snapshot_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy SHALLOW CLONE audit: clone a snapshot table at a
    pinned version, then let source and clone DIVERGE — the
    dev/staging workflow Delta's ``CREATE TABLE ... SHALLOW CLONE``
    exists for (experiment on production data without copying it or
    endangering it).

    Script (all through ``sources/snapshots.py``):

    * source v0: overwrite with orders ``(k, prio)`` partitioned by
      priority; source v1: blind append of the urgent rows shifted by
      ``SCC_OFFSET``;
    * **clone at v1** (``shallow_clone``): the clone's v0 references
      the source's base+append files by absolute path — no bytes move;
    * source v2 (post-clone): delete-where ``prio = '1-URGENT' AND
      k % SCL_DEL_MOD = 0`` — rewrites the urgent partition;
    * clone v1 (post-clone): blind append of the '5-LOW' rows shifted
      by ``SCC_OFFSET``.

    Output: per (table, priority) rowcount / key-sum / appended-count
    plus each log's version count.  The numbers only come out right if
    isolation held BOTH ways: the clone must still serve the
    pre-delete urgent rows through the source's ORIGINAL files (its
    pinned v1 — a clone that tracked the source would lose them), and
    the source must not see the clone's '5-LOW' append (a clone that
    wrote through would inflate it).

    Scale shape: the clone commit is METADATA-ONLY — one log entry
    listing the source's live files, O(files) however many petabytes
    they hold; divergent writes are ordinary staged commits on
    independent logs, and reads resolve absolute-path adds with zero
    indirection.  The source-retention hazard (vacuum kills clones) is
    documented at the protocol function.
    """
    import tempfile

    from velib_lakehouse_spark.sources import snapshots as snap

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("prio"),
    )
    src = tempfile.mkdtemp(prefix="scl_src_")
    dst = tempfile.mkdtemp(prefix="scl_dst_")
    _BACKFILL_DIRS.extend([src, dst])
    schema = "k bigint, prio string"
    urgent = {"1-URGENT"}

    snap.optimistic_commit(
        src,
        "overwrite",
        None,
        "base",
        lambda rv: (snap.stage_partition_files(orders, src, "base_a1", "prio"), []),
    )
    appended = orders.filter(F.col("prio") == "1-URGENT").withColumn(
        "k", F.col("k") + F.lit(SCC_OFFSET)
    )
    snap.optimistic_commit(
        src,
        "append",
        urgent,
        "pre_clone_append",
        lambda rv: (snap.stage_partition_files(appended, src, "app_a1", "prio"), []),
    )

    clone_entry = snap.shallow_clone(src, dst)
    assert clone_entry["clone_of"]["version"] == 1, clone_entry

    def stage_delete(read_version: int):
        cur = snap.read_table(
            spark, src, schema, version=read_version, domain=urgent
        )
        kept = cur.filter(~(F.col("k") % SCL_DEL_MOD == 0))
        adds = snap.stage_partition_files(kept, src, "del_a1", "prio")
        removes = [
            f for f in snap.live_files(src, read_version) if f[1] in urgent
        ]
        return adds, removes

    snap.optimistic_commit(src, "delete", urgent, "post_clone_delete", stage_delete)

    low = orders.filter(F.col("prio") == "5-LOW").withColumn(
        "k", F.col("k") + F.lit(SCC_OFFSET)
    )
    snap.optimistic_commit(
        dst,
        "append",
        {"5-LOW"},
        "clone_append",
        lambda rv: (snap.stage_partition_files(low, dst, "cApp_a1", "prio"), []),
    )

    n_src_versions = len(snap.read_commits(src))
    n_dst_versions = len(snap.read_commits(dst))
    final_src = snap.read_table(spark, src, schema).withColumn(
        "tbl", F.lit("source")
    )
    final_dst = snap.read_table(spark, dst, schema).withColumn(
        "tbl", F.lit("clone")
    )
    return (
        final_src.unionByName(final_dst)
        .groupBy("tbl", "prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").alias("key_sum"),
            F.sum((F.col("k") >= SCC_OFFSET).cast("bigint")).alias(
                "n_appended"
            ),
        )
        .select(
            "tbl",
            "prio",
            "n_rows",
            "key_sum",
            "n_appended",
            F.when(F.col("tbl") == "source", F.lit(n_src_versions))
            .otherwise(F.lit(n_dst_versions))
            .cast("bigint")
            .alias("n_versions"),
        )
    )


ORACLE["snapshot_shallow_clone"] = f"""
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS prio
      FROM orders
    ),
    urgent_app AS (
      SELECT k + {SCC_OFFSET} AS k, prio FROM base WHERE prio = '1-URGENT'
    ),
    low_app AS (
      SELECT k + {SCC_OFFSET} AS k, prio FROM base WHERE prio = '5-LOW'
    ),
    source_final AS (
      SELECT * FROM (
        SELECT * FROM base UNION ALL SELECT * FROM urgent_app
      ) u
      WHERE NOT (prio = '1-URGENT' AND k % {SCL_DEL_MOD} = 0)
    ),
    clone_final AS (
      SELECT * FROM base
      UNION ALL SELECT * FROM urgent_app
      UNION ALL SELECT * FROM low_app
    ),
    tagged AS (
      SELECT 'source' AS tbl, * FROM source_final
      UNION ALL
      SELECT 'clone' AS tbl, * FROM clone_final
    )
    SELECT tbl, prio,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS key_sum,
           CAST(coalesce(sum(CASE WHEN k >= {SCC_OFFSET} THEN 1 END), 0)
                AS BIGINT) AS n_appended,
           CAST(CASE WHEN tbl = 'source' THEN 3 ELSE 2 END AS BIGINT)
             AS n_versions
    FROM tagged
    GROUP BY tbl, prio
"""
QUERIES["snapshot_shallow_clone"] = snapshot_shallow_clone
