"""Relational operator breadth (SURVEY.md §2.3-2.7) on the TPC-H-ish tables.

One named query per operator family so the oracle harness exercises each
primitive in isolation: equi/broadcast/shuffle/left/semi/anti/cross
joins, grouped and windowed aggregation (rows + range frames), ordered
list aggregation, conditional expressions, date/interval arithmetic,
set operations, explode, pivot, rollup.

Scale discipline applied throughout:
* dimension sides (region/nation/customer) are explicitly broadcast;
* fact-fact joins (orders x lineitem) shuffle on the join key and rely
  on AQE for skew/partition sizing;
* aggregates are expressed so Catalyst plants partial (map-side)
  aggregation before the exchange;
* every window order carries a unique tiebreak for reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.collections import csv_scaled, ordered_collect
from velib_lakehouse_spark.functions.convert import millis
from velib_lakehouse_spark.functions.exact import (
    cents,
    cents_product,
    dec_avg,
    dec_product,
    dec_sum,
    dec_sum_expr,
    micro_avg_6dp,
    micro_sum_2dp,
    sql_cents,
    sql_cents_product,
    sql_micro_avg_6dp,
    sql_micro_sum_2dp,
)


def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter -> groupBy 2 cols -> multi-agg.

    The canonical partial-agg pattern: Catalyst plants a map-side
    HashAggregate before the exchange, so shuffled bytes are O(groups),
    not O(rows) — the property that makes this run at 100TB.
    """
    l = load_table(spark, sf_dir, "lineitem")
    # Integer fixed-point fast path (functions/exact.py): the money and
    # quantity columns carry <= 2 decimals, so micro-unit longs give the
    # same exact, associative sums as the decimal route at codegen speed
    # (decimal sums widen past long-backed precision and fall off
    # whole-stage codegen — measured ~3x on this aggregate).
    qty_m = cents("l_quantity") * F.lit(100)
    price_m = cents("l_extendedprice") * F.lit(100)
    disc_price_m = cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            micro_sum_2dp(qty_m, "sum_qty"),
            micro_sum_2dp(price_m, "sum_base_price"),
            micro_sum_2dp(disc_price_m, "sum_disc_price"),
            micro_avg_6dp(qty_m, "l_quantity", "avg_qty"),
            micro_avg_6dp(cents("l_discount") * F.lit(100), "l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def join_broadcast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact -> dim -> dim broadcast chain (customer⋈nation⋈region).

    Both dimensions are broadcast explicitly: zero shuffles for the
    joins, one exchange for the final aggregation.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal", "total_acctbal"),
        )
    )


def join_shuffle_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact shuffle join (orders⋈lineitem) + aggregation.

    Both sides hash-partition on the order key; at scale this is the
    sort-merge/shuffled-hash case AQE tunes (skew split, partition
    coalescing).  Revenue is the exact fixed-point product-sum
    (see tpch_q1_pricing).
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            micro_sum_2dp(
                cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount")),
                "revenue",
            ),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving dimension rows with no facts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dec_sum_expr(F.col("o_totalprice")), F.lit(0.0)).alias(
                "total_spend"
            ),
        )
    )


def semi_orders_with_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS rewrite, J2 analog of reference src/api.py:54)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(l.select("l_orderkey"), o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def anti_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): parts that appear on no lineitem."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(l.select("l_partkey"), p.p_partkey == l.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
    )


def cross_scalar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two 1-row aggregate CTEs cross-joined with a derived ratio
    (J3/A8; the shape of reference src/api.py:98-126)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    os = o.agg(
        F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "sum_price")
    )
    ls = l.agg(F.count(F.lit(1)).alias("n_lines"), dec_sum("l_quantity", "sum_qty"))
    return os.crossJoin(ls).withColumn(
        "lines_per_order",
        F.round(F.col("n_lines").cast("double") / F.col("n_orders"), 6),
    )


def topn_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group (N=3) via ranked window — the reference's W2 shape."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


def rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface: rank / dense_rank / percent_rank
    / cume_dist over a tie-heavy key (order year), plus row_number and
    ntile with a full tiebreak (they are order-sensitive within ties, so
    determinism requires a total order)."""
    o = load_table(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    w_ties = Window.partitionBy("o_orderstatus").orderBy(year.asc())
    w_total = Window.partitionBy("o_orderstatus").orderBy(
        year.asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        year.cast("bigint").alias("order_year"),
        F.rank().over(w_ties).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_ties).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w_ties), 6).alias("prnk"),
        F.round(F.cume_dist().over(w_ties), 6).alias("cdist"),
        F.row_number().over(w_total).cast("bigint").alias("rn"),
        F.ntile(4).over(w_total).cast("bigint").alias("quartile"),
    )


def global_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (top-20 revenue orders).

    Spark plans this as TakeOrderedAndProject — per-partition top-K then
    a driver merge of K-sized heaps, never a full global sort; the
    orderkey tiebreak makes the cut deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame running sum + lag per customer over order time (W3 family)."""
    o = load_table(spark, sf_dir, "orders")
    ws = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        millis("o_orderdate").alias("order_date_ms"),
        "o_totalprice",
        (
            F.sum(cents("o_totalprice"))
            .over(ws.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            / F.lit(100.0)
        ).alias("running_spend"),
        F.lag("o_totalprice").over(ws).alias("prev_price"),
        F.row_number().over(ws).cast("bigint").alias("order_seq"),
    )


def window_range_trailing_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over days (W4 family): trailing-30-day order count/sum
    per customer, ordered by epoch day."""
    o = load_table(spark, sf_dir, "orders")
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.to_date("o_orderdate")))
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        millis("o_orderdate").alias("order_date_ms"),
        F.count(F.lit(1)).over(wr).alias("orders_30d"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(wr)
        .cast("double")
        .alias("spend_30d"),
    )


def count_if_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-count aggregation (A7; reference src/api.py:73-74)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") < 100000).alias("n_small"),
        F.count_if(
            (F.col("o_totalprice") >= 100000) & (F.col("o_totalprice") < 300000)
        ).alias("n_mid"),
        F.count_if(F.col("o_totalprice") >= 300000).alias("n_large"),
        F.count(F.lit(1)).alias("n_total"),
    )


def collect_ordered_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (A5: DuckDB LIST(x ORDER BY ...) parity,
    reference src/api.py:59) — per-order quantities by ship date.

    Quantities are integral doubles, serialized to a comma-joined int
    string (``csv_scaled``) so the driver's pandas canonicalizer can
    hash the cell; the ordered-array form stays available through
    ``functions.collections.ordered_collect``.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_orderkey").agg(
        csv_scaled(
            ordered_collect(
                F.col("l_quantity"), millis("l_shipdate"), F.col("l_linenumber")
            ),
            1,
        ).alias("quantities_csv"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch conditional expression (P6: when/otherwise chain)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.withColumn("price_bucket", bucket)
        .groupBy("price_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", "bucket_total"),
        )
    )


def date_interval_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic predicate + month truncation (P4/P9 family)."""
    o = load_table(spark, sf_dir, "orders")
    start = F.lit("1998-01-01").cast("date")
    return (
        o.filter(
            (F.col("o_orderdate") >= start)
            & (F.col("o_orderdate") < F.date_add(start, 365))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", "month_total"),
        )
    )


def union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two tagged projections + re-aggregation (set-op surface)."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 300000).select(
        F.lit("high_value").alias("src"), "o_orderkey"
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src"), "o_orderkey"
    )
    return (
        hi.unionAll(urgent)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_orderkey").alias("n_distinct"),
        )
    )


def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a multi-column projection."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide conditional counts) on order status."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
        .withColumnsRenamed({"O": "n_open", "F": "n_finished", "P": "n_partial"})
    )


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide->long melt) — the inverse of ``pivot_status_counts``:
    lineitem's four measure columns become (metric, value) rows, then a
    per-(returnflag, metric) exact aggregate.

    Uses the native ``DataFrame.unpivot`` (SPARK-39877 melt), which
    compiles to an Expand node — each input row is emitted once per
    measure map-side, no shuffle until the aggregate; with partial
    aggregation the shuffle carries n_flags x n_metrics rows per
    partition regardless of corpus size.  Sums/averages follow the
    decimal-exact conventions of functions/exact.py, so the fold is
    associative and AQE-stable at any partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value", "total"),
        dec_avg("value", "avg_value"),
    )


def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregation with grouping() indicators."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.grouping("r_name").cast("bigint").alias("g_region"),
        F.grouping("n_name").cast("bigint").alias("g_nation"),
    )


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the native ``DataFrame.groupingSets``
    API, SPARK-45929) — the general form that cube/rollup specialize:
    per-status totals, per-priority totals, and the grand total in ONE
    pass (an Expand node fans each row into its sets map-side; one
    shuffle for all three aggregation levels — at 100 TB, one scan
    instead of three UNION'd aggregates).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice", "total_price"),
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
    )


def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode / UNNEST (O4; reference src/api.py:103) over document
    tokens, with a HAVING-style post-aggregation filter."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") > 20
    )


ORACLE: dict[str, str | None] = {
    "tpch_q1_pricing": f"""
        WITH m AS (
          SELECT l_returnflag, l_linestatus, l_quantity, l_discount,
                 {sql_cents('l_quantity')} * 100 AS qty_m,
                 {sql_cents('l_extendedprice')} * 100 AS price_m,
                 {sql_cents_product('l_extendedprice', '1 - l_discount')}
                   AS disc_price_m,
                 {sql_cents('l_discount')} * 100 AS disc_m
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        )
        SELECT l_returnflag, l_linestatus,
               {sql_micro_sum_2dp('qty_m', 'sum_qty')},
               {sql_micro_sum_2dp('price_m', 'sum_base_price')},
               {sql_micro_sum_2dp('disc_price_m', 'sum_disc_price')},
               {sql_micro_avg_6dp('qty_m', 'l_quantity', 'avg_qty')},
               {sql_micro_avg_6dp('disc_m', 'l_discount', 'avg_disc')},
               COUNT(*) AS count_order
        FROM m
        GROUP BY l_returnflag, l_linestatus
    """,
    "join_broadcast_chain": """
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "join_shuffle_revenue": f"""
        SELECT o_orderpriority,
               {sql_micro_sum_2dp(
                   sql_cents_product('l_extendedprice', '1 - l_discount'),
                   'revenue',
               )},
               COUNT(DISTINCT o_orderkey) AS n_orders,
               COUNT(*) AS n_lines
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    "join_left_order_counts": """
        SELECT c_custkey, c_name,
               COUNT(o_orderkey) AS n_orders,
               COALESCE(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE),
                        0.0) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "semi_orders_with_lines": """
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
        GROUP BY o_orderstatus
    """,
    "anti_parts_never_ordered": """
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
    """,
    "cross_scalar_stats": """
        WITH os AS (
          SELECT COUNT(*) AS n_orders,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_price
          FROM orders
        ),
        ls AS (
          SELECT COUNT(*) AS n_lines,
                 CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
          FROM lineitem
        )
        SELECT os.n_orders, os.sum_price, ls.n_lines, ls.sum_qty,
               ROUND(CAST(ls.n_lines AS DOUBLE) / os.n_orders, 6)
                 AS lines_per_order
        FROM os CROSS JOIN ls
    """,
    "topn_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders
        )
        WHERE rn <= 3
    """,
    "rank_family": """
        SELECT o_orderkey, o_orderstatus,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               rank() OVER wt AS rnk,
               dense_rank() OVER wt AS drnk,
               ROUND(percent_rank() OVER wt, 6) AS prnk,
               ROUND(cume_dist() OVER wt, 6) AS cdist,
               row_number() OVER wtot AS rn,
               ntile(4) OVER wtot AS quartile
        FROM orders
        WINDOW wt AS (PARTITION BY o_orderstatus ORDER BY year(o_orderdate) ASC),
               wtot AS (PARTITION BY o_orderstatus
                        ORDER BY year(o_orderdate) ASC, o_orderkey ASC)
    """,
    "global_sort_limit": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20
    """,
    "window_running_totals": """
        SELECT o_custkey, o_orderkey,
               epoch_ms(o_orderdate) AS order_date_ms,
               o_totalprice,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 100.0 AS running_spend,
               lag(o_totalprice) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price,
               row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC) AS order_seq
        FROM orders
    """,
    "window_range_trailing_count": """
        SELECT o_custkey, o_orderkey,
               epoch_ms(o_orderdate) AS order_date_ms,
               COUNT(*) OVER wr AS orders_30d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER wr AS DOUBLE)
                 AS spend_30d
        FROM orders
        WINDOW wr AS (
          PARTITION BY o_custkey
          ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
    "count_if_bands": """
        SELECT o_orderpriority,
               CAST(count_if(o_totalprice < 100000) AS BIGINT) AS n_small,
               CAST(count_if(o_totalprice >= 100000 AND o_totalprice < 300000)
                    AS BIGINT) AS n_mid,
               CAST(count_if(o_totalprice >= 300000) AS BIGINT) AS n_large,
               COUNT(*) AS n_total
        FROM orders
        GROUP BY o_orderpriority
    """,
    "collect_ordered_quantities": """
        SELECT l_orderkey,
               array_to_string(list_transform(
                   list(l_quantity
                        ORDER BY l_shipdate ASC, l_linenumber ASC,
                                 l_quantity ASC),
                   x -> CAST(CAST(round(x) AS BIGINT) AS VARCHAR)
               ), ',') AS quantities_csv,
               COUNT(*) AS n_lines
        FROM lineitem
        GROUP BY l_orderkey
    """,
    "case_buckets": """
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    WHEN o_totalprice < 300000 THEN 'large'
                    ELSE 'jumbo' END AS price_bucket,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS bucket_total
        FROM orders
        GROUP BY 1
    """,
    "date_interval_filter": """
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS month_total
        FROM orders
        WHERE o_orderdate >= DATE '1998-01-01'
          AND o_orderdate < DATE '1998-01-01' + INTERVAL 365 DAY
        GROUP BY 1
    """,
    "union_tagged": """
        SELECT src, COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS n_distinct
        FROM (
          SELECT 'high_value' AS src, o_orderkey FROM orders
          WHERE o_totalprice > 300000
          UNION ALL
          SELECT 'urgent' AS src, o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT'
        )
        GROUP BY src
    """,
    "distinct_pairs": """
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    "pivot_status_counts": """
        SELECT o_orderpriority,
               CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_open,
               CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
               CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS n_partial
        FROM orders
        GROUP BY o_orderpriority
    """,
    "unpivot_metrics": """
        WITH long AS (
          SELECT l_returnflag, metric, value
          FROM lineitem
          UNPIVOT (value FOR metric IN
                   (l_quantity, l_extendedprice, l_discount, l_tax))
        )
        SELECT l_returnflag, metric,
               CAST(count(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(value), 6) AS avg_value
        FROM long
        GROUP BY l_returnflag, metric
    """,
    "grouping_sets_orders": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_price,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "rollup_region_nation": """
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               CAST(grouping(r_name) AS BIGINT) AS g_region,
               CAST(grouping(n_name) AS BIGINT) AS g_nation
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    "explode_words": """
        SELECT word, COUNT(*) AS n
        FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents
        )
        WHERE word <> ''
        GROUP BY word
        HAVING COUNT(*) > 20
    """,
}

QUERIES = {
    "tpch_q1_pricing": tpch_q1_pricing,
    "join_broadcast_chain": join_broadcast_chain,
    "join_shuffle_revenue": join_shuffle_revenue,
    "join_left_order_counts": join_left_order_counts,
    "semi_orders_with_lines": semi_orders_with_lines,
    "anti_parts_never_ordered": anti_parts_never_ordered,
    "cross_scalar_stats": cross_scalar_stats,
    "topn_orders_per_customer": topn_orders_per_customer,
    "rank_family": rank_family,
    "global_sort_limit": global_sort_limit,
    "window_running_totals": window_running_totals,
    "window_range_trailing_count": window_range_trailing_count,
    "count_if_bands": count_if_bands,
    "collect_ordered_quantities": collect_ordered_quantities,
    "case_buckets": case_buckets,
    "date_interval_filter": date_interval_filter,
    "union_tagged": union_tagged,
    "distinct_pairs": distinct_pairs,
    "pivot_status_counts": pivot_status_counts,
    "unpivot_metrics": unpivot_metrics,
    "grouping_sets_orders": grouping_sets_orders,
    "rollup_region_nation": rollup_region_nation,
    "explode_words": explode_words,
}


# ---- TPC-H Q3 (round 4) ------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01"
Q3_TOP_N = 10


def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: the classic 3-way
    fact-dim join + filtered aggregate + global top-N.

    customer (filtered to one segment) broadcasts into orders, the
    result shuffles once against lineitem on orderkey; revenue uses the
    integer micro-unit route (functions/exact.py) so the top-N ordering
    is engine-exact.  The final sort is LIMIT-bounded (TakeOrderedAndProject
    — O(N) per partition, no global sort materialization).  o_orderpriority
    stands in for the spec's o_shippriority (not in this schema).
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("date")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("date")
    )
    rev_m = cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount"))
    return (
        l.join(
            F.broadcast(
                o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
                    "o_orderkey", "o_orderdate", "o_orderpriority"
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(micro_sum_2dp(rev_m, "revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(Q3_TOP_N)
    )


ORACLE["tpch_q3_shipping"] = f"""
    WITH j AS (
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             {sql_cents_product('l_extendedprice', '1 - l_discount')} AS rev_m
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = '{Q3_SEGMENT}'
        AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
        AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
    )
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority,
           {sql_micro_sum_2dp('rev_m', 'revenue')}
    FROM j
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT {Q3_TOP_N}
"""
QUERIES["tpch_q3_shipping"] = tpch_q3_shipping


# ---- TPC-H Q5: local-supplier volume (6-table star join) ----

Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier volume: revenue per nation from
    line items where the CUSTOMER and the SUPPLIER sit in the same
    nation of one region, for one order-date year.

    The six-table join is declared flat and left to Catalyst; the only
    hints are broadcasts of the two true dimensions (region-filtered
    nation, 25 rows at any TPC-H scale).  customer and supplier are
    semi-reduced by the broadcast nation BEFORE the fact joins, so at
    cluster scale the plan is: lineitem shuffles once on suppkey
    against the nation-pruned supplier, orders shuffles on custkey
    against the nation-pruned customer, the two meet on orderkey, and
    the co-nation predicate (c_nationkey = s_nationkey) filters the
    join output — the canonical distributed Q5.  Revenue uses the
    integer micro-unit route so the per-nation ordering is
    engine-exact.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_DATE_LO).cast("date"))
        & (F.col("o_orderdate") < F.lit(Q5_DATE_HI).cast("date"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    rev_m = cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount"))
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            o.join(c, F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(micro_sum_2dp(rev_m, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


ORACLE["tpch_q5_local_supplier"] = f"""
    SELECT n_name, {sql_micro_sum_2dp(
        sql_cents_product('l_extendedprice', '1 - l_discount'), 'revenue')}
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = '{Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{Q5_DATE_LO} 00:00:00'
      AND o_orderdate < TIMESTAMP '{Q5_DATE_HI} 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
"""
QUERIES["tpch_q5_local_supplier"] = tpch_q5_local_supplier


# ---- TPC-H Q18: large-volume customers (HAVING filter joined back) ----

Q18_MIN_QTY = 250
Q18_TOP_N = 10


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume-customer query: orders whose total
    line quantity exceeds a threshold, joined back to the customer and
    order detail, top-N by price.

    The shape TPC-H added this query FOR: a grouped HAVING filter over
    the biggest fact table whose (small) result then drives the rest of
    the join tree.  The quantity rollup reduces lineitem once
    (map-side partials on orderkey); its filtered survivors — a tiny
    fraction at any scale — broadcast back into orders, so the fact
    table is never shuffled against orders at all; customer enriches
    via one more key join.  Quantities are integer-valued by TPC-H
    construction and summed as longs; the final top-N is
    TakeOrderedAndProject, never a global sort.
    """
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(
            F.sum(F.expr("cast(round(l_quantity) as bigint)")).alias(
                "total_qty"
            )
        )
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias(
                "price_cents"
            ),
            "total_qty",
        )
        .orderBy(F.desc("price_cents"), F.asc("o_orderkey"))
        .limit(Q18_TOP_N)
    )


ORACLE["tpch_q18_large_orders"] = f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {Q18_MIN_QTY}
    )
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           total_qty
    FROM orders
    JOIN big ON o_orderkey = big.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY price_cents DESC, o_orderkey ASC
    LIMIT {Q18_TOP_N}
"""
QUERIES["tpch_q18_large_orders"] = tpch_q18_large_orders


# ---- Market-basket affinity (support / confidence / lift) ----

BASKET_MIN_SUPPORT = 2


def basket_affinity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over orders: for every pair of parts
    co-purchased in at least ``BASKET_MIN_SUPPORT`` orders, the
    support, directional confidence, and lift — the A-priori first
    level plus association metrics, in integer ppm.

    Scale shape: baskets are (order, part) distinct rows; the pair
    generation self-joins WITHIN an order key, so fan-out per order is
    C(items, 2) with items bounded by order size (TPC-H max 7 lines;
    a DF cap would bound pathological baskets the same way
    `dedup_ngram_jaccard` caps hot shingles).  Item and pair supports
    are two key-bounded aggregations; the metric join broadcasts the
    item-support table (one row per distinct part — catalog-bounded,
    not order-bounded).
    """
    l = load_table(spark, sf_dir, "lineitem")
    items = l.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = items.select("o").distinct().count()
    ia = items.select("o", F.col("p").alias("a"))
    ib = items.select("o", F.col("p").alias("b"))
    pair_supp = (
        ia.join(ib, "o")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support_ab"))
        .filter(F.col("support_ab") >= BASKET_MIN_SUPPORT)
    )
    item_supp = items.groupBy("p").agg(F.count(F.lit(1)).alias("supp"))
    return (
        pair_supp.join(
            F.broadcast(item_supp.select(F.col("p").alias("a"),
                                         F.col("supp").alias("supp_a"))),
            "a",
        )
        .join(
            F.broadcast(item_supp.select(F.col("p").alias("b"),
                                         F.col("supp").alias("supp_b"))),
            "b",
        )
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            "support_ab",
            "supp_a",
            "supp_b",
            F.expr("support_ab * 1000000 div supp_a").alias("conf_a_to_b_ppm"),
            F.expr("support_ab * 1000000 div supp_b").alias("conf_b_to_a_ppm"),
            F.expr(
                f"support_ab * {n_orders}L * 1000000 div (supp_a * supp_b)"
            ).alias("lift_ppm"),
        )
    )


ORACLE["basket_affinity_pairs"] = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM items),
    pair_supp AS (
      SELECT a.p AS part_a, b.p AS part_b,
             CAST(count(*) AS BIGINT) AS support_ab
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
      HAVING count(*) >= {BASKET_MIN_SUPPORT}
    ),
    item_supp AS (
      SELECT p, CAST(count(*) AS BIGINT) AS supp FROM items GROUP BY p
    )
    SELECT ps.part_a, ps.part_b, ps.support_ab,
           sa.supp AS supp_a, sb.supp AS supp_b,
           ps.support_ab * 1000000 // sa.supp AS conf_a_to_b_ppm,
           ps.support_ab * 1000000 // sb.supp AS conf_b_to_a_ppm,
           ps.support_ab * n.n_orders * 1000000 // (sa.supp * sb.supp)
             AS lift_ppm
    FROM pair_supp ps
    JOIN item_supp sa ON sa.p = ps.part_a
    JOIN item_supp sb ON sb.p = ps.part_b
    CROSS JOIN n
"""
QUERIES["basket_affinity_pairs"] = basket_affinity_pairs


# ---- TPC-H Q10: returned-item revenue (top customers by loss) ----

Q10_DATE_LO = "1997-01-01"
Q10_DATE_HI = "1998-01-01"
Q10_TOP_N = 20


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: customers who returned
    the most revenue in one order-date year, enriched with their
    nation — the classic "who is hurting us" join tree.

    Shape: the returnflag filter reaches the lineitem scan (pushed
    predicate); date-filtered orders join customers on the shuffled
    key; nation broadcasts; revenue uses the integer micro-unit route;
    top-N is TakeOrderedAndProject.  Unlike Q18 the fact side cannot
    pre-reduce (the group key includes customer attributes), so this
    pins the orders⋈lineitem⋈customer shuffle tree Catalyst should
    pick when no side collapses.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_DATE_LO).cast("date"))
        & (F.col("o_orderdate") < F.lit(Q10_DATE_HI).cast("date"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev_m = cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(micro_sum_2dp(rev_m, "returned_revenue"))
        .orderBy(F.desc("returned_revenue"), F.asc("c_custkey"))
        .limit(Q10_TOP_N)
    )


ORACLE["tpch_q10_returned_items"] = f"""
    SELECT c_custkey, c_name, n_name, c_mktsegment,
           {sql_micro_sum_2dp(
               sql_cents_product('l_extendedprice', '1 - l_discount'),
               'returned_revenue')}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{Q10_DATE_LO} 00:00:00'
      AND o_orderdate < TIMESTAMP '{Q10_DATE_HI} 00:00:00'
    GROUP BY c_custkey, c_name, n_name, c_mktsegment
    ORDER BY returned_revenue DESC, c_custkey ASC
    LIMIT {Q10_TOP_N}
"""
QUERIES["tpch_q10_returned_items"] = tpch_q10_returned_items


# ---- TPC-H Q6: forecast revenue change (pure scan-filter-agg) ----

Q6_DATE_LO = "1996-01-01"
Q6_DATE_HI = "1997-01-01"
Q6_DISC_LO_BP = 5   # discount band in basis points of 100 (0.05..0.07)
Q6_DISC_HI_BP = 7
Q6_MAX_QTY = 24


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue query: one full-scan
    filter-aggregate with NO join and NO group key — the purest test
    that predicates reach the parquet scan (all three filters show in
    PushedFilters) and that a 100 TB scan reduces map-side to a single
    row per partition before one tiny final merge.

    The discount band compares exact integer cents (the double column
    is 2-decimal by TPC-H construction), so the filter is bit-precise
    on both engines rather than a float epsilon test.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_cents = F.expr("cast(round(l_discount * 100) as bigint)")
    rev_m = cents_product(F.col("l_extendedprice"), F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit(Q6_DATE_LO).cast("date"))
            & (F.col("l_shipdate") < F.lit(Q6_DATE_HI).cast("date"))
            & (F.col("l_quantity") < Q6_MAX_QTY)
        )
        .filter(
            (disc_cents >= Q6_DISC_LO_BP) & (disc_cents <= Q6_DISC_HI_BP)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            micro_sum_2dp(rev_m, "forecast_revenue"),
        )
    )


ORACLE["tpch_q6_forecast_revenue"] = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           {sql_micro_sum_2dp(
               sql_cents_product('l_extendedprice', 'l_discount'),
               'forecast_revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_DATE_LO} 00:00:00'
      AND l_shipdate < TIMESTAMP '{Q6_DATE_HI} 00:00:00'
      AND l_quantity < {Q6_MAX_QTY}
      AND CAST(round(l_discount * 100) AS BIGINT)
            BETWEEN {Q6_DISC_LO_BP} AND {Q6_DISC_HI_BP}
"""
QUERIES["tpch_q6_forecast_revenue"] = tpch_q6_forecast_revenue
