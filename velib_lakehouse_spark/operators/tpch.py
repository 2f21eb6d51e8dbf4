"""TPC-H query-suite completion: Q2/Q4/Q7/Q8/Q9/Q11-Q17/Q19-Q22 shaped
queries on the TPC-H-ish test tables (Q1/Q3/Q5/Q6/Q10/Q18 live in
relational.py).

The testdata schema is a trimmed TPC-H: there is NO partsupp table and
no l_commitdate/l_receiptdate/l_shipmode/p_container/c_phone columns,
so every query whose canonical form needs one of those is ADAPTED:
part-supplier facts are derived from lineitem (the observed supply
relationships), commit/receipt lateness becomes shipdate-vs-orderdate
lateness, and the Q22 phone-prefix country filter becomes a nation-key
filter.  Each docstring states the adaptation; the join/agg/subquery
SHAPE — which is what exercises the engine — is preserved.

Scale discipline (the 100 TB lens):
* nation/region are always broadcast; supplier/part/customer are
  broadcast ONLY behind a selective filter (and noted), otherwise left
  to AQE — at sf100k those "dimensions" are multi-GB;
* correlated scalar subqueries (Q17's per-part average, Q15's global
  max, Q22's threshold) become one tiny aggregate frame joined back —
  never a per-row recomputation;
* EXISTS/NOT EXISTS become semi/anti joins (Q4, Q21, Q22);
* every money aggregate runs on the integer fixed-point fast path
  (functions/exact.py): exact, associative, codegen-friendly, so
  map-side partial aggregation and AQE cannot change results. Ratio
  outputs (Q8/Q14) divide two exact longs in double — one correctly
  rounded op, bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.exact import (
    cents,
    cents_product,
    micro_sum_2dp,
    sql_cents,
    sql_cents_product,
    sql_micro_sum_2dp,
)

QUERIES: dict = {}
ORACLE: dict = {}


def _year(col: str) -> F.Column:
    # Spark year() emits int32, DuckDB's int64: normalize to bigint.
    return F.year(col).cast("bigint")


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part in a region (adapted: no partsupp, so
# the supply relationship is the observed lineitem offers).
# ---------------------------------------------------------------------------

def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: for each LARGE part, the cheapest EUROPE
    supplier that ever shipped it (min observed line price, supplier
    key as the unique tiebreak).

    Adaptation: partsupp does not exist in this schema; offers are
    ``lineitem GROUP BY (part, supplier) -> MIN(price)`` — same
    "min-cost supplier per part within a region" correlated-subquery
    shape as the original, expressed as a window rank over the offer
    frame (one shuffle on partkey, no per-row subquery).

    Scale: the offer aggregation is a map-side-combinable groupBy on
    the fact table; nation/region broadcast; the part filter is
    selective (1 of 6 types) but part still scales with SF, so it
    stays a shuffle join under AQE.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")

    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents("l_extendedprice")).alias("cost_c")
    )
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("cost_c").asc(), F.col("l_suppkey").asc()
    )
    best = (
        offers.join(euro_supp, offers.l_suppkey == euro_supp.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("cost_c").cast("double") / F.lit(100.0)).alias("min_cost"),
        )
    )


ORACLE["tpch_q2_min_cost_supplier"] = f"""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN({sql_cents('l_extendedprice')}) AS cost_c
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    euro AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT o.l_partkey, o.cost_c, e.s_acctbal, e.s_name, e.n_name,
             row_number() OVER (PARTITION BY o.l_partkey
                                ORDER BY o.cost_c ASC, o.l_suppkey ASC) AS rn
      FROM offers o JOIN euro e ON o.l_suppkey = e.s_suppkey
    )
    SELECT r.s_acctbal, r.s_name, r.n_name, p.p_partkey, p.p_name,
           CAST(r.cost_c AS DOUBLE) / 100.0 AS min_cost
    FROM ranked r JOIN part p ON r.l_partkey = p.p_partkey
    WHERE r.rn = 1 AND p.p_type = 'LARGE'
"""
QUERIES["tpch_q2_min_cost_supplier"] = tpch_q2_min_cost_supplier


# ---------------------------------------------------------------------------
# Q4 — order priority checking (adapted lateness: shipdate vs orderdate).
# ---------------------------------------------------------------------------

def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: orders placed in 1996Q1 with at least one line
    shipped more than 30 days after the order date, counted per
    priority.

    Adaptation: no l_commitdate/l_receiptdate — "late" is
    ``l_shipdate > o_orderdate + 30 days``.  The EXISTS correlated
    subquery is the left-semi join with the inequality folded into the
    join condition (Spark evaluates it during the join, no
    post-filter materialization).
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


ORACLE["tpch_q4_priority_check"] = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
"""
QUERIES["tpch_q4_priority_check"] = tpch_q4_priority_check


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations by year.
# ---------------------------------------------------------------------------

def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume NATION_1 <-> NATION_2 by ship
    year (1996-1997).  No schema adaptation needed.

    Scale: the supplier->nation and customer->nation name lookups are
    broadcast; orders x lineitem is the one fact-fact shuffle; the
    nation-pair disjunction is applied BEFORE the fact join on each
    side's nation name column (filter pushdown through the broadcast
    joins), so the shuffle carries only the two nations' rows.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = F.col("supp_nation").isin("NATION_1", "NATION_2") & F.col(
        "cust_nation"
    ).isin("NATION_1", "NATION_2")

    supp_side = (
        l.join(s.select("s_suppkey", "s_nationkey"), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    cust_side = (
        o.select("o_orderkey", "o_custkey")
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    return (
        supp_side.join(cust_side, supp_side.l_orderkey == cust_side.o_orderkey)
        .filter(pair & (F.col("supp_nation") != F.col("cust_nation")))
        .groupBy(
            "supp_nation", "cust_nation", _year("l_shipdate").alias("l_year")
        )
        .agg(
            micro_sum_2dp(
                cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount")),
                "revenue",
            )
        )
    )


ORACLE["tpch_q7_volume_shipping"] = f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_micro_sum_2dp('vol_m', 'revenue')}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {sql_cents_product('l_extendedprice', '1 - l_discount')} AS vol_m
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
"""
QUERIES["tpch_q7_volume_shipping"] = tpch_q7_volume_shipping


# ---------------------------------------------------------------------------
# Q8 — national market share within a region for a part type.
# ---------------------------------------------------------------------------

def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of ECONOMY-part revenue sold to
    AMERICA customers, by order year.

    The share is a division of two exact long micro-sums performed
    once in double — bit-identical across engines and partitionings.
    Scale: part is filtered to one of six types before the fact join;
    customer-region and supplier-nation lookups broadcast.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")

    amer_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        s.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")

    vol_m = cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount"))
    joined = (
        l.join(p.select("p_partkey"), l.l_partkey == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              l.l_orderkey == F.col("o_orderkey"))
        .join(amer_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, l.l_suppkey == F.col("s_suppkey"))
        .select(
            _year("o_orderdate").alias("o_year"),
            vol_m.alias("vol_m"),
            F.when(F.col("supp_nation") == "NATION_3", vol_m)
            .otherwise(F.lit(0))
            .alias("nat_m"),
        )
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum("nat_m").cast("double") / F.sum("vol_m").cast("double")
        ).alias("mkt_share"),
        micro_sum_2dp(F.col("vol_m"), "total_volume"),
    )


ORACLE["tpch_q8_market_share"] = f"""
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {sql_cents_product('l_extendedprice', '1 - l_discount')} AS vol_m,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND o_custkey IN (
          SELECT c_custkey FROM customer
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey
          WHERE r_name = 'AMERICA'
        )
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_m
                              ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(vol_m) AS BIGINT) AS DOUBLE) AS mkt_share,
           {sql_micro_sum_2dp('vol_m', 'total_volume')}
    FROM base GROUP BY o_year
"""
QUERIES["tpch_q8_market_share"] = tpch_q8_market_share


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year (adapted supply cost).
# ---------------------------------------------------------------------------

def tpch_q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped: profit on parts whose name contains 'gear',
    grouped by supplier nation x order year.

    Adaptation: no ps_supplycost — the cost proxy is
    ``0.6 * p_retailprice * l_quantity``.  Kept exact by scaling to
    1e-5 fixed-point units in pure long math:
    ``10*cents(price)*cents(1-disc)  -  6*cents(retail)*cents(qty)``,
    summed as longs and converted once (sum < 2^53 by the documented
    fixed-point scale bound, so the single double conversion+division
    is correctly rounded and identical on both engines).
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("gear")
    )
    amount_s5 = (
        cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount"))
        * F.lit(10)
        - cents("p_retailprice") * cents("l_quantity") * F.lit(6)
    )
    return (
        l.join(p.select("p_partkey", "p_retailprice"),
               l.l_partkey == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              l.l_orderkey == F.col("o_orderkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              l.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            _year("o_orderdate").alias("o_year"),
        )
        .agg(
            (F.sum(amount_s5).cast("double") / F.lit(100000.0)).alias(
                "sum_profit"
            )
        )
    )


ORACLE["tpch_q9_nation_profit"] = f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(
             {sql_cents_product('l_extendedprice', '1 - l_discount')} * 10
             - {sql_cents('p_retailprice')} * {sql_cents('l_quantity')} * 6
           ) AS BIGINT) AS DOUBLE) / 100000.0 AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
"""
QUERIES["tpch_q9_nation_profit"] = tpch_q9_nation_profit


# ---------------------------------------------------------------------------
# Q11 — important parts by traded value within a region (adapted).
# ---------------------------------------------------------------------------

def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: parts whose traded value through ASIA
    suppliers exceeds 1/20000 of the region total.

    Adaptation: no partsupp — "stock value" is the summed line price
    of the part through the region's suppliers.  The HAVING-vs-global-
    scalar comparison is done in exact integer arithmetic
    (``part_value * 20000 > total``) with a decimal(38,0) widening on
    the product so the compare cannot overflow at any SF (int64 would
    overflow the multiply at ~sf10k).  The global total is a 1-row
    broadcast, not a correlated subquery.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey")
    )
    vals = (
        l.join(asia_supp, l.l_suppkey == asia_supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("value_c"))
    )
    total = vals.agg(F.sum("value_c").alias("total_c"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_c").cast("decimal(38,0)") * F.lit(20000)
            > F.col("total_c").cast("decimal(38,0)")
        )
        .select(
            "l_partkey",
            (F.col("value_c").cast("double") / F.lit(100.0)).alias("value"),
        )
    )


ORACLE["tpch_q11_important_parts"] = f"""
    WITH vals AS (
      SELECT l_partkey,
             CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS value_c
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
      )
      GROUP BY l_partkey
    ),
    total AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c FROM vals)
    SELECT l_partkey, CAST(value_c AS DOUBLE) / 100.0 AS value
    FROM vals, total
    WHERE CAST(value_c AS DECIMAL(38,0)) * 20000 > CAST(total_c AS DECIMAL(38,0))
"""
QUERIES["tpch_q11_important_parts"] = tpch_q11_important_parts


# ---------------------------------------------------------------------------
# Q12 — shipping lateness bands vs order priority (adapted shipmode).
# ---------------------------------------------------------------------------

def tpch_q12_lateness_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: for lines shipped in 1997, band order-to-ship
    latency (<=30d fast, <=90d normal, else slow) and count
    critical-priority (1-URGENT/2-HIGH) vs other orders per band.

    Adaptation: no l_shipmode/l_commitdate/l_receiptdate — the
    grouping dimension is the latency band, the CASE-sum shape of the
    original is unchanged.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(days <= 30, "fast").when(days <= 90, "normal").otherwise("slow")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
               l.l_orderkey == F.col("o_orderkey"))
        .groupBy(band.alias("ship_band"))
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~crit, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


ORACLE["tpch_q12_lateness_priority"] = """
    SELECT CASE
             WHEN date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) <= 30 THEN 'fast'
             WHEN date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) <= 90 THEN 'normal'
             ELSE 'slow'
           END AS ship_band,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
"""
QUERIES["tpch_q12_lateness_priority"] = tpch_q12_lateness_priority


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution.
# ---------------------------------------------------------------------------

def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts (customers
    with zero orders included via the left join), excluding
    '4-NOT SPECIFIED' orders (stand-in for the o_comment NOT LIKE
    filter — that column doesn't exist here).

    Scale shape: left join + two-level aggregation; the second groupBy
    runs on a one-row-per-customer frame, so its shuffle is tiny.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o.select("o_orderkey", "o_custkey"),
               c.c_custkey == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


ORACLE["tpch_q13_order_distribution"] = """
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY c_count
"""
QUERIES["tpch_q13_order_distribution"] = tpch_q13_order_distribution


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share for one ship month.
# ---------------------------------------------------------------------------

def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of September-1997 revenue from PROMO
    parts.  ``100 * promo / total`` computed as exact longs with ONE
    double division at the end.

    Scale: lineitem is filtered to one month before the part join;
    no explicit broadcast on part (it scales with SF) — AQE picks the
    strategy from the filtered sizes.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    vol_m = cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount"))
    joined = l.join(
        p.select("p_partkey", "p_type"), l.l_partkey == F.col("p_partkey")
    ).select(
        vol_m.alias("vol_m"),
        F.when(F.col("p_type") == "PROMO", vol_m).otherwise(F.lit(0)).alias(
            "promo_m"
        ),
    )
    return joined.agg(
        (
            (F.sum("promo_m") * F.lit(100)).cast("double")
            / F.sum("vol_m").cast("double")
        ).alias("promo_revenue_pct"),
        micro_sum_2dp(F.col("vol_m"), "total_revenue"),
    )


ORACLE["tpch_q14_promo_share"] = f"""
    WITH base AS (
      SELECT {sql_cents_product('l_extendedprice', '1 - l_discount')} AS vol_m,
             CASE WHEN p_type = 'PROMO'
                  THEN {sql_cents_product('l_extendedprice', '1 - l_discount')}
                  ELSE 0 END AS promo_m
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    )
    SELECT CAST(CAST(SUM(promo_m) AS BIGINT) * 100 AS DOUBLE)
             / CAST(CAST(SUM(vol_m) AS BIGINT) AS DOUBLE)
             AS promo_revenue_pct,
           {sql_micro_sum_2dp('vol_m', 'total_revenue')}
    FROM base
"""
QUERIES["tpch_q14_promo_share"] = tpch_q14_promo_share


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarter revenue.
# ---------------------------------------------------------------------------

def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum 1996Q1 revenue.  The
    "create view + scalar max" of the original becomes an aggregate
    frame self-compared against its broadcast 1-row max — ties (exact
    integer equality, so genuinely identical revenues) are all
    returned, as in the spec.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revs = l.groupBy("l_suppkey").agg(
        F.sum(
            cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount"))
        ).alias("rev_m")
    )
    mx = revs.agg(F.max("rev_m").alias("max_m"))
    return (
        revs.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_m") == F.col("max_m"))
        .join(s.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_m").cast("double") / F.lit(10000.0)).alias(
                "total_revenue"
            ),
        )
    )


ORACLE["tpch_q15_top_supplier"] = f"""
    WITH revs AS (
      SELECT l_suppkey,
             CAST(SUM({sql_cents_product('l_extendedprice', '1 - l_discount')})
                  AS BIGINT) AS rev_m
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev_m AS DOUBLE) / 10000.0 AS total_revenue
    FROM revs JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_m = (SELECT MAX(rev_m) FROM revs)
"""
QUERIES["tpch_q15_top_supplier"] = tpch_q15_top_supplier


# ---------------------------------------------------------------------------
# Q16 — supplier variety per part attribute (adapted).
# ---------------------------------------------------------------------------

def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct supplier count per (brand, type,
    size) over observed part-supplier pairs, excluding Brand#5 and
    PROMO parts and excluding negative-balance suppliers (stand-in for
    the 'customer complaints' NOT IN subquery).

    Adaptation: partsupp pairs come from ``SELECT DISTINCT partkey,
    suppkey FROM lineitem``.  The exclusion subquery is a broadcast
    anti join (it selects few suppliers).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO")
    )
    s_bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(s_bad), pairs.l_suppkey == s_bad.s_suppkey,
                   "left_anti")
        .join(p.select("p_partkey", "p_brand", "p_type", "p_size"),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE["tpch_q16_supplier_variety"] = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
"""
QUERIES["tpch_q16_supplier_variety"] = tpch_q16_supplier_variety


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue for one brand.
# ---------------------------------------------------------------------------

def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if Brand#1 orders below
    20% of the part's average quantity were not taken.

    The correlated per-part AVG subquery becomes a groupBy on the
    SAME filtered line frame joined back (computed once, not per
    row); the ``qty < 0.2*avg`` compare is exact integer cross-
    multiplication ``5 * qty * n < sum_qty`` — no float threshold, so
    boundary rows agree on both engines at any partitioning.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = l.join(
        F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    stats = li.groupBy(F.col("l_partkey").alias("sp_key")).agg(
        F.sum(cents("l_quantity")).alias("sum_qty_c"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        li.join(stats, li.l_partkey == stats.sp_key)
        .filter(
            cents("l_quantity") * F.lit(5) * F.col("n_lines")
            < F.col("sum_qty_c")
        )
        .agg(
            (
                F.sum(cents("l_extendedprice")).cast("double") / F.lit(700.0)
            ).alias("avg_yearly")
        )
    )


ORACLE["tpch_q17_small_qty_revenue"] = f"""
    WITH li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#1'
    ),
    stats AS (
      SELECT l_partkey AS sp_key,
             CAST(SUM({sql_cents('l_quantity')}) AS BIGINT) AS sum_qty_c,
             COUNT(*) AS n_lines
      FROM li GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS DOUBLE)
             / 700.0 AS avg_yearly
    FROM li JOIN stats ON l_partkey = sp_key
    WHERE {sql_cents('l_quantity')} * 5 * n_lines < sum_qty_c
"""
QUERIES["tpch_q17_small_qty_revenue"] = tpch_q17_small_qty_revenue


# ---------------------------------------------------------------------------
# Q19 — bracketed discount revenue (adapted predicates).
# ---------------------------------------------------------------------------

def tpch_q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue from three disjunctive
    (brand, size-range, quantity-range) brackets.

    Adaptation: no p_container/l_shipmode — brackets are brand+size+
    quantity only.  The disjunction lives in the JOIN condition so
    Catalyst can evaluate it during the broadcast-hash probe; common
    conjuncts (partkey equality) still drive the join.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (l.l_partkey == p.p_partkey) & (
        (
            (p.p_brand == "Brand#12")
            & p.p_size.between(1, 5)
            & l.l_quantity.between(1, 11)
        )
        | (
            (p.p_brand == "Brand#23")
            & p.p_size.between(1, 10)
            & l.l_quantity.between(10, 20)
        )
        | (
            (p.p_brand == "Brand#34")
            & p.p_size.between(1, 15)
            & l.l_quantity.between(20, 30)
        )
    )
    return l.join(p, cond).agg(
        micro_sum_2dp(
            cents_product(F.col("l_extendedprice"), 1 - F.col("l_discount")),
            "revenue",
        )
    )


ORACLE["tpch_q19_bracket_revenue"] = f"""
    SELECT {sql_micro_sum_2dp(
        sql_cents_product('l_extendedprice', '1 - l_discount'), 'revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""
QUERIES["tpch_q19_bracket_revenue"] = tpch_q19_bracket_revenue


# ---------------------------------------------------------------------------
# Q20 — heavy shippers of a part family in a region (adapted).
# ---------------------------------------------------------------------------

def tpch_q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: ASIA suppliers who shipped more than 200
    units of red parts during 1997.

    Adaptation: no partsupp availability — the ``ps_availqty >
    0.5 * shipped`` check becomes a shipped-quantity threshold.  The
    nested IN-subquery chain of the original is the same shape:
    part-name filter -> semi join -> per-supplier aggregate ->
    threshold -> join supplier/nation.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red ")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    shipped = (
        l.join(F.broadcast(p.select("p_partkey")),
               l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_c"))
        .filter(F.col("qty_c") > 200 * 100)
    )
    return (
        shipped.join(s, shipped.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            (F.col("qty_c").cast("double") / F.lit(100.0)).alias(
                "shipped_qty"
            ),
        )
    )


ORACLE["tpch_q20_heavy_shippers"] = f"""
    WITH shipped AS (
      SELECT l_suppkey,
             CAST(SUM({sql_cents('l_quantity')}) AS BIGINT) AS qty_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'red %')
      GROUP BY l_suppkey
      HAVING CAST(SUM({sql_cents('l_quantity')}) AS BIGINT) > 20000
    )
    SELECT s_suppkey, s_name, n_name,
           CAST(qty_c AS DOUBLE) / 100.0 AS shipped_qty
    FROM shipped
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
"""
QUERIES["tpch_q20_heavy_shippers"] = tpch_q20_heavy_shippers


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept multi-supplier orders waiting (adapted).
# ---------------------------------------------------------------------------

def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: per supplier, the number of finished
    multi-supplier orders on which that supplier was the SOLE latest
    shipper and shipped more than 60 days after the order date; top 20
    by count.

    Adaptation: no commit/receipt dates — "kept the order waiting" is
    sole-latest-shipper + 60-day lateness on shipdate.  The original's
    EXISTS (another supplier) / NOT EXISTS (another late supplier)
    pair becomes a per-order aggregate: distinct-supplier count >= 2
    and exactly one supplier attains the order's max ship date.  All
    per-order state is one groupBy over the joined lines — no
    correlated rescans.  (numwait, s_name) is a unique sort key, so
    the LIMIT is deterministic.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    lines = l.join(
        o.select("o_orderkey", "o_orderdate"),
        l.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    per_order = lines.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.max("o_orderdate").alias("odate"),
    )
    at_max = (
        lines.join(
            per_order,
            (lines.l_orderkey == per_order.po_key)
            & (lines.l_shipdate == per_order.max_ship),
        )
        .select("po_key", "l_suppkey", "nsupp", "max_ship", "odate")
        .distinct()
    )
    sole = (
        at_max.groupBy("po_key")
        .agg(
            F.count(F.lit(1)).alias("n_at_max"),
            F.max("l_suppkey").alias("supp"),
            F.max("nsupp").alias("nsupp"),
            F.max("max_ship").alias("max_ship"),
            F.max("odate").alias("odate"),
        )
        .filter(
            (F.col("n_at_max") == 1)
            & (F.col("nsupp") >= 2)
            & (F.col("max_ship") > F.col("odate") + F.expr("INTERVAL 60 DAYS"))
        )
    )
    return (
        sole.groupBy("supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(s.select("s_suppkey", "s_name"), F.col("supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


ORACLE["tpch_q21_waiting_suppliers"] = """
    WITH lines AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey AS po_key,
             MAX(l_shipdate) AS max_ship,
             COUNT(DISTINCT l_suppkey) AS nsupp,
             MAX(o_orderdate) AS odate
      FROM lines GROUP BY l_orderkey
    ),
    at_max AS (
      SELECT DISTINCT po_key, l_suppkey, nsupp, max_ship, odate
      FROM lines JOIN per_order
        ON l_orderkey = po_key AND l_shipdate = max_ship
    ),
    sole AS (
      SELECT po_key, COUNT(*) AS n_at_max, MAX(l_suppkey) AS supp,
             MAX(nsupp) AS nsupp, MAX(max_ship) AS max_ship,
             MAX(odate) AS odate
      FROM at_max GROUP BY po_key
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM sole JOIN supplier ON supp = s_suppkey
    WHERE n_at_max = 1 AND nsupp >= 2
      AND max_ship > odate + INTERVAL 60 DAY
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
"""
QUERIES["tpch_q21_waiting_suppliers"] = tpch_q21_waiting_suppliers


# ---------------------------------------------------------------------------
# Q22 — idle high-balance customers per nation (adapted).
# ---------------------------------------------------------------------------

def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: customers of four nations with an
    above-average positive balance and NO orders, counted per nation.

    Adaptation: no c_phone — the country-prefix filter becomes a
    nation-name filter.  The AVG threshold subquery is computed as
    exact cents (sum, count) in one tiny broadcast row; the compare is
    integer cross-multiplication ``bal_c * n > total_c`` — no float
    threshold.  NOT EXISTS(orders) is the anti join.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_3", "NATION_5", "NATION_7")
    )
    o = load_table(spark, sf_dir, "orders")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_acctbal", "n_name"
    )
    thresh = cn.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents("c_acctbal")).alias("total_c"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    return (
        cn.crossJoin(F.broadcast(thresh))
        .filter(cents("c_acctbal") * F.col("n_pos") > F.col("total_c"))
        .join(o.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"),
              "left_anti")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents("c_acctbal")).cast("double") / F.lit(100.0)).alias(
                "totacctbal"
            ),
        )
    )


ORACLE["tpch_q22_idle_customers"] = f"""
    WITH cn AS (
      SELECT c_custkey, c_acctbal, n_name
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7')
    ),
    thresh AS (
      SELECT CAST(SUM({sql_cents('c_acctbal')}) AS BIGINT) AS total_c,
             COUNT(*) AS n_pos
      FROM cn WHERE c_acctbal > 0
    )
    SELECT n_name, COUNT(*) AS numcust,
           CAST(CAST(SUM({sql_cents('c_acctbal')}) AS BIGINT) AS DOUBLE)
             / 100.0 AS totacctbal
    FROM cn, thresh
    WHERE {sql_cents('c_acctbal')} * n_pos > total_c
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
"""
QUERIES["tpch_q22_idle_customers"] = tpch_q22_idle_customers
