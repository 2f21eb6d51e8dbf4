"""Mergeable frequency sketches (count-min) with exact-audit queries.

Spark ships a native ``count_min_sketch`` aggregate, but its binary
payload is engine-private; this module builds the same sketch out of
the repo's md5 hash family (``functions/hashing.py``) so the DuckDB
oracle can reproduce it bucket for bucket — the same
determinism-over-opacity trade every sketch in this repo makes
(MinHash, SimHash, sign-LSH).

``cms_frequency_audit`` answers the question a pipeline owner actually
asks of a sketch: *how wrong is it on the heavy hitters?*  It builds a
(d x w) count-min sketch over all corpus words, point-queries it for
the TOPK most frequent words, and reports estimated vs exact counts
with the overcount (CMS error is one-sided: est >= exact always).

Scale shape:

* Sketch build: map-side fan-out of d rows per token (seed, bucket),
  then ONE shuffle onto (seed, bucket) with map-side partial sums —
  the reduce side is exactly d*w rows NO MATTER the corpus size.
  That is the whole point of a mergeable sketch: at 100 TB the sketch
  still fits in a cache line per executor, and partial sketches merge
  by addition (partition-count invariant).
* Point queries: the exact heavy-hitter pass reuses the word-count
  shuffle (one row per distinct term — Zipf-bounded), takes TOPK via
  TakeOrdered, and joins the d candidate buckets against the d*w-row
  sketch — broadcast-sized by construction.
* Everything is integer arithmetic on 60-bit hashes; no floats
  anywhere, so the audit is bit-exact under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.hashing import (
    seeded_md5_long,
    sql_seeded_md5_long,
)

CMS_D = 4  # hash rows (depth): P(overcount > eps) ~ exp(-d)
# Width 16 is sized for the test corpora (a ~30-term vocabulary), so
# collisions actually occur and the audit shows the one-sided error
# being beaten down by the min over rows.  At real scale width is the
# accuracy knob (eps ~ e/w of total mass): a 1e6-bucket row is still
# only megabytes, and the reduce side stays d*w rows regardless.
CMS_W = 16
CMS_TOPK = 20  # audited heavy hitters


def _words(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda w: w != "")


def cms_frequency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus words, audited on the TOPK terms.

    Returns one row per heavy hitter: the word, its exact count, the
    CMS estimate (min over the d row buckets), and the one-sided
    overcount ``est - exact``.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(_words()).alias("w"))

    seeds = spark.range(CMS_D).select(F.col("id").alias("seed"))
    # map-side: d (seed, bucket) rows per token; reduce side: d*w rows
    sketch = (
        words.crossJoin(F.broadcast(seeds))
        .select(
            "seed",
            (seeded_md5_long(F.col("seed"), F.col("w")) % CMS_W).alias(
                "bucket"
            ),
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    exact = words.groupBy("w").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("w").asc()
    ).limit(CMS_TOPK)

    probes = top.crossJoin(F.broadcast(seeds)).select(
        "w",
        "exact_cnt",
        "seed",
        (seeded_md5_long(F.col("seed"), F.col("w")) % CMS_W).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("w", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select(
            "w",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
    )


_SQL_WORDS = """
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
"""

ORACLE: dict[str, str | None] = {
    "cms_frequency_audit": f"""
        WITH words AS ({_SQL_WORDS}),
        seeds AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS seed),
        sketch AS (
          SELECT seed,
                 {sql_seeded_md5_long('seed', 'w')} % {CMS_W} AS bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM words CROSS JOIN seeds
          GROUP BY 1, 2
        ),
        exact AS (
          SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM words GROUP BY w
        ),
        top AS (
          SELECT w, exact_cnt FROM exact
          ORDER BY exact_cnt DESC, w ASC LIMIT {CMS_TOPK}
        ),
        probes AS (
          SELECT t.w, t.exact_cnt, s.seed,
                 {sql_seeded_md5_long('s.seed', 't.w')} % {CMS_W} AS bucket
          FROM top t CROSS JOIN seeds s
        )
        SELECT p.w, p.exact_cnt,
               min(sk.cnt) AS est_cnt,
               min(sk.cnt) - p.exact_cnt AS overcount
        FROM probes p
        JOIN sketch sk ON sk.seed = p.seed AND sk.bucket = p.bucket
        GROUP BY p.w, p.exact_cnt
    """,
}

QUERIES = {
    "cms_frequency_audit": cms_frequency_audit,
}
