"""Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) and a
dense (embedding-cosine) ranking.

The production RAG/retrieval shape: a sparse ranker and a dense ranker
each produce a top-k list over the corpus, and the two lists are fused
with RRF (Cormack, Clarke & Buettcher, SIGIR 2009):

    rrf(d) = sum_systems 1 / (K + rank_system(d)),  K = 60.

The reference pipeline has no retrieval surface at all; this composes
two operators this repo already proves (``text.bm25_rank`` and the
broadcast cosine scorer from ``similarity``) and adds only the fusion.

Scale design: each ranker is one corpus pass that ends in a top-k
(BM25: scan -> broadcast stats -> per-row arithmetic -> global top-k;
dense: broadcast the single query vector -> map-side cosine -> top-k).
The fusion itself joins two <=K-row frames — driver-trivial at any
corpus size, so the whole query costs exactly two scans regardless of
scale.  The doc_id == vec_id linkage is the testdata's own convention
(both tables enumerate 0..N-1).

Determinism: both input rankings break ties on doc_id; 1/(K+rank) sums
two exactly-representable doubles in a fixed order in both engines, and
the fused ordering re-breaks ties on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.operators.similarity import _vectors
from velib_lakehouse_spark.operators.text import ORACLE as _TEXT_ORACLE
from velib_lakehouse_spark.operators.text import bm25_rank

RRF_K = 60
DENSE_QUERY_ID = 0  # vec_id of the dense query vector
DENSE_TOP_K = 20  # same depth as BM25_TOP_K so both lists weigh equally


def _dense_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents by cosine against the fixed query embedding.

    One broadcast row against the corpus — map-side scoring, then a
    single top-k aggregation (the same shape ``ann_cosine_topk`` proves
    for the multi-query case).
    """
    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") == DENSE_QUERY_ID).select(
        F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    dot = (
        "aggregate(zip_with(qv, v, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    scored = (
        v.filter(F.col("vec_id") != DENSE_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cos", F.round(F.expr(dot) / (F.col("qnorm") * F.col("norm")), 6)
        )
    )
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank_dense", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_dense") <= DENSE_TOP_K)
        .select(F.col("vec_id").alias("doc_id"), "cos", "rank_dense")
    )


def hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of the BM25 top-k and the dense cosine top-k."""
    lex = bm25_rank(spark, sf_dir)
    wl = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex = lex.withColumn("rank_lex", F.row_number().over(wl).cast("bigint"))
    dense = _dense_topk(spark, sf_dir)
    fused = (
        lex.select("doc_id", "rank_lex")
        .join(dense.select("doc_id", "rank_dense"), "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_lex")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_dense")),
                    F.lit(0.0),
                ),
                6,
            ),
        )
    )
    wf = Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return fused.withColumn(
        "fused_rank", F.row_number().over(wf).cast("bigint")
    ).select("doc_id", "rank_lex", "rank_dense", "rrf", "fused_rank")


POSTING_CAP = 10  # serialized postings per term (lowest doc_ids)
POSTING_SALT = 16  # first-stage salt buckets for the min-K window


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: one row per term with document
    frequency, total term frequency, and the first POSTING_CAP postings
    (lowest doc_ids) serialized as ``doc:tf`` — the build step of the
    lexical half of the retrieval stack (BM25 serves from exactly this
    structure).

    Scale: term/doc counts partial-aggregate map-side.  The capped
    posting sample is the interesting part — a naive
    ``row_number() OVER (PARTITION BY term ORDER BY doc_id)`` sorts a
    corpus-sized partition for every stopword-grade term, so the min-K
    is SALTED: stage 1 ranks within (term, doc_id % POSTING_SALT) and
    keeps K per bucket (partitions shrink by the salt factor and
    parallelize across executors), stage 2 ranks the surviving
    <= SALT*K rows per term.  The global K smallest doc_ids are always
    among the per-bucket K smallest, so the result is identical to the
    unsalted window — which is what the oracle runs.  Full (uncapped)
    posting lists at 100 TB should stay relational (one row per
    posting, sorted-bucketed by term) rather than serialized strings.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_doc_words()).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w1 = Window.partitionBy(
        "term", (F.col("doc_id") % POSTING_SALT)
    ).orderBy("doc_id")
    w2 = Window.partitionBy("term").orderBy("doc_id")
    sample = (
        tf.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= POSTING_CAP)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= POSTING_CAP)
        .select(
            "term",
            "doc_id",
            F.concat_ws(
                ":", F.col("doc_id").cast("string"), F.col("tf").cast("string")
            ).alias("entry"),
        )
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    postings = sample.groupBy("term").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                lambda s: s["entry"],
            ),
        ).alias("postings")
    )
    return stats.join(postings, "term").select(
        "term", "df", "total_tf", "postings",
        (F.col("df") > POSTING_CAP).alias("truncated"),
    )


def _doc_words():
    return F.filter(F.split(F.col("text"), " "), lambda x: x != "")


ORACLE: dict[str, str | None] = {
    "inverted_index": f"""
        WITH tf AS (
          SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
          FROM (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS term
            FROM documents
          )
          GROUP BY term, doc_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY term
                                       ORDER BY doc_id) AS rk
          FROM tf
        )
        SELECT term,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS total_tf,
               string_agg(
                 CASE WHEN rk <= {POSTING_CAP}
                      THEN concat(CAST(doc_id AS VARCHAR), ':',
                                  CAST(tf AS VARCHAR)) END,
                 ',' ORDER BY doc_id) AS postings,
               count(*) > {POSTING_CAP} AS truncated
        FROM ranked
        GROUP BY term
    """,
    "hybrid_rank_fusion": f"""
        WITH lex AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
                      AS BIGINT) AS rank_lex
          FROM ({_TEXT_ORACLE["bm25_rank"]})
        ),
        v AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS norm
          FROM embeddings
        ),
        dense AS (
          SELECT vec_id AS doc_id, CAST(rank_dense AS BIGINT) AS rank_dense
          FROM (
            SELECT c.vec_id,
                   row_number() OVER (
                     ORDER BY ROUND(list_dot_product(q.v, c.v)
                                    / (q.norm * c.norm), 6) DESC,
                              c.vec_id ASC) AS rank_dense
            FROM v q JOIN v c ON c.vec_id <> {DENSE_QUERY_ID}
            WHERE q.vec_id = {DENSE_QUERY_ID}
          ) WHERE rank_dense <= {DENSE_TOP_K}
        )
        SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
               rank_lex, rank_dense,
               ROUND(COALESCE(1.0 / ({RRF_K} + rank_lex), 0.0)
                     + COALESCE(1.0 / ({RRF_K} + rank_dense), 0.0), 6)
                 AS rrf,
               CAST(row_number() OVER (
                 ORDER BY ROUND(COALESCE(1.0 / ({RRF_K} + rank_lex), 0.0)
                                + COALESCE(1.0 / ({RRF_K} + rank_dense), 0.0),
                                6) DESC,
                          COALESCE(lex.doc_id, dense.doc_id) ASC)
                 AS BIGINT) AS fused_rank
        FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
    """,
}

QUERIES = {
    "hybrid_rank_fusion": hybrid_rank_fusion,
    "inverted_index": inverted_index,
}
