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


ORACLE: dict[str, str | None] = {
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
}
