"""Training-data export operators: the last mile of an LLM pipeline.

Three operators the reference has no analogue for (its pipeline ends at
serving tables) but a 100 TB corpus-to-training run needs after
dedup/curation:

* ``decontaminate_ngram``   — flag training documents sharing any word
  3-gram with a held-out evaluation set (benchmark decontamination, the
  n-gram-overlap method used for public-benchmark leakage checks).
* ``pack_sequences``        — deterministic sharded sequence packing:
  assign documents to fixed-token-budget training sequences by running
  token count, parallel across shards.
* ``export_shuffled_shards``— deterministic global shuffle + sharding
  for training-order export: md5-keyed pseudo-random order, reproducible
  across engines, retries, and cluster sizes.

Scale design:
* decontamination joins the (small) eval shingle set broadcast against
  the corpus shingle stream — map-side, one groupBy(doc_id) shuffle;
* packing windows are PARTITIONED by shard (md5-derived), so the
  running sums parallelize; a single global window would funnel 100 TB
  through one task;
* shard export's order key is a pure hash — no sort of the raw data,
  one range/hash partitioning, and any re-run lands every doc in the
  same shard at the same position (idempotent restarts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.hashing import md5_long, sql_md5_long
from velib_lakehouse_spark.operators.dedup import _SQL_SHINGLES, _shingles

# Every doc_id % EVAL_MOD == 0 plays the held-out benchmark document.
EVAL_MOD = 11
# Token budget per packed training sequence (whitespace tokens).
CONTEXT_TOKENS = 512
# Parallel packing / export shards.
N_PACK_SHARDS = 16
N_EXPORT_SHARDS = 8


def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the number of
    word-3-grams shared with the eval split and a contamination flag.

    The eval shingle set (distinct shingles of eval docs) is broadcast;
    the corpus shingle stream joins it map-side, so the only shuffle is
    the per-document hit count.  Zero-hit documents are kept (left join
    onto the full doc list) — the output is a complete filter verdict,
    not just the contaminated tail.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d)
    eval_sh = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0).select("shingle").distinct()
    )
    hits = (
        sh.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_eval_hits"))
    )
    train = d.filter(F.col("doc_id") % EVAL_MOD != 0).select("doc_id")
    return (
        train.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_eval_hits", F.lit(0)).alias("n_eval_hits"),
            (F.coalesce("n_eval_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded deterministic sequence packing: each document lands in a
    training sequence ``(shard, seq_id)`` at ``offset_in_seq`` tokens.

    Contiguous greedy packing in md5-shard order: within a shard,
    documents are laid end-to-end by doc_id and a sequence boundary
    falls every CONTEXT_TOKENS tokens of the running total (a document
    starting inside sequence k belongs to k; capacity is approximate by
    up to one document — the standard concat-then-chunk packing).  The
    window is partitioned by shard, so packing parallelizes; one global
    window would serialize the corpus through a single task.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (md5_long(F.col("doc_id").cast("string")) % N_PACK_SHARDS).alias("shard"),
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / CONTEXT_TOKENS)
        .cast("bigint")
        .alias("seq_id"),
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) % CONTEXT_TOKENS).alias(
            "offset_in_seq"
        ),
    )


def export_shuffled_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order export: md5 pseudo-random order,
    hashed into shards, positioned within shard.

    The order key is a pure function of doc_id, so the exported order is
    reproducible across engines, retries, and cluster sizes — the
    property a resumable 100 TB training-data export needs (re-running a
    failed shard reproduces byte-identical output).
    """
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", md5_long(F.col("doc_id").cast("string")).alias("order_key")
    )
    w = Window.partitionBy("shard").orderBy("order_key", "doc_id")
    return (
        keyed.withColumn("shard", F.col("order_key") % N_EXPORT_SHARDS)
        .select(
            "doc_id",
            "shard",
            (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
        )
    )


def write_jsonl_shards(df: DataFrame, out_dir: str) -> None:
    """Materialize the shuffled export as shard=N/ JSONL directories —
    the sink side of ``export_shuffled_shards`` (tested in
    tests/test_curation.py).  Each shard sorts by its deterministic
    position so re-writes are byte-stable."""
    (
        df.repartition("shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(out_dir)
    )


ORACLE: dict[str, str | None] = {
    "decontaminate_ngram": f"""
        WITH sh AS ({_SQL_SHINGLES}),
        eval_sh AS (
          SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
        ),
        hits AS (
          SELECT doc_id, count(*) AS n_eval_hits
          FROM sh
          WHERE doc_id % {EVAL_MOD} <> 0
            AND shingle IN (SELECT shingle FROM eval_sh)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(h.n_eval_hits, 0) AS n_eval_hits,
               COALESCE(h.n_eval_hits, 0) > 0 AS contaminated
        FROM documents d
        LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % {EVAL_MOD} <> 0
    """,
    "pack_sequences": f"""
        WITH toks AS (
          SELECT doc_id,
                 {sql_md5_long("CAST(doc_id AS VARCHAR)")} % {N_PACK_SHARDS}
                   AS shard,
                 CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                      AS BIGINT) AS n_tokens
          FROM documents
        )
        SELECT doc_id, shard, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER w, 0) // {CONTEXT_TOKENS}
                    AS BIGINT) AS seq_id,
               CAST(COALESCE(SUM(n_tokens) OVER w, 0) % {CONTEXT_TOKENS}
                    AS BIGINT) AS offset_in_seq
        FROM toks
        WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
    "export_shuffled_shards": f"""
        WITH keyed AS (
          SELECT doc_id,
                 {sql_md5_long("CAST(doc_id AS VARCHAR)")} AS order_key
          FROM documents
        )
        SELECT doc_id,
               order_key % {N_EXPORT_SHARDS} AS shard,
               CAST(row_number() OVER (
                 PARTITION BY order_key % {N_EXPORT_SHARDS}
                 ORDER BY order_key, doc_id) - 1 AS BIGINT) AS pos
        FROM keyed
    """,
}

QUERIES = {
    "decontaminate_ngram": decontaminate_ngram,
    "pack_sequences": pack_sequences,
    "export_shuffled_shards": export_shuffled_shards,
}
