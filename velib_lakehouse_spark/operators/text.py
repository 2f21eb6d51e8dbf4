"""Text-analysis operators for training-data curation.

All four are single-pass, map-side-only transformations built from JVM
string/array functions (no UDFs, no shuffle except where an aggregation
is the point) — at 100 TB these scale with input bytes and nothing else.

* ``text_stats``       — length/punctuation/stopword quality signals +
                         a composite quality score
* ``lang_id_heuristic``— stopword-hit language scoring (en/fr/de/es)
* ``token_count``      — whitespace tokens + a BPE-ish regex token count
* ``doc_fingerprint``  — order-sensitive positional fingerprint from
                         md5 word hashes (fast content identity that,
                         unlike a set hash, distinguishes permutations)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.hashing import md5_long, sql_md5_long

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "on"]
STOPWORDS_FR = ["le", "la", "les", "de", "et", "un", "une", "est"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "ein", "eine", "mit"]
STOPWORDS_ES = ["el", "los", "las", "que", "y", "en", "por", "es"]

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[^A-Za-z0-9 ]"


def _words(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda w: w != "")


def _stop_hits(words, stoplist: list[str]):
    arr = F.array(*[F.lit(s) for s in stoplist])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (the length/punct/stopword trio)."""
    d = load_table(spark, sf_dir, "documents")
    df = d.select("doc_id", "lang", F.col("text"), _words().alias("w"))
    n_words = F.size("w")
    n_chars = F.length("text")
    punct = F.size(F.regexp_extract_all("text", F.lit(PUNCT_PATTERN), 0))
    stop = _stop_hits(F.col("w"), STOPWORDS_EN)
    out = df.select(
        "doc_id",
        "lang",
        n_words.cast("bigint").alias("n_words"),
        n_chars.cast("bigint").alias("n_chars_measured"),
        F.round(
            F.aggregate(
                F.transform(F.col("w"), lambda w: F.length(w).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).cast("double")
            / n_words,
            6,
        ).alias("avg_word_len"),
        F.round(punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(stop.cast("double") / n_words, 6).alias("stopword_ratio"),
    )
    # Composite score: expression order mirrors the oracle SQL exactly so
    # double arithmetic is bit-identical.
    return out.withColumn(
        "quality_score",
        F.round(
            0.4 * F.col("stopword_ratio")
            + 0.3 * (1 - F.col("punct_ratio"))
            + 0.3 * F.least(F.col("n_words").cast("double") / 100.0, F.lit(1.0)),
            6,
        ),
    )


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-free language ID: stopword-hit counts per language, argmax
    with a fixed tie-break order (en > fr > de > es)."""
    d = load_table(spark, sf_dir, "documents")
    df = d.select("doc_id", F.col("lang").alias("labeled_lang"), _words().alias("w"))
    scored = df.select(
        "doc_id",
        "labeled_lang",
        _stop_hits(F.col("w"), STOPWORDS_EN).cast("bigint").alias("score_en"),
        _stop_hits(F.col("w"), STOPWORDS_FR).cast("bigint").alias("score_fr"),
        _stop_hits(F.col("w"), STOPWORDS_DE).cast("bigint").alias("score_de"),
        _stop_hits(F.col("w"), STOPWORDS_ES).cast("bigint").alias("score_es"),
    )
    best = F.greatest("score_en", "score_fr", "score_de", "score_es")
    return scored.withColumn(
        "predicted_lang",
        F.when(F.col("score_en") == best, "en")
        .when(F.col("score_fr") == best, "fr")
        .when(F.col("score_de") == best, "de")
        .otherwise("es"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts (budgeting primitive)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_words()).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals: distinct-word ratio and the
    frequency share of the most repeated word and word-bigram.

    High repetition flags boilerplate/spam for corpus filtering (the
    repetition family of quality rules).  Computed distributed — explode
    to (doc, gram) counts, then per-doc max/sum — rather than a per-row
    O(len²) nested-lambda scan, so a pathological 1 GB document costs
    O(len) like everything else.  The two gram sizes share one shuffle
    each; partial aggregation keeps shuffled bytes at one row per
    distinct gram.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(_words()).alias("g")).withColumn(
        "n", F.lit(1)
    )
    bigrams = (
        d.select("doc_id", _words().alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 2),"
                    " i -> concat_ws(' ', ws[i], ws[i+1]))"
                )
            ).alias("g"),
        )
        .withColumn("n", F.lit(2))
    )
    grams = words.unionByName(bigrams)
    counts = grams.groupBy("doc_id", "n", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy("doc_id", "n").agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("distinct_grams"),
        F.max("c").alias("top_count"),
    )
    uni = per_doc.filter(F.col("n") == 1)
    bi = per_doc.filter(F.col("n") == 2).select(
        "doc_id",
        F.col("total").alias("bi_total"),
        F.col("top_count").alias("bi_top"),
    )
    return (
        uni.join(bi, "doc_id", "left")
        .select(
            "doc_id",
            F.col("total").alias("n_words"),
            F.col("distinct_grams").alias("n_distinct_words"),
            F.round(F.col("distinct_grams") / F.col("total"), 6).alias(
                "distinct_ratio"
            ),
            F.round(F.col("top_count") / F.col("total"), 6).alias(
                "top_word_ratio"
            ),
            F.round(
                F.coalesce(F.col("bi_top") / F.col("bi_total"), F.lit(0.0)), 6
            ).alias("top_bigram_ratio"),
        )
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional fingerprint: sum((md5_60(word) % 1000003) * position).

    Order-sensitive (a permutation changes the value) yet associative to
    compute — the per-word contributions sum in any partitioning.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(_words()).alias("pos", "w")
    ).withColumn("h", md5_long(F.col("w")) % 1000003)
    return toks.groupBy("doc_id").agg(
        F.sum(F.col("h") * (F.col("pos") + 1)).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_words"),
    )


def _sql_stop_hits(words_expr: str, stoplist: list[str]) -> str:
    lit = "[" + ", ".join(f"'{s}'" for s in stoplist) + "]"
    return f"len(list_filter({words_expr}, x -> list_contains({lit}, x)))"


_SQL_WORDS = "list_filter(string_split(text, ' '), x -> x <> '')"

ORACLE: dict[str, str | None] = {
    "text_stats": f"""
        WITH base AS (
          SELECT doc_id, lang, text, {_SQL_WORDS} AS w FROM documents
        ),
        m AS (
          SELECT doc_id, lang,
                 CAST(len(w) AS BIGINT) AS n_words,
                 CAST(length(text) AS BIGINT) AS n_chars_measured,
                 ROUND(CAST(list_sum(list_transform(w, x ->
                        CAST(length(x) AS BIGINT))) AS DOUBLE) / len(w), 6)
                   AS avg_word_len,
                 ROUND(CAST(len(regexp_extract_all(text, '{PUNCT_PATTERN}'))
                        AS DOUBLE) / length(text), 6) AS punct_ratio,
                 ROUND(CAST({_sql_stop_hits('w', STOPWORDS_EN)} AS DOUBLE)
                        / len(w), 6) AS stopword_ratio
          FROM base
        )
        SELECT *,
               ROUND(0.4 * stopword_ratio + 0.3 * (1 - punct_ratio)
                     + 0.3 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0), 6)
                 AS quality_score
        FROM m
    """,
    "lang_id_heuristic": f"""
        WITH s AS (
          SELECT doc_id, lang AS labeled_lang,
                 CAST({_sql_stop_hits(_SQL_WORDS, STOPWORDS_EN)} AS BIGINT)
                   AS score_en,
                 CAST({_sql_stop_hits(_SQL_WORDS, STOPWORDS_FR)} AS BIGINT)
                   AS score_fr,
                 CAST({_sql_stop_hits(_SQL_WORDS, STOPWORDS_DE)} AS BIGINT)
                   AS score_de,
                 CAST({_sql_stop_hits(_SQL_WORDS, STOPWORDS_ES)} AS BIGINT)
                   AS score_es
          FROM documents
        )
        SELECT *,
               CASE WHEN score_en = greatest(score_en, score_fr, score_de,
                                             score_es) THEN 'en'
                    WHEN score_fr = greatest(score_en, score_fr, score_de,
                                             score_es) THEN 'fr'
                    WHEN score_de = greatest(score_en, score_fr, score_de,
                                             score_es) THEN 'de'
                    ELSE 'es' END AS predicted_lang
        FROM s
    """,
    "token_count": f"""
        SELECT doc_id,
               CAST(len({_SQL_WORDS}) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))
                    AS BIGINT) AS bpe_ish_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_measured
        FROM documents
    """,
    "doc_fingerprint": f"""
        SELECT doc_id,
               CAST(sum(({sql_md5_long('w')} % 1000003) * pos) AS BIGINT)
                 AS fingerprint,
               count(*) AS n_words
        FROM (
          SELECT doc_id, unnest({_SQL_WORDS}) AS w,
                 generate_subscripts({_SQL_WORDS}, 1) AS pos
          FROM documents
        )
        GROUP BY doc_id
    """,
    "repetition_stats": f"""
        WITH uni AS (
          SELECT doc_id, w AS g FROM (
            SELECT doc_id, unnest({_SQL_WORDS}) AS w FROM documents
          )
        ),
        bi AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(ws) - 1),
                        i -> concat_ws(' ', ws[i], ws[i+1]))) AS g
          FROM (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents)
          WHERE len(ws) >= 2
        ),
        uc AS (
          SELECT doc_id, count(*) AS c FROM uni GROUP BY doc_id, g
        ),
        ud AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
                 count(*) AS distinct_grams,
                 CAST(max(c) AS BIGINT) AS top_count
          FROM uc GROUP BY doc_id
        ),
        bc AS (
          SELECT doc_id, count(*) AS c FROM bi GROUP BY doc_id, g
        ),
        bd AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS bi_total,
                 CAST(max(c) AS BIGINT) AS bi_top
          FROM bc GROUP BY doc_id
        )
        SELECT ud.doc_id,
               ud.total AS n_words,
               ud.distinct_grams AS n_distinct_words,
               ROUND(CAST(ud.distinct_grams AS DOUBLE) / ud.total, 6)
                 AS distinct_ratio,
               ROUND(CAST(ud.top_count AS DOUBLE) / ud.total, 6)
                 AS top_word_ratio,
               ROUND(COALESCE(CAST(bd.bi_top AS DOUBLE) / bd.bi_total, 0.0), 6)
                 AS top_bigram_ratio
        FROM ud LEFT JOIN bd ON ud.doc_id = bd.doc_id
    """,
}

QUERIES = {
    "text_stats": text_stats,
    "lang_id_heuristic": lang_id_heuristic,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
    "repetition_stats": repetition_stats,
}
