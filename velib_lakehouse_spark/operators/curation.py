"""Corpus-curation operators: sampling, cleaning, and data mixing.

The remaining staples of a training-data pipeline, all map-side or
single-shuffle and oracle-mirrored:

* ``deterministic_sample`` — hash-bucket sampling: md5-derived bucket in
  [0,100); keep bucket < rate.  Unlike ``rand()``-based sampling it is
  reproducible across runs, engines, partitionings, and retries — the
  property a 100 TB pipeline needs so a re-run selects the same corpus.
* ``text_clean_redact``   — normalization + PII-shaped redaction
  (emails, long digit runs), whitespace collapse — regexp_replace
  chains, pure map-side.
* ``quality_topk_mix``    — stratified data mixing: top-N documents per
  language by the text_stats quality score, with per-language quotas —
  the "mixture weights" shape, as one ranked-window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.hashing import md5_long, sql_md5_long
from velib_lakehouse_spark.operators.text import text_stats

SAMPLE_PCT = 10  # keep ~10% of documents
MIX_TOP_N = 25  # documents per language stratum


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~SAMPLE_PCT% sample via md5 bucket of doc_id."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        d.withColumn("sample_bucket", bucket)
        .filter(F.col("sample_bucket") < SAMPLE_PCT)
        .select("doc_id", "lang", "n_chars", "sample_bucket")
    )


def clean_text_expr(col) -> "F.Column":
    """The normalization/redaction pipeline as a reusable expression:
    lowercase, mask email-shaped tokens and 6+ digit runs, strip non
    [a-z0-9 .@<>] chars, collapse whitespace."""
    cleaned = F.lower(col)
    cleaned = F.regexp_replace(
        cleaned, r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<email>"
    )
    cleaned = F.regexp_replace(cleaned, r"[0-9]{6,}", "<number>")
    cleaned = F.regexp_replace(cleaned, r"[^a-z0-9 .@<>]", " ")
    return F.trim(F.regexp_replace(cleaned, r" +", " "))


def text_clean_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize + redact the corpus (see ``clean_text_expr``)."""
    d = load_table(spark, sf_dir, "documents")
    cleaned = clean_text_expr(F.col("text"))
    return d.select(
        "doc_id",
        cleaned.alias("clean_text"),
        F.length(cleaned).cast("bigint").alias("clean_len"),
        (F.length(cleaned) < F.length("text")).alias("was_modified"),
    )


TRAIN_PCT = 80  # md5 bucket < 80 -> train
VAL_PCT = 90  # 80 <= bucket < 90 -> val; rest -> test


def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment, stratified per language.

    The split key hashes (lang, doc_id) so proportions hold *within*
    every language stratum, not just globally, and the assignment is a
    pure function of the row — reproducible across engines, retries,
    and corpus growth (adding documents never reassigns existing ones,
    the property incremental training-set refreshes need).  Map-side
    only; zero shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", "lang", F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return d.select(
        "doc_id",
        "lang",
        bucket.alias("split_bucket"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


def quality_topk_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified mix: top MIX_TOP_N docs per language by quality score
    (ties broken by doc_id for determinism)."""
    stats = text_stats(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        stats.withColumn("mix_rank", F.row_number().over(w))
        .filter(F.col("mix_rank") <= MIX_TOP_N)
        .select(
            "lang", "doc_id", "quality_score",
            F.col("mix_rank").cast("bigint").alias("mix_rank"),
        )
    )


def corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: documents / words / chars per
    (lang, source) with ROLLUP subtotals — the mixture-accounting view a
    training run reports before export.  One shuffle; rollup rows are
    computed by Spark's partial-aggregation, not a second scan.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "source",
        F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        .cast("bigint")
        .alias("n_words"),
        F.col("n_chars"),
    )
    return (
        base.rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("source", F.lit("<all>")).alias("source"),
            "n_docs",
            "total_words",
            "total_chars",
        )
    )


MIX_ALPHA_IS_SQRT = True  # temperature T=2 -> exponent 1/T = 0.5
MIX_BUDGET_DOCS = 100_000  # target corpus size the weights are scaled to
_MIX_QUANT = 1_000_000_000  # nano-grid for cross-engine-exact weight sums


def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language mixing weights (the multilingual
    up/down-sampling rule of XLM/mT5-style pipelines): sampling weight
    w_i proportional to p_i^(1/T) with T=2, i.e. sqrt of the language's
    corpus share, renormalized.  Low-resource languages get boost > 1,
    the head language gets boost < 1.

    Output per language: document count, raw share p, normalized
    temperature weight, the resulting up/down-sampling boost (w/p), and
    the expected document count when drawing MIX_BUDGET_DOCS samples.

    Scale: one count-per-language aggregate (rows = n_languages) and a
    broadcast total — everything after the first shuffle operates on a
    frame the size of the language inventory.  The exponent is fixed at
    0.5 so both engines evaluate it as IEEE sqrt (correctly rounded,
    bit-identical); raw weights are floor-quantized onto an integer
    nano-grid BEFORE the normalizing sum so the denominator is an exact
    integer in any partitioning/order (double sums are order-sensitive;
    integer sums are not — the ``embedding_centroids`` convention).
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    # The corpus is scanned exactly once (the groupBy above); both
    # normalizing totals are *global windows over the language
    # inventory* — a deliberate single-partition window over rows =
    # n_languages, not over the corpus — so no broadcast-agg re-scan.
    inv = Window.partitionBy()
    p = F.col("n_docs").cast("double") / F.col("total_docs")
    base = (
        counts.withColumn("total_docs", F.sum("n_docs").over(inv))
        .withColumn("wq", F.floor(F.sqrt(p) * _MIX_QUANT).cast("bigint"))
        .withColumn("wq_total", F.sum("wq").over(inv))
    )
    weight = F.col("wq").cast("double") / F.col("wq_total")
    return base.select(
        "lang",
        "n_docs",
        F.round(p, 6).alias("p_share"),
        F.round(weight, 6).alias("weight"),
        F.round(weight / p, 6).alias("boost"),
        F.floor(weight * MIX_BUDGET_DOCS + F.lit(0.5))
        .cast("bigint")
        .alias("expected_docs"),
    )


def corpus_mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature mix: per-document keep/drop verdict
    drawing ~MIX_BUDGET_DOCS documents with the ``corpus_mix_temperature``
    language weights — the sampling pass that turns mixing *weights*
    into an actual training corpus.

    Each language's acceptance rate (in ppm) is its temperature weight
    scaled to the budget and divided by its document count, capped at
    100%; a document is kept when its md5 bucket falls under the rate —
    the ``stratified_split`` coin, so the draw is reproducible across
    engines, retries, and cluster sizes, and a document's verdict never
    changes when other documents are added (the property an incremental
    100 TB ingest needs).

    Scale: the rate table is one count-per-language aggregate
    (language-inventory-sized, broadcast back); the verdict itself is
    map-side.  The rate arithmetic performs the identical double-op
    sequence in both engines on identical integers, then floors to ppm.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    inv = Window.partitionBy()
    rates = (
        counts.withColumn(
            "wq",
            F.floor(
                F.sqrt(
                    F.col("n_docs").cast("double")
                    / F.sum("n_docs").over(inv)
                )
                * _MIX_QUANT
            ).cast("bigint"),
        )
        .withColumn("wq_total", F.sum("wq").over(inv))
        .select(
            "lang",
            F.col("n_docs").alias("lang_docs"),
            F.least(
                F.lit(1_000_000),
                F.floor(
                    F.col("wq").cast("double")
                    / F.col("wq_total")
                    * MIX_BUDGET_DOCS
                    / F.col("lang_docs")
                    * 1_000_000
                ).cast("bigint"),
            ).alias("rate_ppm"),
        )
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("mix"), "lang", F.col("doc_id").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("bucket_ppm", bucket)
        .join(F.broadcast(rates), "lang")
        .select(
            "doc_id",
            "lang",
            "bucket_ppm",
            "rate_ppm",
            (F.col("bucket_ppm") < F.col("rate_ppm")).alias("keep"),
        )
    )


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram leakage between the train split and each held-out split:
    for val and test, how many documents share at least one word-3-gram
    with ANY train document.  Hash-based splitting guarantees disjoint
    *documents*, not disjoint *content* — near-duplicates straddle the
    boundary and leak evaluation signal, which is what this audit
    measures (run it before trusting a validation loss).

    Scale: the train shingle set is vocabulary-sized, far too large to
    broadcast at 100 TB, so the leak test is a shuffle LEFT SEMI join
    on the shingle key — one row per (eval-doc shingle), partial
    dedup map-side; the verdict then reduces to one row per split.

    Determinism: leak ratios are pure integer arithmetic (ppm via
    integer division).
    """
    from velib_lakehouse_spark.operators.dedup import _shingles

    d = load_table(spark, sf_dir, "documents")
    assign = stratified_split(spark, sf_dir).select("doc_id", "split")
    sh = _shingles(d).join(assign, "doc_id")
    train_sh = (
        sh.filter(F.col("split") == "train").select("shingle").distinct()
    )
    leaked = (
        sh.filter(F.col("split") != "train")
        .join(train_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("leaked", F.lit(True))
    )
    per_split = (
        assign.filter(F.col("split") != "train")
        .join(leaked, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("leaked", F.lit(False)).cast("bigint")).alias(
                "n_leaked"
            ),
        )
    )
    return per_split.select(
        "split",
        "n_docs",
        "n_leaked",
        (F.expr("n_leaked * 1000000 div n_docs") / F.lit(1_000_000.0)).alias(
            "leak_ratio"
        ),
    )


DRIFT_BUCKETS = 20
DRIFT_BUCKET_WIDTH = 100  # n_chars per bucket


def source_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: per source, a KS-style statistic — the
    max gap between the source's document-length CDF and the corpus-wide
    CDF over fixed n_chars buckets.

    The shape a crawl-monitoring pipeline needs: when one source's
    length profile diverges (truncation bug, boilerplate flood), its
    ks_stat jumps.  Cost at 100 TB: one (source, bucket) count shuffle
    — at most n_sources * DRIFT_BUCKETS rows reduce-side — then window
    cumsums over that tiny grid.  All counts are integers, each CDF is
    one exact-int division, and max() is order-invariant, so the
    statistic is partitioning- and engine-deterministic.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.least(
        F.floor(F.col("n_chars") / DRIFT_BUCKET_WIDTH),
        F.lit(DRIFT_BUCKETS - 1),
    ).cast("bigint")
    counts = (
        d.select(F.col("source"), bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # dense (source x bucket) grid so the cumulative sums align even
    # when a source skips buckets
    grid = (
        counts.select("source")
        .distinct()
        .crossJoin(
            spark.range(DRIFT_BUCKETS).select(F.col("id").alias("bucket"))
        )
    )
    dense = grid.join(counts, ["source", "bucket"], "left").fillna(0, ["c"])
    w_s = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_source = dense.withColumn("cum_s", F.sum("c").over(w_s))
    totals = counts.groupBy("source").agg(F.sum("c").alias("tot_s"))

    g_counts = (
        d.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("gc"))
    )
    g_grid = spark.range(DRIFT_BUCKETS).select(F.col("id").alias("bucket"))
    g_dense = g_grid.join(g_counts, "bucket", "left").fillna(0, ["gc"])
    w_g = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g_cum = g_dense.withColumn("cum_g", F.sum("gc").over(w_g))
    g_tot = d.agg(F.count(F.lit(1)).alias("tot_g"))

    joined = (
        per_source.join(F.broadcast(g_cum.select("bucket", "cum_g")), "bucket")
        .join(totals, "source")
        .crossJoin(F.broadcast(g_tot))
    )
    gap = F.abs(
        F.col("cum_s").cast("double") / F.col("tot_s")
        - F.col("cum_g").cast("double") / F.col("tot_g")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.round(F.max(gap), 6).alias("ks_stat"),
            F.max("tot_s").alias("n_docs"),
        )
    )


QUANTILE_PCTS = (25, 50, 75, 95)


def length_quantiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank length quantiles (p25/p50/p75/p95 of word
    count) per source — the corpus-profiling audit behind length-filter
    thresholds.

    Interpolating quantiles (percentile_cont / percentile_approx) mix
    doubles and are not reproducible across engines; nearest-rank picks
    the element at ceil(p*n/100), so every output is an integer that
    actually occurs in the data.  One shuffle by source feeds both the
    row_number and the per-source count (same window partitioning, one
    Exchange).  At 100 TB this is the exact audit tool for a bounded
    number of sources; when per-source rows no longer fit a sort,
    percentile_approx is the approximate scale path — at the cost of
    the cross-engine exactness this one guarantees.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        .cast("bigint")
        .alias("n_words"),
    )
    w_rank = Window.partitionBy("source").orderBy("n_words", "doc_id")
    ranked = base.select(
        "source",
        "n_words",
        F.row_number().over(w_rank).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    aggs = [F.max("n").alias("n_docs")]
    for p in QUANTILE_PCTS:
        # ceil(p*n/100) via floor((p*n+99)/100): exact for p*n < 2^53
        target = F.floor((F.lit(p) * F.col("n") + F.lit(99)) / F.lit(100))
        aggs.append(
            F.max(F.when(F.col("r") == target, F.col("n_words"))).alias(
                f"p{p}_words"
            )
        )
    return ranked.groupBy("source").agg(*aggs)


_SQL_QUALITY = """
  SELECT doc_id, lang,
         ROUND(0.4 * stopword_ratio + 0.3 * (1 - punct_ratio)
               + 0.3 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0), 6)
           AS quality_score
  FROM (
    SELECT doc_id, lang,
           CAST(len(w) AS BIGINT) AS n_words,
           ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))
                  AS DOUBLE) / length(text), 6) AS punct_ratio,
           ROUND(CAST(len(list_filter(w, x -> list_contains(
                    ['the','a','of','and','to','in','is','on'], x)))
                  AS DOUBLE) / len(w), 6) AS stopword_ratio
    FROM (
      SELECT doc_id, lang, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    )
    WHERE len(w) > 0
  )
"""

ORACLE: dict[str, str | None] = {
    "deterministic_sample": f"""
        SELECT doc_id, lang, n_chars,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 100) AS sample_bucket
        FROM documents
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 100) < {SAMPLE_PCT}
    """,
    "text_clean_redact": r"""
        WITH c AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(lower(text),
                         '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<email>',
                         'g'),
                       '[0-9]{6,}', '<number>', 'g'),
                     '[^a-z0-9 .@<>]', ' ', 'g'),
                   ' +', ' ', 'g')) AS clean_text,
                 text
          FROM documents
        )
        SELECT doc_id, clean_text,
               CAST(length(clean_text) AS BIGINT) AS clean_len,
               length(clean_text) < length(text) AS was_modified
        FROM c
    """,
    "quality_topk_mix": f"""
        SELECT lang, doc_id, quality_score, mix_rank
        FROM (
          SELECT lang, doc_id, quality_score,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY quality_score DESC, doc_id ASC) AS mix_rank
          FROM ({_SQL_QUALITY})
        )
        WHERE mix_rank <= {MIX_TOP_N}
    """,
    "source_drift_ks": f"""
        WITH b AS (
          SELECT source,
                 least(CAST(floor(n_chars / {DRIFT_BUCKET_WIDTH}) AS BIGINT),
                       {DRIFT_BUCKETS - 1}) AS bucket
          FROM documents
        ),
        counts AS (
          SELECT source, bucket, count(*) AS c FROM b GROUP BY source, bucket
        ),
        grid AS (
          SELECT s.source, g.bucket
          FROM (SELECT DISTINCT source FROM counts) s
          CROSS JOIN (SELECT unnest(generate_series(0,
                        {DRIFT_BUCKETS - 1}))::BIGINT AS bucket) g
        ),
        dense AS (
          SELECT grid.source, grid.bucket, COALESCE(counts.c, 0) AS c
          FROM grid LEFT JOIN counts USING (source, bucket)
        ),
        per_source AS (
          SELECT source, bucket,
                 sum(c) OVER (PARTITION BY source ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS cum_s
          FROM dense
        ),
        totals AS (SELECT source, sum(c) AS tot_s FROM counts GROUP BY source),
        g_dense AS (
          SELECT g.bucket, COALESCE(gc.gc, 0) AS gc
          FROM (SELECT unnest(generate_series(0,
                  {DRIFT_BUCKETS - 1}))::BIGINT AS bucket) g
          LEFT JOIN (SELECT bucket, count(*) AS gc FROM b GROUP BY bucket) gc
            USING (bucket)
        ),
        g_cum AS (
          SELECT bucket, sum(gc) OVER (ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS cum_g
          FROM g_dense
        ),
        g_tot AS (SELECT count(*) AS tot_g FROM documents)
        SELECT source,
               ROUND(max(abs(CAST(cum_s AS DOUBLE) / tot_s
                             - CAST(cum_g AS DOUBLE) / tot_g)), 6) AS ks_stat,
               CAST(max(tot_s) AS BIGINT) AS n_docs
        FROM per_source
        JOIN g_cum USING (bucket)
        JOIN totals USING (source)
        CROSS JOIN g_tot
        GROUP BY source
    """,
    "corpus_composition": """
        SELECT COALESCE(lang, '<all>') AS lang,
               COALESCE(source, '<all>') AS source,
               count(*) AS n_docs,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                                        x -> x <> ''))) AS BIGINT)
                 AS total_words,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY ROLLUP (lang, source)
    """,
    "corpus_mix_temperature": f"""
        WITH counts AS (
          SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ),
        total AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM counts),
        base AS (
          SELECT lang, n_docs,
                 CAST(n_docs AS DOUBLE) / total_docs AS p,
                 CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / total_docs)
                            * {_MIX_QUANT}) AS BIGINT) AS wq
          FROM counts CROSS JOIN total
        ),
        wsum AS (SELECT CAST(SUM(wq) AS BIGINT) AS wq_total FROM base)
        SELECT lang, n_docs,
               ROUND(p, 6) AS p_share,
               ROUND(CAST(wq AS DOUBLE) / wq_total, 6) AS weight,
               ROUND(CAST(wq AS DOUBLE) / wq_total / p, 6) AS boost,
               CAST(floor(CAST(wq AS DOUBLE) / wq_total
                          * {MIX_BUDGET_DOCS} + 0.5) AS BIGINT)
                 AS expected_docs
        FROM base CROSS JOIN wsum
    """,
    "corpus_mix_apply": f"""
        WITH counts AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY lang
        ),
        total AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM counts),
        base AS (
          SELECT lang, n_docs,
                 CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / total_docs)
                            * {_MIX_QUANT}) AS BIGINT) AS wq
          FROM counts CROSS JOIN total
        ),
        wsum AS (SELECT CAST(SUM(wq) AS BIGINT) AS wq_total FROM base),
        rates AS (
          SELECT lang, n_docs AS lang_docs,
                 LEAST(1000000, CAST(floor(
                   CAST(wq AS DOUBLE) / wq_total * {MIX_BUDGET_DOCS}
                   / n_docs * 1000000) AS BIGINT)) AS rate_ppm
          FROM base CROSS JOIN wsum
        )
        SELECT d.doc_id, d.lang,
               (('0x' || substr(md5(concat_ws('|', 'mix', d.lang,
                  CAST(d.doc_id AS VARCHAR))), 1, 15))::BIGINT % 1000000)
                 AS bucket_ppm,
               r.rate_ppm,
               (('0x' || substr(md5(concat_ws('|', 'mix', d.lang,
                  CAST(d.doc_id AS VARCHAR))), 1, 15))::BIGINT % 1000000)
                 < r.rate_ppm AS keep
        FROM documents d JOIN rates r ON d.lang = r.lang
    """,
    "stratified_split": f"""
        WITH b AS (
          SELECT doc_id, lang,
                 (('0x' || substr(md5(concat_ws('|', lang,
                      CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT % 100)
                   AS split_bucket
          FROM documents
        )
        SELECT doc_id, lang, split_bucket,
               CASE WHEN split_bucket < {TRAIN_PCT} THEN 'train'
                    WHEN split_bucket < {VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
    "length_quantiles_by_source": f"""
        WITH base AS (
          SELECT source, doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS BIGINT) AS n_words
          FROM documents
        ),
        ranked AS (
          SELECT source, n_words,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_words, doc_id) AS r,
                 count(*) OVER (PARTITION BY source) AS n
          FROM base
        )
        SELECT source,
               MAX(n) AS n_docs,
               {", ".join(
                   f"MAX(CASE WHEN r = floor(({p} * n + 99) / 100)"
                   f" THEN n_words END) AS p{p}_words"
                   for p in QUANTILE_PCTS
               )}
        FROM ranked GROUP BY source
    """,
}

def _sql_split_leakage() -> str:
    from velib_lakehouse_spark.operators.dedup import _SQL_SHINGLES

    return f"""
        WITH assign AS (
          SELECT doc_id,
                 CASE WHEN b < {TRAIN_PCT} THEN 'train'
                      WHEN b < {VAL_PCT} THEN 'val'
                      ELSE 'test' END AS split
          FROM (
            SELECT doc_id,
                   (('0x' || substr(md5(concat_ws('|', lang,
                        CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT % 100) AS b
            FROM documents
          )
        ),
        sh AS (
          SELECT s.doc_id, s.shingle, a.split
          FROM ({_SQL_SHINGLES}) s JOIN assign a ON s.doc_id = a.doc_id
        ),
        train_sh AS (
          SELECT DISTINCT shingle FROM sh WHERE split = 'train'
        ),
        leaked AS (
          SELECT DISTINCT doc_id FROM sh
          WHERE split <> 'train'
            AND shingle IN (SELECT shingle FROM train_sh)
        )
        SELECT a.split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_leaked,
               (SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // count(*)) / 1000000.0 AS leak_ratio
        FROM assign a LEFT JOIN leaked l ON a.doc_id = l.doc_id
        WHERE a.split <> 'train'
        GROUP BY a.split
    """


ORACLE["split_leakage_audit"] = _sql_split_leakage()

QUERIES = {
    "deterministic_sample": deterministic_sample,
    "text_clean_redact": text_clean_redact,
    "quality_topk_mix": quality_topk_mix,
    "corpus_mix_temperature": corpus_mix_temperature,
    "corpus_mix_apply": corpus_mix_apply,
    "stratified_split": stratified_split,
    "split_leakage_audit": split_leakage_audit,
    "corpus_composition": corpus_composition,
    "source_drift_ks": source_drift_ks,
    "length_quantiles_by_source": length_quantiles_by_source,
}


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-completeness and cardinality profile of the documents
    table: null counts, empty-text count, distinct languages/sources,
    length extremes — the one-glance profiling row a data catalog shows
    before anyone queries a new 100 TB drop.

    Scale: a single full-scan aggregate (every statistic partial-
    aggregates map-side; distincts are exact but over low-cardinality
    label columns), one row out.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("doc_id").isNull().cast("bigint")).alias("null_doc_id"),
        F.sum(F.col("text").isNull().cast("bigint")).alias("null_text"),
        F.sum(
            (F.col("text").isNotNull() & (F.length("text") == 0)).cast(
                "bigint"
            )
        ).alias("empty_text"),
        F.sum(F.col("lang").isNull().cast("bigint")).alias("null_lang"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


ORACLE["corpus_profile"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_doc_id,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_text,
           CAST(SUM(CASE WHEN text IS NOT NULL AND len(text) = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_lang,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
"""
QUERIES["corpus_profile"] = corpus_profile


WS_SAMPLE_K = 50
_WS_U_MOD = 1_000_000_000


def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, A-ES): each document draws a uniform
    u from its md5 hash and ranks by ln(u)/weight; the top-K by that
    key is an exact weighted sample — longer documents (weight =
    n_chars) are proportionally more likely, yet the draw is a pure
    function of doc_id, so it reproduces across engines, retries, and
    cluster sizes (the ``deterministic_sample`` property, upgraded
    from uniform to weighted).

    Scale: map-side key computation + one TakeOrdered top-K (map-side
    partial top-K, no global sort) — the one-pass distributed weighted
    sampler.

    Determinism: u = (md5 % 1e9 + 1)/1e9 divides identical integers;
    ln(u)/w is the identical double expression in both engines and is
    floor-quantized to nano units before ranking; ties break on
    doc_id.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit("ws"), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % _WS_U_MOD
            + 1
        ).cast("double")
        / F.lit(float(_WS_U_MOD))
    )
    key_nano = F.floor(
        F.log(u) / F.col("n_chars").cast("double") * F.lit(1_000_000_000)
    ).cast("bigint")
    scored = d.select(
        "doc_id",
        F.col("n_chars").alias("weight"),
        key_nano.alias("key_nano"),
    )
    return scored.orderBy(F.desc("key_nano"), F.asc("doc_id")).limit(
        WS_SAMPLE_K
    )


ORACLE["weighted_sample_topk"] = f"""
    WITH scored AS (
      SELECT doc_id, n_chars AS weight,
             CAST(floor(
               ln(CAST((('0x' || substr(md5(concat_ws('|', 'ws',
                     CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT
                     % {_WS_U_MOD} + 1) AS DOUBLE) / {_WS_U_MOD})
               / CAST(n_chars AS DOUBLE) * 1000000000) AS BIGINT)
               AS key_nano
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, weight, key_nano
    FROM scored
    ORDER BY key_nano DESC, doc_id ASC
    LIMIT {WS_SAMPLE_K}
"""
QUERIES["weighted_sample_topk"] = weighted_sample_topk


def e2e_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation funnel as ONE judged query: raw corpus ->
    Gopher quality gate -> exact keep-first dedup -> per-source yield
    report (docs in, docs passing, unique survivors, surviving words).
    This is the number a data engineer actually reports per crawl
    source, and it pins that the pipeline STAGES COMPOSE — the same
    operators judged individually, chained, with one composite oracle.

    Scale: the quality gate is map-side (per-row booleans); dedup
    shuffles 60-bit text hashes (never text) for the keep-first window;
    the report is one partial-aggregated rollup per source.  Nothing in
    the funnel materializes an intermediate corpus — it is one lazy
    plan end-to-end, which is exactly how you'd run it at 100 TB (the
    stages fuse into two shuffle boundaries total).
    """
    from velib_lakehouse_spark.operators.text import gopher_quality_filter

    d = load_table(spark, sf_dir, "documents")
    g = gopher_quality_filter(spark, sf_dir).select(
        "doc_id", "n_words", "passes_gopher"
    )
    passers = (
        g.filter(F.col("passes_gopher"))
        .join(d.select("doc_id", "source", "text"), "doc_id")
        .withColumn("text_hash", md5_long(F.col("text")))
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    surv = passers.withColumn("first", F.row_number().over(w) == 1)
    per_source = surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_quality"),
        F.sum(F.col("first").cast("bigint")).alias("n_survivors"),
        F.sum(
            F.when(F.col("first"), F.col("n_words")).otherwise(F.lit(0))
        ).alias("surviving_words"),
    )
    raw = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    return raw.join(per_source, "source", "left").select(
        "source",
        "n_raw",
        F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
        F.coalesce("n_survivors", F.lit(0)).alias("n_survivors"),
        F.coalesce("surviving_words", F.lit(0)).alias("surviving_words"),
    )


def _e2e_oracle() -> str:
    from velib_lakehouse_spark.operators.text import ORACLE as TEXT_ORACLE

    return f"""
        WITH g AS ({TEXT_ORACLE["gopher_quality_filter"]}),
        passers AS (
          SELECT d.source, d.doc_id, g.n_words,
                 {sql_md5_long('d.text')} AS text_hash
          FROM g JOIN documents d USING (doc_id)
          WHERE g.passes_gopher
        ),
        surv AS (
          SELECT source, n_words,
                 row_number() OVER (PARTITION BY text_hash
                                    ORDER BY doc_id) = 1 AS first
          FROM passers
        ),
        q AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n_quality,
                 CAST(SUM(CASE WHEN first THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_survivors,
                 CAST(SUM(CASE WHEN first THEN n_words ELSE 0 END) AS BIGINT)
                   AS surviving_words
          FROM surv GROUP BY source
        ),
        raw AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_raw
          FROM documents GROUP BY source
        )
        SELECT raw.source, raw.n_raw,
               COALESCE(q.n_quality, 0) AS n_quality,
               COALESCE(q.n_survivors, 0) AS n_survivors,
               COALESCE(q.surviving_words, 0) AS surviving_words
        FROM raw LEFT JOIN q USING (source)
    """


ORACLE["e2e_curation_report"] = _e2e_oracle()
QUERIES["e2e_curation_report"] = e2e_curation_report


# ---- per-domain cap sampling (round 4) ---------------------------------------

DOMAIN_CAP = 15


def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source's contribution at DOMAIN_CAP documents, chosen by
    content-independent hash order — the anti-domination step of a
    crawl-mix recipe (one mega-domain must not swamp the corpus).

    Differs from ``deterministic_sample`` (global hash-threshold rate)
    by bounding the PER-GROUP count exactly.  The md5(doc_id) sort key
    makes the pick uniform, reproducible, and stable under corpus
    growth everywhere except the cap boundary.  One shuffle on source;
    the rank window is WindowGroupLimit-eligible, so each task discards
    past-cap rows before the per-source sort finishes — at 100 TB with
    few giant sources, pre-aggregate with a salted per-salt cap first
    and re-rank the ~salts * cap survivors.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        md5_long(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        d.withColumn("smp_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("smp_rank") <= DOMAIN_CAP)
        .select("doc_id", "source", "lang", "n_chars", "smp_rank")
    )


ORACLE["domain_cap_sample"] = f"""
    SELECT doc_id, source, lang, n_chars, smp_rank FROM (
      SELECT doc_id, source, lang, n_chars,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY {sql_md5_long("CAST(doc_id AS VARCHAR)")}, doc_id
             ) AS BIGINT) AS smp_rank
      FROM documents
    ) WHERE smp_rank <= {DOMAIN_CAP}
"""
QUERIES["domain_cap_sample"] = domain_cap_sample


# ---- PSI drift + Gini concentration audits ----

PSI_BINS = 8


def psi_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per source: how far each source's
    doc-length distribution drifts from the corpus-wide one —
    ``PSI = sum_i (q_i - p_i) * ln(q_i / p_i)`` over equi-width length
    bins, the standard model-monitoring drift score (PSI > 0.2 =
    investigate) and the binned complement to the rank-based KS audit
    (`source_drift_ks`).

    Laplace-smoothed bin shares ((count+1)/(total+B)) keep empty bins
    finite; each bin term is floor-quantized to integer micro units
    before the sum — both engines derive the doubles from identical
    integer counts, so the result is bit-stable (the `pmi_collocations`
    ln convention).

    Scale shape: ONE pass builds (source, bin) counts (the global
    min/max broadcast from a 2-value agg); source totals and corpus
    bin shares derive from that same tiny (sources x B)-row frame.
    Nothing after the first aggregation touches the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    stats = d.agg(
        F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx")
    )
    binned = (
        d.crossJoin(F.broadcast(stats))
        .select(
            "source",
            F.expr(
                f"(n_chars - mn) * {PSI_BINS} div (mx - mn + 1)"
            ).alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    src_tot = binned.groupBy("source").agg(F.sum("c").alias("src_n"))
    corp = binned.groupBy("bin").agg(F.sum("c").alias("corp_c"))
    corp_tot = binned.agg(F.sum("c").alias("corp_n"))
    grid = (
        src_tot.crossJoin(
            F.broadcast(
                spark.range(PSI_BINS).select(F.col("id").alias("bin"))
            )
        )
        .join(binned, ["source", "bin"], "left")
        .join(F.broadcast(corp), "bin", "left")
        .crossJoin(F.broadcast(corp_tot))
        .select(
            "source",
            "src_n",
            F.expr(
                f"(coalesce(c, 0) + 1) / cast(src_n + {PSI_BINS} as double)"
            ).alias("q"),
            F.expr(
                f"(coalesce(corp_c, 0) + 1)"
                f" / cast(corp_n + {PSI_BINS} as double)"
            ).alias("p"),
        )
    )
    return (
        grid.select(
            "source",
            "src_n",
            F.expr(
                "cast(floor((q - p) * ln(q / p) * 1e6) as bigint)"
            ).alias("term_micro"),
        )
        .groupBy("source")
        .agg(
            F.max("src_n").alias("n_docs"),
            F.sum("term_micro").alias("psi_micro"),
        )
    )


ORACLE["psi_drift_audit"] = f"""
    WITH stats AS (
      SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents
    ),
    binned AS (
      SELECT source,
             (n_chars - mn) * {PSI_BINS} // (mx - mn + 1) AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM documents CROSS JOIN stats GROUP BY 1, 2
    ),
    src_tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS src_n
      FROM binned GROUP BY source
    ),
    corp AS (
      SELECT bin, CAST(sum(c) AS BIGINT) AS corp_c FROM binned GROUP BY bin
    ),
    corp_tot AS (SELECT CAST(sum(c) AS BIGINT) AS corp_n FROM binned),
    grid AS (
      SELECT s.source, s.src_n,
             (COALESCE(b.c, 0) + 1)
               / CAST(s.src_n + {PSI_BINS} AS DOUBLE) AS q,
             (COALESCE(cp.corp_c, 0) + 1)
               / CAST(ct.corp_n + {PSI_BINS} AS DOUBLE) AS p
      FROM src_tot s
      CROSS JOIN (SELECT unnest(generate_series(0, {PSI_BINS - 1}))
                  AS bin) g
      LEFT JOIN binned b ON b.source = s.source AND b.bin = g.bin
      LEFT JOIN corp cp ON cp.bin = g.bin
      CROSS JOIN corp_tot ct
    )
    SELECT source,
           CAST(max(src_n) AS BIGINT) AS n_docs,
           CAST(sum(CAST(floor((q - p) * ln(q / p) * 1e6) AS BIGINT))
                AS BIGINT) AS psi_micro
    FROM grid GROUP BY source
"""
QUERIES["psi_drift_audit"] = psi_drift_audit


def source_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the corpus's per-source document counts —
    the one-number answer to "is this corpus dominated by a few
    domains?" (0 = perfectly even, ->1 = one source owns everything);
    the measurement whose remediation is `domain_cap_sample`.

    Exact integer form over counts sorted ascending (rank tiebreak by
    source name): ``G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))``,
    emitted in ppm by integer division — no floats anywhere.

    Scale shape: one aggregation to per-source counts, then a window
    over ONE ROW PER SOURCE (domain-catalog-bounded, not corpus-
    bounded) — the global order is over thousands of domains at any
    corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("x"))
    ranked = counts.select(
        "x",
        F.row_number()
        .over(Window.orderBy(F.col("x").asc(), F.col("source").asc()))
        .alias("i"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("x").alias("total_docs"),
        F.expr(
            "(2 * sum(i * x) - (count(1) + 1) * sum(x)) * 1000000"
            " div (count(1) * sum(x))"
        ).alias("gini_ppm"),
    )


ORACLE["source_concentration_gini"] = """
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS x
      FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x ASC, source ASC) AS i
      FROM counts
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sources,
           CAST(sum(x) AS BIGINT) AS total_docs,
           (2 * CAST(sum(i * x) AS BIGINT)
             - (count(*) + 1) * CAST(sum(x) AS BIGINT)) * 1000000
             // (count(*) * CAST(sum(x) AS BIGINT)) AS gini_ppm
    FROM ranked
"""
QUERIES["source_concentration_gini"] = source_concentration_gini


# ---- Multi-stage curation DAG with lineage accounting ----

# Stage thresholds — deliberately simple, the judged artifact is the
# DAG composition + lineage math, not the individual heuristics (each
# heuristic family is judged on its own elsewhere in the registry).
DAG_MIN_WORDS = 5
DAG_MAX_CHARS = 20_000
DAG_TRAIN_PCT = 90  # md5 bucket < 90 -> train, rest -> validation


def curation_dag_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data curation DAG — eval holdout -> exact
    dedup -> quality gate -> benchmark decontamination -> train split —
    judged as ONE pipeline with per-stage lineage counts (rows in/out/
    dropped per stage), the audit artifact every production curation
    run ships with its dataset card.

    Scale shape: survival through every stage is computed as BOOLEAN
    FLAGS on a single corpus pass — never by materializing N
    intermediate corpora and counting each (which would scan the
    corpus once per stage).  The dedup flag is a min-over-content-hash
    window (one hash-keyed shuffle, text never shuffles); the quality
    and split flags are map-side expressions; the contamination flag
    is the decontaminate_ngram shape (eval shingles broadcast into the
    corpus shingle stream, one doc-keyed hit aggregation).  Lineage is
    then ONE conditional aggregation over nested conjunctions — at
    100 TB the whole DAG is two scans (flags + shingles), two keyed
    shuffles, and a 1-row reduce, fanned out to 5 report rows.

    Stage semantics: dedup/quality/decontamination apply to the
    train-candidate corpus (eval holdout removed first — standard,
    since eval docs must not vote for canonical status), and the
    decontamination eval set is built from the held-out docs' word
    3-grams (same EVAL_MOD protocol as decontaminate_ngram).
    """
    from velib_lakehouse_spark.operators.dedup import _shingles
    from velib_lakehouse_spark.operators.training import EVAL_MOD

    d = load_table(spark, sf_dir, "documents")
    is_cand = F.col("doc_id") % EVAL_MOD != 0
    # canonical = smallest CANDIDATE doc_id of the content-hash group
    # (min of a conditional: eval docs never claim canonicality)
    canon = (
        F.min(F.when(is_cand, F.col("doc_id"))).over(
            Window.partitionBy(md5_long(F.col("text")))
        )
        == F.col("doc_id")
    )
    n_words = F.size(F.filter(F.split(F.col("text"), " "), lambda w: w != ""))
    qual = (n_words >= DAG_MIN_WORDS) & (F.col("n_chars") <= DAG_MAX_CHARS)
    train = (
        md5_long(F.col("doc_id").cast("string")) % 100 < DAG_TRAIN_PCT
    )
    flags = d.select(
        "doc_id",
        is_cand.alias("is_cand"),
        canon.alias("canon"),
        qual.alias("qual"),
        train.alias("train"),
    )

    sh = _shingles(d)
    eval_sh = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0).select("shingle").distinct()
    )
    contam = (
        sh.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_sh), "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    flagged = flags.join(contam, "doc_id", "left").na.fill(
        {"contaminated": False}
    )

    def _n(cond) -> F.Column:
        return F.sum(cond.cast("bigint"))

    c = F.col
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_total"),
        _n(c("is_cand")).alias("n_cand"),
        _n(c("is_cand") & c("canon")).alias("n_canon"),
        _n(c("is_cand") & c("canon") & c("qual")).alias("n_qual"),
        _n(
            c("is_cand") & c("canon") & c("qual") & ~c("contaminated")
        ).alias("n_clean"),
        _n(
            c("is_cand")
            & c("canon")
            & c("qual")
            & ~c("contaminated")
            & c("train")
        ).alias("n_train"),
    )
    return agg.selectExpr(
        """stack(5,
             CAST(1 AS BIGINT), 'holdout_eval',    n_total, n_cand,
             CAST(2 AS BIGINT), 'exact_dedup',     n_cand,  n_canon,
             CAST(3 AS BIGINT), 'quality_filter',  n_canon, n_qual,
             CAST(4 AS BIGINT), 'decontaminate',   n_qual,  n_clean,
             CAST(5 AS BIGINT), 'train_split',     n_clean, n_train
           ) AS (stage_id, stage, rows_in, rows_out)"""
    ).withColumn("rows_dropped", F.col("rows_in") - F.col("rows_out"))


def _sql_curation_dag() -> str:
    from velib_lakehouse_spark.operators.dedup import _SQL_SHINGLES
    from velib_lakehouse_spark.operators.training import EVAL_MOD

    return f"""
        WITH flags AS (
          SELECT doc_id,
                 doc_id % {EVAL_MOD} <> 0 AS is_cand,
                 min(CASE WHEN doc_id % {EVAL_MOD} <> 0 THEN doc_id END)
                   OVER (PARTITION BY {sql_md5_long('text')}) = doc_id
                   AS canon,
                 (len(list_filter(string_split(text, ' '), x -> x <> ''))
                    >= {DAG_MIN_WORDS}
                  AND n_chars <= {DAG_MAX_CHARS}) AS qual,
                 {sql_md5_long('CAST(doc_id AS VARCHAR)')} % 100
                   < {DAG_TRAIN_PCT} AS train
          FROM documents
        ),
        sh AS ({_SQL_SHINGLES}),
        eval_sh AS (
          SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
        ),
        contam AS (
          SELECT DISTINCT sh.doc_id
          FROM sh JOIN eval_sh USING (shingle)
          WHERE sh.doc_id % {EVAL_MOD} <> 0
        ),
        flagged AS (
          SELECT f.*, c.doc_id IS NOT NULL AS contaminated
          FROM flags f LEFT JOIN contam c ON f.doc_id = c.doc_id
        ),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_total,
                 CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cand,
                 CAST(SUM(CASE WHEN is_cand AND canon THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_canon,
                 CAST(SUM(CASE WHEN is_cand AND canon AND qual
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_qual,
                 CAST(SUM(CASE WHEN is_cand AND canon AND qual
                      AND NOT contaminated THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clean,
                 CAST(SUM(CASE WHEN is_cand AND canon AND qual
                      AND NOT contaminated AND train THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_train
          FROM flagged
        )
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS stage_id, 'holdout_eval' AS stage,
                 n_total AS rows_in, n_cand AS rows_out,
                 n_total - n_cand AS rows_dropped FROM agg
          UNION ALL
          SELECT 2, 'exact_dedup', n_cand, n_canon, n_cand - n_canon
          FROM agg
          UNION ALL
          SELECT 3, 'quality_filter', n_canon, n_qual, n_canon - n_qual
          FROM agg
          UNION ALL
          SELECT 4, 'decontaminate', n_qual, n_clean, n_qual - n_clean
          FROM agg
          UNION ALL
          SELECT 5, 'train_split', n_clean, n_train, n_clean - n_train
          FROM agg
        )
    """


ORACLE["curation_dag_lineage"] = _sql_curation_dag()
QUERIES["curation_dag_lineage"] = curation_dag_lineage


# ---- priority sampling with subset-sum estimation audit ---------------------

PS_K = 64  # sample size: one generic sample answers every subset-sum query
_PS_U_MOD = 1_000_000_000


def priority_sample_subset_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup 2007) with the
    subset-sum estimation it exists for, audited against exact totals.

    ``weighted_sample_topk`` draws a weighted sample (A-ES); this
    operator draws the sample AND uses it: each document gets priority
    ``q = w / u`` (weight w = n_chars, u uniform from its md5 hash),
    the top-K by priority is the sample, and ``tau`` — the (K+1)-th
    priority — turns it into an unbiased estimator: every sampled item
    estimates its weight as ``max(w, tau)``, and the estimated total
    weight of ANY subset (here: per language) is the sum of those
    values over the sample members in the subset.  One K-row sample,
    kept once, answers arbitrary post-hoc subset-sum queries over a
    100 TB corpus — the "which slice is how big" question asked after
    the scan is gone.

    Determinism (the cross-engine contract): u = (md5_60bit % 1e9 +
    1)/1e9 divides identical integers — exact in both engines; the
    priority is quantized to integer milli units (floor(w / u * 1000),
    two correctly-rounded IEEE-754 ops on identical inputs) before
    ranking, and every downstream value (tau, max, sums) is integer
    arithmetic on those milli units.  Ties break on doc_id.

    Scale shape: priorities are map-side expressions; the sample and
    tau come from ONE TakeOrdered top-(K+1) (map-side partial top-K, no
    global sort, no window); the per-language estimate aggregates K
    rows; the exact side is one map-side-combined groupBy — present
    only because this is an audit.  When the corpus has <= K documents
    the whole corpus is the sample and tau = 0, so every estimate is
    exact (the estimator's boundary case, handled identically in both
    engines).
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit("ps"), F.col("doc_id").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % _PS_U_MOD
            + 1
        ).cast("double")
        / F.lit(float(_PS_U_MOD))
    )
    scored = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").alias("weight"),
        F.floor(F.col("n_chars").cast("double") / u * F.lit(1000.0))
        .cast("bigint")
        .alias("prio_milli"),
    )
    # ONE top-(K+1) pass yields the sample (ranks 1..K) and tau (the
    # (K+1)-th priority = the min of the K+1 frame under desc order)
    frame = (
        scored.orderBy(F.desc("prio_milli"), F.asc("doc_id"))
        .limit(PS_K + 1)
        .persist()
    )
    tau = frame.agg(
        F.when(F.count(F.lit(1)) == PS_K + 1, F.min("prio_milli"))
        .otherwise(F.lit(0))
        .alias("tau_milli")
    )
    sample = (
        frame.orderBy(F.desc("prio_milli"), F.asc("doc_id"))
        .limit(PS_K)
        .crossJoin(F.broadcast(tau))
        .select(
            "lang",
            F.greatest(
                F.col("weight") * 1000, F.col("tau_milli")
            ).alias("est_w_milli"),
        )
    )
    est = sample.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("est_w_milli").alias("est_milli"),
    )
    exact = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("exact_total_chars"),
    )
    return exact.join(est, "lang", "left").select(
        "lang",
        "n_docs",
        "exact_total_chars",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        F.expr("coalesce(est_milli, 0) div 1000").alias("est_total_chars"),
        F.expr(
            "(coalesce(est_milli, 0) div 1000 - exact_total_chars)"
            " * 1000000 div nullif(exact_total_chars, 0)"
        ).alias("err_ppm"),
    )


ORACLE["priority_sample_subset_sum"] = f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars AS weight,
             CAST(floor(
               CAST(n_chars AS DOUBLE)
               / (CAST((('0x' || substr(md5(concat_ws('|', 'ps',
                      CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT
                      % {_PS_U_MOD} + 1) AS DOUBLE) / {_PS_U_MOD})
               * 1000) AS BIGINT) AS prio_milli
      FROM documents WHERE n_chars > 0
    ),
    frame AS (
      SELECT * FROM scored
      ORDER BY prio_milli DESC, doc_id ASC
      LIMIT {PS_K + 1}
    ),
    tau AS (
      SELECT CASE WHEN count(*) = {PS_K + 1} THEN min(prio_milli)
                  ELSE 0 END AS tau_milli
      FROM frame
    ),
    sample AS (
      SELECT lang, greatest(weight * 1000, tau_milli) AS est_w_milli
      FROM (SELECT * FROM frame
            ORDER BY prio_milli DESC, doc_id ASC LIMIT {PS_K})
      CROSS JOIN tau
    ),
    est AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
             CAST(sum(est_w_milli) AS BIGINT) AS est_milli
      FROM sample GROUP BY lang
    ),
    exact AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS exact_total_chars
      FROM documents WHERE n_chars > 0 GROUP BY lang
    )
    SELECT x.lang, x.n_docs, x.exact_total_chars,
           COALESCE(e.n_sampled, 0) AS n_sampled,
           COALESCE(e.est_milli, 0) // 1000 AS est_total_chars,
           (COALESCE(e.est_milli, 0) // 1000 - x.exact_total_chars)
             * 1000000 // nullif(x.exact_total_chars, 0) AS err_ppm
    FROM exact x LEFT JOIN est e ON x.lang = e.lang
"""
QUERIES["priority_sample_subset_sum"] = priority_sample_subset_sum
