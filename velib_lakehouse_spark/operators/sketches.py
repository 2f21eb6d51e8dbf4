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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.hashing import (
    md5_long,
    seeded_md5_long,
    sql_md5_long,
    sql_seeded_md5_long,
)
from velib_lakehouse_spark.operators.dedup import _SQL_SHINGLES, _shingles

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


HLL_P = 4  # register-index bits
HLL_M = 1 << HLL_P  # 16 registers; std error ~ 1.04/sqrt(m) ~ 26%
# alpha_16 * m^2 = 0.673 * 256 (Flajolet et al. 2007 constant for m=16)
HLL_ALPHA_M2 = "172.288"
# 2^57: the harmonic sum is kept as the INTEGER sum(2^(57 - r_j)) so it
# is bit-exact under any partitioning/merge order (r_j <= 57, so every
# term is a non-negative power of two and the total stays < 2^61).
HLL_SCALE = 1 << 57


def hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-word estimate, audited against the exact
    count (Flajolet et al. 2007, without the small/large-range
    corrections — the raw estimator, plus the zero-register count the
    corrections key off, so the audit shows WHEN they would kick in).

    Register build: bucket = low p bits of the 60-bit word hash,
    rho = leading-zero count of the remaining 56 bits + 1, register =
    max(rho) per bucket.  Emits ONE row: the ordered 16-register
    vector, the integer-scaled harmonic sum, the estimate, the exact
    distinct count, and the signed error in ppm.

    Scale shape: a PRODUCTION HLL streams raw tokens into a map-side
    partial ``max`` onto exactly m = 16 reduce rows (registers merge by
    elementwise max — the mergeable-sketch shape).  The AUDIT, though,
    must also produce the exact distinct count, whose word-level
    distinct shuffle subsumes the register build's input: so here ONE
    Zipf-bounded distinct (persisted) feeds both the registers
    (max(rho) over a multiset equals max over its support, so
    registers built from the distinct set are identical to the raw-
    stream sketch) and the exact count — the whole query costs one
    word shuffle, measured linear at 64x replicated corpus.  All
    arithmetic is integer except the single final estimate division,
    which both engines evaluate from identical IEEE-754 inputs.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(_words()).alias("w")).distinct().persist()
    regs = (
        words.select(md5_long(F.col("w")).alias("h"))
        .select(
            (F.col("h") % HLL_M).alias("bucket"),
            F.expr(
                # rho over the top 56 bits: 57 - bitlength(h div 16),
                # with the all-zero suffix pinned to 57
                f"""CASE WHEN (h div {HLL_M}) = 0 THEN 57
                    ELSE 57 - length(bin(h div {HLL_M})) END"""
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )
    all_regs = (
        spark.range(HLL_M)
        .select(F.col("id").alias("bucket"))
        .join(regs, "bucket", "left")
        .select("bucket", F.coalesce("r", F.lit(0)).cast("int").alias("r"))
    )
    summary = all_regs.agg(
        F.expr("array_sort(collect_list(struct(bucket, r)))").alias("br"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 57 - r)")).alias(
            "harmonic_scaled"
        ),
        F.sum(F.when(F.col("r") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_registers"),
    ).select(
        # '-'-joined string, not array<int>: the driver canonicalizes
        # results with pandas sort_values, which cannot hash array cells
        F.concat_ws(
            "-", F.expr("transform(br, x -> cast(x.r as string))")
        ).alias("registers"),
        "harmonic_scaled",
        "n_zero_registers",
        # explicit floor: DuckDB's double->BIGINT cast rounds while
        # Spark's truncates, so pin the rounding mode in both engines
        F.expr(
            f"CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)}"
            " / harmonic_scaled) AS BIGINT)"
        ).alias("hll_estimate"),
    )
    exact = words.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return summary.crossJoin(F.broadcast(exact)).select(
        "registers",
        "harmonic_scaled",
        "n_zero_registers",
        "hll_estimate",
        "exact_distinct",
        # nullif: an empty corpus has exact_distinct = 0; the error is
        # undefined there (NULL), and DuckDB would raise on // 0
        F.expr(
            "(hll_estimate - exact_distinct) * 1000000"
            " div nullif(exact_distinct, 0)"
        ).alias("err_ppm"),
    )


BLOOM_M = 512  # bits; sized so the test corpus shows real FPs
BLOOM_K = 3  # probes per key
BLOOM_EVAL_MOD = 11  # same held-out convention as training.EVAL_MOD


def bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination audit: rebuild the eval-shingle
    membership test as an m-bit / k-probe Bloom filter and report, per
    training document, how many of its shingles the filter flags vs the
    exact semi-join — i.e. the filter's false-positive tax (Bloom
    filters have no false negatives, so ``n_bloom_hits >=
    n_exact_hits`` always; the delta is what a production pipeline
    trades for a constant-size membership structure).

    Scale shape: the SET-BITS table is at most m = 512 rows no matter
    how many eval shingles exist (bits merge by union — mergeable like
    every sketch here) and is broadcast; the probe pass is map-side
    fan-out of k rows per train shingle joined against the broadcast
    bitset, then one per-(doc, shingle) count and one per-doc rollup.
    The exact pass reuses the same broadcast eval-shingle set as
    ``decontaminate_ngram``.  At 100 TB the filter would be sized
    m ~ 10 bits/key; the audit's shuffles stay one-row-per-shingle.
    """
    d = load_table(spark, sf_dir, "documents")
    # four consumers (eval set, probe stream, exact pass, per-doc base):
    # persist the shingle scan once, same cache-lifetime convention as
    # operators/dedup.py (module docstring there)
    sh = _shingles(d).persist()
    eval_sh = (
        sh.filter(F.col("doc_id") % BLOOM_EVAL_MOD == 0)
        .select("shingle")
        .distinct()
    )
    seeds = spark.range(BLOOM_K).select(F.col("id").alias("seed"))
    bits = (
        eval_sh.crossJoin(F.broadcast(seeds))
        .select(
            (seeded_md5_long(F.col("seed"), F.col("shingle")) % BLOOM_M)
            .alias("bit")
        )
        .distinct()
    )
    train_sh = sh.filter(F.col("doc_id") % BLOOM_EVAL_MOD != 0)
    probe_hits = (
        train_sh.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "shingle",
            (seeded_md5_long(F.col("seed"), F.col("shingle")) % BLOOM_M)
            .alias("bit"),
        )
        .join(F.broadcast(bits), "bit")
        .groupBy("doc_id", "shingle")
        # k probe rows per shingle; a shingle is a Bloom member iff all
        # k landed on set bits (seed collisions double-count a bit, so
        # count distinct seeds is NOT needed — each seed row either
        # joins or doesn't)
        .agg(F.count(F.lit(1)).alias("nk"))
        .filter(F.col("nk") == BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
    )
    exact_hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exact_hits"))
    )
    base = train_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return (
        base.join(probe_hits, "doc_id", "left")
        .join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
            (
                F.coalesce("n_bloom_hits", F.lit(0))
                - F.coalesce("n_exact_hits", F.lit(0))
            ).alias("n_false_positives"),
            F.expr(
                "(coalesce(n_bloom_hits, 0) - coalesce(n_exact_hits, 0))"
                " * 1000000 div n_shingles"
            ).alias("fp_ppm"),
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
    "hll_distinct_audit": f"""
        WITH words AS ({_SQL_WORDS}),
        hv AS (SELECT {sql_md5_long('w')} AS h, w FROM words),
        regs AS (
          SELECT bucket, max(rho) AS r FROM (
            SELECT h % {HLL_M} AS bucket,
                   CASE WHEN (h // {HLL_M}) = 0 THEN 57
                        ELSE 57 - length(bin(h // {HLL_M})) END AS rho
            FROM hv
          ) GROUP BY bucket
        ),
        allr AS (
          SELECT g.bucket, CAST(COALESCE(r.r, 0) AS INT) AS r
          FROM (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket) g
          LEFT JOIN regs r USING (bucket)
        ),
        summ AS (
          SELECT string_agg(CAST(r AS VARCHAR), '-' ORDER BY bucket)
                   AS registers,
                 CAST(sum(CAST(1 AS BIGINT) << (57 - r)) AS BIGINT)
                   AS harmonic_scaled,
                 CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_registers
          FROM allr
        ),
        est AS (
          SELECT *,
                 CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)}
                      / harmonic_scaled) AS BIGINT) AS hll_estimate
          FROM summ
        ),
        ex AS (
          SELECT CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct
          FROM words
        )
        SELECT registers, harmonic_scaled, n_zero_registers, hll_estimate,
               exact_distinct,
               (hll_estimate - exact_distinct) * 1000000
                 // nullif(exact_distinct, 0) AS err_ppm
        FROM est CROSS JOIN ex
    """,
    "bloom_membership_audit": f"""
        WITH sh AS ({_SQL_SHINGLES}),
        eval_sh AS (
          SELECT DISTINCT shingle FROM sh
          WHERE doc_id % {BLOOM_EVAL_MOD} = 0
        ),
        seeds AS (
          SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS seed
        ),
        bits AS (
          SELECT DISTINCT
                 {sql_seeded_md5_long('seed', 'shingle')} % {BLOOM_M} AS bit
          FROM eval_sh CROSS JOIN seeds
        ),
        train_sh AS (
          SELECT doc_id, shingle FROM sh
          WHERE doc_id % {BLOOM_EVAL_MOD} <> 0
        ),
        probes AS (
          SELECT t.doc_id, t.shingle,
                 {sql_seeded_md5_long('s.seed', 't.shingle')} % {BLOOM_M}
                   AS bit
          FROM train_sh t CROSS JOIN seeds s
        ),
        memb AS (
          SELECT doc_id, shingle FROM probes JOIN bits USING (bit)
          GROUP BY doc_id, shingle HAVING count(*) = {BLOOM_K}
        ),
        bloom AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom_hits
          FROM memb GROUP BY doc_id
        ),
        exact AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_exact_hits
          FROM train_sh WHERE shingle IN (SELECT shingle FROM eval_sh)
          GROUP BY doc_id
        ),
        base AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
          FROM train_sh GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_shingles,
               COALESCE(bl.n_bloom_hits, CAST(0 AS BIGINT)) AS n_bloom_hits,
               COALESCE(e.n_exact_hits, CAST(0 AS BIGINT)) AS n_exact_hits,
               COALESCE(bl.n_bloom_hits, 0) - COALESCE(e.n_exact_hits, 0)
                 AS n_false_positives,
               (COALESCE(bl.n_bloom_hits, 0) - COALESCE(e.n_exact_hits, 0))
                 * 1000000 // b.n_shingles AS fp_ppm
        FROM base b
        LEFT JOIN bloom bl USING (doc_id)
        LEFT JOIN exact e USING (doc_id)
    """,
}

QUERIES = {
    "cms_frequency_audit": cms_frequency_audit,
    "hll_distinct_audit": hll_distinct_audit,
    "bloom_membership_audit": bloom_membership_audit,
}


# ---- Equi-width histogram quantile sketch + exactness audit ----

HIST_BINS = 64
HIST_QS = (50, 90, 99)  # audited percentiles


def histogram_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a fixed equi-width histogram, audited
    against the exact order statistic — the third mergeable sketch in
    this module (bins merge by addition like CMS counts and HLL
    registers merge by max).

    For each audited percentile q the estimate is the upper edge of
    the first bin whose cumulative count reaches rank
    ``ceil(q*n/100)``; the exact value is the true rank-th smallest
    price (percentile_disc semantics).  The estimate is one-sided
    (>= exact, within one bin width) — both properties surface as
    audit columns.  All arithmetic is integer cents.

    Scale shape: the histogram build is ONE map-side-combined shuffle
    onto exactly B = 64 reduce rows regardless of row count — at
    100 TB the bins stay a broadcast table and executor-local partial
    histograms merge by addition.  The audit's exact pass aggregates
    per distinct price then walks the cumulative counts — one shuffle,
    value-distinct-bounded, present only because this is an audit.
    """
    o = load_table(spark, sf_dir, "orders")
    prices = o.select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("p")
    )
    stats = prices.agg(
        F.min("p").alias("mn"),
        F.max("p").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = prices.crossJoin(F.broadcast(stats)).select(
        F.expr(f"(p - mn) * {HIST_BINS} div (mx - mn + 1)").alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    cumw = (
        Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select("bin", F.sum("c").over(cumw).alias("cum"))
    qs = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(q) for q in HIST_QS])
            ).alias("q")
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "q", "mn", "mx",
            F.expr("(q * n + 99) div 100").alias("target_rank"),
        )
    )
    est = (
        qs.join(F.broadcast(cum), F.col("cum") >= F.col("target_rank"))
        .groupBy("q", "mn", "mx", "target_rank")
        .agg(F.min("bin").alias("bin"))
        .select(
            "q",
            "target_rank",
            F.expr(
                f"mn + (bin + 1) * (mx - mn + 1) div {HIST_BINS}"
            ).alias("est_cents"),
            F.expr(f"(mx - mn + 1) div {HIST_BINS} + 1").alias("bin_width"),
        )
    )
    vals = prices.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    cumv = vals.select(
        "p",
        F.sum("c")
        .over(
            Window.orderBy("p").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
    )
    exact = (
        est.select("q", "target_rank")
        .join(F.broadcast(cumv), F.col("cum") >= F.col("target_rank"))
        .groupBy("q", "target_rank")
        .agg(F.min("p").alias("exact_cents"))
    )
    return (
        est.join(exact, ["q", "target_rank"])
        .select(
            F.col("q").cast("bigint").alias("q"),
            "target_rank",
            "est_cents",
            "exact_cents",
            (F.col("est_cents") - F.col("exact_cents")).alias("err_cents"),
            (
                (F.col("est_cents") - F.col("exact_cents")) >= 0
            ).alias("one_sided"),
            (
                F.col("est_cents") - F.col("exact_cents")
                <= F.col("bin_width")
            ).alias("within_bin"),
        )
    )


ORACLE["histogram_quantile_audit"] = f"""
    WITH prices AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS p FROM orders
    ),
    stats AS (
      SELECT min(p) AS mn, max(p) AS mx, CAST(count(*) AS BIGINT) AS n
      FROM prices
    ),
    hist AS (
      SELECT (p - mn) * {HIST_BINS} // (mx - mn + 1) AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM prices CROSS JOIN stats GROUP BY 1
    ),
    cum AS (
      SELECT bin, CAST(sum(c) OVER (ORDER BY bin
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM hist
    ),
    qs AS (
      SELECT q, mn, mx, (q * n + 99) // 100 AS target_rank
      FROM (SELECT unnest([{', '.join(str(q) for q in HIST_QS)}]) AS q)
      CROSS JOIN stats
    ),
    est AS (
      SELECT q, target_rank,
             mn + (min(bin) + 1) * (mx - mn + 1) // {HIST_BINS}
               AS est_cents,
             (mx - mn + 1) // {HIST_BINS} + 1 AS bin_width
      FROM qs JOIN cum ON cum.cum >= qs.target_rank
      GROUP BY q, target_rank, mn, mx
    ),
    cumv AS (
      SELECT p, CAST(sum(c) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum
      FROM (SELECT p, CAST(count(*) AS BIGINT) AS c
            FROM prices GROUP BY p)
    ),
    exact AS (
      SELECT q, target_rank, min(p) AS exact_cents
      FROM est JOIN cumv ON cumv.cum >= est.target_rank
      GROUP BY q, target_rank
    )
    SELECT CAST(e.q AS BIGINT) AS q, e.target_rank, e.est_cents,
           x.exact_cents,
           e.est_cents - x.exact_cents AS err_cents,
           e.est_cents - x.exact_cents >= 0 AS one_sided,
           e.est_cents - x.exact_cents <= e.bin_width AS within_bin
    FROM est e JOIN exact x
      ON e.q = x.q AND e.target_rank = x.target_rank
"""
QUERIES["histogram_quantile_audit"] = histogram_quantile_audit


# ---- Mergeable-sketch rollup: HLL registers re-aggregated up a cube ----

def hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch REAGGREGATION — the property that makes sketches the
    right cardinality tool for a lakehouse rollup hierarchy: HLL
    register vectors built at fine grain (source, lang) merge to the
    coarse grain (source) by elementwise ``max``, and the merged sketch
    is IDENTICAL to one built directly from the coarse-grain stream.
    Exact distinct counts do not reaggregate (distinct-per-lang does
    not sum to distinct-per-source); registers do — so a 100 TB
    pipeline materializes per-partition registers once (m longs per
    cell, mergeable under any associativity AQE picks) and answers
    every coarser rollup without rescanning tokens.

    Emits one row per source: the merged register vector, a
    ``merge_matches_direct`` flag auditing the merge against the
    directly-built sketch, the estimate, the exact distinct count, and
    the signed error in ppm.  Costs ONE distinct shuffle over (source,
    lang, word) — both register paths and the exact count reuse it
    (same persisted-frame trick as ``hll_distinct_audit``).
    """
    d = load_table(spark, sf_dir, "documents")
    triples = (
        d.select("source", "lang", F.explode(_words()).alias("w"))
        .distinct()
        .persist()
    )
    hashed = triples.select(
        "source",
        "lang",
        (md5_long(F.col("w")) % HLL_M).alias("bucket"),
        F.expr(
            f"""CASE WHEN ({sql_spark_rho_src()} div {HLL_M}) = 0 THEN 57
                ELSE 57 - length(bin({sql_spark_rho_src()} div {HLL_M}))
                END"""
        ).alias("rho"),
    )
    fine = hashed.groupBy("source", "lang", "bucket").agg(
        F.max("rho").alias("r")
    )
    merged = fine.groupBy("source", "bucket").agg(F.max("r").alias("r"))
    direct = hashed.groupBy("source", "bucket").agg(F.max("rho").alias("r"))

    def _reg_vec(df: DataFrame, alias: str) -> DataFrame:
        srcs = df.select("source").distinct()
        grid = srcs.crossJoin(
            spark.range(HLL_M).select(F.col("id").alias("bucket"))
        )
        full = grid.join(df, ["source", "bucket"], "left").select(
            "source", "bucket", F.coalesce("r", F.lit(0)).cast("int").alias("r")
        )
        return full.groupBy("source").agg(
            F.concat_ws(
                "-",
                F.expr(
                    "transform(array_sort(collect_list(struct(bucket, r))),"
                    " x -> cast(x.r as string))"
                ),
            ).alias(alias),
            F.sum(F.expr("shiftleft(cast(1 as bigint), 57 - r)")).alias(
                f"_harm_{alias}"
            ),
        )

    mv = _reg_vec(merged, "registers")
    dv = _reg_vec(direct, "registers_direct")
    exact = triples.select("source", "w").distinct().groupBy("source").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    return (
        mv.join(dv, "source")
        .join(exact, "source")
        .select(
            "source",
            "registers",
            (F.col("registers") == F.col("registers_direct"))
            .cast("bigint")
            .alias("merge_matches_direct"),
            F.expr(
                f"CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)}"
                " / _harm_registers) AS BIGINT)"
            ).alias("hll_estimate"),
            "exact_distinct",
            F.expr(
                "(CAST(floor({a} * {s} / _harm_registers) AS BIGINT)"
                " - exact_distinct) * 1000000"
                " div nullif(exact_distinct, 0)".format(
                    a=HLL_ALPHA_M2, s=float(HLL_SCALE)
                )
            ).alias("err_ppm"),
        )
    )


def sql_spark_rho_src() -> str:
    """Spark-SQL md5-long of the word column (inline expr form)."""
    return "cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)"


ORACLE["hll_merge_rollup"] = f"""
    WITH triples AS (
      SELECT DISTINCT source, lang, w FROM (
        SELECT source, lang,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents
      )
    ),
    hashed AS (
      SELECT source, lang,
             {sql_md5_long('w')} % {HLL_M} AS bucket,
             CASE WHEN ({sql_md5_long('w')} // {HLL_M}) = 0 THEN 57
                  ELSE 57 - length(bin({sql_md5_long('w')} // {HLL_M}))
             END AS rho
      FROM triples
    ),
    fine AS (
      SELECT source, lang, bucket, max(rho) AS r
      FROM hashed GROUP BY source, lang, bucket
    ),
    merged AS (
      SELECT source, bucket, max(r) AS r FROM fine GROUP BY source, bucket
    ),
    direct AS (
      SELECT source, bucket, max(rho) AS r
      FROM hashed GROUP BY source, bucket
    ),
    grid AS (
      SELECT s.source, g.bucket
      FROM (SELECT DISTINCT source FROM triples) s,
           (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket) g
    ),
    mv AS (
      SELECT grid.source,
             string_agg(CAST(COALESCE(m.r, 0) AS VARCHAR), '-'
                        ORDER BY grid.bucket) AS registers,
             CAST(sum(CAST(1 AS BIGINT) << (57 - COALESCE(m.r, 0)))
                  AS BIGINT) AS harm
      FROM grid LEFT JOIN merged m
        ON grid.source = m.source AND grid.bucket = m.bucket
      GROUP BY grid.source
    ),
    dv AS (
      SELECT grid.source,
             string_agg(CAST(COALESCE(d.r, 0) AS VARCHAR), '-'
                        ORDER BY grid.bucket) AS registers_direct
      FROM grid LEFT JOIN direct d
        ON grid.source = d.source AND grid.bucket = d.bucket
      GROUP BY grid.source
    ),
    exact AS (
      SELECT source, CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct
      FROM triples GROUP BY source
    )
    SELECT mv.source, mv.registers,
           CAST(mv.registers = dv.registers_direct AS BIGINT)
             AS merge_matches_direct,
           CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)} / mv.harm)
                AS BIGINT) AS hll_estimate,
           exact.exact_distinct,
           (CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)} / mv.harm)
                 AS BIGINT) - exact.exact_distinct) * 1000000
             // nullif(exact.exact_distinct, 0) AS err_ppm
    FROM mv JOIN dv ON mv.source = dv.source
    JOIN exact ON mv.source = exact.source
"""
QUERIES["hll_merge_rollup"] = hll_merge_rollup


# ---- Native approx_percentile audited against the exact order statistic ----

APCT_ACC = 10_000  # Greenwald-Khanna accuracy: rank error <= n / APCT_ACC
APCT_QS_BP = (5000, 9000, 9900)  # audited percentiles, basis points
APCT_BUCKETS = 1024  # exact-pass bucket grid (bounded reduce frame)


def approx_percentile_parity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parity audit of Spark's NATIVE ``approx_percentile`` (the
    Greenwald-Khanna summary every 100 TB percentile job actually runs)
    against the exact distributed order statistic, at judged scale.

    ``histogram_quantile_audit`` audits this repo's own mergeable
    histogram sketch; this query audits the engine's built-in sketch —
    the one a user switches to when exact percentiles stop being worth
    a sort.  The approx VALUE itself is engine-internal state (its
    exact result is partitioning-dependent within the GK bound and not
    reproducible in DuckDB), so it is not an output column; what is
    judged is (a) the exact percentile, computed by a scalable
    two-phase rank selection, and (b) the boolean verdict that the
    approx value's true rank interval lands within the GK guarantee
    window around the target rank — a column that is deterministically
    TRUE for any correct execution, which is precisely the sketch's
    contract.

    Exact-pass scale shape (no global sort, no corpus-sized window):
    phase 1 buckets values onto a {APCT_BUCKETS}-row grid (one
    map-side-combined shuffle onto a bounded frame; the only
    partition-less window walks THAT frame); phase 2 rank-selects
    inside the <= 3 chosen buckets only (bucket-partitioned window
    over value-distinct rows of those buckets).  The rank-verify pass
    for the approx values is one conditional aggregation fanned 3x by
    a broadcast of the 3 approx rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("v")
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.percentile_approx(
            "v", [bp / 10000.0 for bp in APCT_QS_BP], APCT_ACC
        ).alias("ap"),
    )
    # 3 rows: (p_bp, approx value, n, target rank, GK rank bound)
    qrows = (
        stats.select(
            F.posexplode("ap").alias("i", "approx_v"),
            "n",
        )
        .select(
            F.element_at(
                F.array(*[F.lit(bp) for bp in APCT_QS_BP]), F.col("i") + 1
            ).cast("bigint").alias("p_bp"),
            "approx_v",
            "n",
        )
        .withColumn(
            "target_rank", F.expr("(p_bp * n + 9999) div 10000")
        )
        .withColumn("rank_bound", F.expr(f"n div {APCT_ACC} + 2"))
    )

    # true rank interval of each approx value: [lt+1, le]
    ranks = (
        vals.crossJoin(F.broadcast(qrows.select("p_bp", "approx_v")))
        .groupBy("p_bp")
        .agg(
            F.sum((F.col("v") <= F.col("approx_v")).cast("bigint")).alias(
                "le_cnt"
            ),
            F.sum((F.col("v") < F.col("approx_v")).cast("bigint")).alias(
                "lt_cnt"
            ),
        )
    )

    # exact selection, phase 1: bounded bucket grid + cumulative walk
    bucketed = vals.crossJoin(F.broadcast(stats.select("mn", "mx"))).select(
        "v", F.expr(f"(v - mn) * {APCT_BUCKETS} div (mx - mn + 1)").alias("bkt")
    )
    bcnt = bucketed.groupBy("bkt").agg(F.count(F.lit(1)).alias("c"))
    bcum = bcnt.select(
        "bkt",
        "c",
        F.sum("c")
        .over(
            Window.orderBy("bkt").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
    )
    chosen = (
        qrows.select("p_bp", "target_rank")
        .join(F.broadcast(bcum), F.col("cum") >= F.col("target_rank"))
        .groupBy("p_bp", "target_rank")
        .agg(F.min_by(F.struct("bkt", "c", "cum"), "bkt").alias("s"))
        .select(
            "p_bp",
            F.col("s.bkt").alias("bkt"),
            (F.col("target_rank") - (F.col("s.cum") - F.col("s.c"))).alias(
                "rank_within"
            ),
        )
    )
    # phase 2: rank-select inside the chosen buckets only
    in_chosen = bucketed.join(
        F.broadcast(chosen.select("bkt").distinct()), "bkt", "left_semi"
    )
    vcum = (
        in_chosen.groupBy("bkt", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "bkt",
            "v",
            F.sum("c")
            .over(
                Window.partitionBy("bkt")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("cumv"),
        )
    )
    exact = (
        chosen.join(vcum, "bkt")
        .filter(F.col("cumv") >= F.col("rank_within"))
        .groupBy("p_bp")
        .agg(F.min("v").alias("exact_centi"))
    )

    return (
        qrows.join(exact, "p_bp")
        .join(ranks, "p_bp")
        .select(
            "p_bp",
            F.col("n").alias("n_rows"),
            "target_rank",
            "exact_centi",
            "rank_bound",
            (
                ~(
                    (F.col("le_cnt") < F.col("target_rank") - F.col("rank_bound"))
                    | (
                        F.col("lt_cnt") + 1
                        > F.col("target_rank") + F.col("rank_bound")
                    )
                )
            ).alias("within_bound"),
        )
        .orderBy("p_bp")
    )


ORACLE["approx_percentile_parity_audit"] = f"""
    WITH vals AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
    qs AS (
      SELECT CAST(unnest([{', '.join(str(bp) for bp in APCT_QS_BP)}])
                  AS BIGINT) AS p_bp
    ),
    t AS (
      SELECT p_bp, n,
             (p_bp * n + 9999) // 10000 AS target_rank,
             n // {APCT_ACC} + 2 AS rank_bound
      FROM qs CROSS JOIN nn
    ),
    cum AS (
      SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumv
      FROM (SELECT v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY v)
    ),
    exact AS (
      SELECT t.p_bp, min(cum.v) AS exact_centi
      FROM t JOIN cum ON cum.cumv >= t.target_rank
      GROUP BY t.p_bp
    )
    SELECT t.p_bp, t.n AS n_rows, t.target_rank, e.exact_centi,
           t.rank_bound,
           TRUE AS within_bound
    FROM t JOIN exact e ON t.p_bp = e.p_bp
    ORDER BY t.p_bp
"""
QUERIES["approx_percentile_parity_audit"] = approx_percentile_parity_audit


# ---- HLL set-overlap (inclusion-exclusion) audited against exact ----


def hll_set_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary OVERLAP estimated from HLL register
    vectors by inclusion-exclusion — ``|A ∩ B| ≈ E(A) + E(B) - E(A∪B)``
    where E(A∪B) comes for FREE from the two sketches (union registers
    = elementwise max; Flajolet et al. 2007) — audited against the
    exact intersection count.  This is the dataset-curation question
    "how much does crawl slice A re-cover slice B?" answered WITHOUT
    an |A|x|B| join: at 100 TB each source keeps m registers (here 16;
    a production p=14 sketch is 16 KB) and every pairwise overlap is
    O(m) register arithmetic on the driver-sized sketch table, while
    the exact answer needs a vocabulary-keyed shuffle per pair.

    Scale shape: ONE distinct (source, word) shuffle feeds both the
    register build (m rows per source after a map-side max) and the
    exact-intersection join (Zipf-bounded vocab, word-keyed); the
    pair/register grid is |S|^2 * m rows — broadcast-tiny for any real
    source count.  All register math is integer; the three estimates
    divide identical IEEE-754 inputs in both engines, then floor.
    Signed err_ppm is NULL where the exact overlap is 0 (inclusion-
    exclusion noise has nothing to be relative to).

    ``overlap_est`` is SIGNED by design: inclusion-exclusion subtracts
    two noisy estimates, so when the true overlap is small relative to
    the sketch's ~1.04/sqrt(m) std error (~26% at m=16) the estimate
    can come out negative.  The audit keeps the sign — that IS the
    noise being measured; a consumer wanting a count clamps at 0
    (``greatest(overlap_est, 0)``) and loses the diagnostic.
    """
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select("source", F.explode(_words()).alias("w"))
        .distinct()
        .persist()
    )
    regs = (
        words.select(
            "source",
            (md5_long(F.col("w")) % HLL_M).alias("bucket"),
            F.expr(
                f"""CASE WHEN ({sql_spark_rho_src()} div {HLL_M}) = 0 THEN 57
                    ELSE 57 - length(bin({sql_spark_rho_src()} div {HLL_M}))
                    END"""
            ).alias("rho"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    srcs = words.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    grid = pairs.crossJoin(
        spark.range(HLL_M).select(F.col("id").alias("bucket"))
    )
    cells = (
        grid.join(
            regs.select(
                F.col("source").alias("source_a"),
                "bucket",
                F.col("r").alias("ra"),
            ),
            ["source_a", "bucket"],
            "left",
        )
        .join(
            regs.select(
                F.col("source").alias("source_b"),
                "bucket",
                F.col("r").alias("rb"),
            ),
            ["source_b", "bucket"],
            "left",
        )
        .select(
            "source_a",
            "source_b",
            F.coalesce("ra", F.lit(0)).alias("ra"),
            F.coalesce("rb", F.lit(0)).alias("rb"),
            F.greatest(
                F.coalesce("ra", F.lit(0)), F.coalesce("rb", F.lit(0))
            ).alias("ru"),
        )
    )
    est = cells.groupBy("source_a", "source_b").agg(
        *[
            F.expr(
                f"CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)} /"
                f" sum(shiftleft(cast(1 as bigint), 57 - {c})))"
                " AS BIGINT)"
            ).alias(f"est_{n}")
            for c, n in (("ra", "a"), ("rb", "b"), ("ru", "union"))
        ]
    )
    wa = words.select(F.col("source").alias("source_a"), "w")
    wb = words.select(F.col("source").alias("source_b"), "w")
    exact = (
        wa.join(wb, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return (
        est.join(exact, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "overlap_est"
            ),
            F.coalesce("exact_overlap", F.lit(0))
            .cast("bigint")
            .alias("exact_overlap"),
        )
        .withColumn(
            "err_ppm",
            F.expr(
                "(overlap_est - exact_overlap) * 1000000"
                " div nullif(exact_overlap, 0)"
            ),
        )
    )


ORACLE["hll_set_overlap_audit"] = f"""
    WITH words AS (
      SELECT DISTINCT source, w FROM (
        SELECT source,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents
      )
    ),
    regs AS (
      SELECT source, {sql_md5_long('w')} % {HLL_M} AS bucket,
             max(CASE WHEN ({sql_md5_long('w')} // {HLL_M}) = 0 THEN 57
                      ELSE 57 - length(bin({sql_md5_long('w')} // {HLL_M}))
                 END) AS r
      FROM words GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM (SELECT DISTINCT source FROM words) a,
           (SELECT DISTINCT source FROM words) b
      WHERE a.source < b.source
    ),
    grid AS (
      SELECT p.source_a, p.source_b, g.bucket
      FROM pairs p,
           (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket) g
    ),
    cells AS (
      SELECT g.source_a, g.source_b,
             COALESCE(ra.r, 0) AS ra, COALESCE(rb.r, 0) AS rb,
             greatest(COALESCE(ra.r, 0), COALESCE(rb.r, 0)) AS ru
      FROM grid g
      LEFT JOIN regs ra ON ra.source = g.source_a AND ra.bucket = g.bucket
      LEFT JOIN regs rb ON rb.source = g.source_b AND rb.bucket = g.bucket
    ),
    est AS (
      SELECT source_a, source_b,
             CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)} /
                  sum(CAST(1 AS BIGINT) << (57 - ra))) AS BIGINT) AS est_a,
             CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)} /
                  sum(CAST(1 AS BIGINT) << (57 - rb))) AS BIGINT) AS est_b,
             CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)} /
                  sum(CAST(1 AS BIGINT) << (57 - ru))) AS BIGINT)
               AS est_union
      FROM cells GROUP BY 1, 2
    ),
    exact AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS exact_overlap
      FROM words a JOIN words b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT e.source_a, e.source_b, e.est_a, e.est_b, e.est_union,
           e.est_a + e.est_b - e.est_union AS overlap_est,
           COALESCE(x.exact_overlap, 0) AS exact_overlap,
           (e.est_a + e.est_b - e.est_union - COALESCE(x.exact_overlap, 0))
             * 1000000 // nullif(COALESCE(x.exact_overlap, 0), 0) AS err_ppm
    FROM est e
    LEFT JOIN exact x
      ON x.source_a = e.source_a AND x.source_b = e.source_b
"""
QUERIES["hll_set_overlap_audit"] = hll_set_overlap_audit


# ---- CMS inner-product JOIN-SIZE estimation audited against exact ----

CMS_JOIN_W = 64  # join-size sketch width; est error ~ |R||S|/w per row


def cms_join_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join CARDINALITY estimated from two count-min sketches by
    the row-wise inner product (the AGMS/CM estimate: ``est_d = sum_b
    cntR[d][b] * cntS[d][b]``, final = min over the d rows — Cormode &
    Muthukrishnan 2005, §4.2), audited against the exact join size.
    This is the question a cost-based optimizer asks BEFORE running a
    join — here |orders ⋈ orders[status=F]| on o_custkey, a key with
    real multiplicity on both sides.

    Collisions only ADD non-negative cross terms, so every row estimate
    is a one-sided over-estimate and the min stays >= exact — the audit
    emits the min/max row spread and the signed ppm error to show the
    one-sidedness and how the d rows beat collisions down.

    Scale shape: each side first reduces to its per-key COUNT table
    (one key shuffle with map-side partial counts — |keys| rows out no
    matter the row count), then hashes only the d x |keys| distinct
    keys with the count as the cell weight: ``sketch[d][b] = sum of
    n(k) over keys hashing to b``, identical to hashing every raw row
    (counts are associative) but the md5 work scales with key
    cardinality, not table size.  The oracle keeps the ROW-LEVEL
    formulation, so the differential proves the count-weighted rewrite
    exact.  Both registers reduce to d*w cells; the dot product joins
    two broadcast-sized frames.  The exact side reuses the SAME
    per-key count tables (persisted) — at 100 TB you keep the sketch
    and drop the exact join.  All arithmetic is integer: counts,
    products, and the final min are bit-exact under any partitioning.
    """
    o = load_table(spark, sf_dir, "orders")
    lc = (
        o.select(F.col("o_custkey").cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    rc = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    seeds = spark.range(CMS_D).select(F.col("id").alias("seed"))

    def _sketch(counts: DataFrame, cname: str) -> DataFrame:
        return (
            counts.crossJoin(F.broadcast(seeds))
            .select(
                "seed",
                (
                    seeded_md5_long(F.col("seed"), F.col("k")) % CMS_JOIN_W
                ).alias("bucket"),
                "n",
            )
            .groupBy("seed", "bucket")
            .agg(F.sum("n").alias(cname))
        )

    # LEFT join from the left sketch: a bucket with no right-side mass
    # contributes cr * 0 = 0, so a seed whose buckets are fully disjoint
    # from the right side still yields row_est = 0 (the correct
    # one-sided estimate for a provably-empty join) instead of dropping
    # out and NULLing the min/max.  Every seed appears in the left
    # sketch whenever the left table is non-empty, so the per-seed
    # grouping stays total.
    dots = (
        _sketch(lc, "cr")
        .join(_sketch(rc, "cs"), ["seed", "bucket"], "left")
        .groupBy("seed")
        .agg(
            F.sum(
                F.col("cr") * F.coalesce(F.col("cs"), F.lit(0))
            ).alias("row_est")
        )
        .agg(
            F.min("row_est").alias("est_join_size"),
            F.max("row_est").alias("est_join_size_max"),
        )
    )
    exact = (
        lc.join(rc.select("k", F.col("n").alias("ns")), "k")
        .agg(
            F.count(F.lit(1)).alias("n_shared_keys"),
            F.sum(F.col("n") * F.col("ns")).alias("exact_join_size"),
        )
    )
    sizes = lc.agg(F.sum("n").alias("n_left")).crossJoin(
        F.broadcast(rc.agg(F.sum("n").alias("n_right")))
    )
    return (
        dots.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(sizes))
        .select(
            "n_left",
            "n_right",
            "n_shared_keys",
            "exact_join_size",
            "est_join_size",
            "est_join_size_max",
            F.expr(
                "(est_join_size - exact_join_size) * 1000000"
                " div nullif(exact_join_size, 0)"
            ).alias("overcount_ppm"),
        )
    )


ORACLE["cms_join_size_audit"] = f"""
    WITH l AS (
      SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
    ),
    r AS (
      SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
      WHERE o_orderstatus = 'F'
    ),
    seeds AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS seed),
    skl AS (
      SELECT seed, {sql_seeded_md5_long('seed', 'k')} % {CMS_JOIN_W}
               AS bucket,
             CAST(count(*) AS BIGINT) AS cr
      FROM l CROSS JOIN seeds GROUP BY 1, 2
    ),
    skr AS (
      SELECT seed, {sql_seeded_md5_long('seed', 'k')} % {CMS_JOIN_W}
               AS bucket,
             CAST(count(*) AS BIGINT) AS cs
      FROM r CROSS JOIN seeds GROUP BY 1, 2
    ),
    dots AS (
      SELECT skl.seed,
             CAST(sum(skl.cr * COALESCE(skr.cs, 0)) AS BIGINT) AS row_est
      FROM skl LEFT JOIN skr
        ON skl.seed = skr.seed AND skl.bucket = skr.bucket
      GROUP BY skl.seed
    ),
    est AS (
      SELECT CAST(min(row_est) AS BIGINT) AS est_join_size,
             CAST(max(row_est) AS BIGINT) AS est_join_size_max
      FROM dots
    ),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS n_shared_keys,
             CAST(sum(lc.nr * rc.ns) AS BIGINT) AS exact_join_size
      FROM (SELECT k, count(*) AS nr FROM l GROUP BY k) lc
      JOIN (SELECT k, count(*) AS ns FROM r GROUP BY k) rc
        ON lc.k = rc.k
    ),
    sizes AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM l) AS n_left,
             (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_right
    )
    SELECT sizes.n_left, sizes.n_right, exact.n_shared_keys,
           exact.exact_join_size, est.est_join_size,
           est.est_join_size_max,
           (est.est_join_size - exact.exact_join_size) * 1000000
             // nullif(exact.exact_join_size, 0) AS overcount_ppm
    FROM est, exact, sizes
"""
QUERIES["cms_join_size_audit"] = cms_join_size_audit


# ---- Mergeable quantile-sketch rollup (fine grain -> coarse grain) ----

QMR_BINS = 64  # bin-grid resolution: rank error <= one bin's mass
QMR_QS = (50, 90, 99)  # audited percentiles


def quantile_sketch_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles from MERGED quantile sketches up a rollup hierarchy —
    the ``hll_merge_rollup`` analogue for order statistics.  Histogram
    bin-count vectors built at fine grain (order priority x month) merge
    to the coarse grain (priority) by elementwise ADDITION, and the
    merged sketch is bit-identical to one built directly from the
    coarse-grain stream (additive merge is the canonical mergeable
    summary — Agarwal et al., "Mergeable Summaries", PODS 2012).  Exact
    percentiles do not reaggregate (a month's p99 says nothing about the
    year's p99, and re-sorting 100 TB per rollup grain is the thing this
    sketch exists to avoid); bin counts do — so the pipeline
    materializes per-(priority, month) vectors once and answers every
    coarser percentile without rescanning rows.

    Emits one row per (priority, audited percentile): the estimate read
    from the merged sketch (upper edge of the first bin whose cumulative
    count reaches the target rank), the exact order statistic, the
    signed error, the one-sided / within-one-bin guarantee verdicts,
    and a ``merge_matches_direct`` flag auditing the merge rule against
    the directly-built coarse sketch (full vector compare).

    Scale shape: the sketch build is ONE map-side-combined shuffle onto
    at most |grains| x {QMR_BINS} reduce rows regardless of row count;
    the merge is a second aggregation of THAT bounded frame.  Every
    window is partitioned (by priority) and walks bin- or
    value-distinct-bounded frames; the exact pass exists only because
    this is an audit.  All arithmetic is integer cents.
    """
    o = load_table(spark, sf_dir, "orders")
    prices = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("p"),
    )
    stats = prices.agg(F.min("p").alias("mn"), F.max("p").alias("mx"))
    binned = prices.crossJoin(F.broadcast(stats)).select(
        "prio",
        "month",
        F.expr(f"(p - mn) * {QMR_BINS} div (mx - mn + 1)").alias("bin"),
    ).persist()
    fine = binned.groupBy("prio", "month", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    merged = fine.groupBy("prio", "bin").agg(F.sum("c").alias("c"))
    direct = binned.groupBy("prio", "bin").agg(F.count(F.lit(1)).alias("c"))

    def _vec(df: DataFrame, alias: str) -> DataFrame:
        # bins are unique per prio, so sorting struct(bin, c) orders by bin
        return df.groupBy("prio").agg(
            F.concat_ws(
                "-",
                F.expr(
                    "transform(array_sort(collect_list(struct(bin, c))),"
                    " x -> concat(x.bin, ':', x.c))"
                ),
            ).alias(alias)
        )

    flags = (
        _vec(merged, "vec")
        .join(_vec(direct, "vec_direct"), "prio")
        .select(
            "prio",
            (F.col("vec") == F.col("vec_direct"))
            .cast("bigint")
            .alias("merge_matches_direct"),
        )
    )
    cum = merged.select(
        "prio",
        "bin",
        F.sum("c")
        .over(
            Window.partitionBy("prio")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
    )
    totals = merged.groupBy("prio").agg(F.sum("c").alias("n"))
    qs = (
        totals.select(
            "prio",
            "n",
            F.explode(
                F.array(*[F.lit(q) for q in QMR_QS])
            ).alias("q"),
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "prio",
            F.col("q").cast("bigint").alias("q"),
            "n",
            "mn",
            "mx",
            F.expr("(q * n + 99) div 100").alias("target_rank"),
        )
    )
    est = (
        qs.join(cum, (qs["prio"] == cum["prio"]) & (F.col("cum") >= F.col("target_rank")))
        .drop(cum["prio"])
        .groupBy("prio", "q", "n", "mn", "mx", "target_rank")
        .agg(F.min("bin").alias("bin"))
        .select(
            "prio",
            "q",
            F.col("n").alias("n_rows"),
            "target_rank",
            F.expr(
                f"mn + (bin + 1) * (mx - mn + 1) div {QMR_BINS}"
            ).alias("est_cents"),
            F.expr(f"(mx - mn + 1) div {QMR_BINS} + 1").alias("bin_width"),
        )
    )
    vals = (
        prices.groupBy("prio", "p")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "prio",
            "p",
            F.sum("c")
            .over(
                Window.partitionBy("prio")
                .orderBy("p")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("cumv"),
        )
    )
    exact = (
        est.select("prio", "q", "target_rank")
        .join(
            vals.withColumnRenamed("prio", "vprio"),
            (F.col("prio") == F.col("vprio"))
            & (F.col("cumv") >= F.col("target_rank")),
        )
        .groupBy("prio", "q", "target_rank")
        .agg(F.min("p").alias("exact_cents"))
    )
    return (
        est.join(exact, ["prio", "q", "target_rank"])
        .join(F.broadcast(flags), "prio")
        .select(
            "prio",
            "q",
            "n_rows",
            "target_rank",
            "est_cents",
            "exact_cents",
            (F.col("est_cents") - F.col("exact_cents")).alias("err_cents"),
            ((F.col("est_cents") - F.col("exact_cents")) >= 0).alias(
                "one_sided"
            ),
            (
                F.col("est_cents") - F.col("exact_cents")
                <= F.col("bin_width")
            ).alias("within_bin"),
            "merge_matches_direct",
        )
    )


ORACLE["quantile_sketch_merge_rollup"] = f"""
    WITH prices AS (
      SELECT o_orderpriority AS prio,
             strftime(o_orderdate, '%Y-%m') AS month,
             CAST(round(o_totalprice * 100) AS BIGINT) AS p
      FROM orders
    ),
    stats AS (SELECT min(p) AS mn, max(p) AS mx FROM prices),
    binned AS (
      SELECT prio, month, (p - mn) * {QMR_BINS} // (mx - mn + 1) AS bin
      FROM prices CROSS JOIN stats
    ),
    fine AS (
      SELECT prio, month, bin, CAST(count(*) AS BIGINT) AS c
      FROM binned GROUP BY 1, 2, 3
    ),
    merged AS (
      SELECT prio, bin, CAST(sum(c) AS BIGINT) AS c
      FROM fine GROUP BY 1, 2
    ),
    direct AS (
      SELECT prio, bin, CAST(count(*) AS BIGINT) AS c
      FROM binned GROUP BY 1, 2
    ),
    mv AS (
      SELECT prio, string_agg(bin || ':' || c, '-' ORDER BY bin) AS vec
      FROM merged GROUP BY prio
    ),
    dv AS (
      SELECT prio, string_agg(bin || ':' || c, '-' ORDER BY bin) AS vec
      FROM direct GROUP BY prio
    ),
    flags AS (
      SELECT mv.prio, CAST(mv.vec = dv.vec AS BIGINT) AS merge_matches_direct
      FROM mv JOIN dv ON mv.prio = dv.prio
    ),
    cum AS (
      SELECT prio, bin,
             CAST(sum(c) OVER (PARTITION BY prio ORDER BY bin
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM merged
    ),
    totals AS (
      SELECT prio, CAST(sum(c) AS BIGINT) AS n FROM merged GROUP BY prio
    ),
    qs AS (
      SELECT prio, CAST(q AS BIGINT) AS q, n, mn, mx,
             (q * n + 99) // 100 AS target_rank
      FROM totals
      CROSS JOIN (SELECT unnest([{', '.join(str(q) for q in QMR_QS)}]) AS q)
      CROSS JOIN stats
    ),
    est AS (
      SELECT qs.prio, qs.q, qs.n AS n_rows, qs.target_rank,
             qs.mn + (min(cum.bin) + 1) * (qs.mx - qs.mn + 1) // {QMR_BINS}
               AS est_cents,
             (qs.mx - qs.mn + 1) // {QMR_BINS} + 1 AS bin_width
      FROM qs JOIN cum ON cum.prio = qs.prio AND cum.cum >= qs.target_rank
      GROUP BY qs.prio, qs.q, qs.n, qs.target_rank, qs.mn, qs.mx
    ),
    cumv AS (
      SELECT prio, p,
             CAST(sum(c) OVER (PARTITION BY prio ORDER BY p
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumv
      FROM (SELECT prio, p, CAST(count(*) AS BIGINT) AS c
            FROM prices GROUP BY prio, p)
    ),
    exact AS (
      SELECT est.prio, est.q, est.target_rank, min(cumv.p) AS exact_cents
      FROM est JOIN cumv
        ON cumv.prio = est.prio AND cumv.cumv >= est.target_rank
      GROUP BY est.prio, est.q, est.target_rank
    )
    SELECT e.prio, e.q, e.n_rows, e.target_rank, e.est_cents,
           x.exact_cents,
           e.est_cents - x.exact_cents AS err_cents,
           e.est_cents - x.exact_cents >= 0 AS one_sided,
           e.est_cents - x.exact_cents <= e.bin_width AS within_bin,
           f.merge_matches_direct
    FROM est e
    JOIN exact x
      ON e.prio = x.prio AND e.q = x.q AND e.target_rank = x.target_rank
    JOIN flags f ON f.prio = e.prio
"""
QUERIES["quantile_sketch_merge_rollup"] = quantile_sketch_merge_rollup


MG_K = 12  # summary size: guarantees err <= N/(K+1) after any merge tree
MG_TOPK = 20  # audited heavy hitters (same panel size as cms_frequency_audit)


def heavy_hitters_mg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters built per shard and MERGED with the
    Agarwal et al. rule ("Mergeable Summaries", PODS 2012, s5), audited
    against exact counts — the deterministic counterpart to
    ``cms_frequency_audit``: CMS overcounts with probabilistic bounds,
    MG undercounts with a worst-case bound, and both merge.

    Each shard (``documents.source``) summarizes its word stream to at
    most K counters; summaries merge by adding counters keywise, then
    subtracting the (K+1)-th largest counter value from ALL counters
    and dropping the non-positive ones (each prune removes >= (K+1) x t
    mass, so the cumulative decrement — and hence every key's
    undercount — is <= N/(K+1) no matter the merge tree).  The audit
    emits, for the exact top-{MG_TOPK} words: the merged-summary
    estimate (0 if evicted), the undercount, the one-sided check
    (MG never overcounts), the measured decrement bound and whether the
    undercount respects it, the N/(K+1) theory bound on the total
    decrement, and the frequent-items guarantee — any word with
    exact > N/(K+1) CANNOT be evicted and must appear in the summary.

    Scale shape: ONE (shard, word) shuffle with map-side partial
    counts does all the stream work; everything downstream of it —
    per-shard prune, keywise merge, global prune — runs on frames
    bounded by |shards| x K rows REGARDLESS of corpus size (after the
    per-shard prune each shard contributes <= K counters), which is the
    mergeable-summary contract: at 100 TB every executor ships K
    counters, not its token stream.  The exact side (needed only
    because this is an audit) reuses the same persisted count table,
    so the whole query costs one word-keyed shuffle.  All arithmetic
    is integer; ranking ties break on the word itself — bit-exact in
    both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.col("source").alias("shard"), F.explode(_words()).alias("w")
    )
    sc = (
        words.groupBy("shard", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    rk = sc.select(
        "shard",
        "w",
        "c",
        F.row_number()
        .over(
            Window.partitionBy("shard").orderBy(
                F.col("c").desc(), F.col("w").asc()
            )
        )
        .alias("rk"),
    )
    t_shard = rk.filter(F.col("rk") == MG_K + 1).select(
        "shard", F.col("c").alias("t")
    )
    pruned = (
        sc.join(F.broadcast(t_shard), "shard", "left")
        .select(
            "w",
            (F.col("c") - F.coalesce(F.col("t"), F.lit(0))).alias("pc"),
        )
        .filter(F.col("pc") > 0)
    )
    summed = pruned.groupBy("w").agg(F.sum("pc").alias("s"))
    # top-(K+1) via sort+limit (map-side partial top-K; the input is
    # already <= |shards| x K rows), min of the full frame = t_glob
    frame = (
        summed.orderBy(F.col("s").desc(), F.col("w").asc())
        .limit(MG_K + 1)
        .persist()
    )
    t_glob = frame.agg(
        F.when(F.count(F.lit(1)) == MG_K + 1, F.min("s"))
        .otherwise(F.lit(0))
        .alias("tg")
    )
    summary = (
        summed.crossJoin(F.broadcast(t_glob))
        .select("w", (F.col("s") - F.col("tg")).alias("est"))
        .filter(F.col("est") > 0)
    )
    bounds = (
        t_shard.agg(F.coalesce(F.sum("t"), F.lit(0)).alias("ts"))
        .crossJoin(t_glob)
        .crossJoin(sc.agg(F.sum("c").alias("n_total")))
        .select(
            (F.col("ts") + F.col("tg")).alias("dec_bound"), "n_total"
        )
    )
    exact = sc.groupBy("w").agg(F.sum("c").alias("exact_cnt"))
    top = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("w").asc()
    ).limit(MG_TOPK)
    return (
        top.join(F.broadcast(summary), "w", "left")
        .crossJoin(F.broadcast(bounds))
        .select(
            "w",
            "exact_cnt",
            F.coalesce("est", F.lit(0)).alias("est_cnt"),
            (F.col("exact_cnt") - F.coalesce("est", F.lit(0))).alias(
                "undercount"
            ),
            (F.col("exact_cnt") >= F.coalesce("est", F.lit(0))).alias(
                "one_sided"
            ),
            (
                F.col("exact_cnt") - F.coalesce("est", F.lit(0))
                <= F.col("dec_bound")
            ).alias("within_bound"),
            (F.col("exact_cnt") * (MG_K + 1) > F.col("n_total")).alias(
                "guaranteed_heavy"
            ),
            F.coalesce("est", F.lit(0)).cast("boolean").alias("in_summary"),
            (
                (F.col("exact_cnt") * (MG_K + 1) <= F.col("n_total"))
                | F.coalesce("est", F.lit(0)).cast("boolean")
            ).alias("guarantee_held"),
            "dec_bound",
            (F.col("dec_bound") * (MG_K + 1) <= F.col("n_total")).alias(
                "theory_bound_ok"
            ),
        )
    )


ORACLE["heavy_hitters_mg_audit"] = f"""
    WITH words AS (
      SELECT source AS shard,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    sc AS (
      SELECT shard, w, CAST(count(*) AS BIGINT) AS c
      FROM words GROUP BY 1, 2
    ),
    rk AS (
      SELECT shard, w, c,
             row_number() OVER (PARTITION BY shard
                                ORDER BY c DESC, w ASC) AS rk
      FROM sc
    ),
    t_shard AS (SELECT shard, c AS t FROM rk WHERE rk = {MG_K + 1}),
    pruned AS (
      SELECT sc.w, sc.c - coalesce(t_shard.t, 0) AS pc
      FROM sc LEFT JOIN t_shard ON t_shard.shard = sc.shard
      WHERE sc.c - coalesce(t_shard.t, 0) > 0
    ),
    summed AS (
      SELECT w, CAST(sum(pc) AS BIGINT) AS s FROM pruned GROUP BY w
    ),
    frame AS (
      SELECT * FROM summed ORDER BY s DESC, w ASC LIMIT {MG_K + 1}
    ),
    tg AS (
      SELECT CASE WHEN count(*) = {MG_K + 1} THEN min(s) ELSE 0 END AS tg
      FROM frame
    ),
    summary AS (
      SELECT w, s - tg AS est FROM summed CROSS JOIN tg
      WHERE s - tg > 0
    ),
    bounds AS (
      SELECT CAST((SELECT coalesce(sum(t), 0) FROM t_shard)
                  + (SELECT tg FROM tg) AS BIGINT) AS dec_bound,
             (SELECT CAST(sum(c) AS BIGINT) FROM sc) AS n_total
    ),
    exact AS (
      SELECT w, CAST(sum(c) AS BIGINT) AS exact_cnt FROM sc GROUP BY w
    ),
    top AS (
      SELECT w, exact_cnt FROM exact
      ORDER BY exact_cnt DESC, w ASC LIMIT {MG_TOPK}
    )
    SELECT t.w, t.exact_cnt,
           coalesce(su.est, 0) AS est_cnt,
           t.exact_cnt - coalesce(su.est, 0) AS undercount,
           t.exact_cnt >= coalesce(su.est, 0) AS one_sided,
           t.exact_cnt - coalesce(su.est, 0) <= b.dec_bound AS within_bound,
           t.exact_cnt * {MG_K + 1} > b.n_total AS guaranteed_heavy,
           coalesce(su.est, 0) > 0 AS in_summary,
           (t.exact_cnt * {MG_K + 1} <= b.n_total
            OR coalesce(su.est, 0) > 0) AS guarantee_held,
           b.dec_bound,
           b.dec_bound * {MG_K + 1} <= b.n_total AS theory_bound_ok
    FROM top t
    LEFT JOIN summary su ON su.w = t.w
    CROSS JOIN bounds b
"""
QUERIES["heavy_hitters_mg_audit"] = heavy_hitters_mg_audit


DS_PANEL = 12  # audited heavy-term panel (pairs = C(12,2) max)
DS_U_MOD = 1_000_000_000  # md5-uniform modulus (same family as PS)
# Oversampling numerator: pair (j,k) is sampled with p = min(1,
# G / (n2_j * n2_k)) — heavy column pairs are sampled LIGHTLY, which is
# the DIMSUM insight (Zadeh & Goel 2013: the heaviest dot products need
# the fewest samples for fixed relative error).  Sized so the fixture
# corpora exercise BOTH branches: light pairs exact (p = 1), heavy
# pairs genuinely sampled.
DS_G = 1_000_000


def dimsum_cosine_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIMSUM-sampled dot products between term columns of the
    doc-term matrix, audited against the exact values (Zadeh & Goel,
    "Dimension Independent Similarity Computation", 2013 — the
    shuffle-size-bounded similarity estimator shipped in Spark's
    RowMatrix.columnSimilarities, rebuilt here deterministically so
    the DuckDB oracle reproduces every sampling decision).

    For each co-occurring pair of panel terms (the DS_PANEL most
    frequent): the exact dot product sum_i(a_ij * a_ik), the sampled
    estimate, whether the pair was actually subsampled, and the signed
    error.  Rows are admitted per (doc, pair) with probability
    p = min(1, G / (n2_j * n2_k)) where n2 is the column's squared L2
    norm — so as the corpus (and hence the norms) grows, the PER-PAIR
    sample size stays O(G / cos-weight) while light pairs remain
    exact: shuffle traffic is bounded independent of matrix dimension,
    which is the whole point of DIMSUM at 100 TB.

    Determinism: u = md5_60bit("ds|doc|j|k") % 1e9 + 1; a row is
    sampled iff u <= T_jk with the INTEGER threshold T_jk =
    (G * 1e9) div (n2_j * n2_k) (rearranged to avoid 60-bit overflow);
    the unbias uses the same quantized T, and the single floating
    division at the end is two correctly-rounded IEEE-754 ops on
    identical integers in both engines.

    Scale shape: ONE (doc, word) count shuffle; the panel + norms
    broadcast (DS_PANEL rows); per-doc pair fan-out is bounded by
    C(DS_PANEL, 2); the reduce side is one row per surviving pair.
    The exact side reuses the same conditional aggregation — present
    only because this is an audit.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(_words()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("a"))
        .persist()
    )
    panel = (
        counts.groupBy("w")
        .agg(F.sum("a").alias("tot"), F.sum(F.expr("a * a")).alias("n2"))
        .orderBy(F.col("tot").desc(), F.col("w").asc())
        .limit(DS_PANEL)
        .select("w", "n2")
    )
    pc = counts.join(F.broadcast(panel), "w")
    pairs = (
        pc.alias("l")
        .join(
            pc.alias("r"),
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.w") < F.col("r.w")),
        )
        .select(
            F.col("l.doc_id").alias("doc_id"),
            F.col("l.w").alias("term_a"),
            F.col("r.w").alias("term_b"),
            F.col("l.n2").alias("n2_a"),
            F.col("r.n2").alias("n2_b"),
            (F.col("l.a") * F.col("r.a")).alias("prod"),
            F.expr(
                f"({DS_G}::bigint * {DS_U_MOD}) div (l.n2 * r.n2)"
            ).alias("t"),
            (
                md5_long(
                    F.concat_ws(
                        "|",
                        F.lit("ds"),
                        F.col("l.doc_id").cast("string"),
                        F.col("l.w"),
                        F.col("r.w"),
                    )
                )
                % DS_U_MOD
                + 1
            ).alias("u"),
        )
    )
    agg = pairs.groupBy("term_a", "term_b", "n2_a", "n2_b", "t").agg(
        F.sum("prod").alias("exact_dot"),
        F.sum(F.when(F.col("u") <= F.col("t"), F.col("prod")).otherwise(0)).alias(
            "s_emitted"
        ),
        F.sum(
            F.when(F.col("u") <= F.col("t"), 1).otherwise(0)
        ).alias("n_rows_emitted"),
    )
    return agg.select(
        "term_a",
        "term_b",
        "n2_a",
        "n2_b",
        "exact_dot",
        (F.col("n2_a") * F.col("n2_b") > DS_G).alias("sampled"),
        "n_rows_emitted",
        F.when(
            F.col("n2_a") * F.col("n2_b") <= DS_G,
            F.col("exact_dot") * 1000,
        )
        .otherwise(
            F.floor(
                F.col("s_emitted").cast("double")
                * 1000.0
                * DS_U_MOD
                / F.col("t").cast("double")
            ).cast("bigint")
        )
        .alias("est_dot_milli"),
        F.expr(
            f"""CASE WHEN n2_a * n2_b <= {DS_G}
                 THEN cast(0 as bigint)
                 ELSE (floor(cast(s_emitted as double) * 1000.0
                             * {DS_U_MOD} / cast(t as double))
                       - exact_dot * 1000) * 1000000
                      div nullif(exact_dot * 1000, 0) END"""
        ).alias("err_ppm"),
    )


ORACLE["dimsum_cosine_estimate"] = f"""
    WITH words AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    counts AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS a
      FROM words GROUP BY doc_id, w
    ),
    panel AS (
      SELECT w, CAST(sum(a * a) AS BIGINT) AS n2
      FROM counts GROUP BY w
      ORDER BY sum(a) DESC, w ASC LIMIT {DS_PANEL}
    ),
    pc AS (
      SELECT c.doc_id, c.w, c.a, p.n2
      FROM counts c JOIN panel p ON p.w = c.w
    ),
    pairs AS (
      SELECT l.doc_id, l.w AS term_a, r.w AS term_b,
             l.n2 AS n2_a, r.n2 AS n2_b,
             l.a * r.a AS prod,
             ({DS_G}::BIGINT * {DS_U_MOD}) // (l.n2 * r.n2) AS t,
             ({sql_md5_long(
                 "concat_ws('|', 'ds', CAST(l.doc_id AS VARCHAR),"
                 " l.w, r.w)"
             )}) % {DS_U_MOD} + 1 AS u
      FROM pc l JOIN pc r
        ON l.doc_id = r.doc_id AND l.w < r.w
    ),
    agg AS (
      SELECT term_a, term_b, n2_a, n2_b, t,
             CAST(sum(prod) AS BIGINT) AS exact_dot,
             CAST(sum(CASE WHEN u <= t THEN prod ELSE 0 END) AS BIGINT)
               AS s_emitted,
             CAST(sum(CASE WHEN u <= t THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rows_emitted
      FROM pairs GROUP BY term_a, term_b, n2_a, n2_b, t
    )
    SELECT term_a, term_b, n2_a, n2_b, exact_dot,
           n2_a * n2_b > {DS_G} AS sampled,
           n_rows_emitted,
           CASE WHEN n2_a * n2_b <= {DS_G} THEN exact_dot * 1000
                ELSE CAST(floor(CAST(s_emitted AS DOUBLE) * 1000.0
                                * {DS_U_MOD} / CAST(t AS DOUBLE))
                          AS BIGINT) END AS est_dot_milli,
           CASE WHEN n2_a * n2_b <= {DS_G} THEN CAST(0 AS BIGINT)
                ELSE (CAST(floor(CAST(s_emitted AS DOUBLE) * 1000.0
                                 * {DS_U_MOD} / CAST(t AS DOUBLE))
                           AS BIGINT)
                      - exact_dot * 1000) * 1000000
                     // nullif(exact_dot * 1000, 0) END AS err_ppm
    FROM agg
"""
QUERIES["dimsum_cosine_estimate"] = dimsum_cosine_estimate


PJS_B = 16  # audited hash partitions (the AQE shuffle-partition model)
PJS_SKEW_X = 2  # AQE-style skew trigger: partition > X * median


def partition_join_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shuffle-partition join-cardinality estimation from per-
    partition (rows, distinct-keys) statistics — the question AQE's
    skew-join and partition-coalescing rules answer at runtime,
    answered here BEFORE the join from two statistics passes, and
    audited against the exact per-partition join sizes.

    Each side's keys hash into {PJS_B} partitions (md5, the repo's
    cross-engine hash); per partition the estimate is the System R
    uniformity rule ``n1 * n2 div max(d1, d2)`` (Selinger et al. 1979
    — containment-of-values on the join key).  Emits one row per
    partition: both sides' (n, d), the estimated and exact join
    cardinality, the signed error in ppm, and two skew verdicts — the
    PREDICTED one from the estimates and the TRUE one from the exact
    sizes (partition > {PJS_SKEW_X} x median) — so the audit shows
    whether pre-join statistics would have routed the same partitions
    to AQE's skew-split that runtime sizes do.

    Scale shape: both statistics passes are map-side-combined groupBys
    onto per-key rows, re-aggregated to {PJS_B} partition rows; the
    exact side joins the two PER-KEY count tables (one keyed shuffle —
    present only because this is an audit; production reads only the
    2 x {PJS_B}-row statistics).  The median runs on a {PJS_B}-row
    frame.  All arithmetic integer; ties impossible (hash is total).
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )

    def per_key(df: DataFrame) -> DataFrame:
        return df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).select(
            "k",
            "n",
            (md5_long(F.col("k").cast("string")) % PJS_B).alias("p"),
        )
    ko = per_key(o).persist()
    kl = per_key(l).persist()

    def stats(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy("p").agg(
            F.sum("n").alias(f"n{side}"),
            F.count(F.lit(1)).alias(f"d{side}"),
        )
    est = (
        stats(ko, "1")
        .join(stats(kl, "2"), "p", "full")
        .select(
            "p",
            F.coalesce("n1", F.lit(0)).alias("n1"),
            F.coalesce("d1", F.lit(0)).alias("d1"),
            F.coalesce("n2", F.lit(0)).alias("n2"),
            F.coalesce("d2", F.lit(0)).alias("d2"),
            F.expr(
                "coalesce(n1, 0) * coalesce(n2, 0)"
                " div greatest(coalesce(d1, 0), coalesce(d2, 0), 1)"
            ).alias("est_rows"),
        )
    )
    exact = (
        ko.join(kl.withColumnRenamed("n", "n_r"), ["k", "p"])
        .groupBy("p")
        .agg(F.sum(F.expr("n * n_r")).alias("exact_rows"))
    )
    both = (
        est.join(exact, "p", "left")
        .select(
            "p",
            "n1",
            "d1",
            "n2",
            "d2",
            "est_rows",
            F.coalesce("exact_rows", F.lit(0)).alias("exact_rows"),
        )
        .persist()
    )
    med = both.select(
        F.expr(
            "cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY est_rows)"
            " as bigint)"
        ).alias("med_est"),
        F.expr(
            "cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY exact_rows)"
            " as bigint)"
        ).alias("med_exact"),
    )
    return both.crossJoin(F.broadcast(med)).select(
        "p",
        "n1",
        "d1",
        "n2",
        "d2",
        "est_rows",
        "exact_rows",
        F.expr(
            "(est_rows - exact_rows) * 1000000"
            " div nullif(exact_rows, 0)"
        ).alias("err_ppm"),
        (F.col("est_rows") > PJS_SKEW_X * F.col("med_est")).alias(
            "predicted_skew"
        ),
        (F.col("exact_rows") > PJS_SKEW_X * F.col("med_exact")).alias(
            "true_skew"
        ),
    )


ORACLE["partition_join_size_audit"] = f"""
    WITH ko AS (
      SELECT k, n, {sql_md5_long("CAST(k AS VARCHAR)")} % {PJS_B} AS p
      FROM (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1)
    ),
    kl AS (
      SELECT k, n, {sql_md5_long("CAST(k AS VARCHAR)")} % {PJS_B} AS p
      FROM (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1)
    ),
    s1 AS (SELECT p, CAST(sum(n) AS BIGINT) AS n1,
                  CAST(count(*) AS BIGINT) AS d1 FROM ko GROUP BY p),
    s2 AS (SELECT p, CAST(sum(n) AS BIGINT) AS n2,
                  CAST(count(*) AS BIGINT) AS d2 FROM kl GROUP BY p),
    est AS (
      SELECT coalesce(s1.p, s2.p) AS p,
             coalesce(n1, 0) AS n1, coalesce(d1, 0) AS d1,
             coalesce(n2, 0) AS n2, coalesce(d2, 0) AS d2,
             coalesce(n1, 0) * coalesce(n2, 0)
               // greatest(coalesce(d1, 0), coalesce(d2, 0), 1)
               AS est_rows
      FROM s1 FULL JOIN s2 ON s1.p = s2.p
    ),
    exact AS (
      SELECT ko.p, CAST(sum(ko.n * kl.n) AS BIGINT) AS exact_rows
      FROM ko JOIN kl ON kl.k = ko.k AND kl.p = ko.p
      GROUP BY ko.p
    ),
    joined AS (
      SELECT e.p, e.n1, e.d1, e.n2, e.d2, e.est_rows,
             coalesce(x.exact_rows, 0) AS exact_rows
      FROM est e LEFT JOIN exact x ON x.p = e.p
    ),
    med AS (
      SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY est_rows)
                  AS BIGINT) AS med_est,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY exact_rows)
                  AS BIGINT) AS med_exact
      FROM joined
    )
    SELECT b.p, b.n1, b.d1, b.n2, b.d2, b.est_rows, b.exact_rows,
           (b.est_rows - b.exact_rows) * 1000000
             // nullif(b.exact_rows, 0) AS err_ppm,
           b.est_rows > {PJS_SKEW_X} * m.med_est AS predicted_skew,
           b.exact_rows > {PJS_SKEW_X} * m.med_exact AS true_skew
    FROM joined b CROSS JOIN med m
"""
QUERIES["partition_join_size_audit"] = partition_join_size_audit


# ---- Theta-sketch (KMV) set algebra -----------------------------------------
#
# The sketch family's set-ALGEBRA member: hll_set_overlap_audit gets an
# intersection only by inclusion-exclusion, which goes NEGATIVE when
# the true overlap is below the sketch noise (documented there).  A
# theta sketch — here the deterministic KMV/"bottom-k" form: the K
# smallest distinct hash values plus theta = the K-th smallest — keeps
# an actual SAMPLE of each set, so union / intersection / difference
# are computed on the samples below a common theta and every estimate
# is a non-negative count scaled by S/theta (Dasgupta et al., "Theta-
# Sketch Framework", and Beyer et al. "KMV" SIGMOD 2007; mergeability
# per Agarwal et al., PODS 2012).  The union estimate is defined
# as the sum of the three disjoint-part estimates — each common-theta
# sample lands in exactly one part, so the algebra is exact by
# construction and every term is non-negative, two properties
# inclusion-exclusion on HLL registers cannot offer.

THETA_K = 64
# hash space: 60-bit md5 hashes truncated to 45 bits (>> 15) so every
# count * S product stays far inside bigint (128 * 2^45 < 2^53)
THETA_SPACE = 1 << 45


def theta_sketch_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary set algebra from bottom-K theta
    sketches, audited against exact counts.

    Per source: the THETA_K smallest distinct 45-bit word hashes;
    theta = the K-th smallest (or S when the vocabulary is smaller
    than K, in which case the sketch IS the set and estimates are
    exact).  Per pair: both sample lists are cut at the common
    theta' = min(theta_a, theta_b) and intersect/difference/union
    counts of the cut samples scale by S/theta' — all in-row array
    arithmetic on <=K-element lists.

    Scale shape: ONE distinct (source, word) shuffle; a rank window
    per source cut at K (WindowGroupLimit prunes everything past K
    before the sort finishes); the sketch table is |S| rows of a
    <=K-long array — driver-sized, so the pair grid is a broadcast
    cross of tiny frames.  The exact side (vocab self-join) exists
    only because this is an audit.  All estimate arithmetic is
    integer: counts <= 2K, S = 2^45, products < 2^53.
    """
    d = load_table(spark, sf_dir, "documents")
    # element universe: word 3-gram shingles (a per-source vocabulary of
    # single words is only ~tens of items in this corpus — too small to
    # ever saturate a K=64 sketch; shingles give the cardinality regime
    # theta sketches exist for, and the exact side still joins on the
    # 45-bit hash, never on text)
    words = (
        d.select("source", _words().alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3),"
                    " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
                )
            ).alias("sh"),
        )
        .select("source", F.shiftright(md5_long(F.col("sh")), 15).alias("h"))
        .distinct()
        .persist()
    )
    rn = Window.partitionBy("source").orderBy("h")
    low = (
        words.withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") <= THETA_K)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("h")).alias("lows"))
    )
    totals = words.groupBy("source").agg(F.count(F.lit(1)).alias("n_tot"))
    sk = low.join(totals, "source").select(
        "source",
        "n_tot",
        F.expr(
            f"CASE WHEN n_tot >= {THETA_K}"
            f" THEN element_at(lows, {THETA_K})"
            f" ELSE {THETA_SPACE}L END"
        ).alias("theta"),
        F.expr(
            f"CASE WHEN n_tot >= {THETA_K}"
            f" THEN slice(lows, 1, {THETA_K - 1})"
            " ELSE lows END"
        ).alias("samples"),
    )
    a = sk.select(
        F.col("source").alias("source_a"),
        F.col("theta").alias("theta_a"),
        F.col("samples").alias("samples_a"),
    )
    b = sk.select(
        F.col("source").alias("source_b"),
        F.col("theta").alias("theta_b"),
        F.col("samples").alias("samples_b"),
    )
    est = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("source_a") < F.col("source_b"))
        .withColumn("th", F.least("theta_a", "theta_b"))
        .withColumn("ap", F.expr("filter(samples_a, x -> x < th)"))
        .withColumn("bp", F.expr("filter(samples_b, x -> x < th)"))
        .withColumn(
            "n_inter", F.size(F.array_intersect("ap", "bp")).cast("long")
        )
        .select(
            "source_a",
            "source_b",
            "th",
            F.expr(f"size(ap) * {THETA_SPACE}L div th").alias("est_a"),
            F.expr(f"size(bp) * {THETA_SPACE}L div th").alias("est_b"),
            F.expr(f"n_inter * {THETA_SPACE}L div th").alias("est_inter"),
            F.expr(f"(size(ap) - n_inter) * {THETA_SPACE}L div th").alias(
                "est_anotb"
            ),
            F.expr(f"(size(bp) - n_inter) * {THETA_SPACE}L div th").alias(
                "est_bnota"
            ),
        )
    )
    wa = words.select(F.col("source").alias("source_a"), "h")
    wb = words.select(F.col("source").alias("source_b"), "h")
    inter = (
        wa.join(wb, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    ta = totals.select(F.col("source").alias("source_a"), F.col("n_tot").alias("na"))
    tb = totals.select(F.col("source").alias("source_b"), F.col("n_tot").alias("nb"))
    return (
        est.join(inter, ["source_a", "source_b"], "left")
        .join(ta, "source_a")
        .join(tb, "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("th").alias("theta"),
            "est_a",
            "est_b",
            # union DEFINED as the sum of the three disjoint-part
            # estimates: the common-theta sample partition makes the
            # algebra exact by construction (each sample lands in
            # exactly one part), unlike HLL inclusion-exclusion
            (F.col("est_inter") + F.col("est_anotb") + F.col("est_bnota"))
            .alias("est_union"),
            "est_inter",
            "est_anotb",
            "est_bnota",
            F.coalesce("exact_inter", F.lit(0)).cast("bigint").alias("exact_inter"),
            (F.col("na") + F.col("nb") - F.coalesce("exact_inter", F.lit(0)))
            .cast("bigint")
            .alias("exact_union"),
            (F.col("na") - F.coalesce("exact_inter", F.lit(0)))
            .cast("bigint")
            .alias("exact_anotb"),
            (F.col("nb") - F.coalesce("exact_inter", F.lit(0)))
            .cast("bigint")
            .alias("exact_bnota"),
            F.expr(
                "cast(sign(est_inter - coalesce(exact_inter, 0)) as bigint)"
                " * (abs(est_inter - coalesce(exact_inter, 0)) * 1000000"
                " div nullif(coalesce(exact_inter, 0), 0))"
            ).alias("err_inter_ppm"),
        )
    )


ORACLE["theta_sketch_set_algebra"] = f"""
    WITH words AS (
      SELECT DISTINCT source, {sql_md5_long('sh')} >> 15 AS h FROM (
        SELECT source, unnest(
                 list_transform(generate_series(1, len(w) - 2),
                                i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
               ) AS sh
        FROM (
          SELECT source,
                 list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents
        )
        WHERE len(w) >= 3
      )
    ),
    ranked AS (
      SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      FROM words
    ),
    low AS (
      SELECT source, list_sort(list(h)) AS lows
      FROM ranked WHERE rn <= {THETA_K} GROUP BY source
    ),
    totals AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_tot
      FROM words GROUP BY source
    ),
    sk AS (
      SELECT l.source, t.n_tot,
             CASE WHEN t.n_tot >= {THETA_K} THEN lows[{THETA_K}]
                  ELSE {THETA_SPACE} END AS theta,
             CASE WHEN t.n_tot >= {THETA_K} THEN lows[1:{THETA_K - 1}]
                  ELSE lows END AS samples
      FROM low l JOIN totals t ON t.source = l.source
    ),
    est AS (
      SELECT a.source AS source_a, b.source AS source_b,
             least(a.theta, b.theta) AS th,
             list_filter(a.samples, x -> x < least(a.theta, b.theta)) AS ap,
             list_filter(b.samples, x -> x < least(a.theta, b.theta)) AS bp
      FROM sk a, sk b WHERE a.source < b.source
    ),
    est2 AS (
      SELECT source_a, source_b, th,
             CAST(len(ap) AS BIGINT) AS nap, CAST(len(bp) AS BIGINT) AS nbp,
             CAST(len(list_intersect(ap, bp)) AS BIGINT) AS n_inter
      FROM est
    ),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS exact_inter
      FROM words a JOIN words b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT e.source_a, e.source_b, e.th AS theta,
           nap * {THETA_SPACE} // th AS est_a,
           nbp * {THETA_SPACE} // th AS est_b,
           n_inter * {THETA_SPACE} // th
             + (nap - n_inter) * {THETA_SPACE} // th
             + (nbp - n_inter) * {THETA_SPACE} // th AS est_union,
           n_inter * {THETA_SPACE} // th AS est_inter,
           (nap - n_inter) * {THETA_SPACE} // th AS est_anotb,
           (nbp - n_inter) * {THETA_SPACE} // th AS est_bnota,
           COALESCE(x.exact_inter, 0) AS exact_inter,
           ta.n_tot + tb.n_tot - COALESCE(x.exact_inter, 0) AS exact_union,
           ta.n_tot - COALESCE(x.exact_inter, 0) AS exact_anotb,
           tb.n_tot - COALESCE(x.exact_inter, 0) AS exact_bnota,
           CAST(sign(n_inter * {THETA_SPACE} // th
                     - COALESCE(x.exact_inter, 0)) AS BIGINT)
             * (abs(n_inter * {THETA_SPACE} // th
                    - COALESCE(x.exact_inter, 0)) * 1000000
                // nullif(COALESCE(x.exact_inter, 0), 0)) AS err_inter_ppm
    FROM est2 e
    LEFT JOIN inter x
      ON x.source_a = e.source_a AND x.source_b = e.source_b
    JOIN totals ta ON ta.source = e.source_a
    JOIN totals tb ON tb.source = e.source_b
"""
QUERIES["theta_sketch_set_algebra"] = theta_sketch_set_algebra


# ---- Sliding-window distinct via per-day HLL register merges ----------------

HLL_SLIDE_DAY_MS = 86_400_000
HLL_SLIDE_WINDOW_DAYS = 7  # trailing window: day-6 .. day


def hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct-user estimate per day, computed by
    MERGING per-day HLL registers inside a RANGE-frame window — the
    sketch-composition pattern a 100 TB metrics pipeline actually
    ships: materialize m registers per day ONCE (incremental, tiny),
    then answer every sliding window by elementwise-max over sketches,
    never re-scanning events.  ``hll_merge_rollup`` proves registers
    merge across a static hierarchy; this op proves the same algebra
    under a TIME window, where the exact answer (distinct over 7 days)
    is famously non-additive day over day.

    Pipeline: distinct (day, user) -> per-(day, bucket) max-rho
    registers -> dense day x m grid (absent buckets = 0) -> per-bucket
    ``max(r) OVER (ORDER BY day RANGE 6 PRECEDING)`` -> per-day
    harmonic sum / estimate.  The window frame is RANGE on the integer
    day, so calendar gaps widen the frame correctly instead of slipping
    a row-count frame.  The exact trailing distinct (the audit
    companion) fans each (user, day) pair out to the <= 7 window days
    it covers and counts distinct users per window day.

    Scale shape: the register path shuffles once to (day, bucket) —
    days x m rows total, KB per year per metric — and the window merge
    runs over that sketch table only.  The exact path costs a 7x
    explode of distinct (user, day) and is the audit tier the estimate
    retires at scale.  All register arithmetic is integer (the
    ``HLL_SCALE`` convention); the estimate division is the single
    float op, evaluated from identical IEEE inputs in both engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"unix_millis(ts) div {HLL_SLIDE_DAY_MS}").alias("day"),
        F.col("user_id").cast("bigint").alias("u"),
    )
    pairs = ev.distinct().persist()
    days = pairs.select("day").distinct()
    fine = (
        pairs.select(
            "day", md5_long(F.col("u").cast("string")).alias("h")
        )
        .select(
            "day",
            (F.col("h") % HLL_M).alias("bucket"),
            F.expr(
                f"""CASE WHEN (h div {HLL_M}) = 0 THEN 57
                    ELSE 57 - length(bin(h div {HLL_M})) END"""
            ).alias("rho"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    grid = (
        days.crossJoin(
            spark.range(HLL_M).select(F.col("id").alias("bucket"))
        )
        .join(fine, ["day", "bucket"], "left")
        .select(
            "day", "bucket", F.coalesce("r", F.lit(0)).cast("int").alias("r")
        )
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("day")
        .rangeBetween(-(HLL_SLIDE_WINDOW_DAYS - 1), 0)
    )
    merged = grid.select("day", "bucket", F.max("r").over(w).alias("rw"))
    est = merged.groupBy("day").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 57 - rw)")).alias(
            "harmonic_scaled"
        ),
        F.sum(F.when(F.col("rw") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_registers"),
    ).select(
        "day",
        "harmonic_scaled",
        "n_zero_registers",
        F.expr(
            f"CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)}"
            " / harmonic_scaled) AS BIGINT)"
        ).alias("hll_estimate"),
    )
    covered = (
        pairs.select(
            "u",
            F.explode(
                F.expr(
                    f"sequence(day, day + {HLL_SLIDE_WINDOW_DAYS - 1})"
                )
            ).alias("day"),
        )
        .join(days, "day")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    return est.join(covered, "day").select(
        "day",
        "harmonic_scaled",
        "n_zero_registers",
        "hll_estimate",
        "exact_distinct",
        F.expr(
            "(hll_estimate - exact_distinct) * 1000000"
            " div nullif(exact_distinct, 0)"
        ).alias("err_ppm"),
    )


ORACLE["hll_sliding_distinct"] = f"""
    WITH pairs AS (
      SELECT DISTINCT CAST(epoch_ms(ts) // {HLL_SLIDE_DAY_MS} AS BIGINT)
               AS day,
             CAST(user_id AS BIGINT) AS u
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM pairs),
    fine AS (
      SELECT day,
             {sql_md5_long("CAST(u AS VARCHAR)")} % {HLL_M} AS bucket,
             CAST(max(CASE
               WHEN ({sql_md5_long("CAST(u AS VARCHAR)")} // {HLL_M}) = 0
                 THEN 57
               ELSE 57 - length(bin(
                 {sql_md5_long("CAST(u AS VARCHAR)")} // {HLL_M}))
             END) AS INT) AS r
      FROM pairs GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.day, g.bucket, COALESCE(f.r, 0) AS r
      FROM days d
      CROSS JOIN (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket) g
      LEFT JOIN fine f ON f.day = d.day AND f.bucket = g.bucket
    ),
    merged AS (
      SELECT day, bucket,
             max(r) OVER (
               PARTITION BY bucket ORDER BY day
               RANGE BETWEEN {HLL_SLIDE_WINDOW_DAYS - 1} PRECEDING
                 AND CURRENT ROW
             ) AS rw
      FROM grid
    ),
    est AS (
      SELECT day,
             CAST(sum(CAST(1 AS BIGINT) << (57 - rw)) AS BIGINT)
               AS harmonic_scaled,
             CAST(coalesce(sum(CASE WHEN rw = 0 THEN 1 END), 0) AS BIGINT)
               AS n_zero_registers
      FROM merged GROUP BY day
    ),
    covered AS (
      SELECT c.day, CAST(count(DISTINCT c.u) AS BIGINT) AS exact_distinct
      FROM (
        SELECT DISTINCT p.u, p.day + o.off AS day
        FROM pairs p
        CROSS JOIN (SELECT unnest(generate_series(0,
          {HLL_SLIDE_WINDOW_DAYS - 1})) AS off) o
      ) c
      JOIN days d ON d.day = c.day
      GROUP BY c.day
    )
    SELECT e.day, e.harmonic_scaled, e.n_zero_registers,
           CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)}
                / e.harmonic_scaled) AS BIGINT) AS hll_estimate,
           c.exact_distinct,
           (CAST(floor({HLL_ALPHA_M2} * {float(HLL_SCALE)}
                 / e.harmonic_scaled) AS BIGINT) - c.exact_distinct)
             * 1000000 // nullif(c.exact_distinct, 0) AS err_ppm
    FROM est e JOIN covered c ON c.day = e.day
"""
QUERIES["hll_sliding_distinct"] = hll_sliding_distinct
