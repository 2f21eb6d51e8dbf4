"""Python UDTF surface (Spark 4 user-defined table functions).

The engine's Python API tiers (SURVEY §2.11) cover scalar pandas
UDFs, grouped ``applyInPandas``, ``mapInPandas``, ``mapInArrow`` and
stateful streaming pandas; Spark 4 adds one more extension point —
the user-defined TABLE function, a row-to-rows generator that
participates in SQL ``LATERAL`` joins.  ``udtf_sentence_split``
exercises it end-to-end: register, lateral-join against the documents
table, project the generated rows next to the parent row's key.

Scale notes:

* A Python UDTF is the row-at-a-time slow tier (one Python generator
  call per input row).  It is the right tool for *generator-shaped*
  logic (one row in, N rows out, N data-dependent) that must live in
  SQL text; for fixed-shape splitting the native
  ``posexplode(split(...))`` used everywhere else in this repo is
  ~10-100x faster.  The UDTF exists because the API surface is part
  of the engine contract, and the segmenter is its honest use case.
* Arrow optimization (``useArrow=True``) batches the row transfer
  (SPARK-43964); we request it and fall back to pickle transfer on
  builds where the flag is unavailable.
* The lateral join itself is narrow (no shuffle): each partition
  generates its segments locally, and the parent row's columns are
  duplicated onto child rows by the generator node, exactly like
  native ``explode``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.session import ensure_package_on_workers

_SENT_RE = re.compile(r"[.!?]\s+")
SEG_MAX_WORDS = 16


class _SentenceSplit:
    """Split ``text`` into sentences on ``[.!?]\\s+`` boundaries, then
    hard-wrap every sentence at ``SEG_MAX_WORDS`` words (the usual
    segmenter contract: downstream models want bounded segments even
    when the source text never ends a sentence).

    Yields (sent_idx, sentence, n_words) per segment; ``sent_idx``
    enumerates emitted segments per document (0-based).  Fragments
    with no words emit nothing.  The delimiter set is lookbehind-free
    on purpose: the DuckDB oracle mirrors it with RE2's
    ``regexp_split_to_array``, and RE2 has no lookbehind.
    """

    def eval(self, text: str):  # noqa: D102 - documented on the class
        if text is None:
            return
        idx = 0
        for frag in _SENT_RE.split(text):
            words = [w for w in frag.split(" ") if w]
            for j in range(0, len(words), SEG_MAX_WORDS):
                seg = words[j : j + SEG_MAX_WORDS]
                yield idx, " ".join(seg), len(seg)
                idx += 1


_RETURN_TYPE = "sent_idx: bigint, sentence: string, n_words: bigint"

try:  # Arrow-optimized row transfer where the build supports it
    SentenceSplit = udtf(_SentenceSplit, returnType=_RETURN_TYPE, useArrow=True)
except TypeError:  # pragma: no cover - older builds
    SentenceSplit = udtf(_SentenceSplit, returnType=_RETURN_TYPE)


def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment inventory per document via a Python UDTF lateral join.

    ``SELECT d.doc_id, s.* FROM documents d, LATERAL sentence_split(d.text) s``
    — the UDTF generates a data-dependent number of rows per document
    and the lateral correlation carries ``doc_id`` onto each.
    """
    ensure_package_on_workers(spark)  # UDTF class pickles by module ref
    spark.udtf.register("sentence_split", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words
        FROM udtf_documents d,
             LATERAL sentence_split(d.text) s
        """
    )


ORACLE: dict[str, str | None] = {
    "udtf_sentence_split": rf"""
        WITH s AS (
          SELECT doc_id,
                 regexp_split_to_array(text, '[.!?]\s+') AS ss
          FROM documents
        ),
        frag AS (
          SELECT doc_id, i AS frag_i,
                 list_filter(string_split(ss[i], ' '), x -> x <> '') AS w
          FROM (
            SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS i
            FROM s WHERE len(ss) >= 1
          )
        ),
        seg AS (
          SELECT doc_id, frag_i, j,
                 array_to_string(
                   w[(j - 1) * {SEG_MAX_WORDS} + 1 :
                     least(j * {SEG_MAX_WORDS}, len(w))], ' ') AS sentence,
                 CAST(least(j * {SEG_MAX_WORDS}, len(w))
                      - (j - 1) * {SEG_MAX_WORDS} AS BIGINT) AS n_words
          FROM (
            SELECT doc_id, frag_i, w,
                   unnest(generate_series(
                     1, CAST(ceil(len(w) / {SEG_MAX_WORDS}.0) AS BIGINT))) AS j
            FROM frag WHERE len(w) >= 1
          )
        )
        SELECT doc_id,
               CAST(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY frag_i, j) - 1
                    AS BIGINT) AS sent_idx,
               sentence, n_words
        FROM seg
    """,
}

QUERIES = {
    "udtf_sentence_split": udtf_sentence_split,
}
