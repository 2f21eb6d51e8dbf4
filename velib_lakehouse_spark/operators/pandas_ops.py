"""Arrow-batched Python operators (the sanctioned slow path, §2.11).

The reference needs no UDFs; these exist for the extension surface where
Python genuinely earns its keep (feature extraction, per-group model-ish
logic) and to keep the Arrow interop paths exercised:

* ``pandas_text_features``  — scalar ``pandas_udf``: vectorized string
  features per document (one Arrow batch per ~10k rows, not per-row
  pickling);
* ``pandas_session_gaps``   — grouped-map ``applyInPandas``: per-station
  inter-event gap statistics, the shape used for per-key imperative
  logic Spark expressions can't express.

Both are engineered to emit exact integers (microsecond diffs, counts)
so the DuckDB oracle applies unchanged — floats across a Python/numpy
boundary would not be bit-reproducible.

Scale: scalar pandas_udfs pipeline inside the stage (no shuffle);
applyInPandas shuffles once on the group key, and each group must fit
in worker memory — per-station event history does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.session import ensure_package_on_workers


@F.pandas_udf(LongType())
def _n_unique_words(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: len({w for w in t.split(" ") if w}))


@F.pandas_udf(LongType())
def _n_digit_chars(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: sum(c.isdigit() for c in t))


def pandas_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized per-document features through the Arrow scalar path."""
    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return d.select(
        "doc_id",
        _n_unique_words("text").alias("n_unique_words"),
        _n_digit_chars("text").alias("n_digit_chars"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
    )


_GAP_SCHEMA = (
    "station_code bigint, n_events bigint, max_gap_us bigint, min_gap_us bigint"
)


def _gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    # datetime64 diffs are exact integer microseconds — no float boundary
    gaps = pdf["ts"].diff().dropna().dt.total_seconds() * 1_000_000
    gaps = gaps.round().astype("int64")
    return pd.DataFrame(
        {
            "station_code": [int(pdf["user_id"].iloc[0])],
            "n_events": [len(pdf)],
            "max_gap_us": [int(gaps.max()) if len(gaps) else None],
            "min_gap_us": [int(gaps.min()) if len(gaps) else None],
        }
    )


def pandas_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-station inter-event gap stats via grouped-map applyInPandas."""
    ensure_package_on_workers(spark)
    # explicit-N pre-partition on the group key: the groupBy reuses the
    # partitioning (no second exchange) and AQE cannot coalesce the
    # small shuffle into one task, which would serialize the thousands
    # of per-group pandas calls
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
    )
    return e.groupBy("user_id").applyInPandas(_gap_stats, schema=_GAP_SCHEMA)


ORACLE: dict[str, str | None] = {
    "pandas_text_features": """
        SELECT doc_id,
               CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                                  x -> x <> ''))) AS BIGINT)
                 AS n_unique_words,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
                 AS n_digit_chars,
               CAST(length(text) AS BIGINT) AS n_chars_measured
        FROM documents
    """,
    "pandas_session_gaps": """
        WITH gaps AS (
          SELECT user_id,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   AS gap_us
          FROM events
        )
        SELECT user_id AS station_code,
               count(*) AS n_events,
               max(gap_us) AS max_gap_us,
               min(gap_us) AS min_gap_us
        FROM gaps
        GROUP BY user_id
    """,
}

QUERIES = {
    "pandas_text_features": pandas_text_features,
    "pandas_session_gaps": pandas_session_gaps,
}


def arrow_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native batch operator (``mapInArrow``): per-document byte/
    codepoint accounting computed directly on ``pyarrow.RecordBatch``es
    — the zero-copy tier below ``mapInPandas`` (no pandas Series
    materialization, no object boxing; the Python side reads Arrow
    buffers).

    This is the API a multimodal decode loop should use at 100 TB:
    payload bytes stay in Arrow memory end-to-end, and the operator
    pipelines inside the scan stage (no shuffle — verified by the plan
    audit).  Here it computes UTF-8 byte length vs codepoint length and
    the ASCII share per document, integers only, so the DuckDB oracle
    applies unchanged.
    """
    import pyarrow as pa

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def batch_stats(batches):
        for batch in batches:
            doc_id = batch.column("doc_id")
            text = batch.column("text")
            n_bytes = pa.compute.binary_length(
                pa.compute.cast(text, pa.binary())
            )
            n_chars = pa.compute.utf8_length(text)
            yield pa.RecordBatch.from_arrays(
                [
                    doc_id,
                    pa.compute.cast(n_bytes, pa.int64()),
                    pa.compute.cast(n_chars, pa.int64()),
                    pa.compute.cast(
                        pa.compute.subtract(n_bytes, n_chars), pa.int64()
                    ),
                ],
                names=["doc_id", "n_bytes", "n_codepoints", "n_multibyte_extra"],
            )

    return d.mapInArrow(
        batch_stats,
        "doc_id long, n_bytes long, n_codepoints long, n_multibyte_extra long",
    )


ORACLE["arrow_batch_stats"] = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) AS BIGINT) AS n_codepoints,
           CAST(octet_length(encode(text)) - length(text) AS BIGINT)
             AS n_multibyte_extra
    FROM documents
"""
QUERIES["arrow_batch_stats"] = arrow_batch_stats


# ---- Cogrouped-map: the two-sided per-key imperative path ----

_COGROUP_SCHEMA = (
    "user_id bigint, n_orders bigint, n_events bigint, n_paired bigint,"
    " paired_spend_cents bigint"
)


def _paired_spend(key, orders_pdf: pd.DataFrame, events_pdf: pd.DataFrame):
    """Positional pairing of a key's orders and events streams.

    Sort each side by its own (time, id) — a constant session-TZ shift
    moves both sides identically, so the ORDER is TZ-proof and no
    wall-clock value leaves Python.  Money leaves as exact cents
    (floor(x*100+0.5) == Spark's round() half-up on nonnegative
    2-decimal prices).
    """
    k = min(len(orders_pdf), len(events_pdf))
    spend = 0
    if k:
        ordered = orders_pdf.sort_values(["o_orderdate", "o_orderkey"])
        # vectorized exact-cents fold: int64-truncating v*100+0.5 per
        # element is the same nonnegative half-up the Python loop did
        spend = int(
            (ordered["o_totalprice"].to_numpy()[:k] * 100 + 0.5)
            .astype("int64")
            .sum()
        )
    return pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_orders": [len(orders_pdf)],
            "n_events": [len(events_pdf)],
            "n_paired": [k],
            "paired_spend_cents": [spend],
        }
    )


def pandas_cogroup_paired_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-input per-key imperative logic via cogrouped-map
    ``groupBy().cogroup(...).applyInPandas`` — the API tier for logic
    that needs BOTH of a key's group frames in one Python call (here:
    zip the k-th order with the k-th event positionally and account the
    paired spend; the single-input ``applyInPandas`` cannot see the
    second frame, and a join would materialize the n*m pairing this
    avoids).

    Scale shape: one shuffle per side on the cogroup key (explicit-N
    repartition so AQE cannot collapse the thousands of per-key pandas
    calls into one task), then each key's two frames stream through
    Arrow together.  Per-key memory is that key's history on both
    sides — the same bound single-input applyInPandas already carries.
    """
    ensure_package_on_workers(spark)
    n = spark.sparkContext.defaultParallelism
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        .repartition(n, "o_custkey")
    )
    # the Python side only ever reads len(events_pdf): ship the key
    # column ALONE through the shuffle and the Arrow boundary instead of
    # (user_id, ts, event_id) (guide §4: pass only the columns the
    # function needs)
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .repartition(n, "user_id")
    )
    return (
        o.groupBy("o_custkey")
        .cogroup(e.groupBy("user_id"))
        .applyInPandas(_paired_spend, schema=_COGROUP_SCHEMA)
    )


ORACLE["pandas_cogroup_paired_spend"] = """
    WITH o AS (
      SELECT o_custkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      FROM orders
    ),
    e AS (
      SELECT user_id AS k,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ),
    oc AS (SELECT k, CAST(count(*) AS BIGINT) AS n_orders FROM o GROUP BY k),
    ec AS (SELECT k, CAST(count(*) AS BIGINT) AS n_events FROM e GROUP BY k),
    paired AS (
      SELECT o.k,
             CAST(count(*) AS BIGINT) AS n_paired,
             CAST(SUM(o.c) AS BIGINT) AS spend
      FROM o JOIN e ON o.k = e.k AND o.rn = e.rn
      GROUP BY o.k
    )
    SELECT coalesce(oc.k, ec.k) AS user_id,
           coalesce(oc.n_orders, 0) AS n_orders,
           coalesce(ec.n_events, 0) AS n_events,
           coalesce(p.n_paired, 0) AS n_paired,
           coalesce(p.spend, 0) AS paired_spend_cents
    FROM oc FULL OUTER JOIN ec ON oc.k = ec.k
    LEFT JOIN paired p ON coalesce(oc.k, ec.k) = p.k
"""
QUERIES["pandas_cogroup_paired_spend"] = pandas_cogroup_paired_spend
