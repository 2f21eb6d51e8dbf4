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
