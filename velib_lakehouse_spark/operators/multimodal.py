"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at lake scale: payloads are opaque
``binary`` columns beside typed metadata; decode / feature-extraction /
frame-sampling run as Arrow-batched pandas transforms (``mapInPandas``)
so the Python boundary is crossed per *batch*, never per row, and the
operator parallelizes per partition with no shuffle.

The actual codec step is STUBBED (image/audio libraries are not in this
environment): ``decode_image`` raises ``NotImplementedError``, and the
pipeline runs a deterministic fake decode derived from the payload bytes
instead.  Everything around the stub — binary column construction,
schema, batch iteration, partitioning — is real and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.session import ensure_package_on_workers

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, n_frames bigint"
)


def decode_image(payload: bytes) -> dict:
    """Real codec hook — not available in this environment.

    A deployment with PIL/ffmpeg swaps this in for ``_fake_decode`` via
    ``decode_media(..., decoder=decode_image)``.
    """
    raise NotImplementedError("image codecs are not available in this build")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decode: metadata derived from byte length."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 64 + (n % 576),
        "height": 64 + ((n * 7) % 416),
        "n_frames": 1 + (n % 29),
    }


def with_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque binary payload column (here: utf-8 text bytes —
    in production the bytes come straight off the object store)."""
    return df.withColumn("payload", F.encode(F.col("text"), "UTF-8"))


def decode_media(df: DataFrame, decoder=_fake_decode) -> DataFrame:
    """Arrow-batched decode: binary payload -> typed metadata rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(p) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    ensure_package_on_workers(df.sparkSession)
    return df.select("doc_id", "payload").mapInPandas(run, schema=DECODE_SCHEMA)


def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> binary payload -> batched (fake) decode -> metadata."""
    d = load_table(spark, sf_dir, "documents")
    return decode_media(with_payload(d))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: explode every 4th frame index per decoded payload.

    The decode feeds a declarative explode — the pandas boundary ends at
    the metadata, so the fan-out stays JVM-side.
    """
    meta = multimodal_decode_meta(spark, sf_dir)
    return meta.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n_frames") - 1),
                lambda i: i % 4 == 0,
            )
        ).alias("frame_idx"),
    )


ORACLE: dict[str, str | None] = {
    "multimodal_decode_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(64 + octet_length(encode(text)) % 576 AS BIGINT) AS width,
               CAST(64 + (octet_length(encode(text)) * 7) % 416 AS BIGINT)
                 AS height,
               CAST(1 + octet_length(encode(text)) % 29 AS BIGINT) AS n_frames
        FROM documents
    """,
    "multimodal_frame_sample": """
        WITH meta AS (
          SELECT doc_id,
                 CAST(1 + octet_length(encode(text)) % 29 AS BIGINT) AS n_frames
          FROM documents
        )
        SELECT doc_id, n_frames,
               unnest(list_filter(generate_series(0, n_frames - 1),
                                  i -> i % 4 = 0)) AS frame_idx
        FROM meta
    """,
}

QUERIES = {
    "multimodal_decode_meta": multimodal_decode_meta,
    "multimodal_frame_sample": multimodal_frame_sample,
}
