"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``).

The reference's bronze tier pulls the station feed over HTTP and
re-emits keyed JSON messages (reference src/assets/bronze.py:16-58).
Spark 4's Python Data Source API lets that ingestion live INSIDE the
scan: a ``DataSource`` subclass declares a schema and a partition
list, and each partition's ``read()`` runs as a distributed task —
the idiomatic home for "fetch from a weird system and emit rows"
logic that previously needed a driver-side collect or an RDD.

``velib_feed`` is that source, network-free: each input partition is
one ``events*.parquet`` file under ``path`` (a stand-in for one API
page / one feed shard), read with **pyarrow directly** (no Spark
machinery inside the task — exactly how a real HTTP/queue source
would look) and re-emitted as the reference's keyed compact-JSON
message shape via the same :mod:`ingest` helpers the Kafka producer
path uses.

Scale shape: parallelism = partition count (one per feed shard);
every task is independent and map-side; schema is declared up front
so Catalyst plans normally on top (the downstream ``from_json`` +
aggregation prune and shuffle as usual).  A Python source pays the
Python-worker tax per row — use it for sources Spark cannot read
natively, not to reimplement parquet (the parquet-backed shard here
is the test double, as with the Kafka file-source).
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from velib_lakehouse_spark.session import ensure_package_on_workers


class VelibFeedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("velib_feed requires option 'path'")
        self._path = path

    def partitions(self):  # one partition per feed shard (file)
        files = sorted(_glob.glob(os.path.join(self._path, "events*.parquet")))
        # a directory-style table (Spark-written) is a dir of parts
        for f in list(files):
            if os.path.isdir(f):
                files.remove(f)
                files.extend(
                    sorted(_glob.glob(os.path.join(f, "*.parquet")))
                )
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        t = pq.read_table(
            partition.value, columns=["event_id", "ts", "user_id", "value"]
        )
        ts = t["ts"]
        # the feed has shipped both ns-epoch ints and timestamps; both
        # normalize to epoch millis (same contract as the catalog)
        if str(ts.type).startswith("int"):
            ts_ms = [v.as_py() // 1_000_000 for v in ts]
        else:
            ts_ms = [int(v.cast("int64").as_py()) // 1000 for v in ts.cast("timestamp[us]")]
        for eid, code, val, ms in zip(
            t["event_id"].to_pylist(),
            t["user_id"].to_pylist(),
            t["value"].to_pylist(),
            ts_ms,
        ):
            payload = json.dumps(
                {
                    "bikes": val,
                    "event_id": eid,
                    "stationcode": code,
                    "ts_ms": ms,
                },
                separators=(",", ":"),
                sort_keys=True,
            )
            yield (code, payload)


class VelibFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "velib_feed"

    def schema(self) -> str:
        return "stationcode bigint, payload string"

    def reader(self, schema) -> VelibFeedReader:
        return VelibFeedReader(self.options)


def python_datasource_bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze ingestion through the custom Python data source: scan the
    feed shards distributed, parse the keyed JSON payload back out
    (P1 semantics on a source Spark has no native reader for), and
    report per-station message counts + latest report.

    The JSON round trip is the point: the payload leaves the source as
    the exact producer bytes (`ingest.to_keyed_messages` shape), so
    parse-back parity proves the source emits what the Kafka path
    would.
    """
    ensure_package_on_workers(spark)  # source class pickles by module ref
    spark.dataSource.register(VelibFeedDataSource)
    feed = spark.read.format("velib_feed").option("path", sf_dir).load()
    parsed = feed.select(
        "stationcode",
        F.from_json(
            "payload",
            "bikes double, event_id bigint, stationcode bigint, ts_ms bigint",
        ).alias("k"),
    )
    return parsed.groupBy("stationcode").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.max("k.ts_ms").alias("last_report_ms"),
        F.max_by(F.col("k.bikes"), F.col("k.event_id")).alias("latest_bikes"),
    )


ORACLE: dict[str, str | None] = {
    "python_datasource_bronze": """
        SELECT user_id AS stationcode,
               CAST(count(*) AS BIGINT) AS n_msgs,
               max(epoch_us(ts) // 1000) AS last_report_ms,
               max_by(value, event_id) AS latest_bikes
        FROM events
        GROUP BY user_id
    """,
}

QUERIES = {
    "python_datasource_bronze": python_datasource_bronze,
}
