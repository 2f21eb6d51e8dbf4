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
        # normalize to epoch millis (same contract as the catalog).
        # POST-EPOCH ASSUMPTION (r4 ADVICE): Python // floors while the
        # oracle's DuckDB // truncates toward zero, so the two diverge
        # by 1 ms on pre-1970 instants only; the events corpus (and any
        # realistic feed) is post-epoch, where floor == truncate.
        if str(ts.type).startswith("int"):
            vals = ts.to_pylist()
            # guard the assumption instead of silently diverging (r5
            # ADVICE): a pre-epoch instant floors here, truncates there
            assert not vals or min(vals) >= 0, "pre-epoch int ts in feed"
            ts_ms = [v // 1_000_000 for v in vals]
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

    def simpleStreamReader(self, schema):
        return VelibFeedStreamReader(self.options)


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


# ---- Streaming tier of the same source ----


def _shard_files(path: str) -> list[str]:
    files = sorted(_glob.glob(os.path.join(path, "events*.parquet")))
    for f in list(files):
        if os.path.isdir(f):
            files.remove(f)
            files.extend(sorted(_glob.glob(os.path.join(f, "*.parquet"))))
    return files


def _shard_rows(path: str):
    """Decode one feed shard to (stationcode, payload) tuples — shared
    by the batch partitions and the streaming offsets (same bytes)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["event_id", "ts", "user_id", "value"])
    ts = t["ts"]
    if str(ts.type).startswith("int"):
        vals = ts.to_pylist()
        # same post-epoch guard as the batch reader above (r5 ADVICE)
        assert not vals or min(vals) >= 0, "pre-epoch int ts in feed"
        ts_ms = [v // 1_000_000 for v in vals]
    else:
        ts_ms = [
            int(v.cast("int64").as_py()) // 1000
            for v in ts.cast("timestamp[us]")
        ]
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


try:  # Spark 4 streaming Python-source API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover - older runtime
    SimpleDataSourceStreamReader = object


class VelibFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming read of the feed: offset = shard index, one shard per
    micro-batch.  ``SimpleDataSourceStreamReader`` is the driver-side
    prototyping tier (rows flow through the driver's prefetch cache);
    the partition-based ``DataSourceStreamReader`` with the same offset
    scheme is the distributed-scale path — the offset/replay contract
    (``read`` advances, ``readBetweenOffsets`` replays committed
    ranges for recovery) is identical, which is what this query pins.
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("velib_feed requires option 'path'")
        self._path = path

    def initialOffset(self) -> dict:
        return {"shard": 0}

    def read(self, start: dict):
        # Spark's prefetch cache copy.copy()s whatever this returns when
        # planning partitions — a generator is not copyable, so the batch
        # must be materialized here (bounded: one feed snapshot).  All
        # shards present at call time are drained into this batch because
        # PythonMicroBatchStream does not support Trigger.AvailableNow and
        # falls back to single-batch execution — a one-shard-per-call
        # cursor would silently drop shards 1..n there.
        files = _shard_files(self._path)
        i = int(start["shard"])
        rows: list = []
        for f in files[i:]:
            rows.extend(_shard_rows(f))
        return rows, {"shard": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _shard_files(self._path)
        rows: list = []
        for i in range(int(start["shard"]), min(int(end["shard"]), len(files))):
            rows.extend(_shard_rows(files[i]))
        return rows


def streaming_python_datasource_feed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bronze ingestion through the STREAMING face of the custom Python
    data source: the same source class serves `readStream` via an
    offset-tracked shard cursor, each micro-batch parses the keyed
    JSON payload and folds into a per-station running aggregate
    (complete mode — station cardinality is the bound, same argument
    as ``streaming_static_enrich``).  Sums are exact micro-units so
    batch boundaries cannot change the result; the oracle is the batch
    aggregate over the same table.
    """
    ensure_package_on_workers(spark)
    # The planner-side PYTHON STREAMING SOURCE RUNNER does not add
    # addPyFile includes to sys.path before unpickling the DataSource
    # (the batch planner worker does — setup_spark_files runs for it),
    # so a by-reference pickle of this class dies with
    # ModuleNotFoundError whenever the driver wasn't launched with the
    # repo on PYTHONPATH (any real harness).  Pickling this module by
    # VALUE makes the streamed source self-contained: the reader
    # classes and shard helpers close over stdlib + pyspark only.
    from pyspark import cloudpickle as _cp

    import velib_lakehouse_spark.sources.pyds as _pyds_mod

    _cp.register_pickle_by_value(_pyds_mod)
    spark.dataSource.register(VelibFeedDataSource)
    feed = spark.readStream.format("velib_feed").option("path", sf_dir).load()
    parsed = feed.select(
        "stationcode",
        F.from_json(
            "payload",
            "bikes double, event_id bigint, stationcode bigint, ts_ms bigint",
        ).alias("k"),
    )
    agg = parsed.groupBy("stationcode").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.max("k.ts_ms").alias("last_report_ms"),
        F.sum(
            F.floor(F.col("k.bikes") * F.lit(1e4) + F.lit(0.5)).cast("bigint")
        ).alias("sum_bikes_micro"),
    )
    from velib_lakehouse_spark.session import tuned_shuffle

    with tuned_shuffle(spark, max(4, spark.sparkContext.defaultParallelism // 4)):
        query = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("pyds_stream_sink")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table("pyds_stream_sink")


ORACLE["streaming_python_datasource_feed"] = """
    SELECT user_id AS stationcode,
           CAST(count(*) AS BIGINT) AS n_msgs,
           max(epoch_us(ts) // 1000) AS last_report_ms,
           CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_bikes_micro
    FROM events
    GROUP BY user_id
"""
QUERIES["streaming_python_datasource_feed"] = streaming_python_datasource_feed
