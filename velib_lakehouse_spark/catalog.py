"""Table catalog: names -> DataFrames over a scale-factor directory.

Plays the role of the reference's reader helpers + path conventions
(reference src/resources.py:106-120 generic format reader; reference
src/assets/velib_alerte.py:23-34 partition-aware parquet read): a single
place that knows where tables live and normalizes their schemas.

Normalizations applied here (and nowhere else) so every operator sees a
clean schema:

* ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark reads
  (under ``nanosAsLong``) as a nanosecond epoch long; converted to
  TimestampType at microsecond precision — the same truncation DuckDB
  applies when casting ns -> us, so oracle comparisons agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velib_lakehouse_spark.session import apply_safe_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from ``{sf_dir}/{name}.parquet`` with a normalized schema."""
    apply_safe_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ns epoch long -> microsecond timestamp (integer division
            # floors, matching DuckDB's ns->us truncation).
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # Session handed to us before the NTZ-inference conf applied:
            # naive us-timestamp + UTC session -> identical instants.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register each table as a temp view (for the Spark-SQL entry points)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
