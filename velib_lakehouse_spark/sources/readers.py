"""Generic format reader (reference src/resources.py:106-120 generalized).

A thin dispatch over ``DataFrameReader`` so pipelines name a format +
path + options instead of hand-rolling reader chains.  Delta/Iceberg
are wired behind availability probes — their jars are not in this build,
so the lakehouse tables fall back to hive-partitioned parquet (same
layout the reference uses; Delta adds ACID overwrite + time travel when
the package is present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from velib_lakehouse_spark.session import apply_safe_confs


def delta_available(spark: SparkSession) -> bool:
    """True when the Delta Lake classes are on the JVM classpath."""
    try:
        spark._jvm.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Read ``path`` as ``fmt`` with options (json/parquet/csv/orc/...)."""
    apply_safe_confs(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
