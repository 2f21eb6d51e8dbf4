"""Central query registry: aggregates every operator module's inventory.

``QUERIES``: name -> callable(spark, sf_dir) -> DataFrame
``ORACLE``:  name -> DuckDB SQL mirror (or None for rows-only checks)

``__spark_entry__.py`` and ``bench.py`` both read from here, so a query
registered once is simultaneously correctness-checked (driver oracle),
benchmarked, and unit-testable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str | None] = {}


def _register(module) -> None:
    overlap = set(module.QUERIES) & set(QUERIES)
    if overlap:  # pragma: no cover - developer error
        raise ValueError(f"duplicate query names: {overlap}")
    QUERIES.update(module.QUERIES)
    ORACLE.update(module.ORACLE)


def _load() -> None:
    from velib_lakehouse_spark.operators import relational, relational2, velib

    for mod in (velib, relational, relational2):
        _register(mod)

    # Optional modules land as they are implemented; import-gated so a
    # broken extension never takes down the core inventory.
    for name in (
        "dedup",
        "similarity",
        "text",
        "multimodal",
        "pandas_ops",
        "rollups",
        "curation",
    ):
        try:
            mod = __import__(
                f"velib_lakehouse_spark.operators.{name}", fromlist=["QUERIES"]
            )
            _register(mod)
        except ImportError:
            pass

    try:
        from velib_lakehouse_spark.streaming import silver as streaming_silver

        _register(streaming_silver)
    except ImportError:
        pass

    try:
        from velib_lakehouse_spark.sources import lake

        _register(lake)
    except ImportError:
        pass


_load()
