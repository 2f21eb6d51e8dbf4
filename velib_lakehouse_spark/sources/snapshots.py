"""Versioned snapshot tables: atomic overwrite + time travel + vacuum.

The reference's gold table is a raw-parquet ``mode("overwrite")`` — a
reader racing the writer can see a half-deleted directory (reference
src/assets/velib_alerte.py:70-72).  Delta/Iceberg fix that with a
transaction log; their jars are not in this build, so this module
implements the minimal version of the same idea on plain parquet:

* each write lands in a fresh ``v=N`` directory (never mutated);
* a tiny ``_latest`` manifest is committed by atomic rename — readers
  always resolve a fully-written version;
* old versions remain for time travel until ``vacuum`` drops them
  (reference maintenance.py's 72h retention, done at table granularity).

This is the K3 upgrade + VACUUM analogue; swap in real Delta by
replacing these four functions, call sites unchanged.

Delta adoption attempt (recorded for the record): this build has no
``delta-spark`` / ``delta-core`` / Iceberg runtime jars anywhere on the
classpath or pip cache, no network access, and installs are disallowed —
so ``format("delta")`` cannot initialize (the DeltaCatalog class is
absent).  The manifest path stays; on a cluster with the jars, set
``spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension`` and
``spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog
.DeltaCatalog`` and point these writers at ``format("delta")``.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from velib_lakehouse_spark.session import apply_safe_confs

_MANIFEST = "_latest"


def _manifest_path(table_path: str) -> Path:
    return Path(table_path) / _MANIFEST


def current_version(table_path: str) -> int | None:
    p = _manifest_path(table_path)
    if not p.exists():
        return None
    return int(json.loads(p.read_text())["version"])


def write_snapshot(df: DataFrame, table_path: str, n_files: int = 1) -> int:
    """Commit a new table version atomically; returns the version number."""
    Path(table_path).mkdir(parents=True, exist_ok=True)
    prev = current_version(table_path)
    version = 0 if prev is None else prev + 1
    vdir = os.path.join(table_path, f"v={version}")
    df.coalesce(n_files).write.mode("overwrite").parquet(vdir)

    # commit: write manifest to a temp file, then atomic rename
    fd, tmp = tempfile.mkstemp(dir=table_path, prefix="._manifest_")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": version, "committed_at": time.time()}, f)
    os.replace(tmp, _manifest_path(table_path))
    return version


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read the latest committed version, or time-travel to ``version``."""
    apply_safe_confs(spark)
    v = current_version(table_path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version at {table_path}")
    vdir = os.path.join(table_path, f"v={v}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} not found (vacuumed?)")
    return spark.read.parquet(vdir)


def list_versions(table_path: str) -> list[int]:
    root = Path(table_path)
    if not root.exists():
        return []
    return sorted(
        int(c.name.split("=", 1)[1])
        for c in root.iterdir()
        if c.is_dir() and c.name.startswith("v=")
    )


def vacuum(table_path: str, keep_last: int = 2) -> int:
    """Drop all but the newest ``keep_last`` versions (never the current
    one); returns the number of versions removed."""
    versions = list_versions(table_path)
    cur = current_version(table_path)
    victims = [v for v in versions[:-keep_last] if v != cur] if keep_last else [
        v for v in versions if v != cur
    ]
    for v in victims:
        shutil.rmtree(os.path.join(table_path, f"v={v}"))
    return len(victims)
