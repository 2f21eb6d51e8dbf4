"""Versioned snapshot tables: atomic commit, time travel, vacuum."""

from __future__ import annotations

import json

import pytest

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.sources.snapshots import (
    current_version,
    list_versions,
    read_snapshot,
    vacuum,
    write_snapshot,
)
from tests.conftest import SF_DIR


def test_snapshot_versions_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "gold")
    o = load_table(spark, SF_DIR, "orders")

    v0 = write_snapshot(o.limit(10), table)
    v1 = write_snapshot(o.limit(25), table)
    assert (v0, v1) == (0, 1)
    assert current_version(table) == 1

    assert read_snapshot(spark, table).count() == 25  # latest
    assert read_snapshot(spark, table, version=0).count() == 10  # time travel

    # a torn/aborted write never surfaces: drop a half-written dir
    (tmp_path / "gold" / "v=99").mkdir()
    assert read_snapshot(spark, table).count() == 25


def test_vacuum_keeps_current(spark, tmp_path):
    table = str(tmp_path / "gold")
    o = load_table(spark, SF_DIR, "orders")
    for n in (5, 10, 15, 20):
        write_snapshot(o.limit(n), table)
    assert list_versions(table) == [0, 1, 2, 3]

    removed = vacuum(table, keep_last=2)
    assert removed == 2
    assert list_versions(table) == [2, 3]
    assert read_snapshot(spark, table).count() == 20
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, table, version=0)


def test_manifest_commit_is_atomic_shape(tmp_path, spark):
    table = str(tmp_path / "gold")
    o = load_table(spark, SF_DIR, "orders")
    write_snapshot(o.limit(3), table)
    manifest = json.loads((tmp_path / "gold" / "_latest").read_text())
    assert manifest["version"] == 0
    assert "committed_at" in manifest
    # no stray temp manifests left behind
    assert not [p for p in (tmp_path / "gold").iterdir()
                if p.name.startswith("._manifest_")]
