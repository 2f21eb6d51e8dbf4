"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet,
then compares row count, column-name sets, and order-insensitive values
(exact equality, including floats — the engine's determinism conventions
are supposed to make results bit-identical, and this harness is how that
claim is enforced before the driver sees it).
"""

from __future__ import annotations

import math
import os

import duckdb

from velib_lakehouse_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        # The driver's fixtures are single parquet files; test fixtures
        # written by Spark are directories of part files.  Read either.
        path = f"{sf_dir}/{t}.parquet"
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sortable(v):
    return repr(v)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"schema: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount: spark={len(s_rows)} oracle={len(o_rows)}")

    # reorder oracle columns to spark's order, then sort rows
    idx = [o_cols.index(c) for c in s_cols]
    o_sorted = sorted(
        (tuple(_norm(r[i]) for i in idx) for r in o_rows), key=_sortable
    )
    s_sorted = sorted((tuple(_norm(v) for v in r) for r in s_rows), key=_sortable)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={a!r} oracle={b!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
