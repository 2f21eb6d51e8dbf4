"""Differential tests: every registered query vs. its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate (row-count + schema + order-
insensitive values) at sf0.001 so regressions surface in seconds.
"""

from __future__ import annotations

import pytest

from velib_lakehouse_spark import registry
from tests.conftest import SF_DIR
from tests.oracle_harness import compare

CASES = [(name, sql) for name, sql in registry.ORACLE.items() if sql is not None]


@pytest.mark.parametrize("name,sql", CASES, ids=[c[0] for c in CASES])
def test_query_matches_oracle(spark, name, sql):
    df = registry.QUERIES[name](spark, SF_DIR)
    problems = compare(df, sql, SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_rows_only_queries_run(spark):
    for name, sql in registry.ORACLE.items():
        if sql is None:
            df = registry.QUERIES[name](spark, SF_DIR)
            assert df.count() >= 0, name
