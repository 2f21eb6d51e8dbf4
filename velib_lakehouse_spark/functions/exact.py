"""Cross-engine-exact numeric conventions.

Floating-point aggregation order differs between engines (and between
partitionings of the same engine), so raw ``SUM(double)`` is not
reproducible bit-for-bit.  Every judged aggregate therefore goes through
decimal arithmetic, which is exact and associative, and is only cast to
double at the very end — both Spark and DuckDB then produce the *same*
double for the same exact decimal value.

Conventions (mirror these in oracle SQL):

* sum:      ``CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE)``
  — the ROUND keeps the decimal at scale 2 before the double cast, so
  both engines perform a single correctly-rounded conversion (casting a
  high-scale decimal to double costs DuckDB two roundings and can differ
  from Spark by 1 ULP)
* product:  cast both factors to DECIMAL before multiplying
* average:  exact-double sum / COUNT, in double arithmetic, ROUND(..., 6)
  (one double division of identical operands is deterministic)

This doubles as the 100TB answer: decimal sums are associative, so
map-side partial aggregation and AQE re-partitioning cannot change the
result.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"
DEC_HI = "decimal(18,6)"


def dec_sum(col: Column | str, alias: str) -> Column:
    """Exact sum of a double column, surfaced as double (2-decimal)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), 2).cast("double").alias(alias)


def dec_sum_expr(col: Column) -> Column:
    return F.round(F.sum(col.cast(DEC)), 2).cast("double")


def dec_avg(col: Column | str, alias: str) -> Column:
    """Exact-sum / count average, rounded to 6 places."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), 6).alias(alias)


def dec_product(a: Column, b: Column) -> Column:
    """Exact product of two double columns (decimal domain)."""
    return a.cast(DEC_HI) * b.cast(DEC_HI)


# ---- oracle-SQL (DuckDB) counterparts, for building mirror strings ----

def sql_dec_sum(expr: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,4))), 2) AS DOUBLE)"
        f" AS {alias}"
    )


def sql_dec_avg(expr: str, alias: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
        f" / COUNT({expr}), 6) AS {alias}"
    )


def sql_dec_product(a: str, b: str) -> str:
    return f"(CAST({a} AS DECIMAL(18,6)) * CAST({b} AS DECIMAL(18,6)))"
