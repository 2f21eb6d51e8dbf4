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


# ---- integer fixed-point fast path -----------------------------------------
#
# When the inputs have a KNOWN fixed decimal scale (TPC-H money/quantity
# columns: <= 2 places), the decimal route above leaves performance on
# the table: sum(DECIMAL(18,4)) widens to DECIMAL(28,4), which Spark
# backs with BigDecimal objects instead of codegen longs (measured ~3x
# on the Q1 aggregate).  Scaling to integer micro-units (1e-4) first
# keeps the whole aggregate in long arithmetic — still exact, still
# associative (so partial aggregation/AQE cannot change results), and
# whole-stage-codegen fast.  round(x*100) is safe because a 2-decimal
# double is within 1 ULP of its scaled integer — never near a .5
# boundary.  NONNEGATIVE inputs only (the final half-up rounding is
# emulated with floor((s+50)/100)); signed columns (acctbal) stay on
# the decimal path.

CENTS = 100
MICRO = 10_000


def cents(col: Column | str) -> Column:
    """Exact integer cents of a nonnegative <=2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * CENTS).cast("bigint")


def cents_product(a: Column | str, b: Column | str) -> Column:
    """cents(a) * cents(b): exact scale-4 micro-units, pure long math."""
    return cents(a) * cents(b)


def micro_sum_2dp(micro_col: Column, alias: str) -> Column:
    """SUM of scale-4 micro-units, rounded half-up to 2 decimals and
    surfaced as double — same value as ``dec_sum`` on the unscaled
    column (nonnegative inputs)."""
    return (
        F.floor((F.sum(micro_col) + F.lit(50)) / F.lit(100)) / F.lit(100.0)
    ).alias(alias)


def micro_avg_6dp(micro_col: Column, count_col: Column | str, alias: str) -> Column:
    """Exact micro sum -> double, / 1e4, / count, rounded to 6 — the
    identical double-op sequence as ``dec_avg``."""
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    return F.round(
        F.sum(micro_col).cast("double") / F.lit(float(MICRO)) / F.count(c), 6
    ).alias(alias)


def sql_cents(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def sql_cents_product(a: str, b: str) -> str:
    return f"({sql_cents(a)} * {sql_cents(b)})"


def sql_micro_sum_2dp(micro_expr: str, alias: str) -> str:
    return f"floor((SUM({micro_expr}) + 50) / 100) / 100.0 AS {alias}"


def sql_micro_avg_6dp(micro_expr: str, count_expr: str, alias: str) -> str:
    return (
        f"ROUND(CAST(SUM({micro_expr}) AS DOUBLE) / 10000.0"
        f" / COUNT({count_expr}), 6) AS {alias}"
    )
