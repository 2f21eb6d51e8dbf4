"""Deterministic, cross-engine hash primitives.

Engine-native hashes (Spark's xxhash/Murmur3, DuckDB's ``hash()``) are
incompatible across engines, so every hashed operator (MinHash, SimHash,
fingerprinting, LSH) is built on md5 — identical everywhere — with the
first 15 hex chars (60 bits) reinterpreted as a non-negative BIGINT:

* Spark :  ``CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)``
* DuckDB:  ``('0x' || substr(md5(x), 1, 15))::BIGINT``

60 bits keeps every value well inside int64 (no ANSI overflow), and the
seeded variant ``md5(seed || ':' || x)`` gives an arbitrary family of
independent hash functions for MinHash signatures / LSH hyperplanes.

At 100TB scale md5-per-token is pure map-side compute (whole-stage
codegen'd JVM expression, no shuffle, no Python) — it scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column) -> Column:
    """60-bit non-negative bigint from md5 of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def seeded_md5_long(seed: Column | int, col: Column) -> Column:
    """Member of a hash-function family: h_seed(x) = md5(seed:x) -> bigint."""
    s = F.lit(seed) if isinstance(seed, int) else seed
    return md5_long(F.concat_ws(":", s.cast("string"), col))


# ---- DuckDB mirrors (string builders for oracle SQL) ----

def sql_md5_long(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def sql_seeded_md5_long(seed_expr: str, expr: str) -> str:
    return sql_md5_long(f"concat(CAST({seed_expr} AS VARCHAR), ':', {expr})")
