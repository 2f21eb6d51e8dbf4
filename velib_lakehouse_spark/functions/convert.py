"""Small type-normalization helpers shared by the operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def millis(col: Column | str) -> Column:
    """Epoch milliseconds of a timestamp column (BIGINT).

    Parquet columns written without UTC adjustment surface as
    TIMESTAMP_NTZ, which ``unix_millis`` rejects; with the session pinned
    to UTC the cast to TIMESTAMP is value-preserving, and the result
    matches DuckDB's ``epoch_ms``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))
