"""Ordered collection aggregation.

Spark's ``collect_list`` gives no ordering guarantee, but DuckDB's
``LIST(x ORDER BY ...)`` (used by the reference's sparkline query,
reference src/api.py:59) does.  The deterministic Spark idiom is
collect-structs -> array_sort -> project, which this module packages.
``array_sort`` on structs orders by fields left-to-right, so callers put
the sort keys first and always include a unique tiebreak.

Scale note: this is a single groupBy shuffle plus per-group O(n log n)
sort — all JVM-side, no Python.  Per-group lists must fit in executor
memory, which holds for top-N-per-group inputs (the reference caps at 5
readings per station before aggregating).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_collect(value: Column, *sort_keys: Column) -> Column:
    """collect ``value`` ordered by ``sort_keys`` (ascending, nulls last)."""
    struct = F.struct(
        *[k.alias(f"k{i}") for i, k in enumerate(sort_keys)], value.alias("v")
    )
    return F.transform(F.array_sort(F.collect_list(struct)), lambda x: x["v"])
