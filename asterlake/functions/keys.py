"""Deterministic surrogate keys.

The reference generates surrogate keys with ``monotonically_increasing_id()``
(``src/etl/silver_to_gold.py:59,67`` — dim_celestial_body and the fact's
``approach_event_id``), which is partition-layout-dependent: the same input
produces different ids run-to-run, and its pandas twin uses ``index + 1``
(``src/etl/pandas/silver_to_gold.py:63,85-86``) so the reference's two
implementations already disagree with each other.

Here keys are ``xxhash64`` of the natural key — deterministic, shuffle-free
(a map-side expression, no window/sort), collision-safe at fact-table scale
(64-bit space vs ~10^10 rows at 100 TB), and identical on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(*cols: Column | str) -> Column:
    """64-bit deterministic surrogate key over the natural-key columns.

    Nulls are distinguished from empty strings by xxhash64's per-type
    handling; multi-column keys hash the tuple, not a concatenation, so
    ("a", "bc") != ("ab", "c").
    """
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def dense_key(order_col: Column | str) -> Column:
    """Dense 1..N key via a global dense_rank — use only for small dims.

    A global (un-partitioned) window forces all rows through one task; fine
    for dimensions with few distinct values (celestial bodies ~ O(10)),
    never for facts. Portable to ANSI SQL (DENSE_RANK() OVER (ORDER BY k))
    which makes it the oracle-checkable variant.
    """
    from pyspark.sql import Window

    col = F.col(order_col) if isinstance(order_col, str) else order_col
    return F.dense_rank().over(Window.orderBy(col)).cast("long")
