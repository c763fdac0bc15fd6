"""Tolerant casts.

Spark 4 runs with ANSI mode ON by default, so a plain ``cast('double')`` on a
malformed string *throws* at runtime. The reference was written against that
same pyspark 4.x surface (``src/etl/bronze_to_silver.py:70-76``) but its
pandas twin uses ``pd.to_numeric(errors="coerce")``
(``src/etl/pandas/bronze_to_silver.py:75-79``) — i.e. null-on-failure. We
standardize on the tolerant twin's semantics via ``try_cast``/``try_to_*``:
bad input degrades to NULL instead of failing a 100 TB job on one dirty row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def try_double(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.try_cast("double")


def try_date(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.try_cast("date")


def try_timestamp(col: Column | str, fmt: str) -> Column:
    """Null-on-parse-failure timestamp (reference uses strict ``to_timestamp``
    with format ``yyyy-MMM-dd HH:mm``, src/etl/bronze_to_silver.py:66)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(col, F.lit(fmt))
