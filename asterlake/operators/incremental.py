"""Incremental aggregate maintenance: merge partial aggregates exactly.

The materialized-view move every lakehouse serving layer needs: instead of
recomputing a 100 TB aggregate when a batch lands, aggregate ONLY the new
batch and merge it into the stored aggregate table. Correct only for
decomposable aggregates (sum/count/min/max — avg must be carried as
sum+count); exactness additionally demands the partials be carried in an
exact representation: two double partial-sums added together need not
equal the one-pass sum, but decimal/long partials merge associatively, so
the merged table is bit-identical to a full recompute.

Scale: the merge is a key-keyed full-outer join of two AGGREGATE tables —
both group-cardinality-sized, never fact-sized. The fact is only scanned
for the delta batch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_aggregates(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge two partial-aggregate tables with identical schemas.

    Keys present in only one side pass through; shared keys combine
    column-wise (sum/count add, min/max fold). Carry sums as DECIMAL or
    integer types — merging double partials is not associative-exact.
    """
    b = base.alias("b")
    d = delta.alias("d")
    cond = [b[k].eqNullSafe(d[k]) for k in keys]
    merged = b.join(d, cond, "full_outer")

    out = [F.coalesce(b[k], d[k]).alias(k) for k in keys]
    for c in [*sum_cols, *count_cols]:
        zero = F.lit(0)
        # NULL partials: a key absent from one side contributes nothing
        # (coalesce to 0), but when BOTH partials are NULL (a SUM over
        # all-NULL input values) the merged value must stay NULL — a
        # one-pass recompute yields NULL there, and this merge is
        # contractually bit-identical to it.
        out.append(
            F.when(b[c].isNull() & d[c].isNull(), F.lit(None))
            .otherwise(
                F.coalesce(b[c], zero.cast(base.schema[c].dataType))
                + F.coalesce(d[c], zero.cast(base.schema[c].dataType))
            )
            .alias(c)
        )
    for c in min_cols:
        out.append(F.least(b[c], d[c]).alias(c))  # least/greatest skip NULLs
    for c in max_cols:
        out.append(F.greatest(b[c], d[c]).alias(c))
    return merged.select(*out)
