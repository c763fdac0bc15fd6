"""Data-lifecycle operators: tombstone cascade (right-to-be-forgotten).

A deletion request names root entities (customers, users); the lakehouse
must propagate it through every table that references them — directly by
foreign key, or transitively through an intermediate table — and produce
an auditable per-table manifest of what was removed. The reference
pipeline has no deletion story at all; for a training-data lakehouse this
is table stakes (consent revocation must reach derived corpora).

Scale shape: every propagation step is a LEFT SEMI / LEFT ANTI join from
a fact table to a key set. Root tombstones are small by nature (a day's
deletion requests) and carry an explicit broadcast hint; transitive key
sets (e.g. the orders of deleted customers) are data-sized — a few
percent of a fact table can dwarf the broadcast threshold — so they are
projected to the join key only and left UNHINTED, letting AQE pick
broadcast vs shuffle from the observed size at runtime (the same pattern
decontaminate uses for its anti-join). The audit aggregate is one count
per table — scalar aggregates, no wide state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cascade_plan(
    tables: dict[str, DataFrame],
    tombstones: DataFrame,
    root_key: str,
    edges: list[tuple[str, str, str, str]],
) -> dict[str, DataFrame]:
    """Per-table DELETED-row frames for a tombstone cascade.

    ``edges`` is the FK chain as ``(table, fk_col, parent, parent_col)``
    in propagation order; a parent of ``"__root__"`` joins against the
    tombstone set's ``root_key``. Each returned frame is the full rows of
    ``tables[name]`` that the deletion reaches (left-semi against the
    propagated key set); callers anti-join to produce the surviving
    table, or write the manifest for audit/erasure proof.
    """
    deleted: dict[str, DataFrame] = {}
    key_sets: dict[str, tuple[DataFrame, str]] = {
        "__root__": (tombstones.select(root_key), root_key)
    }
    for table, fk, parent, parent_col in edges:
        pset, pkey = key_sets[parent]
        keys = pset.select(
            F.col(pkey if parent == "__root__" else parent_col)
        )
        if parent == "__root__":
            # only the root tombstone set is small by contract; derived
            # key sets are data-sized, so AQE decides for those
            keys = F.broadcast(keys)
        cond = tables[table][fk] == keys[keys.columns[0]]
        gone = tables[table].join(keys, cond, "left_semi")
        deleted[table] = gone
        key_sets[table] = (gone, fk)
    return deleted


def cascade_delete_counts(
    tables: dict[str, DataFrame],
    tombstones: DataFrame,
    root_key: str,
    edges: list[tuple[str, str, str, str]],
) -> DataFrame:
    """Audit manifest: one row per table with ``n_before / n_deleted /
    n_after`` BIGINTs. ``n_after`` is derived (before - deleted), so the
    whole audit costs one count aggregate per table per side."""
    deleted = cascade_plan(tables, tombstones, root_key, edges)
    parts = []
    for name, _, _, _ in edges:
        before = tables[name].agg(
            F.count("*").cast("bigint").alias("n_before")
        )
        gone = deleted[name].agg(
            F.count("*").cast("bigint").alias("n_deleted")
        )
        parts.append(
            before.crossJoin(gone).select(
                F.lit(name).alias("table_name"),
                "n_before",
                "n_deleted",
                (F.col("n_before") - F.col("n_deleted"))
                .cast("bigint")
                .alias("n_after"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-feed derivation between two table snapshots: one row
    per key present in either side, labeled ``added`` / ``deleted`` /
    ``changed`` / ``unchanged`` — the diff a corpus-build regression
    check or a downstream-sync needs when the source has no changelog.

    Comparison is per-column null-safe equality (``<=>``), not a hash, so
    the verdict is engine-exact and NULL transitions (value -> NULL)
    count as changes. Shape: ONE full-outer join on the key — at scale a
    co-partitioned sort-merge join (bucket both snapshots on the key to
    make it exchange-free); the label is a pure projection on top.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]
    # explicit presence markers, not key-null-ness: isNotNull on a key
    # column can't distinguish "row absent from this side" from "row
    # present with a NULL key" (which never joins), and would mislabel
    # the latter; a literal marker is NULL after a full-outer join
    # exactly when the side is absent
    o = old.select(
        F.lit(True).alias("_o_present"),
        *[F.col(c).alias(f"_o_{c}") for c in key_cols + compare_cols],
    )
    nw = new.select(
        F.lit(True).alias("_n_present"),
        *[F.col(c).alias(f"_n_{c}") for c in key_cols + compare_cols],
    )
    cond = [o[f"_o_{k}"] == nw[f"_n_{k}"] for k in key_cols]
    j = o.join(nw, cond, "full_outer")
    in_old = F.coalesce(j["_o_present"], F.lit(False))
    in_new = F.coalesce(j["_n_present"], F.lit(False))
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~j[f"_o_{c}"].eqNullSafe(j[f"_n_{c}"])
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("deleted"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    keys = [
        F.coalesce(j[f"_n_{k}"], j[f"_o_{k}"]).alias(k) for k in key_cols
    ]
    return j.select(*keys, change.alias("change_type"))
