"""Change-data-feed between table snapshots (Delta CDF analog for the
versioned-parquet TableStore).

``table_diff`` computes the row-level change feed that transforms one
snapshot into another: ``insert`` / ``delete`` rows carry the new/old
image, and a key whose non-key attributes changed emits BOTH an
``update_preimage`` and an ``update_postimage`` row — the same four
change types Delta's Change Data Feed emits, so downstream consumers
(incremental rollup maintenance, audit trails, replication) can be
written once against either backend. Pairs with
``TableStore.versions`` / ``read_version`` for time travel.

Reference parity: extends the null-safe change-detection MERGE
(sources/merge.py:168, reference stored-proc semantics) from
"detect while applying" to "reconstruct the feed between any two
retained snapshots".

Scale notes (100 TB): one full-outer hash join co-partitioned on the
key columns — the same shuffle a MERGE pays — then a narrow
classify-and-explode projection (each joined row emits 0-2 change
rows inside whole-stage codegen). No caching, no second pass, no
driver state; attribute comparison is null-safe ``eqNullSafe`` per
column, constant-folded into one predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_TYPE = "_change_type"


def table_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Row-level change feed transforming ``old`` into ``new``.

    Both frames must share a schema; ``keys`` identify rows and must
    be non-null (presence on a join side is detected via key
    nullness, as in any full-outer reconciliation). Returns the
    shared columns plus ``_change_type`` ∈ {insert, delete,
    update_preimage, update_postimage}; unchanged rows emit nothing.
    """
    cols = old.columns
    if set(cols) != set(new.columns):
        raise ValueError(
            f"schema mismatch: {sorted(cols)} vs {sorted(new.columns)}"
        )
    attrs = [c for c in cols if c not in keys]
    o, n = old.alias("o"), new.alias("n")
    key_cond = None
    for k in keys:
        c = o[k].eqNullSafe(n[k])
        key_cond = c if key_cond is None else key_cond & c
    j = o.join(n, key_cond, "full_outer")

    in_old = F.lit(False)
    in_new = F.lit(False)
    for k in keys:
        in_old = in_old | o[k].isNotNull()
        in_new = in_new | n[k].isNotNull()
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~o[a].eqNullSafe(n[a])

    def image(side, change: str):
        return F.struct(
            *[side[c].alias(c) for c in cols],
            F.lit(change).alias(CHANGE_TYPE),
        )

    feed = F.when(
        ~in_old, F.array(image(n, "insert"))
    ).when(
        ~in_new, F.array(image(o, "delete"))
    ).when(
        changed,
        F.array(image(o, "update_preimage"), image(n, "update_postimage")),
    ).otherwise(F.array())

    return (
        j.select(F.explode(feed).alias("_r"))
        .select("_r.*")
    )
