"""SCD Type-2 dimension maintenance (history-preserving upsert).

The reference's dims are SCD1 — attribute changes overwrite
(sp_upsert_claims.sql UPDATE arm). This operator provides the
history-preserving alternative as one set-based pass over the current
slice: changed members get their open row closed (valid_to stamped)
and a new version row; unchanged members are untouched (null-safe
attribute compare, same P10 discipline as MERGE).

History rows never rewrite — at scale, partition the table by
``is_current`` so the (small) current slice rewrites and the closed
history is append-only.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fabric_claims_spark.sources.merge import TableStore

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"


@dataclass
class Scd2Stats:
    new_members: int
    changed_members: int


def _stamp(df: DataFrame, ts: datetime) -> DataFrame:
    return (
        df.withColumn(VALID_FROM, F.lit(ts).cast("timestamp"))
        .withColumn(VALID_TO, F.lit(None).cast("timestamp"))
        .withColumn(IS_CURRENT, F.lit(True))
    )


def scd2_apply(
    store: TableStore,
    name: str,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_ts: datetime,
) -> Scd2Stats:
    """Apply a full or partial snapshot of (key, attrs) to the SCD2
    table ``name``; returns new/changed member counts."""
    if not store.exists(name):
        snap = _stamp(updates.select(key, *attrs), effective_ts)
        store.overwrite(name, snap)
        return Scd2Stats(new_members=snap.count(), changed_members=0)

    hist = store.read(name)
    current = hist.where(F.col(IS_CURRENT))
    # exact-duplicate rows collapse; CONFLICTING rows per key would
    # fan out the history join (duplicated closed rows, several
    # "current" versions per key) — a caller bug, so fail loudly
    # rather than pick a survivor nondeterministically. The guard job
    # is dim-sized, not fact-sized.
    u_rows = updates.select(key, *attrs).distinct()
    if u_rows.groupBy(key).count().where(F.col("count") > 1).limit(1).count():
        raise ValueError(
            f"scd2_apply: updates carry conflicting rows for the same {key!r}; "
            "resolve to one row per key before applying"
        )
    u = u_rows.alias("u")
    c = current.alias("c")

    diff = F.lit(False)
    for a in attrs:
        diff = diff | ~F.col(f"c.{a}").eqNullSafe(F.col(f"u.{a}"))

    joined = u.join(c, F.col(f"u.{key}").eqNullSafe(F.col(f"c.{key}")), "left").cache()
    new_rows = joined.where(F.col(f"c.{key}").isNull()).select("u.*")
    changed_rows = joined.where(F.col(f"c.{key}").isNotNull() & diff).select("u.*")
    n_new, n_changed = new_rows.count(), changed_rows.count()

    changed_keys = changed_rows.select(F.col(key).alias("_ck")).distinct()
    close_ts = F.lit(effective_ts).cast("timestamp")
    # close the open row of changed members; everything else unchanged
    updated_hist = (
        hist.join(F.broadcast(changed_keys), hist[key] == F.col("_ck"), "left")
        .withColumn(
            VALID_TO,
            F.when(
                F.col("_ck").isNotNull() & F.col(IS_CURRENT), close_ts
            ).otherwise(F.col(VALID_TO)),
        )
        .withColumn(
            IS_CURRENT,
            F.when(F.col("_ck").isNotNull(), F.lit(False)).otherwise(
                F.col(IS_CURRENT)
            ),
        )
        .drop("_ck")
    )
    result = updated_hist.unionByName(
        _stamp(new_rows.unionByName(changed_rows), effective_ts)
    )
    store.overwrite(name, result)
    joined.unpersist()
    return Scd2Stats(new_members=n_new, changed_members=n_changed)


def current_view(store: TableStore, name: str) -> DataFrame:
    return store.read(name).where(F.col(IS_CURRENT))


def as_of_view(store: TableStore, name: str, ts: datetime) -> DataFrame:
    """Point-in-time reconstruction: rows valid at ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return store.read(name).where(
        (F.col(VALID_FROM) <= t)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > t))
    )


def point_in_time_join(
    fact: DataFrame,
    history: DataFrame,
    key: str,
    fact_ts: str,
    how: str = "left",
) -> DataFrame:
    """Join each fact row to the dimension version valid AT THAT ROW'S
    timestamp — the feature-store "as-of correctness" join that
    prevents dimension leakage from the future (``as_of_view`` fixes
    one global timestamp; this resolves a per-row one).

    Because SCD2 validity intervals are non-overlapping per key, at
    most one history row satisfies ``valid_from <= fact_ts < valid_to``
    (open ``valid_to`` = NULL), so the join never fans out. With
    ``how='left'``, facts predating the member's first version (the
    late-arriving-dimension case) survive with NULL attributes for the
    caller to bucket explicitly.

    Scale notes (100 TB): the equi component (``fact.key ==
    history.key``) drives a hash join — co-partitioned shuffle on the
    key, history side broadcast when it is a bounded dimension — and
    the validity range predicates apply as post-join filters on the
    matched pairs (per key there are only as many pairs as versions,
    typically 1-3). No range explosion, no cartesian.
    """
    h = history
    cond = (
        (fact[key] == h[key])
        & (h[VALID_FROM] <= fact[fact_ts])
        & (h[VALID_TO].isNull() | (fact[fact_ts] < h[VALID_TO]))
    )
    return fact.join(h, cond, how).drop(h[key])
