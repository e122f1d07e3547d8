"""Join helpers with explicit scale strategies (SURVEY.md §2.3, §4).

Catalyst/AQE picks physical joins; these helpers encode the two
decisions it can't make for us: (a) force-broadcast a known-small
side, (b) salt a known-skewed key so one hot key's rows spread over
``salt_buckets`` reducers instead of one. AQE's skew-join splitting
handles *shuffle* skew adaptively; salting is for the aggregate case
(groupBy on a hot key) where AQE can't re-split a single group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """J1 — subtract matching keys (NB_BRONZE:182)."""
    return left.join(right.select(on), on, "left_anti")


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | Column, how: str = "left"
) -> DataFrame:
    """J4 — dim side pinned to broadcast (no fact shuffle)."""
    return fact.join(F.broadcast(dim), on, how)


def salted_groupby_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 32
) -> DataFrame:
    """Two-phase aggregate for skewed keys: partial count on
    (key, salt) — spreads the hot key across reducers — then final
    combine on key. Semantically identical to df.groupBy(keys).count().
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_n"))
    return partial.groupBy(*keys).agg(F.sum("_n").cast("long").alias("count"))


def salted_join_skewed_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-salted inner equi-join: the skewed left side gets a random
    salt, the (smaller) right side is exploded ×salt_buckets so every
    salted left row still finds its match. Use when one key dominates
    and the right side is small enough to replicate but too big to
    broadcast outright.
    """
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    exploded_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_left.join(exploded_right, [key, "_salt"], "inner").drop("_salt")
