"""Key-dedup operators (SURVEY.md §2.5 W1, §2.4 A4).

``dedup_latest`` is the reference's quarantining dedup
(NBclaims_bronze.Notebook/notebook-content.py:119-126): row_number
over the key ordered by recency, rank 1 survives, rank >1 is routed
to a dupe table. The window hash-partitions on the key — no global
sort, scales linearly with AQE handling skewed keys.

A deterministic tie-breaker column should always be supplied: the
reference's ClaimDate-only ordering makes the survivor of exact ties
partition-order-dependent (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RANK_COL = "row_num"


def dedup_latest(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> tuple[DataFrame, DataFrame]:
    """(survivors, duplicates). ``order_by`` should sort best-first,
    e.g. [col('ClaimDate').desc(), col('IngestedAt').desc()]."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    ranked = df.withColumn(RANK_COL, F.row_number().over(w))
    survivors = ranked.where(F.col(RANK_COL) == 1).drop(RANK_COL)
    duplicates = ranked.where(F.col(RANK_COL) > 1).drop(RANK_COL)
    return survivors, duplicates


def dedup_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """A4 — arbitrary-survivor key dedup (NB_SILVER:204-207)."""
    return df.dropDuplicates(keys)
