"""Bucketed-table helpers — the pay-the-shuffle-once join strategy.

At 100 TB the dominant recurring cost of a fact⋈fact equi-join is the
exchange of both sides on the join key, re-paid by EVERY query. Hive
bucketing moves that shuffle to write time: each table is written
pre-hash-partitioned (and optionally pre-sorted) into N buckets on
the join key, the catalog records the layout, and Spark's scan then
*reports* hashpartitioning to the planner — a sort-merge join of two
tables bucketed on the same key with the same bucket count needs NO
exchange at all (tests/test_bucketing.py pins the plan shape).

Use it for the joins a warehouse repeats daily (fact-to-fact on the
order/claim key, MERGE staging against the target layout); leave
one-off joins to AQE. The bucket count is a layout contract: pick it
once per subject area (e.g. 1024 at 100 TB — ~100 GB per bucket
pre-split by parquet row groups) and keep every co-joined table on
it, because mismatched counts put the exchange right back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and by default bucket-sorted)
    catalog table on ``key``. ``path`` makes it an external table
    (the files land there; the catalog only records the layout).
    Sorting inside buckets lets the merge join skip its per-task sort
    when the planner can prove the ordering."""
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.mode(mode).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table via the catalog (a plain path read would
    drop the bucket metadata and with it the exchange elimination)."""
    return spark.table(table)
