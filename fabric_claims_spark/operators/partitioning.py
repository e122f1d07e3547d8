"""Parallelism guards for generate-heavy operators.

Explode-based generators (shingling, k-gram hashing, position
spines) multiply each input row by ~row length, but Spark never
rebalances WITHIN a stage: whatever parallelism the scan produced is
what the explode and every narrow transform after it run at. A small
dimension read from a single parquet file therefore drags a
million-row generated stage through one task (observed: the sf0.1
documents scan is 1 file -> the 64-slot MinHash aggregate ran 6.4 s
single-task vs ~0.5 s spread over 32).

``spread`` is the guard: round-robin repartition ONLY when the scan
is under-parallel. On a real cluster reading a large table the input
already has >= defaultParallelism splits and this is a no-op — the
shuffle is paid exactly when it is profitable (input partitions ≪
cores), and what shuffles is the raw rows, never the exploded bulk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``min_partitions`` (default: the
    session's defaultParallelism) partitions before a row-multiplying
    transform. No-op when the source is already parallel enough, so
    it is safe to leave in scale paths.

    Probe order matters: ``inputFiles()`` is a metadata lookup (~1 ms)
    while ``rdd.getNumPartitions()`` converts the whole plan to an RDD
    (~1 s per distinct plan) — the RDD probe is the fallback for
    file-less (in-memory) frames only. A many-files scan early-exits
    without ever touching the RDD API; a few-files scan repartitions.
    The one soft spot — few files that SPLIT into > target partitions
    (single file > target × maxPartitionBytes) — still repartitions to
    ``target``, which by construction saturates the cluster's cores."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0 and df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
