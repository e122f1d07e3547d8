"""ORC source/sink — the columnar interchange twin of
sources/parquet (S2/S3), for estates whose upstream lake landed on
ORC (Hive-era warehouses) rather than Parquet.

Same contract as the parquet path: explicit path layout, no schema
inference surprises (ORC embeds its schema), predicate pushdown and
column pruning ride Spark's native vectorized ORC reader. Writes
default to zstd — at 100 TB the compression codec is a first-order
storage/scan-cost knob, and zstd beats the snappy default on both
ratio and decode speed for wide fact tables.

The reference pins parquet/Delta only (NBclaims_bronze.Notebook/
notebook-content.py:96-104); this module exists so a user migrating a
Hive/ORC estate can land and serve through the same engine without a
pre-conversion pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC file/directory with the native vectorized reader.

    Filter pushdown into ORC uses the embedded min/max + bloom
    indexes (`spark.sql.orc.filterPushdown`, on by default); column
    pruning reads only referenced stripes' streams.
    """
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zstd",
    partition_by: list[str] | None = None,
) -> None:
    """Write ORC with explicit codec and optional hive partitioning.

    ``partition_by`` produces the directory-per-value layout that
    gives free partition pruning on the read side — same layout
    contract as the hive-partitioned parquet writes in
    operators/partitioning.
    """
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
