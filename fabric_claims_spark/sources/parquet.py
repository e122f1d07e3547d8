"""Parquet table access for the driver-provided test data.

Thin helpers so queries stay declarative: ``spark.read.parquet`` gives
Catalyst the scan node, and filter/column pushdown happens for free as
long as callers filter/select on the returned DataFrame (verify with
``df.explain`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fabric_claims_spark.schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table (parity with Delta scan-by-path, S2:
    NBclaims_silver.Notebook/notebook-content.py:64-75).

    events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects ([PARQUET_TYPE_ILLEGAL]); read it as long via the
    legacy conf and convert ns→µs with exact integer division. DuckDB
    keeps ns, so queries surface timestamps truncated ≥ second grain.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
