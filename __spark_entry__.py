"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``fabric_claims_spark/queries/`` — one registered
entry per operator in SURVEY.md §2 plus the training-data extension
operators. ``tools/check_correctness.py`` replays this same gate
locally.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fabric_claims_spark.queries import load_all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all_queries()
    return registry["pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted entries get the rows-only check."""
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
