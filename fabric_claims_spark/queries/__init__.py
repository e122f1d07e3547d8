"""Driver-contract query catalog.

Every operator claimed in SURVEY.md §2 registers here as a named query
over the driver's test tables, together with a DuckDB oracle SQL twin
(omitted only for genuinely non-SQL-expressible operators, which get
the driver's weaker rows-only check).

Cross-engine determinism rules (so value hashes match DuckDB exactly):

* Monetary doubles are exactly 2-dp in the test data — cast to
  ``decimal(18,4)`` (rates to ``decimal(6,4)``) before arithmetic and
  aggregation, then cast the final aggregate to double. Exact decimal
  math gives bit-identical doubles in both engines; summing raw
  doubles would be partition-order-dependent.
* Averages are expressed as ``cast(sum as double) / count`` — a single
  deterministic IEEE division — never engine-native ``avg`` over
  decimals (result types differ).
* Timestamp columns are cast to date / truncated to seconds at the
  edges (events.ts is ns in parquet; Spark truncates to µs).
* Every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from fabric_claims_spark.queries import (  # noqa: F401
        relational,
        quality,
        time_intelligence,
        incremental,
        text_docs,
        similarity,
        lsh,
        kpi,
        stats,
        pipeline_smoke,
    )

    return REGISTRY
