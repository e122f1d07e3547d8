"""The medallion pipeline as a driver-checked query.

Runs the full bronze→silver→gold flow on the deterministic claims
fixture (tests/fixtures.py — seeded CSV with known counts per
quarantine path) inside a throwaway workspace and returns the layer
metrics as one row. Every value is a deterministic function of the
fixture, so the oracle is a literal SELECT — this puts the pipeline's
end-to-end semantics (4-way split invariant, dedup, DQ rules, star
conformance, gold upsert accounting) under the same hash gate as the
relational operators.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from fabric_claims_spark.pipeline.bronze import run_bronze
from fabric_claims_spark.pipeline.gold import run_gold
from fabric_claims_spark.pipeline.silver import run_silver
from fabric_claims_spark.localframe import local_frame
from fabric_claims_spark.queries import query
from fabric_claims_spark.sources.merge import TableStore

_RUN_TS = datetime(2024, 7, 1, 2, 0, 0, tzinfo=timezone.utc)


@query(
    "claims_pipeline_e2e",
    oracle="""
    SELECT CAST(54 AS BIGINT) AS rows_processed,
           CAST(2 AS BIGINT) AS malformed,
           CAST(3 AS BIGINT) AS duplicates,
           CAST(6 AS BIGINT) AS bad_quality,
           CAST(43 AS BIGINT) AS valid,
           CAST(43 AS BIGINT) AS fact_claims,
           CAST(5844 AS BIGINT) AS dim_dates,
           CAST(43 AS BIGINT) AS gold_claims_inserted,
           CAST(0 AS BIGINT) AS gold_claims_updated
    """,
)
def claims_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tests.fixtures import write_claims_fixture

    work = Path(tempfile.mkdtemp(prefix="claims_e2e_"))
    try:
        write_claims_fixture(work / "claims.csv")
        bronze = TableStore(spark, str(work / "bronze"))
        silver = TableStore(spark, str(work / "silver"))
        gold = TableStore(spark, str(work / "gold"))

        b = run_bronze(
            spark, bronze, str(work / "claims.csv"), run_ts=_RUN_TS, batch_id="e2e"
        )
        s = run_silver(
            spark, bronze, silver, run_ts=_RUN_TS, batch_id="e2e"
        )
        g = run_gold(spark, silver, gold)

        row = (
            b["rows_processed"],
            b["quality_metrics"]["malformed"],
            b["quality_metrics"]["duplicates"],
            b["quality_metrics"]["bad_quality"],
            b["quality_metrics"]["valid"],
            s["rows_processed"]["fact_claims"],
            s["rows_processed"]["dim_dates"],
            g["Claims"]["inserted"],
            g["Claims"]["updated"],
        )
        return local_frame(
            spark,
            [row],
            "rows_processed long, malformed long, duplicates long, "
            "bad_quality long, valid long, fact_claims long, dim_dates long, "
            "gold_claims_inserted long, gold_claims_updated long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
