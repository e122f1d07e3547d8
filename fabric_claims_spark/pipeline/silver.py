"""Silver star-schema conformance dataflow (NBclaims_silver.Notebook/
notebook-content.py, SURVEY.md §3.1 silver stage).

claims_clean → dim_patients, dim_providers, dim_dates, fact_claims:

* dims: projection → full-row DISTINCT → key-dedup → salted SHA-256
  pseudonymization of the natural key (PII never reaches silver).
* dim_dates: bounded 2015→2030 spine with surrogate DateID.
* fact: hashed FKs + audit columns, MERGE-keyed on ClaimID.

Scale notes: dims are overwrite (small, fully derivable); the fact is
an idempotent keyed MERGE. The input scan is cached across the four
derivations (NB_SILVER:70-75 does the same).
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fabric_claims_spark.functions.dates import date_spine
from fabric_claims_spark.functions.hashing import pseudonymize
from fabric_claims_spark.pipeline.bronze import CLEAN_TABLE
from fabric_claims_spark.sources.merge import TableStore

DEFAULT_SALT = "healthcare_secure_salt_2024"  # NB_SILVER:51

DIM_PATIENTS = "dim_patients"
DIM_PROVIDERS = "dim_providers"
DIM_DATES = "dim_dates"
FACT_CLAIMS = "fact_claims"


def _audit_cols(df: DataFrame, run_ts: datetime, batch_id: str) -> DataFrame:
    """CreatedDate/ModifiedDate/ProcessBatchID stamps
    (NB_SILVER:179-193)."""
    ts = F.lit(run_ts).cast("timestamp")
    return (
        df.withColumn("CreatedDate", ts)
        .withColumn("ModifiedDate", ts)
        .withColumn("ProcessBatchID", F.lit(batch_id))
    )


def run_silver(
    spark: SparkSession,
    bronze_store: TableStore,
    silver_store: TableStore,
    salt: str = DEFAULT_SALT,
    run_ts: datetime | None = None,
    batch_id: str | None = None,
    incremental_since: datetime | None = None,
) -> dict[str, Any]:
    """Full rebuild (reference behavior: dims overwritten,
    NB_SILVER:218-228) or, with ``incremental_since``, a delta pass:
    only bronze rows with ``IngestedAt > since`` are conformed, and
    dims MERGE instead of overwrite. At 100 TB the incremental path is
    the only viable one — the full path rescans the entire clean table
    every run. The filter on IngestedAt pushes to the scan."""
    if not bronze_store.exists(CLEAN_TABLE):
        # Fail-fast existence check (NB_SILVER:67-68).
        raise FileNotFoundError(f"bronze table {CLEAN_TABLE} not found")

    run_ts = run_ts or datetime.now(timezone.utc)
    batch_id = batch_id or str(uuid.uuid4())
    claims = bronze_store.read(CLEAN_TABLE)
    if incremental_since is not None:
        claims = claims.where(
            F.col("IngestedAt") > F.lit(incremental_since).cast("timestamp")
        )
    claims = claims.cache()

    dim_patients = _audit_cols(
        claims.select(
            "PatientID",
            "PatientAge",
            "PatientGender",
            "PatientMaritalStatus",
            "PatientEmploymentStatus",
        )
        .distinct()
        .dropDuplicates(["PatientID"])
        .withColumn("PatientID", pseudonymize("PatientID", salt)),
        run_ts,
        batch_id,
    )

    dim_providers = _audit_cols(
        claims.select("ProviderID", "ProviderSpecialty", "ProviderLocation")
        .distinct()
        .dropDuplicates(["ProviderID"])
        .withColumn("ProviderID", pseudonymize("ProviderID", salt)),
        run_ts,
        batch_id,
    )

    dim_dates = _audit_cols(date_spine(spark), run_ts, batch_id)

    fact_claims = _audit_cols(
        claims.select(
            "ClaimID",
            pseudonymize("PatientID", salt).alias("PatientID"),
            pseudonymize("ProviderID", salt).alias("ProviderID"),
            "ClaimDate",
            "ClaimAmount",
            "DiagnosisCode",
            "ProcedureCode",
            "ClaimStatus",
            "ClaimType",
            "ClaimSubmissionMethod",
        ),
        run_ts,
        batch_id,
    )

    if incremental_since is not None:
        # Delta pass: dims merge-by-key — change detection restricted
        # to business attributes so audit stamps don't rewrite
        # unchanged members; the bounded date spine is static.
        silver_store.merge(
            DIM_PATIENTS,
            dim_patients,
            keys=["PatientID"],
            compare_cols=[
                "PatientAge",
                "PatientGender",
                "PatientMaritalStatus",
                "PatientEmploymentStatus",
            ],
        )
        silver_store.merge(
            DIM_PROVIDERS,
            dim_providers,
            keys=["ProviderID"],
            compare_cols=["ProviderSpecialty", "ProviderLocation"],
        )
        if not silver_store.exists(DIM_DATES):
            silver_store.overwrite(DIM_DATES, dim_dates)
    else:
        silver_store.overwrite(DIM_PATIENTS, dim_patients)
        silver_store.overwrite(DIM_PROVIDERS, dim_providers)
        silver_store.overwrite(DIM_DATES, dim_dates)
    fact_stats = silver_store.merge(
        FACT_CLAIMS,
        fact_claims,
        keys=["ClaimID"],
        compare_cols=[
            "PatientID",
            "ProviderID",
            "ClaimDate",
            "ClaimAmount",
            "DiagnosisCode",
            "ProcedureCode",
            "ClaimStatus",
            "ClaimType",
            "ClaimSubmissionMethod",
        ],
    )

    # current-version row counts from parquet footer metadata (round
    # 14, guide §1.2/§5): four read().count() jobs on tables this run
    # just wrote re-paid full job scheduling for numbers the footers
    # already hold (Delta stores keep the Spark count inside
    # count_rows)
    metrics = {
        "dim_patients": silver_store.count_rows(DIM_PATIENTS),
        "dim_providers": silver_store.count_rows(DIM_PROVIDERS),
        "dim_dates": silver_store.count_rows(DIM_DATES),
        "fact_claims": silver_store.count_rows(FACT_CLAIMS),
    }
    claims.unpersist()
    return {
        "status": "Succeeded",
        "run_id": batch_id,
        "rows_processed": metrics,
        "fact_inserted": fact_stats.inserted,
        "fact_updated": fact_stats.updated,
    }
