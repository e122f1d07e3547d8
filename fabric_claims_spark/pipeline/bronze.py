"""Bronze quality-gate dataflow (NBclaims_bronze.Notebook/
notebook-content.py — the reference's richest single dataflow,
SURVEY.md §3.2).

One permissive scan fans out into four disjoint outputs:

  raw ─┬─ malformed (CorruptRecord captured, 90-day retention)
       ├─ duplicates (rank>1 by ClaimID latest-ClaimDate, 180-day)
       ├─ bad_quality (any of 9 DQ rules, ';' reasons, 365-day)
       └─ claims_clean (MERGE-or-create keyed on ClaimID)

Split invariant: |raw| = |malformed| + |dupes| + |bad| + |clean|.

Scale notes: the scan is cached once and feeds all four branches
(reference caches the same way, NB_BRONZE:193-196); the only shuffle
is the dedup window's hash partition on ClaimID; reject writes are
appends; the clean write is a keyed MERGE so re-runs are idempotent.
"""

from __future__ import annotations

import uuid
from datetime import datetime
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fabric_claims_spark.operators.partitioning import spread
from fabric_claims_spark.operators.quality import (
    REASON_COL,
    claims_rules,
    with_reasons,
)
from fabric_claims_spark.schemas import CORRUPT_COL
from fabric_claims_spark.sources.csv import read_claims_csv
from fabric_claims_spark.sources.merge import TableStore

MALFORMED_TABLE = "malformed_claims"
DUPES_TABLE = "dupe_claims"
BAD_TABLE = "data_quality_claims"
CLEAN_TABLE = "claims_clean"

# Quarantine retention windows in days (NB_BRONZE:97,126,171).
RETENTION = {"malformed": 90, "dupes": 180, "bad": 365}


def _lineage(df: DataFrame, run_ts: datetime | None, batch_id: str) -> DataFrame:
    """System columns (NB_BRONZE:83-85): ingest timestamp, source file,
    batch id. run_ts injectable for deterministic tests (F15)."""
    ingested = F.lit(run_ts).cast("timestamp") if run_ts else F.current_timestamp()
    return (
        df.withColumn("IngestedAt", ingested)
        .withColumn("SourceFile", F.input_file_name())
        .withColumn("ProcessBatchID", F.lit(batch_id))
    )


def run_bronze(
    spark: SparkSession,
    store: TableStore,
    csv_path: str,
    run_ts: datetime | None = None,
    batch_id: str | None = None,
) -> dict[str, Any]:
    """Execute the quality gate on a CSV landing path; returns the
    exit-metrics payload (NB_BRONZE:260-287 parity)."""
    return run_bronze_on_df(
        spark, store, read_claims_csv(spark, csv_path), run_ts, batch_id
    )


def run_bronze_on_df(
    spark: SparkSession,
    store: TableStore,
    raw_df: DataFrame,
    run_ts: datetime | None = None,
    batch_id: str | None = None,
) -> dict[str, Any]:
    """The quality gate itself — shared by the batch runner and the
    streaming foreachBatch twin (streaming/bronze_stream.py)."""
    batch_id = batch_id or str(uuid.uuid4())

    # A single landing CSV parses into very few input partitions;
    # spread() redistributes ONLY in that case — a many-split scan (the
    # 100 TB landing) keeps its native partitioning instead of paying a
    # full shuffle and being capped down to defaultParallelism.
    raw = spread(_lineage(raw_df, run_ts, batch_id))
    # PERMISSIVE corrupt-column filters require materialization first
    # (Spark restriction); the reference caches here too for the
    # multi-branch fan-out (NB_BRONZE:193-196).
    raw = raw.cache()
    # One aggregate pass materializes the cache AND yields both counts
    # (total + malformed) — separate .count() actions would each cost a
    # full pass whenever the cache is evicted or doesn't fit.
    head = raw.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col(CORRUPT_COL).isNotNull().cast("long")).alias("malformed"),
    ).first()
    total_rows = int(head["total"])

    retention = lambda days: F.date_add(F.current_date(), days)  # noqa: E731

    malformed = raw.where(F.col(CORRUPT_COL).isNotNull()).withColumn(
        "RetentionDate", retention(RETENTION["malformed"])
    )
    clean_shape = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)

    # Evaluate the dedup window AND the 9-rule reason array in ONE
    # tagged projection, then cache it: each downstream branch (dupes /
    # bad / good) is a cheap filter of the cached rows instead of
    # re-running the shuffle + regex per branch (the reference fans out
    # filters from the raw cache and pays the window twice per sink).
    w_rank = Window.partitionBy("ClaimID").orderBy(
        # ClaimDate desc, deterministic tie-breakers (risk-register fix
        # for the reference's date-only ordering).
        F.col("ClaimDate").desc_nulls_last(),
        F.col("IngestedAt").desc_nulls_last(),
        F.col("PatientID").asc_nulls_last(),
    )
    tagged = with_reasons(
        clean_shape.withColumn("_rn", F.row_number().over(w_rank)), claims_rules()
    ).cache()

    dupes = (
        tagged.where(F.col("_rn") > 1)
        .drop("_rn", REASON_COL, "_has_violation")
        .withColumn("RetentionDate", retention(RETENTION["dupes"]))
    )
    bad = (
        tagged.where((F.col("_rn") == 1) & F.col("_has_violation"))
        .drop("_rn", "_has_violation")
        .withColumn("RetentionDate", retention(RETENTION["bad"]))
    )
    good = tagged.where((F.col("_rn") == 1) & ~F.col("_has_violation")).drop(
        "_rn", REASON_COL, "_has_violation"
    )

    # Branch counts in ONE aggregate over the tagged cache (the three
    # branch predicates are disjoint filters of the same rows); with
    # the malformed count from the head aggregate this replaces four
    # per-branch .count() jobs — at scale, four potential rescans.
    tails = tagged.agg(
        F.sum((F.col("_rn") > 1).cast("long")).alias("duplicates"),
        F.sum(((F.col("_rn") == 1) & F.col("_has_violation")).cast("long")).alias(
            "bad_quality"
        ),
        F.sum(((F.col("_rn") == 1) & ~F.col("_has_violation")).cast("long")).alias(
            "valid"
        ),
    ).first()
    counts = {
        "malformed": int(head["malformed"] or 0),
        "duplicates": int(tails["duplicates"] or 0),
        "bad_quality": int(tails["bad_quality"] or 0),
        "valid": int(tails["valid"] or 0),
    }

    store.append(MALFORMED_TABLE, malformed)
    store.append(DUPES_TABLE, dupes)
    store.append(BAD_TABLE, bad)
    # Change detection scoped to business columns: an identical
    # re-delivery keeps the original lineage stamps (first-seen
    # IngestedAt survives, updated=0, and silver's incremental slice
    # stays empty) while genuinely-changed rows still update.
    business_cols = [
        c
        for c in good.columns
        if c not in ("IngestedAt", "SourceFile", "ProcessBatchID")
    ]
    merge_stats = store.merge(
        CLEAN_TABLE, good, keys=["ClaimID"], compare_cols=business_cols
    )

    tagged.unpersist()
    raw.unpersist()
    return {
        "status": "Succeeded",
        "run_id": batch_id,
        "rows_processed": total_rows,
        "quality_metrics": counts,
        "clean_inserted": merge_stats.inserted,
        "clean_updated": merge_stats.updated,
    }
