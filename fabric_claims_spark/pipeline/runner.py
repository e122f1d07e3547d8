"""Master orchestration (PLclaims_master.DataPipeline — SURVEY.md
§3.1). The reference's three chained pipelines with watermark gates
collapse into one Python module in a single Spark application; the
only process boundaries left are driver↔executors and driver↔storage.

Flow per run (C1-C8):

  bronze: source-file mtime > bronze wm?  → quality gate → commit wm
  silver: bronze wm > silver wm?          → star schema  → commit wm
  gold:   silver wm > last gold success?  → upserts + 'Succeeded'
          audit row; otherwise a skip audit row (the reference logs
          'Failed' for the skip path, PL_GOLD:114-150 — preserved).

Retry policy parity: none (retry=0, PL_BRONZE:9-11); idempotent
MERGEs make manual re-runs safe.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import SparkSession

from fabric_claims_spark.pipeline import watermark as wmgate
from fabric_claims_spark.pipeline.bronze import run_bronze
from fabric_claims_spark.pipeline.gold import run_gold
from fabric_claims_spark.pipeline.silver import run_silver
from fabric_claims_spark.sources.audit import append_audit_row, last_gold_success
from fabric_claims_spark.sources.merge import TableStore
from fabric_claims_spark.sources.state import WatermarkStore, file_modified_utc


class ClaimsRunner:
    """One lakehouse root with bronze/silver/gold stores + watermarks."""

    def __init__(self, spark: SparkSession, root: str, clock=None):
        self.spark = spark
        self.root = root
        kwargs = {"clock": clock} if clock else {}
        self.watermarks = WatermarkStore(os.path.join(root, "watermarks"), **kwargs)
        self.bronze = TableStore(spark, os.path.join(root, "bronze"))
        self.silver = TableStore(spark, os.path.join(root, "silver"))
        self.gold = TableStore(spark, os.path.join(root, "gold"))
        self._clock = clock or (lambda: datetime.now(timezone.utc))

    # -- layer runs ---------------------------------------------------------
    def run_bronze(self, csv_path: str) -> dict[str, Any]:
        gate = wmgate.evaluate_gate(
            self.watermarks, wmgate.BRONZE, file_modified_utc(csv_path)
        )
        if not gate.should_run:
            return {"status": "Skipped", "reason": "no new source data", **vars(gate)}
        run_ts = self._clock()
        result = run_bronze(self.spark, self.bronze, csv_path, run_ts=run_ts)
        # Ingest-lineage watermark: the IngestedAt stamp this bronze run
        # used — silver's incremental slice filters on it.
        self.watermarks.write("bronze_ingest", ts=run_ts)
        # Commit AFTER success (I3). The watermark records the upstream
        # version processed (source mtime), NOT wall clock — the
        # reference stamps now() (NB_BRONZE_WM:39-40), which silently
        # mis-gates under clock skew; version lineage cannot.
        self.watermarks.write(wmgate.BRONZE, ts=gate.upstream_ts)
        return result

    def run_silver(self, incremental: bool = False) -> dict[str, Any]:
        gate = wmgate.evaluate_gate(
            self.watermarks, wmgate.SILVER, self.watermarks.read(wmgate.BRONZE)
        )
        if not gate.should_run:
            return {"status": "Skipped", "reason": "bronze not newer", **vars(gate)}
        since = None
        if incremental:
            # Conform only rows bronze ingested after the last silver
            # pass (epoch on first run → full build).
            from datetime import datetime as _dt

            stored = self.watermarks.read("silver_ingest")
            since = _dt.strptime(stored, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
        result = run_silver(
            self.spark,
            self.bronze,
            self.silver,
            run_ts=self._clock(),
            incremental_since=since,
        )
        self.watermarks.write(wmgate.SILVER, ts=gate.upstream_ts)
        if incremental:
            self.watermarks.write(
                "silver_ingest", ts=self.watermarks.read("bronze_ingest")
            )
        return result

    def run_gold(self) -> dict[str, Any]:
        silver_wm = self.watermarks.read(wmgate.SILVER)
        gold_wm = last_gold_success(self.spark, self.gold)
        if not WatermarkStore.is_newer(silver_wm, gold_wm):
            # Skip path logs an audit row (reference logs 'Failed' as
            # its skip marker, PL_GOLD:114-150).
            append_audit_row(
                self.spark,
                self.gold,
                pipeline="claims_gold",
                layer="Gold",
                status="Failed",
                error="skipped: silver watermark not newer",
                wm_before=gold_wm,
                wm_after=gold_wm,
                finished_at=self._clock(),
            )
            return {"status": "Skipped", "reason": "silver not newer"}
        result = run_gold(self.spark, self.silver, self.gold)
        append_audit_row(
            self.spark,
            self.gold,
            pipeline="claims_gold",
            layer="Gold",
            status="Succeeded",
            rows_written=result["rows_written"],
            wm_before=gold_wm,
            wm_after=silver_wm,
            finished_at=self._clock(),
        )
        return result

    # -- master -------------------------------------------------------------
    def run_all(self, csv_path: str, incremental_silver: bool = False) -> dict[str, Any]:
        """PL_MASTER:4-101 — three sequential invokes, each waiting on
        the previous."""
        return {
            "bronze": self.run_bronze(csv_path),
            "silver": self.run_silver(incremental=incremental_silver),
            "gold": self.run_gold(),
        }
