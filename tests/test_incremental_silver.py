"""Incremental silver: only newly-ingested bronze rows are conformed;
dims merge without rewriting unchanged members."""

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from fabric_claims_spark.pipeline.runner import ClaimsRunner
from tests.fixtures import write_claims_fixture


class FakeClock:
    def __init__(self, start):
        self.now = start

    def __call__(self):
        self.now += timedelta(minutes=1)
        return self.now


def test_incremental_silver_processes_only_new_batch(spark, tmp_path):
    clock = FakeClock(datetime(2031, 1, 1, tzinfo=timezone.utc))
    runner = ClaimsRunner(spark, str(tmp_path / "lake"), clock=clock)

    csv = tmp_path / "claims.csv"
    exp1 = write_claims_fixture(csv, seed=1)
    r1 = runner.run_all(str(csv), incremental_silver=True)
    assert r1["silver"]["status"] == "Succeeded"
    assert r1["silver"]["rows_processed"]["fact_claims"] == exp1["valid"]
    assert r1["silver"]["fact_inserted"] == exp1["valid"]

    # batch 2: a fresh set of claims (different seed → new ClaimIDs)
    import os

    exp2 = write_claims_fixture(csv, seed=2)
    st = os.stat(csv)
    os.utime(csv, (st.st_atime, st.st_mtime + 3600))
    r2 = runner.run_all(str(csv), incremental_silver=True)

    assert r2["bronze"]["status"] == "Succeeded"
    # fact grew by exactly batch2's valid rows, all as inserts from the
    # incremental slice (batch1 rows were NOT re-conformed)
    assert r2["silver"]["fact_inserted"] == exp2["valid"]
    assert r2["silver"]["rows_processed"]["fact_claims"] == exp1["valid"] + exp2["valid"]

    fact = runner.silver.read("fact_claims")
    assert fact.count() == exp1["valid"] + exp2["valid"]
    # dim_dates written once (static spine)
    assert runner.silver.read("dim_dates").count() == 5844

    # batch1 members kept their original audit stamps (no rewrite):
    # every batch-1 fact row still carries the batch-1 ProcessBatchID
    b1_ids = {r["ProcessBatchID"] for r in fact.select("ProcessBatchID").distinct().collect()}
    assert len(b1_ids) == 2  # one batch id per silver pass
