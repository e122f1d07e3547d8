"""End-to-end medallion pipeline golden test (SURVEY.md §5 item 3):
bronze → silver → gold through the master runner, plus watermark
skip behavior and gold upsert accounting."""

import hashlib
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from fabric_claims_spark.pipeline.runner import ClaimsRunner
from fabric_claims_spark.pipeline.silver import DEFAULT_SALT
from fabric_claims_spark.sources.audit import AUDIT_TABLE
from tests.fixtures import write_claims_fixture


class FakeClock:
    """Deterministic, strictly-increasing UTC clock."""

    def __init__(self, start: datetime):
        self.now = start

    def __call__(self) -> datetime:
        self.now += timedelta(minutes=1)
        return self.now


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    expected = write_claims_fixture(tmp / "claims.csv")
    clock = FakeClock(datetime(2030, 1, 1, 2, 0, 0, tzinfo=timezone.utc))
    runner = ClaimsRunner(spark, str(tmp / "lake"), clock=clock)
    result = runner.run_all(str(tmp / "claims.csv"))
    return runner, result, expected, tmp


def test_all_layers_ran(pipeline):
    runner, result, expected, _ = pipeline
    assert result["bronze"]["status"] == "Succeeded"
    assert result["silver"]["status"] == "Succeeded"
    assert result["gold"]["Claims"]["inserted"] == expected["valid"]
    assert result["gold"]["Dates"]["inserted"] == 5844


def test_silver_star_schema(pipeline):
    runner, result, expected, _ = pipeline
    dims = result["silver"]["rows_processed"]
    assert dims["fact_claims"] == expected["valid"]
    assert dims["dim_dates"] == 5844  # 2015-01-01 → 2030-12-31
    assert dims["dim_patients"] <= expected["valid"]

    fact = runner.silver.read("fact_claims")
    pat = runner.silver.read("dim_patients")
    # hashed IDs: 64-char lowercase hex, stable across fact and dim
    row = pat.select("PatientID").first()
    assert len(row["PatientID"]) == 64
    assert int(row["PatientID"], 16) >= 0
    # referential integrity: every fact FK resolves in the dim
    orphans = fact.join(pat, "PatientID", "left_anti").count()
    assert orphans == 0


def test_hash_is_salted_sha256(pipeline):
    runner, _, _, _ = pipeline
    fact = runner.silver.read("fact_claims")
    clean = runner.bronze.read("claims_clean")
    src = clean.select("ClaimID", "PatientID").first()
    expected_hash = hashlib.sha256(
        (src["PatientID"] + DEFAULT_SALT).encode()
    ).hexdigest()
    got = fact.where(F.col("ClaimID") == src["ClaimID"]).first()["PatientID"]
    assert got == expected_hash


def test_gold_claims_amount_widened_to_double(pipeline):
    runner, _, _, _ = pipeline
    gold_claims = runner.gold.read("Claims")
    assert dict(gold_claims.dtypes)["ClaimAmount"] == "double"
    bronze_clean = runner.bronze.read("claims_clean")
    assert dict(bronze_clean.dtypes)["ClaimAmount"] == "decimal(18,2)"


def test_second_run_skips_everywhere(pipeline):
    """I1-I4: unchanged source → every layer gates out; gold logs the
    skip audit row (reference logs 'Failed' for skips)."""
    runner, _, _, tmp = pipeline
    result2 = runner.run_all(str(tmp / "claims.csv"))
    assert result2["bronze"]["status"] == "Skipped"
    assert result2["silver"]["status"] == "Skipped"
    assert result2["gold"]["status"] == "Skipped"
    audit = runner.gold.read(AUDIT_TABLE)
    assert audit.where(F.col("Status") == "Failed").count() == 1
    assert audit.where(F.col("Status") == "Succeeded").count() == 1


def test_changed_source_reruns_and_updates(pipeline, spark):
    """Re-delivered batch with one changed row → bronze MERGE updates
    exactly that row; gold counts 1 update (SP @@ROWCOUNT parity)."""
    runner, _, expected, tmp = pipeline
    csv = tmp / "claims.csv"
    content = csv.read_text().splitlines()
    # flip one valid row's status Approved<->Denied deterministically
    for i in range(1, len(content)):
        cols = content[i].split(",")
        if len(cols) == 17 and cols[10] == "Approved" and "-" in cols[0] and len(cols[0]) == 36:
            cols[10] = "Denied"
            content[i] = ",".join(cols)
            changed_id = cols[0]
            break
    csv.write_text("\n".join(content) + "\n")
    # bump mtime well past the processed version so the gate re-opens
    # regardless of test speed (second-granularity mtimes)
    import os

    st = os.stat(csv)
    os.utime(csv, (st.st_atime, st.st_mtime + 3600))

    result = runner.run_all(str(csv))
    assert result["bronze"]["status"] == "Succeeded"
    assert result["bronze"]["clean_inserted"] == 0
    assert result["bronze"]["clean_updated"] >= 1
    assert result["gold"]["Claims"]["inserted"] == 0
    assert result["gold"]["Claims"]["updated"] == 1
    gold_row = (
        runner.gold.read("Claims").where(F.col("ClaimID") == changed_id).first()
    )
    assert gold_row["ClaimStatus"] == "Denied"
