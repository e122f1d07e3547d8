"""Masking / RLS view-factory tests (SURVEY.md §2.12)."""

from pyspark.sql import functions as F

from fabric_claims_spark.plans.governance import (
    mask_hash,
    mask_partial,
    masked_view,
    provider_rls,
)


def test_masked_view(spark):
    df = spark.createDataFrame(
        [("c1", "555-12-3456", 100.0)], "id string, ssn string, amt double"
    )
    out = masked_view(df, {"ssn": lambda c: mask_partial(c, keep_last=4)}).first()
    assert out["ssn"] == "*******3456"
    assert out["amt"] == 100.0  # unmasked columns pass through


def test_mask_hash_join_stable(spark):
    df = spark.createDataFrame([("p1",), ("p1",), ("p2",)], "pid string")
    out = df.select(mask_hash(F.col("pid"), "s").alias("h")).collect()
    assert out[0]["h"] == out[1]["h"] != out[2]["h"]
    assert len(out[0]["h"]) == 64


def test_provider_rls_pushes_filter(spark):
    df = spark.createDataFrame(
        [("a", "prov1"), ("b", "prov2"), ("c", "prov1")],
        "claim string, ProviderID string",
    )
    out = provider_rls(df, ["prov1"])
    rows = out.collect()
    assert {r["claim"] for r in rows} == {"a", "c"}
    assert all(r["ProviderID"] == "prov1" for r in rows)
