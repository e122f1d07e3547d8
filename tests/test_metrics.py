"""Metrics layer vs DuckDB oracle on fixture data (SURVEY.md §5 item 5)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from fabric_claims_spark.plans.metrics import report_query, with_time_calc
from fabric_claims_spark.plans.star import star

ROWS = [
    # ClaimID, PatientID, ProviderID, ClaimDate, Amount, Status, Type, Age
    ("c1", "p1", "v1", "2023-01-10", 100.0, "Approved", "Routine", 30),
    ("c2", "p1", "v1", "2023-02-10", 200.0, "Denied", "Emergency", 30),
    ("c3", "p2", "v2", "2023-02-15", 300.0, "Approved", "Inpatient", 40),
    ("c4", "p3", "v2", "2024-01-05", 400.0, "Pending", "Routine", 50),
    ("c5", "p3", "v1", "2024-02-20", 500.0, "Approved", "Urgent Care", 50),
    ("c6", "p4", "v3", "2024-02-25", 600.0, "Partial", "Outpatient", 60),
]
SCHEMA = (
    "ClaimID string, PatientID string, ProviderID string, ClaimDate string, "
    "ClaimAmount double, ClaimStatus string, ClaimType string, PatientAge int"
)


@pytest.fixture(scope="module")
def claims(spark):
    return spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "ClaimDate", F.to_date("ClaimDate")
    )


def test_report_query_matches_duckdb(claims):
    got = {
        r["ClaimStatus"]: r
        for r in report_query(
            claims,
            dims=["ClaimStatus"],
            measure_names=["total_claims", "total_amount", "unique_patients"],
        ).collect()
    }
    con = duckdb.connect()
    con.register("claims", claims.toPandas())
    want = con.execute(
        """SELECT ClaimStatus, COUNT(*) n, SUM(ClaimAmount) amt,
                  COUNT(DISTINCT PatientID) up
           FROM claims GROUP BY 1"""
    ).fetchall()
    for status, n, amt, up in want:
        assert got[status]["total_claims"] == n
        assert got[status]["total_amount"] == pytest.approx(amt)
        assert got[status]["unique_patients"] == up


def test_filtered_measures_and_rates(claims):
    row = report_query(
        claims,
        dims=[],
        measure_names=["approved_claims", "approved_amount", "approval_rate",
                       "routine_claims", "pending_rate"],
    ).collect()[0]
    assert row["approved_claims"] == 3
    assert row["approved_amount"] == 900.0
    assert row["approval_rate"] == pytest.approx(0.5)
    assert row["routine_claims"] == 2
    assert row["pending_rate"] == pytest.approx(1 / 6)


def test_divide_null_on_empty(claims):
    """DIVIDE → NULL (not 0, not error) when the filter empties the
    denominator context."""
    row = report_query(
        claims,
        dims=[],
        measure_names=["approval_rate"],
        slicers=F.col("ClaimStatus") == "NoSuchStatus",
    ).collect()[0]
    assert row["approval_rate"] is None


def test_time_calc_group(claims, spark):
    monthly = claims.groupBy(
        F.year("ClaimDate").alias("Year"), F.month("ClaimDate").alias("Month")
    ).agg(F.sum("ClaimAmount").alias("amount"))
    out = {
        (r["Year"], r["Month"]): r
        for r in with_time_calc(monthly, "amount").collect()
    }
    # YTD resets per year
    assert out[(2023, 2)]["amount_ytd"] == 600.0  # 100 + (200+300)
    assert out[(2024, 2)]["amount_ytd"] == 1500.0  # 400 + (500+600)
    # LY: Feb-2024 vs Feb-2023
    assert out[(2024, 2)]["amount_ly"] == 500.0
    assert out[(2024, 2)]["amount_yoy_delta"] == 600.0
    assert out[(2024, 2)]["amount_yoy_pct"] == pytest.approx(600 / 500)
    # first year has no LY → NULLs preserved
    assert out[(2023, 1)]["amount_ly"] is None
    assert out[(2023, 1)]["amount_yoy_pct"] is None
    # L12M at Feb-2024 covers Mar-2023..Feb-2024
    assert out[(2024, 2)]["amount_l12m"] == 1500.0
    # QTD resets at each quarter boundary: Feb accumulates Jan+Feb
    # (same Q1), and a Q-boundary month restarts at its own value
    assert out[(2023, 2)]["amount_qtd"] == 600.0  # Jan+Feb 2023 (Q1)
    assert out[(2024, 1)]["amount_qtd"] == 400.0
    assert out[(2024, 2)]["amount_qtd"] == 1500.0
    # MTD at month grain is the month's own value
    assert out[(2024, 2)]["amount_mtd"] == 1100.0


def test_star_builder_no_duplicate_keys(spark, claims):
    dates = spark.createDataFrame(
        [("2023-01-10",), ("2023-02-10",), ("2023-02-15",),
         ("2024-01-05",), ("2024-02-20",), ("2024-02-25",)],
        "Date string",
    ).withColumn("Date", F.to_date("Date")).withColumn("Year", F.year("Date"))
    patients = spark.createDataFrame(
        [("p1", "F"), ("p2", "M"), ("p3", "F"), ("p4", "U")],
        "PatientID string, PatientGender string",
    )
    joined = star(
        claims,
        {
            "date": (dates, "ClaimDate", "Date"),
            "patient": (patients, "PatientID", "PatientID"),
        },
    )
    assert joined.columns.count("PatientID") == 1
    assert joined.count() == 6
    assert joined.where(F.col("PatientGender").isNull()).count() == 0


def test_status_calc_group_all_and_items(claims):
    """Claim Status calc group (Claim Status.tmdl:5-13): All recomputes
    the selected measures unfiltered; each item under KEEPFILTERS —
    including a non-additive DISTINCTCOUNT — and non-item statuses
    ('Partial') feed only All."""
    from fabric_claims_spark.plans.metrics import with_status_calc

    out = {
        r["claim_status"]: r
        for r in report_query(
            with_status_calc(claims),
            dims=["claim_status"],
            measure_names=["total_claims", "total_amount", "unique_patients"],
        ).collect()
    }
    assert set(out) == {"All", "Approved", "Denied", "Pending"}
    assert out["All"]["total_claims"] == 6
    assert out["All"]["total_amount"] == 2100.0
    assert out["All"]["unique_patients"] == 4
    assert out["Approved"]["total_claims"] == 3
    assert out["Approved"]["total_amount"] == 900.0
    assert out["Approved"]["unique_patients"] == 3  # p1,p2,p3 — not 3 rows' worth
    assert out["Pending"]["total_claims"] == 1
    assert out["Denied"]["total_amount"] == 200.0


def test_status_calc_keepfilters_composes_with_slicers(claims):
    """KEEPFILTERS = intersect with existing filter context: slicer
    Type=Routine ∧ item Approved must yield only c1."""
    from fabric_claims_spark.plans.metrics import with_status_calc

    out = {
        r["claim_status"]: r
        for r in report_query(
            with_status_calc(claims),
            dims=["claim_status"],
            measure_names=["total_claims", "total_amount"],
            slicers=F.col("ClaimType") == "Routine",
        ).collect()
    }
    assert out["All"]["total_claims"] == 2  # c1, c4
    assert out["Approved"]["total_amount"] == 100.0  # just c1
    assert "Denied" not in out  # no Routine+Denied rows anywhere


def test_status_calc_stacks_with_time_calc(claims):
    """Both calc groups together: each status slice gets its own
    independent YTD/LY series (extra_keys partitioning)."""
    from fabric_claims_spark.plans.metrics import with_status_calc

    monthly = (
        with_status_calc(claims)
        .groupBy(
            "claim_status",
            F.year("ClaimDate").alias("Year"),
            F.month("ClaimDate").alias("Month"),
        )
        .agg(F.sum("ClaimAmount").alias("amount"))
    )
    out = {
        (r["claim_status"], r["Year"], r["Month"]): r
        for r in with_time_calc(
            monthly, "amount", extra_keys=["claim_status"]
        ).collect()
    }
    # Approved: 2023 = 100 (Jan) + 300 (Feb); 2024 = 500 (Feb)
    assert out[("Approved", 2023, 2)]["amount_ytd"] == 400.0
    assert out[("Approved", 2024, 2)]["amount_ly"] == 300.0
    # All slice reproduces the unsliced series
    assert out[("All", 2023, 2)]["amount_ytd"] == 600.0
    assert out[("All", 2024, 2)]["amount_ly"] == 500.0
    # Pending exists only in 2024 → its LY is NULL, not another slice's
    assert out[("Pending", 2024, 1)]["amount_ly"] is None
    # L12M stays within the slice: Mar-2023..Feb-2024 Approved = just 500
    assert out[("Approved", 2024, 2)]["amount_l12m"] == 500.0


def test_yoy_gap_query_actually_exercises_missing_ly(spark):
    """The year-boundary corner must be non-vacuous: the sparse month
    grid has mid-series months (year > first year) whose LY month is
    absent, and for every such row with_time_calc keeps LY, YoY delta
    and YoY pct NULL — never coalesced to 0."""
    from fabric_claims_spark.queries import load_all_queries

    out = load_all_queries()["yoy_gap_ly_null_semantics"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    first_year = min(r["order_year"] for r in out)
    gap_rows = [
        r for r in out
        if r["order_year"] > first_year and r["revenue_ly"] is None
    ]
    assert gap_rows, "sparse grid produced no mid-series LY gap"
    for r in gap_rows:
        assert r["yoy_delta"] is None
        assert r["yoy_pct"] is None
        assert r["yoy_pct_is_null"] is True
    # and rows WITH an LY sibling do produce a ratio
    assert any(
        r["yoy_pct"] is not None for r in out
        if r["order_year"] > first_year
    )
