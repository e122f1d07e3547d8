"""Observation-API metrics: values must match a standalone aggregate
while riding the write action (no second pass over the data)."""

from pyspark.sql import functions as F

from fabric_claims_spark.pipeline.observe import write_with_metrics
from fabric_claims_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_write_with_metrics_matches_standalone_agg(spark, tmp_path):
    df = load_table(spark, SF, "orders")
    out = str(tmp_path / "obs_orders")
    got = write_with_metrics(
        df,
        lambda d: d.write.mode("overwrite").parquet(out),
        {
            "rows": F.count(F.lit(1)),
            "total_cents": F.sum(
                (F.col("o_totalprice").cast("decimal(18,4)") * 100).cast(
                    "bigint"
                )
            ),
            "max_date": F.max(F.to_date("o_orderdate")),
        },
    )
    want = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,4)") * 100).cast("bigint")
        ).alias("total_cents"),
        F.max(F.to_date("o_orderdate")).alias("max_date"),
    ).first()
    assert got["rows"] == want["rows"]
    assert got["total_cents"] == want["total_cents"]
    assert got["max_date"] == want["max_date"]
    # and the write really landed
    assert spark.read.parquet(out).count() == want["rows"]


def test_observed_metrics_reflect_post_filter_rows(spark, tmp_path):
    """observe() measures the rows that FLOW THROUGH its point in the
    plan — attached after a filter it must count survivors only (the
    property that makes it a correct quality-gate meter)."""
    df = load_table(spark, SF, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    out = str(tmp_path / "obs_urgent")
    got = write_with_metrics(
        df,
        lambda d: d.write.mode("overwrite").parquet(out),
        {"rows": F.count(F.lit(1))},
    )
    assert got["rows"] == df.count()
    assert got["rows"] < load_table(spark, SF, "orders").count()
