"""Cost-based optimization surface: ANALYZE TABLE statistics must
reach the optimizer (row counts / NDV on the logical plan) and flip
join sides when the size order contradicts the syntactic order —
the catalog-statistics path a 100 TB warehouse runs on."""

import pytest
from pyspark.sql import functions as F

from fabric_claims_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cbo(spark, tmp_path):
    """Two catalog tables with ANALYZE'd statistics and CBO on."""
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    load_table(spark, SF, "orders").write.option(
        "path", str(tmp_path / "o")
    ).saveAsTable("cbo_orders")
    load_table(spark, SF, "nation").write.option(
        "path", str(tmp_path / "n")
    ).saveAsTable("cbo_nation")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")
    before = {
        "cbo": spark.conf.get("spark.sql.cbo.enabled", "false"),
        "reorder": spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false"),
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.cbo.enabled", before["cbo"])
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", before["reorder"])
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql("DROP TABLE IF EXISTS cbo_nation")


def test_analyze_produces_row_and_column_stats(cbo):
    spark = cbo
    rows = spark.sql("DESCRIBE TABLE EXTENDED cbo_orders").collect()
    stats = [r for r in rows if r.col_name == "Statistics"]
    assert stats and "rows" in stats[0].data_type
    col = spark.sql(
        "DESCRIBE TABLE EXTENDED cbo_orders o_orderkey"
    ).collect()
    info = {r.info_name: r.info_value for r in col}
    assert info.get("distinct_count") not in (None, "NULL")


def test_optimizer_sees_catalog_row_counts(cbo):
    spark = cbo
    df = spark.table("cbo_orders")
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    n = spark.table("cbo_orders").count()
    rc = stats.rowCount()
    assert rc.isDefined()
    assert str(rc.get()) == str(n)


def test_cbo_broadcasts_statistically_small_side(cbo):
    """With stats on, the planner must pick the 25-row nation as the
    broadcast build side of an un-hinted join, regardless of
    syntactic order — the decision a 100 TB star schema lives by."""
    spark = cbo
    joined = spark.table("cbo_nation").join(
        spark.table("cbo_orders").withColumn(
            "nk", (F.col("o_orderkey") % 25).cast("int")
        ),
        F.col("n_nationkey") == F.col("nk"),
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "BroadcastHashJoin" in plan
    # The first table relation printed below the BroadcastExchange
    # node must be NATION — i.e. the stats-small side is the one
    # being shipped, not the orders fact (the tree prints an
    # exchange's child immediately beneath it).
    lines = plan.splitlines()
    i = next(
        k for k, ln in enumerate(lines) if "BroadcastExchange" in ln
    )
    first_rel = next(
        ln
        for ln in lines[i + 1 :]
        if "cbo_nation" in ln or "cbo_orders" in ln
    )
    assert "cbo_nation" in first_rel, plan
