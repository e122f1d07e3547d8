"""Bucketed co-located join: the write-time shuffle must eliminate
the join-time exchange (operators/bucketing)."""

from pyspark.sql import functions as F

from fabric_claims_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, df, mode="simple"):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_bucketed_smj_has_no_join_key_exchange(spark, tmp_path):
    for t in ("bt_orders", "bt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(
        spark.read.parquet(f"{SF}/orders.parquet"),
        "bt_orders",
        "o_orderkey",
        8,
        path=str(tmp_path / "o"),
    )
    write_bucketed(
        spark.read.parquet(f"{SF}/lineitem.parquet"),
        "bt_lineitem",
        "l_orderkey",
        8,
        path=str(tmp_path / "l"),
    )
    try:
        j = (
            read_bucketed(spark, "bt_orders")
            .hint("merge")  # pin SMJ: broadcast would hide the claim
            .join(
                read_bucketed(spark, "bt_lineitem").hint("merge"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(spark, j)
        assert "SortMergeJoin" in plan
        # the whole point: neither side shuffles on the join key
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Bucketed: true" in _plan(spark, j, "formatted")
        # and the result is still the plain join's result
        want = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")
