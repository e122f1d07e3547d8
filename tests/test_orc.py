"""ORC source/sink: roundtrip fidelity, filter pushdown, and
partition pruning — the Hive-estate interchange path."""

from pyspark.sql import functions as F

from fabric_claims_spark.sources.orc import read_orc, write_orc
from fabric_claims_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _plan(spark, df, mode="formatted"):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_orc_roundtrip_preserves_data(spark, tmp_path):
    src = load_table(spark, SF, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = src.agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))).first()[0]
    b = back.agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))).first()[0]
    assert a == b


def test_orc_filter_pushdown_and_pruning(spark, tmp_path):
    path = str(tmp_path / "li_orc")
    write_orc(load_table(spark, SF, "lineitem"), path)
    df = read_orc(spark, path).where(F.col("l_orderkey") == 1).select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(spark, df)
    assert "PushedFilters" in plan and "l_orderkey" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" not in read_schema


def test_orc_partitioned_write_prunes(spark, tmp_path):
    import os

    path = str(tmp_path / "orders_orc_by_status")
    write_orc(
        load_table(spark, SF, "orders"),
        path,
        partition_by=["o_orderstatus"],
    )
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
    df = read_orc(spark, path).where(F.col("o_orderstatus") == "O")
    plan = _plan(spark, df)
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines and any("O" in ln for ln in scan_lines)
