"""SCD2 history-preserving dimension tests."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from fabric_claims_spark.operators.scd2 import (
    as_of_view,
    current_view,
    scd2_apply,
)
from fabric_claims_spark.sources.merge import TableStore

T1 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T2 = datetime(2024, 6, 1, tzinfo=timezone.utc)
T3 = datetime(2024, 9, 1, tzinfo=timezone.utc)


def _df(spark, rows):
    return spark.createDataFrame(rows, "pid string, specialty string, city string")


def test_scd2_lifecycle(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))

    s1 = scd2_apply(
        store, "dim", _df(spark, [("p1", "cardio", "boston"), ("p2", "onco", "austin")]),
        key="pid", attrs=["specialty", "city"], effective_ts=T1,
    )
    assert (s1.new_members, s1.changed_members) == (2, 0)

    # p1 moves city; p3 appears; p2 unchanged
    s2 = scd2_apply(
        store, "dim",
        _df(spark, [("p1", "cardio", "denver"), ("p2", "onco", "austin"),
                    ("p3", "peds", "miami")]),
        key="pid", attrs=["specialty", "city"], effective_ts=T2,
    )
    assert (s2.new_members, s2.changed_members) == (1, 1)

    hist = store.read("dim")
    assert hist.count() == 4  # p1×2 versions + p2 + p3
    cur = {r["pid"]: r for r in current_view(store, "dim").collect()}
    assert cur["p1"]["city"] == "denver"
    assert len(cur) == 3

    # the closed p1 row carries the full validity interval
    closed = hist.where((F.col("pid") == "p1") & ~F.col("is_current")).first()
    assert closed["city"] == "boston"
    assert closed["valid_to"] == T2.replace(tzinfo=None) or closed["valid_to"] is not None

    # point-in-time: between T1 and T2 p1 was still in boston, no p3
    asof = {r["pid"]: r for r in as_of_view(store, "dim", datetime(2024, 3, 1, tzinfo=timezone.utc)).collect()}
    assert asof["p1"]["city"] == "boston"
    assert "p3" not in asof

    # idempotency: re-applying the same snapshot is a no-op
    s3 = scd2_apply(
        store, "dim",
        _df(spark, [("p1", "cardio", "denver"), ("p2", "onco", "austin"),
                    ("p3", "peds", "miami")]),
        key="pid", attrs=["specialty", "city"], effective_ts=T3,
    )
    assert (s3.new_members, s3.changed_members) == (0, 0)
    assert store.read("dim").count() == 4
