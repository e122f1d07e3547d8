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


def test_point_in_time_join_resolves_per_row_versions(spark, tmp_path):
    from datetime import datetime

    from fabric_claims_spark.operators.scd2 import (
        point_in_time_join,
        scd2_apply,
    )
    from fabric_claims_spark.sources.merge import TableStore

    store = TableStore(spark, str(tmp_path / "pit"))
    snap1 = spark.createDataFrame([(1, "A"), (2, "B")], "k long, seg string")
    snap2 = spark.createDataFrame(
        [(1, "A2"), (2, "B"), (3, "C")], "k long, seg string"
    )
    t0, t1 = datetime(2020, 1, 1), datetime(2020, 6, 1)
    scd2_apply(store, "dim", snap1, "k", ["seg"], t0)
    scd2_apply(store, "dim", snap2, "k", ["seg"], t1)
    hist = store.read("dim")

    facts = spark.createDataFrame(
        [
            (10, 1, datetime(2020, 3, 1)),   # before flip -> A
            (11, 1, datetime(2020, 7, 1)),   # after flip -> A2
            (12, 1, datetime(2020, 6, 1)),   # exactly at flip -> A2
            (13, 2, datetime(2020, 7, 1)),   # unchanged member -> B
            (14, 3, datetime(2020, 3, 1)),   # before member existed -> NULL
            (15, 3, datetime(2020, 8, 1)),   # late-arriving member -> C
        ],
        "fid long, k long, ts timestamp",
    )
    got = {
        r["fid"]: r["seg"]
        for r in point_in_time_join(facts, hist, "k", "ts").collect()
    }
    assert got == {10: "A", 11: "A2", 12: "A2", 13: "B", 14: None, 15: "C"}
    # at most one version matches per fact row (no fan-out)
    assert point_in_time_join(facts, hist, "k", "ts").count() == 6
