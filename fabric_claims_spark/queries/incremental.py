"""Incremental / streaming-equivalent operators (SURVEY.md §2.9, S6).

The reference's incrementality is a watermark protocol: scalar
max-timestamp lookups gating layer runs (PL_GOLD:54-96), and
late/duplicate re-deliveries resolved latest-by-key via MERGE
(NB_BRONZE:119-126 + SP_UPSERT). These queries express the dataflow
half of that protocol over the ``events`` table; the control-plane
half (state docs, skip logic) lives in ``pipeline/watermark.py``.

events.ts is nanosecond-precision parquet; Spark truncates to µs on
read while DuckDB keeps ns — every surfaced timestamp is explicitly
truncated to the second so both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fabric_claims_spark.operators.joins import asof_join_backward
from fabric_claims_spark.localframe import local_frame
from fabric_claims_spark.queries import query
from fabric_claims_spark.queries._util import dsum, money
from fabric_claims_spark.sources.parquet import load_table


# --------------------------------------------------------------------------
# S6/A11 — audit-log watermark lookup: COALESCE(MAX(ts), epoch) with a
# status filter (PL_GOLD:74). The second column exercises the
# empty-set → epoch fallback.
@query(
    "watermark_max_lookup",
    oracle="""
    SELECT
      CAST(COALESCE(date_trunc('second', MAX(CASE WHEN event_type = 'purchase' THEN ts END)),
                    TIMESTAMP '1970-01-01 00:00:00') AS TIMESTAMP) AS purchase_watermark,
      CAST(COALESCE(date_trunc('second', MAX(CASE WHEN event_type = 'no_such_type' THEN ts END)),
                    TIMESTAMP '1970-01-01 00:00:00') AS TIMESTAMP) AS missing_watermark
    FROM events
    """,
)
def watermark_max_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")

    def wm(etype: str):
        return F.coalesce(
            F.date_trunc(
                "second", F.max(F.when(F.col("event_type") == etype, F.col("ts")))
            ),
            epoch,
        )

    return e.agg(
        wm("purchase").alias("purchase_watermark"),
        wm("no_such_type").alias("missing_watermark"),
    )


# --------------------------------------------------------------------------
# I-ops streaming equivalent — tumbling-window aggregation (the batch
# twin of readStream + window(ts, '1 hour'); the streaming runner in
# streaming/ executes the same grouping with withWatermark).
@query(
    "events_hourly_tumbling",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS event_count,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            dsum(money("value")).alias("value_sum"),
        )
    )


# --------------------------------------------------------------------------
# I5/S10 — late/duplicate delivery resolution: latest-by-key state
# (MERGE "latest wins", NB_BRONZE:119-126 + SP_UPSERT upsert). The
# whole events history collapses to one current row per user.
@query(
    "state_latest_per_user",
    oracle="""
    SELECT user_id, event_type AS last_event_type,
           value AS last_value,
           CAST(date_trunc('second', ts) AS TIMESTAMP) AS last_ts
    FROM events
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def state_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.date_trunc("second", F.col("ts")).alias("last_ts"),
        )
    )


# --------------------------------------------------------------------------
# As-of (backward) join — the custom temporal operator Spark lacks
# natively (operators/joins.asof_join_backward: union + carry-forward
# window, one shuffle, no range explosion). For every view event, the
# user's most recent purchase value at-or-before that moment.
@query(
    "events_asof_last_purchase",
    oracle="""
    SELECT v.event_id, v.user_id, p.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join_backward(
        views, purchases, key="user_id", ts="ts", right_value_cols=["value"]
    )
    return joined.select("event_id", "user_id", F.col("asof_value"))


# --------------------------------------------------------------------------
# Forward as-of join — the mirror feature: for each view, the value
# of the NEXT purchase at-or-after it in the same user's stream
# (time-to-next-event / next-slot features). The right side is
# pre-deduplicated to one row per (user, ts) — arg_min by event_id —
# so the as-of tie contract is deterministic in both engines.
@query(
    "events_asof_next_purchase",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, arg_min(value, event_id) AS value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
    v AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'view')
    SELECT v.event_id, v.user_id, p.value AS asof_value
    FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
)
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.operators.joins import asof_join_forward

    e = load_table(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min_by("value", "event_id").alias("value"))
    )
    joined = asof_join_forward(
        views, purchases, key="user_id", ts="ts", right_value_cols=["value"]
    )
    return joined.select("event_id", "user_id", F.col("asof_value"))


# --------------------------------------------------------------------------
# I2 — layer-to-layer change propagation: rows newer than a stored
# watermark (the dataflow side of PL_SILVER:110-124's gate). Filter
# pushes to the parquet scan (PushedFilters in explain).
@query(
    "incremental_slice_after_watermark",
    oracle="""
    SELECT event_type, COUNT(*) AS new_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM events
    WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
    GROUP BY event_type
    """,
)
def incremental_slice_after_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt
    import os

    # Filter in the SOURCE domain: a predicate on a converted/cast
    # timestamp cannot push past the conversion expression, so compare
    # in the column's native on-disk type (raw int64 nanos for legacy
    # TIMESTAMP(NANOS) files, TIMESTAMP_NTZ for timestamp[us] files).
    # Either way the comparison reaches the parquet scan (row-group
    # pruning at scale); any relabeling happens after the filter.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        wm_ns = int(
            _dt.datetime(2024, 1, 25, tzinfo=_dt.timezone.utc).timestamp()
            * 1_000_000_000
        )
        gate = F.col("ts") > F.lit(wm_ns)
    elif ts_type == "timestamp_ntz":
        gate = F.col("ts") > F.expr("TIMESTAMP_NTZ '2024-01-25 00:00:00'")
    else:
        gate = F.col("ts") > F.expr("TIMESTAMP '2024-01-25 00:00:00'")
    return (
        raw.where(gate)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("new_events"),
            F.countDistinct("user_id").alias("active_users"),
        )
    )

# --------------------------------------------------------------------------
# SCD Type-2 dimension history (operators/scd2.py) as a hash-checked
# query: snapshot 1 loads ~90% of customers, snapshot 2 re-delivers
# all of them with a deterministic attribute change (negative-balance
# members move to segment 'MIGRATED') — so the resulting history
# exercises all three SCD2 arms at once: unchanged members keep their
# open row, changed members get a closed row + a new version, and the
# held-out 10% arrive as brand-new members. The oracle reconstructs
# the exact same history declaratively.
_SCD2_T0 = "2024-01-01 00:00:00"
_SCD2_T1 = "2024-04-01 00:00:00"


@query(
    "scd2_customer_history",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           TIMESTAMP '{_SCD2_T0}' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to,
           CAST(1 AS BIGINT) AS is_current
    FROM customer WHERE c_custkey % 10 != 0 AND c_acctbal >= 0
    UNION ALL
    SELECT c_custkey, c_mktsegment,
           TIMESTAMP '{_SCD2_T0}', TIMESTAMP '{_SCD2_T1}', 0
    FROM customer WHERE c_custkey % 10 != 0 AND c_acctbal < 0
    UNION ALL
    SELECT c_custkey, 'MIGRATED',
           TIMESTAMP '{_SCD2_T1}', CAST(NULL AS TIMESTAMP), 1
    FROM customer WHERE c_custkey % 10 != 0 AND c_acctbal < 0
    UNION ALL
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'MIGRATED' ELSE c_mktsegment END,
           TIMESTAMP '{_SCD2_T1}', CAST(NULL AS TIMESTAMP), 1
    FROM customer WHERE c_custkey % 10 = 0
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile
    from datetime import datetime

    from fabric_claims_spark.operators.scd2 import IS_CURRENT, scd2_apply
    from fabric_claims_spark.sources.merge import TableStore

    cust = load_table(spark, sf_dir, "customer")
    snap1 = cust.where(F.col("c_custkey") % 10 != 0).select(
        "c_custkey", "c_mktsegment"
    )
    snap2 = cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit("MIGRATED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )

    # workspace outlives this function (the returned frame reads the
    # store lazily; the driver collects later) — reclaimed at exit.
    work = tempfile.mkdtemp(prefix="scd2_history_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    store = TableStore(spark, work)
    t0 = datetime.fromisoformat(_SCD2_T0)
    t1 = datetime.fromisoformat(_SCD2_T1)
    scd2_apply(store, "dim_customer", snap1, "c_custkey", ["c_mktsegment"], t0)
    scd2_apply(store, "dim_customer", snap2, "c_custkey", ["c_mktsegment"], t1)
    return store.read("dim_customer").select(
        "c_custkey",
        "c_mktsegment",
        "valid_from",
        "valid_to",
        F.col(IS_CURRENT).cast("long").alias("is_current"),
    )


# --------------------------------------------------------------------------
# Point-in-time (feature-store) join: revenue attributed to the
# customer segment AS OF EACH ORDER'S DATE, against an SCD2 history
# whose segment migration lands mid-range (1998-07-01) — orders
# before the flip aggregate under the original segment, orders after
# under 'MIGRATED', and orders from members whose first dimension
# version postdates them (the late-arriving 10%) bucket as 'UNKNOWN'
# instead of silently leaking the future version. The oracle
# reconstructs the identical history declaratively and joins with the
# same validity predicate.
_PIT_T0 = "1995-01-01 00:00:00"
_PIT_T1 = "1998-07-01 00:00:00"


@query(
    "orders_pit_segment_revenue",
    oracle=f"""
    WITH h AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '{_PIT_T0}' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer WHERE c_custkey % 10 != 0 AND c_acctbal >= 0
      UNION ALL
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '{_PIT_T0}', TIMESTAMP '{_PIT_T1}'
      FROM customer WHERE c_custkey % 10 != 0 AND c_acctbal < 0
      UNION ALL
      SELECT c_custkey, 'MIGRATED',
             TIMESTAMP '{_PIT_T1}', CAST(NULL AS TIMESTAMP)
      FROM customer WHERE c_custkey % 10 != 0 AND c_acctbal < 0
      UNION ALL
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'MIGRATED'
                  ELSE c_mktsegment END,
             TIMESTAMP '{_PIT_T1}', CAST(NULL AS TIMESTAMP)
      FROM customer WHERE c_custkey % 10 = 0),
    j AS (
      SELECT o.o_totalprice, o.o_orderdate, h.c_mktsegment
      FROM orders o
      LEFT JOIN h ON o.o_custkey = h.c_custkey
        AND h.valid_from <= o.o_orderdate
        AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to))
    SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment_at_order,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           COUNT(*) AS orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
                AS DOUBLE) AS revenue
    FROM j GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def orders_pit_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile
    from datetime import datetime

    from fabric_claims_spark.operators.scd2 import (
        point_in_time_join,
        scd2_apply,
    )
    from fabric_claims_spark.sources.merge import TableStore

    cust = load_table(spark, sf_dir, "customer")
    snap1 = cust.where(F.col("c_custkey") % 10 != 0).select(
        "c_custkey", "c_mktsegment"
    )
    snap2 = cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit("MIGRATED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    work = tempfile.mkdtemp(prefix="pit_history_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    store = TableStore(spark, work)
    scd2_apply(
        store, "dim_customer", snap1, "c_custkey", ["c_mktsegment"],
        datetime.fromisoformat(_PIT_T0),
    )
    scd2_apply(
        store, "dim_customer", snap2, "c_custkey", ["c_mktsegment"],
        datetime.fromisoformat(_PIT_T1),
    )
    # align the history key's name with the fact's join key
    hist = store.read("dim_customer").select(
        F.col("c_custkey").alias("o_custkey"),
        "c_mktsegment",
        "valid_from",
        "valid_to",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    j = point_in_time_join(orders, hist, "o_custkey", "o_orderdate")
    return (
        j.groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias(
                "segment_at_order"
            ),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("orders"),
            F.round(F.sum(money("o_totalprice")), 4)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("segment_at_order", "order_year")
    )


# --------------------------------------------------------------------------
# Change data feed between two RETAINED TABLE VERSIONS: snapshot v1
# loads 90% of customers with their original segments; snapshot v2
# drops every custkey % 100 == 7 member (deletes), adds the held-out
# 10% (inserts), and migrates negative-balance members to 'MIGRATED'
# (update pre+post image pairs). The diff runs operators/cdc.table_diff
# over TableStore.versions/read_version time travel — the Delta CDF
# analog on the versioned-parquet store — and aggregates the feed by
# (change_type, segment-as-seen-in-the-image). The oracle rebuilds
# both snapshots declaratively and reconciles them with the same
# full-outer semantics.
@query(
    "customers_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT c_custkey, c_mktsegment
      FROM customer WHERE c_custkey % 10 != 0),
    v2 AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'MIGRATED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 100 != 7),
    feed AS (
      SELECT 'insert' AS change_type, v2.c_mktsegment AS segment
      FROM v2 LEFT JOIN v1 USING (c_custkey) WHERE v1.c_custkey IS NULL
      UNION ALL
      SELECT 'delete', v1.c_mktsegment
      FROM v1 LEFT JOIN v2 USING (c_custkey) WHERE v2.c_custkey IS NULL
      UNION ALL
      SELECT 'update_preimage', v1.c_mktsegment
      FROM v1 JOIN v2 USING (c_custkey)
      WHERE v1.c_mktsegment != v2.c_mktsegment
      UNION ALL
      SELECT 'update_postimage', v2.c_mktsegment
      FROM v1 JOIN v2 USING (c_custkey)
      WHERE v1.c_mktsegment != v2.c_mktsegment)
    SELECT change_type, segment, COUNT(*) AS rows
    FROM feed GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def customers_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from fabric_claims_spark.operators.cdc import table_diff
    from fabric_claims_spark.sources.merge import TableStore

    cust = load_table(spark, sf_dir, "customer")
    v1 = cust.where(F.col("c_custkey") % 10 != 0).select(
        "c_custkey", "c_mktsegment"
    )
    v2 = cust.where(F.col("c_custkey") % 100 != 7).select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit("MIGRATED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    work = tempfile.mkdtemp(prefix="cdf_snapshots_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    store = TableStore(spark, work)
    store.overwrite("customers", v1)
    store.overwrite("customers", v2)
    old_v, new_v = store.versions("customers")[-2:]
    feed = table_diff(
        store.read_version("customers", old_v),
        store.read_version("customers", new_v),
        keys=["c_custkey"],
    )
    return (
        feed.groupBy(
            F.col("_change_type").alias("change_type"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("change_type", "segment")
    )


# --------------------------------------------------------------------------
# Walk-forward (time-series) cross-validation folds — the
# leakage-safe split a temporal model needs: fold i trains on all
# events before cutoff_i and validates on [cutoff_i, cutoff_{i+1}).
# Random/hash splits (docs_hash_split) leak future information into
# training for temporal data; this is the temporal complement. Pure
# projection + aggregate (each event classifies into every fold
# independently — a static ×|folds| expansion like the hopping
# window, fused into the scan stage).
@query(
    "events_walkforward_folds",
    oracle="""
    WITH f AS (
      SELECT * FROM (VALUES
        (1, TIMESTAMP '2024-01-08 00:00:00', TIMESTAMP '2024-01-15 00:00:00'),
        (2, TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-22 00:00:00'),
        (3, TIMESTAMP '2024-01-22 00:00:00', TIMESTAMP '2024-01-29 00:00:00')
      ) t(fold, train_end, valid_end))
    SELECT f.fold,
           COUNT(CASE WHEN e.ts < f.train_end THEN 1 END) AS train_events,
           COUNT(CASE WHEN e.ts >= f.train_end AND e.ts < f.valid_end
                 THEN 1 END) AS valid_events,
           CAST(COUNT(DISTINCT CASE WHEN e.ts < f.train_end
                      THEN e.user_id END) AS BIGINT) AS train_users,
           CAST(COUNT(DISTINCT CASE WHEN e.ts >= f.train_end
                       AND e.ts < f.valid_end
                      THEN e.user_id END) AS BIGINT) AS valid_users
    FROM events e CROSS JOIN f
    GROUP BY f.fold ORDER BY f.fold
    """,
)
def events_walkforward_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    folds = [
        (1, "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
        (2, "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
        (3, "2024-01-22 00:00:00", "2024-01-29 00:00:00"),
    ]
    fdf = local_frame(
        spark, folds, "fold int, train_end string, valid_end string"
    ).select(
        "fold",
        F.col("train_end").cast("timestamp").alias("train_end"),
        F.col("valid_end").cast("timestamp").alias("valid_end"),
    )
    j = e.crossJoin(F.broadcast(fdf))
    in_train = F.col("ts") < F.col("train_end")
    in_valid = (F.col("ts") >= F.col("train_end")) & (
        F.col("ts") < F.col("valid_end")
    )
    return (
        j.groupBy("fold")
        .agg(
            F.count(F.when(in_train, 1)).alias("train_events"),
            F.count(F.when(in_valid, 1)).alias("valid_events"),
            F.countDistinct(F.when(in_train, F.col("user_id"))).alias(
                "train_users"
            ),
            F.countDistinct(F.when(in_valid, F.col("user_id"))).alias(
                "valid_users"
            ),
        )
        .orderBy("fold")
    )
