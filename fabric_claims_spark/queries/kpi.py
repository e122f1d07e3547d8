"""Report-layer KPI queries (SURVEY.md §2.5 W4, §2.8 F4).

W4 is the reference's KPI visual shape — a rate measure trended by
month (RPT "Patients Demographics" kpi visuals); F4 is the retention
stamping applied to every quarantine table (NB_BRONZE:97,126,171).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fabric_claims_spark.queries import query
from fabric_claims_spark.sources.parquet import load_table


# --------------------------------------------------------------------------
# W4 — KPI trend series: a DIVIDE-rate measure grouped by month
# (Indicator = rate, TrendLine = Dates.Month).
@query(
    "kpi_monthly_fulfillment_trend",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
           COUNT(*) AS total_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS fulfilled_orders,
           SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
             / CAST(NULLIF(COUNT(*), 0) AS DOUBLE) AS fulfillment_rate
    FROM orders
    GROUP BY 1, 2
    """,
)
def kpi_monthly_fulfillment_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    fulfilled = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    return o.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    ).agg(
        F.count(F.lit(1)).alias("total_orders"),
        fulfilled.alias("fulfilled_orders"),
        F.try_divide(fulfilled, F.count(F.lit(1)).cast("double")).alias(
            "fulfillment_rate"
        ),
    )


# --------------------------------------------------------------------------
# F4 — retention stamping: date_add from a fixed anchor per quarantine
# class (the pipeline stamps current_date; the query pins the anchor
# so the oracle is stable).
@query(
    "retention_stamps",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE) AS retain_90,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 180 DAY AS DATE) AS retain_180,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 365 DAY AS DATE) AS retain_365
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def retention_stamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_add(d, 90).alias("retain_90"),
        F.date_add(d, 180).alias("retain_180"),
        F.date_add(d, 365).alias("retain_365"),
    )


# --------------------------------------------------------------------------
# Sessionization — gap-based sessions over the event stream (lag +
# cumulative session ids; the stateful-streaming twin would use
# applyInPandasWithState, this is the batch/backfill form).
@query(
    "events_sessionization",
    oracle="""
    WITH gaps AS (
      SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s,
             CASE WHEN date_diff('second',
                    LAG(CAST(date_trunc('second', ts) AS TIMESTAMP))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    CAST(date_trunc('second', ts) AS TIMESTAMP)) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM gaps)
    SELECT user_id, session_id, COUNT(*) AS events_in_session
    FROM sessions GROUP BY 1, 2
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_s", F.date_trunc("second", F.col("ts"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    prev = F.lag("ts_s").over(w)
    new_session = F.when(
        prev.isNull()
        | (F.col("ts_s").cast("long") - prev.cast("long") > 1800),
        1,
    ).otherwise(0)
    w_cum = Window.partitionBy("user_id").orderBy("ts_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = e.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(w_cum).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("events_in_session")
    )


# --------------------------------------------------------------------------
# Top session paths — the most frequent event-type trigrams WITHIN a
# session (events_sessionization's gap>1800 s sessions, (ts, event_id)
# total order). Path mining over sessions, not raw streams: the
# session boundary stops trigrams from spanning unrelated visits.
# Global top-15 with a deterministic (count desc, path) tiebreak via
# TakeOrdered — no global sort.
@query(
    "events_top_session_paths",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, event_type,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s,
             CASE WHEN date_diff('second',
                    LAG(CAST(date_trunc('second', ts) AS TIMESTAMP))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    CAST(date_trunc('second', ts) AS TIMESTAMP)) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, event_id, event_type, ts_s,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM gaps),
    tri AS (
      SELECT event_type
             || '>' || LEAD(event_type, 1) OVER w
             || '>' || LEAD(event_type, 2) OVER w AS path,
             LEAD(session_id, 2) OVER w AS end_session,
             session_id
      FROM sessions
      WINDOW w AS (PARTITION BY user_id, session_id
                   ORDER BY ts_s, event_id))
    SELECT path, COUNT(*) AS occurrences
    FROM tri
    WHERE path IS NOT NULL AND end_session = session_id
    GROUP BY 1
    ORDER BY occurrences DESC, path
    LIMIT 15
    """,
)
def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_s", F.date_trunc("second", F.col("ts"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    prev = F.lag("ts_s").over(w)
    new_session = F.when(
        prev.isNull()
        | (F.col("ts_s").cast("long") - prev.cast("long") > 1800),
        1,
    ).otherwise(0)
    w_cum = Window.partitionBy("user_id").orderBy("ts_s", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = e.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(w_cum).cast("long")
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("ts_s"), F.col("event_id")
    )
    tri = s.select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(ws),
            F.lead("event_type", 2).over(ws),
        ).alias("path"),
        (F.lead("event_type", 2).over(ws).isNotNull()).alias("complete"),
    )
    return (
        tri.where(F.col("complete"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), "path")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Peak concurrency — the sweep-line interval operator (round 12):
# how many gap-based sessions were simultaneously active at the
# busiest instant. Sessions are intervals [min ts, max ts] inclusive
# (the events_sessionization sessions, CTEs shared verbatim); each
# contributes a +1 boundary at its start and a -1 at end + 1 s, and
# the answer is the max of the running boundary sum in global time
# order (removals before arrivals at the same instant — ORDER BY ts,
# delta; among equal deltas the running-value multiset is
# permutation-invariant, so the max and its first timestamp are
# deterministic). Scale shape: the running sum is NEVER one
# partitionless window over the boundary table — boundaries shard by
# calendar day (within-day running sum) and a day-level offset
# (cumulative sum over the bounded day domain) rebases each shard,
# the docs_shuffle_order two-phase pattern.
@query(
    "events_peak_concurrency",
    oracle="""
    WITH gaps AS (
      SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s,
             CASE WHEN date_diff('second',
                    LAG(CAST(date_trunc('second', ts) AS TIMESTAMP))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    CAST(date_trunc('second', ts) AS TIMESTAMP)) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts_s,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM gaps),
    bounds AS (
      SELECT user_id, session_id,
             MIN(ts_s) AS s_start, MAX(ts_s) AS s_end
      FROM sessions GROUP BY 1, 2),
    b AS (
      SELECT s_start AS ts, 1 AS delta FROM bounds
      UNION ALL
      SELECT s_end + INTERVAL 1 SECOND, -1 FROM bounds),
    swept AS (
      SELECT ts, CAST(SUM(delta) OVER (
               ORDER BY ts, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS running
      FROM b),
    pk AS (SELECT MAX(running) AS peak_concurrency FROM swept)
    SELECT p.peak_concurrency,
           MIN(s.ts) AS first_peak_ts,
           (SELECT COUNT(*) FROM bounds) AS n_sessions
    FROM swept s JOIN pk p ON s.running = p.peak_concurrency
    GROUP BY 1
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_s", F.date_trunc("second", F.col("ts"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    prev = F.lag("ts_s").over(w)
    new_session = F.when(
        prev.isNull()
        | (F.col("ts_s").cast("long") - prev.cast("long") > 1800),
        1,
    ).otherwise(0)
    w_cum = Window.partitionBy("user_id").orderBy("ts_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bounds = (
        e.withColumn("new_session", new_session)
        .withColumn(
            "session_id", F.sum("new_session").over(w_cum).cast("long")
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_s").alias("s_start"), F.max("ts_s").alias("s_end")
        )
    )
    b = bounds.select(
        F.col("s_start").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        bounds.select(
            (F.col("s_end") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
            F.lit(-1).alias("delta"),
        )
    ).withColumn("day", F.to_date("ts"))
    # two-phase global running sum: within-day sweep + day offsets
    w_day = Window.partitionBy("day").orderBy("ts", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_days = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        b.groupBy("day")
        .agg(F.sum("delta").alias("dsum"))
        .withColumn(
            "off", F.coalesce(F.sum("dsum").over(w_days), F.lit(0))
        )
        .select("day", "off")
    )
    swept = (
        b.withColumn("run_in", F.sum("delta").over(w_day))
        .join(F.broadcast(offsets), "day")
        .select(
            "ts",
            (F.col("run_in") + F.col("off")).cast("long").alias("running"),
        )
    )
    peak = swept.agg(
        F.max("running").alias("peak_concurrency")
    )
    n_sessions = bounds.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    return (
        swept.join(
            F.broadcast(peak),
            F.col("running") == F.col("peak_concurrency"),
        )
        .groupBy("peak_concurrency")
        .agg(F.min("ts").alias("first_peak_ts"))
        .join(F.broadcast(n_sessions))
        .select("peak_concurrency", "first_peak_ts", "n_sessions")
    )
