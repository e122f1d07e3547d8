"""Time-intelligence operators (SURVEY.md §2.5 W3/W4, §2.8 F8-F10).

The reference's DAX measures (TOTALYTD / SAMEPERIODLASTYEAR /
DATESINPERIOD, SM/tables/Claims.tmdl:126-181 and the Time Calculation
calc group, SM/tables/Time Calculation.tmdl:6-24) re-expressed as the
two Spark idioms SURVEY.md §2.5 prescribes:

* running frames — window ``rowsBetween``/``rangeBetween`` over a
  pre-aggregated month grain (partial aggregation first → the window
  runs on a tiny, already-shuffled frame, never on fact rows);
* period-shift self-joins — aggregate by period, join period minus
  one year.

Decimal sums stay decimal *through* the window and only round+cast to
double at the very end (cross-engine determinism; see queries/_util).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fabric_claims_spark.queries import query
from fabric_claims_spark.queries._util import dsum, money
from fabric_claims_spark.sources.parquet import load_table


def _monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-amount totals at (year, month) grain — exact decimal."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(F.sum(money("o_totalprice")).alias("_rev_dec"))
    )


_MONTHLY_SQL = """
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS _rev_dec
  FROM orders GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# W3a — TOTALYTD as a running window over the month grain
# (SM/tables/Claims.tmdl:126-134; calc group YTD item).
@query(
    "ytd_running_revenue",
    oracle=f"""
    SELECT order_year, order_month,
           CAST(ROUND(_rev_dec, 4) AS DOUBLE) AS month_revenue,
           CAST(ROUND(SUM(_rev_dec) OVER (
             PARTITION BY order_year ORDER BY order_month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
             AS ytd_revenue
    FROM ({_MONTHLY_SQL})
    """,
)
def ytd_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = _monthly_revenue(spark, sf_dir)
    w = (
        Window.partitionBy("order_year")
        .orderBy("order_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "order_year",
        "order_month",
        F.round(F.col("_rev_dec"), 4).cast("double").alias("month_revenue"),
        F.round(F.sum("_rev_dec").over(w), 4).cast("double").alias("ytd_revenue"),
    )


# --------------------------------------------------------------------------
# W3b — SAMEPERIODLASTYEAR / YoY Δ / YoY % via period-shift self-join
# (SM/tables/Claims.tmdl:137-181). LY-missing months keep NULL (DAX
# DIVIDE semantics — never coalesce to 0).
@query(
    "yoy_monthly_revenue",
    oracle=f"""
    WITH m AS ({_MONTHLY_SQL})
    SELECT cur.order_year, cur.order_month,
           CAST(ROUND(cur._rev_dec, 4) AS DOUBLE) AS revenue,
           CAST(ROUND(prev._rev_dec, 4) AS DOUBLE) AS revenue_ly,
           CAST(ROUND(cur._rev_dec - prev._rev_dec, 4) AS DOUBLE) AS yoy_delta,
           CAST(ROUND(cur._rev_dec - prev._rev_dec, 4) AS DOUBLE)
             / CAST(ROUND(NULLIF(prev._rev_dec, 0), 4) AS DOUBLE) AS yoy_pct
    FROM m cur LEFT JOIN m prev
      ON prev.order_year = cur.order_year - 1
     AND prev.order_month = cur.order_month
    """,
)
def yoy_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = _monthly_revenue(spark, sf_dir)
    cur = monthly.alias("cur")
    prev = monthly.alias("prev")
    cur_rev = F.col("cur._rev_dec")
    prev_rev = F.col("prev._rev_dec")
    return (
        cur.join(
            prev,
            (F.col("prev.order_year") == F.col("cur.order_year") - 1)
            & (F.col("prev.order_month") == F.col("cur.order_month")),
            "left",
        )
        .select(
            F.col("cur.order_year").alias("order_year"),
            F.col("cur.order_month").alias("order_month"),
            F.round(cur_rev, 4).cast("double").alias("revenue"),
            F.round(prev_rev, 4).cast("double").alias("revenue_ly"),
            F.round(cur_rev - prev_rev, 4).cast("double").alias("yoy_delta"),
            # try_divide already yields NULL on zero/null denominator,
            # matching the oracle's / NULLIF(...).
            F.try_divide(
                F.round(cur_rev - prev_rev, 4).cast("double"),
                F.round(prev_rev, 4).cast("double"),
            ).alias("yoy_pct"),
        )
    )


# --------------------------------------------------------------------------
# W3d — TOTALQTD as a running window within (year, quarter)
# (Time Calculation.tmdl:8; Claims.tmdl:139 "Total Amount QTD").
@query(
    "qtd_running_revenue",
    oracle="""
    SELECT order_year, order_quarter, order_month,
           CAST(ROUND(_rev_dec, 4) AS DOUBLE) AS month_revenue,
           CAST(ROUND(SUM(_rev_dec) OVER (
             PARTITION BY order_year, order_quarter ORDER BY order_month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
             AS qtd_revenue
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
             CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS _rev_dec
      FROM orders GROUP BY 1, 2, 3)
    """,
)
def qtd_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    ).agg(F.sum(money("o_totalprice")).alias("_rev_dec"))
    w = (
        Window.partitionBy("order_year", "order_quarter")
        .orderBy("order_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "order_year",
        "order_quarter",
        "order_month",
        F.round(F.col("_rev_dec"), 4).cast("double").alias("month_revenue"),
        F.round(F.sum("_rev_dec").over(w), 4).cast("double").alias("qtd_revenue"),
    )


# --------------------------------------------------------------------------
# W3e — TOTALMTD at day grain: running revenue within (year, month)
# ordered by day (Time Calculation.tmdl:12; Claims.tmdl:152 "Total
# Amount MTD"). Day grain because MTD is the identity at month grain;
# pre-aggregate to (y, m, d) first so the window partitions are ≤31
# rows regardless of fact volume.
@query(
    "mtd_running_revenue",
    oracle="""
    SELECT order_year, order_month, order_day,
           CAST(ROUND(_rev_dec, 4) AS DOUBLE) AS day_revenue,
           CAST(ROUND(SUM(_rev_dec) OVER (
             PARTITION BY order_year, order_month ORDER BY order_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
             AS mtd_revenue
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
             CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS _rev_dec
      FROM orders GROUP BY 1, 2, 3)
    """,
)
def mtd_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
    ).agg(F.sum(money("o_totalprice")).alias("_rev_dec"))
    w = (
        Window.partitionBy("order_year", "order_month")
        .orderBy("order_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "order_year",
        "order_month",
        "order_day",
        F.round(F.col("_rev_dec"), 4).cast("double").alias("day_revenue"),
        F.round(F.sum("_rev_dec").over(w), 4).cast("double").alias("mtd_revenue"),
    )


# --------------------------------------------------------------------------
# W3c — DATESINPERIOD(-12, MONTH) rolling window on an epoch-month key
# (SM/tables/Claims.tmdl:265-280 "Last 12M"). rangeBetween keeps gap
# months correct (a missing month still ages out by value, not rank).
@query(
    "rolling_12m_revenue",
    oracle=f"""
    SELECT order_year, order_month,
           CAST(ROUND(SUM(_rev_dec) OVER (
             ORDER BY order_year * 12 + order_month
             RANGE BETWEEN 11 PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
             AS rolling_12m_revenue
    FROM ({_MONTHLY_SQL})
    """,
)
def rolling_12m_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = _monthly_revenue(spark, sf_dir).withColumn(
        "_epoch_month", F.col("order_year") * 12 + F.col("order_month")
    )
    # Partitionless window is safe ONLY because the month grain is
    # bounded (~dozens of rows after pre-aggregation), never on facts.
    w = Window.orderBy("_epoch_month").rangeBetween(-11, 0)
    return monthly.select(
        "order_year",
        "order_month",
        F.round(F.sum("_rev_dec").over(w), 4).cast("double").alias("rolling_12m_revenue"),
    )


# --------------------------------------------------------------------------
# F8 — date spine via sequence+explode (NB_SILVER:134-141) left-joined
# to daily activity; zero-activity days survive with count 0.
@query(
    "date_spine_daily_orders",
    oracle="""
    WITH spine AS (
      SELECT CAST(UNNEST(generate_series(DATE '1995-01-01', DATE '1995-12-31',
                                         INTERVAL 1 DAY)) AS DATE) AS d),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
      FROM orders GROUP BY 1)
    SELECT spine.d AS order_date,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS order_count
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
)
def date_spine_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-12-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("order_date")
    )
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(daily, "order_date", "left").select(
        "order_date", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("order_count")
    )


# --------------------------------------------------------------------------
# F9/F10 — calendar attribute derivation incl. en-US month/day names
# (NB_SILVER:145-150; dim_dates shape).
@query(
    "calendar_attributes",
    oracle="""
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS cal_date,
      CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS cal_year,
      CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS cal_month,
      CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS cal_day,
      CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS cal_quarter,
      monthname(o_orderdate) AS month_name,
      dayname(o_orderdate) AS day_name
    FROM orders
    """,
)
def calendar_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        d.alias("cal_date"),
        F.year(d).cast("long").alias("cal_year"),
        F.month(d).cast("long").alias("cal_month"),
        F.dayofmonth(d).cast("long").alias("cal_day"),
        F.quarter(d).cast("long").alias("cal_quarter"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "EEEE").alias("day_name"),
    ).distinct()


# --------------------------------------------------------------------------
# Dates drill hierarchy (SM/tables/Dates.tmdl:109-124: the report's
# Year -> Month -> Day drill path) as an explicit three-level rollup:
# every drill stop a report user can land on is one row, with
# grouping flags identifying the level. Pre-aggregation happens at
# day grain first, so the rollup's three grouping sets combine
# day-level partials instead of rescanning fact rows per level.
@query(
    "dates_drill_hierarchy",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS drill_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS drill_month,
           CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS drill_day,
           CAST(GROUPING(EXTRACT(month FROM o_orderdate)) AS BIGINT) AS g_month,
           CAST(GROUPING(EXTRACT(day FROM o_orderdate)) AS BIGINT) AS g_day,
           COUNT(*) AS order_count,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
             AS total_amount
    FROM orders
    GROUP BY ROLLUP (EXTRACT(year FROM o_orderdate),
                     EXTRACT(month FROM o_orderdate),
                     EXTRACT(day FROM o_orderdate))
    HAVING GROUPING(EXTRACT(year FROM o_orderdate)) = 0
    """,
)
def dates_drill_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("long").alias("drill_year"),
        F.month("o_orderdate").cast("long").alias("drill_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("drill_day"),
        money("o_totalprice").alias("_amt"),
    )
    return (
        o.rollup("drill_year", "drill_month", "drill_day")
        .agg(
            F.grouping("drill_year").cast("long").alias("_g_year"),
            F.grouping("drill_month").cast("long").alias("g_month"),
            F.grouping("drill_day").cast("long").alias("g_day"),
            F.count(F.lit(1)).alias("order_count"),
            dsum(F.col("_amt")).alias("total_amount"),
        )
        # drop the grand-total row: the drill path starts at Year
        .where(F.col("_g_year") == 0)
        .drop("_g_year")
    )


# --------------------------------------------------------------------------
# Ratio-to-parent hierarchy shares — the percent-of-parent report
# pattern (DAX: DIVIDE([Sales], CALCULATE([Sales], ALLEXCEPT(...)))):
# each nation's revenue as a share of its region, and each region as
# a share of the grand total. Window sums run over the nation-level
# rollup (25 rows) — bounded, shuffle-free beyond the rollup itself;
# every share is one deterministic IEEE division of decimal-exact
# sums.
@query(
    "nation_share_of_region",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2)
    SELECT region, nation,
           CAST(ROUND(rev, 4) AS DOUBLE) AS nation_revenue,
           ROUND(CAST(ROUND(rev, 4) AS DOUBLE)
                 / CAST(ROUND(SUM(rev) OVER (PARTITION BY region), 4)
                        AS DOUBLE), 6) AS share_of_region,
           ROUND(CAST(ROUND(SUM(rev) OVER (PARTITION BY region), 4)
                      AS DOUBLE)
                 / CAST(ROUND(SUM(rev) OVER (), 4) AS DOUBLE), 6)
             AS region_share_of_total
    FROM rev
    ORDER BY region, nation
    """,
)
def nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(money("o_totalprice")).alias("rev"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    region_rev = F.round(F.sum("rev").over(w_region), 4).cast("double")
    total_rev = F.round(F.sum("rev").over(w_all), 4).cast("double")
    return rev.select(
        "region",
        "nation",
        F.round(F.col("rev"), 4).cast("double").alias("nation_revenue"),
        F.round(
            F.round(F.col("rev"), 4).cast("double") / region_rev, 6
        ).alias("share_of_region"),
        F.round(region_rev / total_rev, 6).alias("region_share_of_total"),
    ).orderBy("region", "nation")


# --------------------------------------------------------------------------
# Semi-additive measure — LASTNONBLANK closing value: per (event_type,
# month), the LAST event's value in the month (ordered by ts then
# event_id for tie determinism). The semi-additive family (closing
# balance, inventory level) sums over categories but NOT over time —
# the window runs over the raw stream once, then one per-group filter;
# at 100 TB this is one shuffle on (type, month), same as any keyed
# aggregate.
@query(
    "monthly_closing_value",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(date_trunc('month', ts) AS DATE) AS month,
             value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('month', ts)
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT event_type, month, value AS closing_value
    FROM e WHERE rn = 1
    ORDER BY event_type, month
    """,
)
def monthly_closing_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    month = F.date_trunc("month", F.col("ts")).cast("date")
    w = Window.partitionBy("event_type", month).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            month.alias("month"),
            F.col("value").alias("closing_value"),
        )
        .orderBy("event_type", "month")
    )


# --------------------------------------------------------------------------
# W3 edge parity (VERDICT r5 item 8, SURVEY §7 risk register): LY /
# YoY at a month whose prior-year sibling is ABSENT mid-series must
# stay NULL — DAX DIVIDE semantics, never a coalesce to 0. The month
# grain is made sparse deterministically (each year drops the month
# (year mod 12) + 1), so every year boundary contains a gap whose
# following-year month exists — exactly the corner with_time_calc's
# left LY join has to keep NULL through the windows. This is the
# first ORACLE pin of with_time_calc itself (previously pytest-only):
# decimal sums stay decimal through the windows, rounding to double
# only at output; the yoy_pct NULL-condition is pinned both as a
# boolean and as the rounded-double ratio.
@query(
    "yoy_gap_ly_null_semantics",
    oracle=f"""
    WITH m AS ({_MONTHLY_SQL}),
    s AS (SELECT * FROM m WHERE order_month != (order_year % 12) + 1)
    SELECT cur.order_year, cur.order_month,
           CAST(ROUND(cur._rev_dec, 4) AS DOUBLE) AS revenue,
           CAST(ROUND(prev._rev_dec, 4) AS DOUBLE) AS revenue_ly,
           CAST(ROUND(SUM(cur._rev_dec) OVER (
             PARTITION BY cur.order_year ORDER BY cur.order_month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS DOUBLE) AS ytd_revenue,
           CAST(ROUND(SUM(cur._rev_dec) OVER (
             ORDER BY cur.order_year * 12 + cur.order_month
             RANGE BETWEEN 11 PRECEDING AND CURRENT ROW), 4)
             AS DOUBLE) AS l12m_revenue,
           CAST(ROUND(cur._rev_dec - prev._rev_dec, 4) AS DOUBLE)
             AS yoy_delta,
           (prev._rev_dec IS NULL OR prev._rev_dec = 0) AS yoy_pct_is_null,
           CAST(ROUND(cur._rev_dec - prev._rev_dec, 4) AS DOUBLE)
             / CAST(ROUND(NULLIF(prev._rev_dec, 0), 4) AS DOUBLE) AS yoy_pct
    FROM s cur LEFT JOIN s prev
      ON prev.order_year = cur.order_year - 1
     AND prev.order_month = cur.order_month
    ORDER BY cur.order_year, cur.order_month
    """,
)
def yoy_gap_ly_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.plans.metrics import with_time_calc

    sparse = _monthly_revenue(spark, sf_dir).where(
        F.col("order_month") != (F.col("order_year") % 12) + 1
    )
    tc = with_time_calc(
        sparse, "_rev_dec", year_col="order_year", month_col="order_month"
    )
    r4d = lambda c: F.round(F.col(c), 4).cast("double")  # noqa: E731
    return tc.select(
        "order_year",
        "order_month",
        r4d("_rev_dec").alias("revenue"),
        r4d("_rev_dec_ly").alias("revenue_ly"),
        r4d("_rev_dec_ytd").alias("ytd_revenue"),
        r4d("_rev_dec_l12m").alias("l12m_revenue"),
        r4d("_rev_dec_yoy_delta").alias("yoy_delta"),
        F.col("_rev_dec_yoy_pct").isNull().alias("yoy_pct_is_null"),
        # numeric ratio recomputed in the rounded-double domain (the
        # dsum rule) — with_time_calc's own decimal-domain try_divide
        # is pinned through the boolean above, not its raw scale
        F.try_divide(
            r4d("_rev_dec_yoy_delta"), r4d("_rev_dec_ly")
        ).alias("yoy_pct"),
    ).orderBy("order_year", "order_month")
