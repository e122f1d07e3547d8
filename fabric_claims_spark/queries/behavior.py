"""Behavioral analytics over the event stream: funnel conversion,
cohort retention, and moment-based anomaly flagging.

The reference (lkv971/fabric-claims) has no event tables; these round
out the engine the way its KPI measures round out the claims model —
standard product-analytics shapes a warehouse user expects, built on
the same cross-engine determinism rules (timestamps truncated to
seconds, exact decimal moments, single IEEE divisions).

Scale notes (100 TB): every stage is a hash aggregate or equi-join
keyed on ``user_id`` / ``event_type`` — co-partitioned shuffles with
map-side partial aggregation; no global windows, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fabric_claims_spark.localframe import local_frame
from fabric_claims_spark.queries import query
from fabric_claims_spark.queries._util import MONEY
from fabric_claims_spark.sources.parquet import load_table


def _events_s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with the second-truncated timestamp the catalog compares on."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_trunc("second", F.col("ts")).alias("ts_s"),
    )


# --------------------------------------------------------------------------
# Funnel conversion — staged view → click → purchase, each stage's
# entry strictly after the previous stage's first event for that user.
# Three user-keyed aggregates chained by equi-joins (each shuffle
# reuses the user_id hash partitioning); the final row is a cross
# join of three one-row aggregates.
@query(
    "events_funnel_conversion",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s
      FROM events),
    v AS (SELECT user_id, MIN(ts_s) AS v_ts FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(e.ts_s) AS c_ts
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts_s > v.v_ts GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts_s) AS p_ts
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts_s > c.c_ts GROUP BY 1)
    SELECT (SELECT COUNT(*) FROM v) AS users_view,
           (SELECT COUNT(*) FROM c) AS users_click,
           (SELECT COUNT(*) FROM p) AS users_purchase,
           ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 6) AS view_to_purchase
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_s(spark, sf_dir)
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("v_ts"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts_s") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("c_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts_s") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("p_ts"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("users_view"))
    nc = c.agg(F.count(F.lit(1)).alias("users_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("users_purchase"))
    return nv.crossJoin(nc).crossJoin(np_).select(
        "users_view",
        "users_click",
        "users_purchase",
        F.round(
            F.col("users_click").cast("double") / F.col("users_view"), 6
        ).alias("view_to_click"),
        F.round(
            F.col("users_purchase").cast("double") / F.col("users_click"), 6
        ).alias("click_to_purchase"),
        F.round(
            F.col("users_purchase").cast("double") / F.col("users_view"), 6
        ).alias("view_to_purchase"),
    )


# --------------------------------------------------------------------------
# Cohort retention — users grouped by first-active ISO week; for each
# (cohort_week, week_offset) cell, how many of that cohort were active.
# Both engines truncate weeks to the ISO Monday; the offset is an
# exact integer (day difference of Monday-aligned dates / 7).
@query(
    "events_retention_cohorts",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events),
    c AS (SELECT user_id, MIN(week) AS cohort_week FROM a GROUP BY 1)
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.week) / 7 AS BIGINT)
             AS week_offset,
           COUNT(*) AS active_users
    FROM a JOIN c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _events_s(spark, sf_dir)
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts_s")).cast("date").alias("week"),
        )
        .distinct()
    )
    c = a.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        a.join(c, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        # rows of `a` are distinct per (user, week), so COUNT(*) is the
        # distinct-user count without a second dedup shuffle
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


# --------------------------------------------------------------------------
# Z-score anomaly flagging — per-type mean/stddev from exact decimal
# moments (Σx, Σx² as decimal sums — partition-order-independent),
# then one deterministic chain of double ops per row. The 5-row stats
# side broadcasts; the fact table never shuffles. Same moment trick as
# order_value_stats (queries/stats.py).
@query(
    "events_anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE)
               AS sv,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))
                            * CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE)
               AS ssv
      FROM events GROUP BY 1)
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - sv / n)
                 / sqrt((ssv - sv * sv / n) / (n - 1)), 6) AS zscore
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE ABS(ROUND((e.value - sv / n)
                    / sqrt((ssv - sv * sv / n) / (n - 1)), 6)) > 3
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    vd = F.col("value").cast(MONEY)
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(vd), 4).cast("double").alias("sv"),
        F.round(F.sum(vd * vd), 4).cast("double").alias("ssv"),
    )
    z = F.round(
        (F.col("value") - F.col("sv") / F.col("n"))
        / F.sqrt(
            (F.col("ssv") - F.col("sv") * F.col("sv") / F.col("n"))
            / (F.col("n") - 1)
        ),
        6,
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .where(F.abs(F.col("zscore")) > 3)
    )


# --------------------------------------------------------------------------
# Rolling 7-day per-user activity — a RANGE-frame window over event
# *time*, not row position: every event sees the exact count/value of
# the same user's events in the trailing 7 days, regardless of how
# many rows that is (the rows-frame rolling_12m twin can't express
# this). Frames are anchored on integer epoch-microseconds in both
# engines (unix_micros / epoch_us), so frame membership is exact —
# no float time, no truncation drift. Scale shape: one shuffle on
# user_id; per-partition state is bounded by one user's 7-day burst,
# and the sum is exact decimal.
_7D_US = 604_800_000_000  # 7 days in microseconds


@query(
    "events_rolling_7d_user",
    oracle=f"""
    SELECT event_id, user_id,
           date_trunc('second', ts) AS ts_s,
           COUNT(*) OVER w AS events_7d,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER w, 4) AS DOUBLE)
             AS value_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_7D_US} PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_7d_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_7D_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.date_trunc("second", F.col("ts")).alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("events_7d"),
        F.round(F.sum(F.col("value").cast(MONEY)).over(w), 4)
        .cast("double")
        .alias("value_7d"),
    )


# --------------------------------------------------------------------------
# Event-transition matrix (first-order Markov) — per user, each event
# paired with that user's next event via a lead window ordered by
# (ts, event_id) (total order: ties broken by the unique key, so both
# engines see the same successor). Transition probability is one IEEE
# division of exact counts, rounded to 6 dp. Scale shape: one shuffle
# on user_id for the window, one hash aggregate on the bounded
# (from, to) type domain, broadcast row-totals join.
@query(
    "events_transition_matrix",
    oracle="""
    WITH nxt AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS transitions
      FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_type, SUM(transitions) AS row_total FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, c.transitions,
           ROUND(CAST(c.transitions AS DOUBLE) / t.row_total, 6)
             AS probability
    FROM c JOIN t USING (from_type)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    c = (
        nxt.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    t = c.groupBy("from_type").agg(F.sum("transitions").alias("row_total"))
    return c.join(F.broadcast(t), "from_type").select(
        "from_type",
        "to_type",
        "transitions",
        F.round(
            F.col("transitions").cast("double") / F.col("row_total"), 6
        ).alias("probability"),
    )


# --------------------------------------------------------------------------
# Per-type daily activity trend — ordinary least squares fit of daily
# event counts against the day index, computed entirely from INTEGER
# moments (n, Σx, Σy, Σxy, Σx²): the slope and intercept are each one
# exact-integer expression divided once in IEEE doubles, so both
# engines agree bit-for-bit. The regression consumes the per-day
# rollup (bounded by the date domain), never raw events — the same
# aggregate-then-analyze shape as customers_pareto_bands.
_TREND_EPOCH = "2024-01-01"


@query(
    "events_daily_trend",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             date_diff('day', DATE '{_TREND_EPOCH}',
                       CAST(date_trunc('day', ts) AS DATE)) AS x,
             COUNT(*) AS y
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM d GROUP BY 1)
    SELECT event_type, n,
           CAST(sy AS BIGINT) AS total_events,
           -- NULLIF guards det = 0 (an event_type active on exactly
           -- one day): DuckDB's IEEE default would yield NaN/Inf
           -- while Spark's non-ANSI division yields NULL — both
           -- sides must agree on NULL.
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(n * sxx - sx * sx, 0), 6) AS slope,
           ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / NULLIF(n * sxx - sx * sx, 0), 6) AS intercept
    FROM m
    """,
)
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit(_TREND_EPOCH).cast("date"),
        ).alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # det = 0 ⟺ the type was active on a single day; divide behind a
    # guard so both engines yield NULL (not NaN/Inf) for that case.
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    guarded = lambda num: F.when(  # noqa: E731
        det != 0, F.round(num.cast("double") / det, 6)
    )
    return m.select(
        "event_type",
        "n",
        F.col("sy").cast("long").alias("total_events"),
        guarded(
            F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
        ).alias("slope"),
        guarded(
            F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
        ).alias("intercept"),
    )


# --------------------------------------------------------------------------
# Hopping (sliding) windows — 1-hour windows advancing every 15
# minutes, so each event lands in 4 overlapping windows. Spark's
# F.window(ts, "1 hour", "15 minutes") expands the overlap natively
# (a generator inside whole-stage codegen — no join); the oracle
# reproduces the same expansion with an explicit 4-row offset cross
# join. Boundaries agree because 15 min divides 1 h and both engines
# align buckets to epoch-aligned origins (DuckDB's 2000-01-01
# time_bucket origin is :00/:15/:30/:45-aligned too).
#
# Scale notes (100 TB): the ×4 row expansion happens map-side inside
# the scan stage and feeds straight into hash aggregation with
# map-side partial combine — one shuffle keyed on (window, type),
# identical shape to the tumbling query. The streaming twin
# (streaming/events_stream.hopping_counts_stream) runs the same plan
# under a watermark.
@query(
    "events_hopping_windows",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s
      FROM events),
    w AS (
      SELECT e.event_type, e.value,
             time_bucket(INTERVAL 15 MINUTE, e.ts_s)
               - o.k * INTERVAL 15 MINUTE AS window_start
      FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) o(k))
    SELECT window_start,
           window_start + INTERVAL 60 MINUTE AS window_end,
           event_type,
           COUNT(*) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
    FROM w
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def events_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_s(spark, sf_dir)
    return (
        e.groupBy(
            F.window(F.col("ts_s"), "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast(MONEY))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "event_count",
            "value_sum",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# EWMA smoothing of the per-type daily count series, bit-identical
# across engines by construction: with α = 1/2 the weight for a lag-i
# term is 2^(29-i) — an exact BIGINT — so the bounded 30-term weighted
# sum is pure integer arithmetic (max term ≈ 2^29·10^4 < 2^43, 30
# terms < 2^48, no overflow) and only the FINAL division runs in IEEE
# doubles. No pow(), no float accumulation order to disagree on.
#
# Scale notes (100 TB): the EWMA consumes the per-(type, day) rollup
# — bounded by |types| × date-domain, thousands of rows at any corpus
# size — never raw events. The 30-row self-expansion via a bounded
# range join multiplies that small rollup by ≤30; the raw-event scan
# remains a single hash aggregate with map-side combine.
@query(
    "events_ewma_daily",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS y
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, day, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS rn
      FROM d)
    SELECT a.event_type, a.day, a.y AS raw_count,
           ROUND(
             CAST(SUM(b.y * (1::BIGINT << (29 - (a.rn - b.rn))))
                  AS DOUBLE)
             / SUM(1::BIGINT << (29 - (a.rn - b.rn))), 6) AS ewma
    FROM r a JOIN r b
      ON a.event_type = b.event_type
     AND b.rn BETWEEN a.rn - 29 AND a.rn
    GROUP BY a.event_type, a.day, a.y
    ORDER BY a.event_type, a.day
    """,
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    r = d.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")
        ),
    )
    a, b = r.alias("a"), r.alias("b")
    # F.shiftleft takes a Python-int bit count; the per-row bit count
    # needs the SQL form, which accepts an expression.
    w = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(29 - (a.rn - b.rn) AS INT))")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & F.col("b.rn").between(F.col("a.rn") - 29, F.col("a.rn")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.y").alias("raw_count"),
        )
        .agg(
            F.round(
                F.sum(F.col("b.y") * w).cast("double") / F.sum(w), 6
            ).alias("ewma")
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Holt-Winters daily forecast per event type: the triple-exponential
# big sibling of the EWMA above — level + trend + weekly seasonality
# folded through the bounded per-(type, day) rollup by the grouped
# Arrow escape hatch (operators/forecast.holt_winters_additive; the
# recurrence is not window-expressible). Registered ROWS-ONLY by
# design: the state chain is a deep double-precision recurrence with
# no integer-exact reformulation, so a SQL twin would hash-drift
# across engines after enough steps (the cross-engine precision limit
# the module header documents); correctness is pinned instead by
# literal hand-computed fixtures in tests/test_extensions.py.
# Dyadic params (1/2, 1/4, 1/4) keep those fixtures bit-exact.
@query("events_holtwinters_forecast", oracle=None)
def events_holtwinters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.operators.forecast import holt_winters_additive

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    return holt_winters_additive(
        daily,
        key_col="event_type",
        time_col="day",
        value_col="y",
        alpha=0.5,
        beta=0.25,
        gamma=0.25,
        period=7,
        horizon=14,
    ).orderBy("event_type", "step_index")


# --------------------------------------------------------------------------
# Last-touch attribution: each purchase is credited to the latest
# view/click strictly before it in the same user's stream. One
# user-partitioned window (last non-null touch over ROWS UNBOUNDED
# PRECEDING .. 1 PRECEDING, ordered by (ts, event_id) for tie
# determinism), then a small aggregate per touch type. "direct" =
# purchases with no prior touch.
#
# Scale notes (100 TB): a single shuffle on user_id (user event
# streams are short and numerous — no skew), the window scans each
# user's partition once, and the final aggregate is 3 rows. No joins,
# no driver state.
@query(
    "events_attribution_last_touch",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, value,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s
      FROM events),
    t AS (
      SELECT *,
             last_value(
               CASE WHEN event_type IN ('view', 'click')
                    THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM e)
    SELECT COALESCE(touch, 'direct') AS touch_type,
           COUNT(*) AS purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             AS attributed_value
    FROM t
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_s(spark, sf_dir)
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("view", "click"), F.col("event_type")
        ),
        ignorenulls=True,
    ).over(win)
    return (
        e.withColumn("touch", touch)
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("direct")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.sum(F.col("value").cast(MONEY))
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


# --------------------------------------------------------------------------
# Seasonal (day-of-week) anomaly scores — the seasonal-adjustment
# upgrade of events_anomaly_zscore: each (type, day) residual is
# measured against that type's SAME-WEEKDAY baseline, so a quiet
# Sunday no longer flags as anomalous just for being a Sunday.
# Baselines come from exact integer moments (n, Σy, Σy²) over the
# per-day rollup; each z-score is one deterministic double chain, so
# both engines agree bit-for-bit. σ = 0 (constant weekday) yields
# NULL in both engines via the same guard.
#
# Scale notes (100 TB): raw events reduce to the (type, day) rollup
# in one map-side-combined aggregate; the weekday baseline join is
# |types|×7 rows broadcast. Nothing bigger than the date domain ever
# shuffles again.
@query(
    "events_dow_anomaly",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS y
      FROM events GROUP BY 1, 2),
    b AS (
      SELECT event_type, isodow(day) - 1 AS wd,
             COUNT(*) AS n, SUM(y) AS sy, SUM(y * y) AS syy
      FROM d GROUP BY 1, 2)
    SELECT d.event_type, d.day, CAST(d.y AS BIGINT) AS daily_events,
           ROUND(b.sy * 1.0 / b.n, 6) AS weekday_mean,
           ROUND((d.y - b.sy * 1.0 / b.n)
                 / NULLIF(sqrt((b.n * b.syy - b.sy * b.sy) * 1.0)
                          / b.n, 0), 6) AS seasonal_z
    FROM d JOIN b
      ON d.event_type = b.event_type AND isodow(d.day) - 1 = b.wd
    ORDER BY d.event_type, d.day
    """,
)
def events_dow_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    b = d.groupBy(
        "event_type", F.weekday("day").alias("wd")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    joined = d.join(
        F.broadcast(b),
        (d["event_type"] == b["event_type"])
        & (F.weekday(d["day"]) == b["wd"]),
    ).drop(b["event_type"])
    mean = F.col("sy") * 1.0 / F.col("n")
    sd = F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")) * 1.0
    ) / F.col("n")
    return joined.select(
        "event_type",
        "day",
        F.col("y").cast("long").alias("daily_events"),
        F.round(mean, 6).alias("weekday_mean"),
        F.round(
            (F.col("y") - mean) / F.when(sd != 0, sd), 6
        ).alias("seasonal_z"),
    ).orderBy("event_type", "day")


# --------------------------------------------------------------------------
# Linear (multi-touch) attribution — the equal-credit complement of
# events_attribution_last_touch: each purchase's value splits evenly
# across ALL prior view/click touches in the user's stream; purchases
# with no prior touch credit 'direct'. Per-purchase credits are
# deterministic (exact 2-dp value × integer touch counts, one IEEE
# division, rounded to integer tenth-cents) and sum as BIGINTs, so
# the per-channel totals are partition-order independent.
#
# Scale notes (100 TB): one user-partitioned window computing two
# conditional running counts, then a 3-row aggregate — same single
# user_id shuffle as the last-touch query.
@query(
    "events_attribution_linear",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, value,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s
      FROM events),
    t AS (
      SELECT *,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS n_view,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS n_click
      FROM e),
    p AS (SELECT * FROM t WHERE event_type = 'purchase'),
    credits AS (
      SELECT 'view' AS touch_type,
             COUNT(CASE WHEN n_view > 0 THEN 1 END) AS purchases,
             SUM(CAST(ROUND(value * 10000.0 * n_view
                            / NULLIF(n_view + n_click, 0), 0) AS BIGINT))
               AS micro
      FROM p
      UNION ALL
      SELECT 'click',
             COUNT(CASE WHEN n_click > 0 THEN 1 END),
             SUM(CAST(ROUND(value * 10000.0 * n_click
                            / NULLIF(n_view + n_click, 0), 0) AS BIGINT))
      FROM p
      UNION ALL
      SELECT 'direct',
             COUNT(CASE WHEN n_view + n_click = 0 THEN 1 END),
             SUM(CASE WHEN n_view + n_click = 0
                      THEN CAST(ROUND(value * 10000.0, 0) AS BIGINT) END)
      FROM p)
    SELECT touch_type, purchases,
           ROUND(CAST(COALESCE(micro, 0) AS DOUBLE) / 10000.0, 4)
             AS attributed_value
    FROM credits ORDER BY touch_type
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_s(spark, sf_dir)
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_view = F.count(
        F.when(F.col("event_type") == "view", 1)
    ).over(win)
    n_click = F.count(
        F.when(F.col("event_type") == "click", 1)
    ).over(win)
    p = (
        e.withColumn("n_view", n_view)
        .withColumn("n_click", n_click)
        .where(F.col("event_type") == "purchase")
    )
    tot = F.col("n_view") + F.col("n_click")

    def micro(cnt):
        return F.round(
            F.col("value") * 10000.0 * cnt / F.when(tot != 0, tot), 0
        ).cast("long")

    credits = (
        p.agg(
            F.count(F.when(F.col("n_view") > 0, 1)).alias("pv"),
            F.sum(micro(F.col("n_view"))).alias("mv"),
            F.count(F.when(F.col("n_click") > 0, 1)).alias("pc"),
            F.sum(micro(F.col("n_click"))).alias("mc"),
            F.count(F.when(tot == 0, 1)).alias("pd"),
            F.sum(
                F.when(tot == 0, F.round(F.col("value") * 10000.0, 0).cast("long"))
            ).alias("md"),
        )
    )
    rows = credits.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("touch_type"),
                    F.col("pv").alias("purchases"),
                    F.col("mv").alias("micro"),
                ),
                F.struct(
                    F.lit("click").alias("touch_type"),
                    F.col("pc").alias("purchases"),
                    F.col("mc").alias("micro"),
                ),
                F.struct(
                    F.lit("direct").alias("touch_type"),
                    F.col("pd").alias("purchases"),
                    F.col("md").alias("micro"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        "touch_type",
        "purchases",
        F.round(
            F.coalesce(F.col("micro"), F.lit(0)).cast("double") / 10000.0, 4
        ).alias("attributed_value"),
    ).orderBy("touch_type")


# --------------------------------------------------------------------------
# Growth accounting — the new / retained / resurrected / churned
# decomposition per ISO week (the standard DAU/MAU ledger): a user is
# NEW in their first active week, RETAINED when also active the prior
# week, RESURRECTED when returning after a gap, and counts as CHURNED
# in the week following their last consecutive activity. Built from
# the distinct (user, week) activity set with one user-partitioned
# lag/lead pass — the activity rollup is tiny compared to raw events,
# and the only raw-event shuffle is the initial distinct.
@query(
    "events_growth_accounting",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events),
    s AS (
      SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS first_week,
             LAG(week) OVER (PARTITION BY user_id ORDER BY week)
               AS prev_week,
             LEAD(week) OVER (PARTITION BY user_id ORDER BY week)
               AS next_week
      FROM a),
    active AS (
      SELECT week,
             COUNT(CASE WHEN week = first_week THEN 1 END) AS new_users,
             COUNT(CASE WHEN prev_week IS NOT NULL
                         AND date_diff('day', prev_week, week) = 7
                   THEN 1 END) AS retained_users,
             COUNT(CASE WHEN prev_week IS NOT NULL
                         AND date_diff('day', prev_week, week) > 7
                   THEN 1 END) AS resurrected_users
      FROM s GROUP BY 1),
    churn AS (
      SELECT week + INTERVAL 7 DAY AS week,
             COUNT(*) AS churned_users
      FROM s
      WHERE next_week IS NULL
         OR date_diff('day', week, next_week) > 7
      GROUP BY 1)
    SELECT CAST(COALESCE(a.week, c.week) AS DATE) AS week,
           COALESCE(a.new_users, 0) AS new_users,
           COALESCE(a.retained_users, 0) AS retained_users,
           COALESCE(a.resurrected_users, 0) AS resurrected_users,
           COALESCE(c.churned_users, 0) AS churned_users
    FROM active a FULL OUTER JOIN churn c ON a.week = c.week
    ORDER BY week
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    a = e.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
    ).distinct()
    wu = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("week")
    s = a.select(
        "user_id",
        "week",
        F.min("week").over(wu).alias("first_week"),
        F.lag("week").over(wo).alias("prev_week"),
        F.lead("week").over(wo).alias("next_week"),
    )
    gap = F.datediff(F.col("week"), F.col("prev_week"))
    active = s.groupBy("week").agg(
        F.count(F.when(F.col("week") == F.col("first_week"), 1)).alias(
            "new_users"
        ),
        F.count(
            F.when(F.col("prev_week").isNotNull() & (gap == 7), 1)
        ).alias("retained_users"),
        F.count(
            F.when(F.col("prev_week").isNotNull() & (gap > 7), 1)
        ).alias("resurrected_users"),
    )
    churn = (
        s.where(
            F.col("next_week").isNull()
            | (F.datediff(F.col("next_week"), F.col("week")) > 7)
        )
        .groupBy(F.date_add(F.col("week"), 7).alias("week"))
        .agg(F.count(F.lit(1)).alias("churned_users"))
    )
    return (
        active.join(churn, "week", "full_outer")
        .select(
            "week",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
            F.coalesce("retained_users", F.lit(0)).alias("retained_users"),
            F.coalesce("resurrected_users", F.lit(0)).alias(
                "resurrected_users"
            ),
            F.coalesce("churned_users", F.lit(0)).alias("churned_users"),
        )
        .orderBy("week")
    )


# --------------------------------------------------------------------------
# CUSUM changepoint detection over the daily event volume — the
# classic level-shift detector: CUSUM_k = Σ_{d≤k}(c_d − T/D) peaks at
# the day the mean shifts. Everything stays integer by scaling through
# the day count D: D·CUSUM_k = D·Σc_d − k·T, so no running float sum
# exists anywhere and both engines agree bit-for-bit. The cumulative
# window runs over the daily rollup — a calendar-bounded frame — and
# the peak flag is one more window max over the same frame.
@query(
    "events_cusum_changepoint",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1),
    t AS (SELECT COUNT(*) AS dd, SUM(cnt) AS tot FROM d),
    c AS (
      SELECT day, cnt,
             SUM(cnt) OVER (ORDER BY day) AS cum,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM d)
    SELECT c.day, c.cnt,
           CAST(t.dd * c.cum - c.rn * t.tot AS BIGINT) AS cusum_scaled,
           CAST(CASE WHEN ABS(t.dd * c.cum - c.rn * t.tot)
                     = MAX(ABS(t.dd * c.cum - c.rn * t.tot)) OVER ()
                THEN 1 ELSE 0 END AS BIGINT) AS is_changepoint
    FROM c CROSS JOIN t
    ORDER BY c.day
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    t = d.agg(
        F.count(F.lit(1)).alias("dd"), F.sum("cnt").alias("tot")
    )
    wc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.select(
        "day",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    )
    cus = (F.col("dd") * F.col("cum") - F.col("rn") * F.col("tot")).cast(
        "bigint"
    )
    withc = c.crossJoin(F.broadcast(t)).select(
        "day", "cnt", cus.alias("cusum_scaled")
    )
    mx = F.max(F.abs(F.col("cusum_scaled"))).over(Window.partitionBy())
    return withc.select(
        "day",
        "cnt",
        "cusum_scaled",
        F.when(F.abs(F.col("cusum_scaled")) == mx, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_changepoint"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Semi-structured property extraction — events carry a JSON ``props``
# payload; parse it IN the engine (get_json_object → JVM-side
# JsonPath, no Python) and aggregate the extracted field like any
# other column. The parse is a pure projection that pipelines into
# the partial aggregate — at 100 TB, JSON parsing cost dominates, so
# keeping it inside whole-stage codegen (never a UDF) is the design
# point. Distinct-k is bounded by the property's value domain.
@query(
    "events_json_props_stats",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS INTEGER) AS k
      FROM events)
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT k) AS distinct_k,
           MIN(k) AS min_k, MAX(k) AS max_k,
           CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
    FROM x GROUP BY 1 ORDER BY 1
    """,
)
def events_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("k").alias("distinct_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Additive seasonal decomposition (STL-lite) of the daily event
# volume: trend = centered 7-day moving average, seasonal = per-
# weekday mean of the detrended series, residual = remainder. The
# integers never leave: the MA is kept ×7 (a window SUM over the
# calendar-bounded daily rollup) and the detrended series ×7, so the
# only doubles are three closed-form divisions at the output. Full
# 7-row windows only (the standard centered-MA edge rule).
@query(
    "events_seasonal_decomposition",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1),
    w AS (
      SELECT day, cnt,
             SUM(cnt) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7,
             COUNT(*) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw
      FROM d),
    f AS (
      SELECT day, cnt, t7, 7 * cnt - t7 AS det7 FROM w WHERE nw = 7),
    s AS (
      SELECT isodow(day) - 1 AS wd, COUNT(*) AS k, SUM(det7) AS sdet
      FROM f GROUP BY 1)
    SELECT f.day, f.cnt,
           CAST(f.t7 AS DOUBLE) / 7 AS trend,
           CAST(s.sdet AS DOUBLE) / (7 * s.k) AS seasonal,
           CAST(f.det7 AS DOUBLE) / 7
             - CAST(s.sdet AS DOUBLE) / (7 * s.k) AS residual
    FROM f JOIN s ON isodow(f.day) - 1 = s.wd
    ORDER BY f.day
    """,
)
def events_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wma = Window.orderBy("day").rowsBetween(-3, 3)
    w = d.select(
        "day",
        "cnt",
        F.sum("cnt").over(wma).alias("t7"),
        F.count(F.lit(1)).over(wma).alias("nw"),
    )
    f = w.where(F.col("nw") == 7).select(
        "day", "cnt", "t7", (7 * F.col("cnt") - F.col("t7")).alias("det7")
    )
    s = f.groupBy(F.weekday("day").alias("wd")).agg(
        F.count(F.lit(1)).alias("k"), F.sum("det7").alias("sdet")
    )
    seasonal = F.col("sdet").cast("double") / (7 * F.col("k"))
    return (
        f.join(F.broadcast(s), F.weekday(F.col("day")) == s["wd"])
        .select(
            "day",
            "cnt",
            (F.col("t7").cast("double") / 7).alias("trend"),
            seasonal.alias("seasonal"),
            (F.col("det7").cast("double") / 7 - seasonal).alias("residual"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Inter-arrival time histogram — the distribution of per-user gaps
# between consecutive events, log2-bucketed. The lag runs in a
# per-user window (no partition ever exceeds one user's history);
# the log2 bucket is PURE INTEGER — length(bin(gap)) is the bit
# length, so no float log exists anywhere — and the output frame is
# bucket-domain-bounded (≤ ~33 rows for any second-scaled gap).
@query(
    "events_interarrival_histogram",
    oracle="""
    WITH g AS (
      SELECT date_diff('second',
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
               ts) AS gap_s
      FROM events),
    b AS (
      SELECT CASE WHEN gap_s <= 0 THEN 0
                  ELSE length(bin(gap_s)) END AS bucket,
             gap_s
      FROM g WHERE gap_s IS NOT NULL)
    SELECT bucket, COUNT(*) AS n_gaps,
           MIN(gap_s) AS min_gap_s, MAX(gap_s) AS max_gap_s
    FROM b GROUP BY 1 ORDER BY 1
    """,
)
def events_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    b = g.select(
        F.when(F.col("gap_s") <= 0, 0)
        .otherwise(F.length(F.bin(F.col("gap_s"))))
        .alias("bucket"),
        "gap_s",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Audience-overlap Jaccard — exact set similarity between event-type
# audiences (which behaviors share users), the complement of the HLL
# sketch's approximate cardinalities. Pairs are generated from each
# user's sorted distinct-type array in-expression (C(types,2) ≤
# C(5,2) structs per user — the basket_brand_pairs trick), so the
# user frame is touched once and no user-level self-join exists.
@query(
    "events_audience_jaccard",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events),
    ac AS (SELECT event_type, COUNT(*) AS aud FROM ut GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS users_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT i.type_a, i.type_b, i.users_both,
           ca.aud + cb.aud - i.users_both AS users_either,
           CAST(i.users_both AS DOUBLE)
             / (ca.aud + cb.aud - i.users_both) AS jaccard
    FROM inter i
    JOIN ac ca ON i.type_a = ca.event_type
    JOIN ac cb ON i.type_b = cb.event_type
    ORDER BY i.type_a, i.type_b
    """,
)
def events_audience_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    ac = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("aud"))
    sets = ut.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    combos = F.flatten(
        F.transform(
            F.col("ts"),
            lambda x, i: F.transform(
                F.slice(F.col("ts"), i + 2, F.size("ts")),
                lambda y: F.struct(x.alias("type_a"), y.alias("type_b")),
            ),
        )
    )
    inter = (
        sets.select(F.explode(combos).alias("p"))
        .groupBy(
            F.col("p.type_a").alias("type_a"),
            F.col("p.type_b").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("users_both"))
    )
    ca = F.broadcast(
        ac.select(F.col("event_type"), F.col("aud").alias("aud_a"))
    )
    cb = F.broadcast(
        ac.select(F.col("event_type"), F.col("aud").alias("aud_b"))
    )
    either = F.col("aud_a") + F.col("aud_b") - F.col("users_both")
    return (
        inter.join(ca, inter.type_a == ca.event_type)
        .drop("event_type")
        .join(cb, inter.type_b == cb.event_type)
        .select(
            "type_a",
            "type_b",
            "users_both",
            either.alias("users_either"),
            (F.col("users_both").cast("double") / either).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# A/B experiment readout — the props JSON field hashes events into
# variants (k % 2); per event type: per-variant means, relative lift,
# and the Welch t statistic. Values convert to integer CENTS through
# an exact decimal cast, so every moment (n, Σx, Σx²) is an exact
# int64 sum; the means, variances, and t are then closed-form double
# expressions written token-identically in both engines (determinism
# is what the gate needs — the doubles are the same doubles). One
# aggregate over (type, variant), one pivot, no second pass.
@query(
    "events_abtest_lift",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS INTEGER) % 2 AS variant,
             CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS c
      FROM events),
    m AS (
      SELECT event_type, variant, COUNT(*) AS n, SUM(c) AS s,
             SUM(c * c) AS ss
      FROM x GROUP BY 1, 2),
    p AS (
      SELECT event_type,
             MAX(CASE WHEN variant = 0 THEN n END) AS na,
             MAX(CASE WHEN variant = 0 THEN s END) AS sa,
             MAX(CASE WHEN variant = 0 THEN ss END) AS ssa,
             MAX(CASE WHEN variant = 1 THEN n END) AS nb,
             MAX(CASE WHEN variant = 1 THEN s END) AS sb,
             MAX(CASE WHEN variant = 1 THEN ss END) AS ssb
      FROM m GROUP BY 1)
    SELECT event_type, na, nb,
           ROUND(CAST(sa AS DOUBLE) / na / 100, 6) AS mean_a,
           ROUND(CAST(sb AS DOUBLE) / nb / 100, 6) AS mean_b,
           ROUND((CAST(sb AS DOUBLE) / nb) / (CAST(sa AS DOUBLE) / na) - 1,
                 6) AS rel_lift,
           ROUND((CAST(sb AS DOUBLE) / nb - CAST(sa AS DOUBLE) / na)
                 / sqrt((CAST(ssa AS DOUBLE) / na
                          - (CAST(sa AS DOUBLE) / na)
                            * (CAST(sa AS DOUBLE) / na))
                         / (na - 1)
                        + (CAST(ssb AS DOUBLE) / nb
                           - (CAST(sb AS DOUBLE) / nb)
                             * (CAST(sb AS DOUBLE) / nb))
                          / (nb - 1)),
                 6) AS welch_t
    FROM p ORDER BY event_type
    """,
)
def events_abtest_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        (F.get_json_object("props", "$.k").cast("int") % 2).alias("variant"),
        (F.col("value").cast("decimal(18,4)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    m = x.groupBy("event_type", "variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    p = m.groupBy("event_type").agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == 0, F.col("s"))).alias("sa"),
        F.max(F.when(F.col("variant") == 0, F.col("ss"))).alias("ssa"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == 1, F.col("s"))).alias("sb"),
        F.max(F.when(F.col("variant") == 1, F.col("ss"))).alias("ssb"),
    )
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    va = (F.col("ssa").cast("double") / F.col("na") - ma * ma) / (
        F.col("na") - 1
    )
    vb = (F.col("ssb").cast("double") / F.col("nb") - mb * mb) / (
        F.col("nb") - 1
    )
    return p.select(
        "event_type",
        "na",
        "nb",
        F.round(ma / 100, 6).alias("mean_a"),
        F.round(mb / 100, 6).alias("mean_b"),
        F.round(mb / ma - 1, 6).alias("rel_lift"),
        F.round((mb - ma) / F.sqrt(va + vb), 6).alias("welch_t"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Kaplan–Meier reorder survival — "how long until a customer orders
# again", with proper right-censoring (a customer\'s last order is
# censored at the dataset horizon, not dropped). The at-risk counts
# come from a DESCENDING cumulative window over the interval-day
# VALUE domain (calendar-bounded frame), and the KM product stays
# exact as a cumulative integer sum of 6-dp micro-nat ln(1 − d/n)
# terms — the output is log S(t), one division from the state, no
# cross-engine exp/product drift. The d = n_risk terminal cell (S→0,
# ln→−∞) is excluded from the sum by the guard both engines share.
@query(
    "customer_reorder_survival",
    oracle="""
    WITH anchor AS (SELECT MAX(o_orderdate) AS ad FROM orders),
    nxt AS (
      SELECT o_custkey, o_orderdate,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS nd
      FROM orders),
    iv AS (
      SELECT CASE WHEN nd IS NOT NULL
                  THEN date_diff(\'day\', o_orderdate, nd)
                  ELSE date_diff(\'day\', o_orderdate,
                                 (SELECT ad FROM anchor)) END AS t,
             CAST(nd IS NOT NULL AS INT) AS ev
      FROM nxt),
    h AS (SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c FROM iv GROUP BY 1),
    cum AS (
      SELECT t, d, c,
             SUM(d + c) OVER (ORDER BY t DESC) AS n_risk
      FROM h),
    km AS (
      SELECT t, d, c, n_risk,
             SUM(CASE WHEN d > 0 AND d < n_risk
                 THEN CAST(ROUND(ROUND(
                        ln(1 - CAST(d AS DOUBLE) / n_risk), 6)
                        * 1000000, 0) AS BIGINT)
                 ELSE 0 END) OVER (ORDER BY t) AS micro_cum
      FROM cum)
    SELECT t AS interval_days, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
           CAST(micro_cum AS DOUBLE) / 1000000.0 AS log_survival
    FROM km ORDER BY interval_days
    """,
)
def customer_reorder_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("ad"))
    wl = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = o.select(
        "o_custkey",
        "o_orderdate",
        F.lead("o_orderdate").over(wl).alias("nd"),
    ).crossJoin(F.broadcast(anchor))
    iv = nxt.select(
        F.when(
            F.col("nd").isNotNull(), F.datediff("nd", "o_orderdate")
        )
        .otherwise(F.datediff("ad", "o_orderdate"))
        .alias("t"),
        F.col("nd").isNotNull().cast("int").alias("ev"),
    )
    h = iv.groupBy("t").agg(
        F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c")
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = h.select(
        "t", "d", "c",
        F.sum(F.col("d") + F.col("c")).over(wdesc).alias("n_risk"),
    )
    micro = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.round(
            F.round(
                F.log(1 - F.col("d").cast("double") / F.col("n_risk")), 6
            )
            * 1_000_000,
            0,
        ).cast("long"),
    ).otherwise(F.lit(0))
    wasc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = cum.select(
        "t", "d", "c", "n_risk",
        F.sum(micro).over(wasc).alias("micro_cum"),
    )
    return km.select(
        F.col("t").alias("interval_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("c").cast("bigint").alias("n_censored"),
        (F.col("micro_cum").cast("double") / 1_000_000.0).alias(
            "log_survival"
        ),
    ).orderBy("interval_days")


# --------------------------------------------------------------------------
# Markov next-event prediction accuracy — train the first-order
# transition argmax and score it on the SAME pair stream, in-engine:
# accuracy(a) = max_b count(a,b) / Σ_b count(a,b). The pair stream is
# one per-user lag window; everything after is bounded (|types|²
# cells). The eval-family member for the transition matrix.
@query(
    "events_markov_top1_accuracy",
    oracle="""
    WITH p AS (
      SELECT prev, event_type AS nxt FROM (
        SELECT event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events)
      WHERE prev IS NOT NULL),
    m AS (SELECT prev, nxt, COUNT(*) AS n FROM p GROUP BY 1, 2),
    best AS (
      SELECT prev, nxt AS predicted_next, n AS correct FROM (
        SELECT prev, nxt, n,
               ROW_NUMBER() OVER (PARTITION BY prev
                                  ORDER BY n DESC, nxt) AS r
        FROM m)
      WHERE r = 1),
    tot AS (SELECT prev, SUM(n) AS total FROM m GROUP BY 1)
    SELECT b.prev AS from_type, b.predicted_next, b.correct,
           CAST(t.total AS BIGINT) AS total,
           CAST(b.correct AS DOUBLE) / t.total AS top1_accuracy
    FROM best b JOIN tot t ON b.prev = t.prev
    ORDER BY from_type
    """,
)
def events_markov_top1_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = e.select(
        F.col("event_type").alias("nxt"),
        F.lag("event_type").over(w).alias("prev"),
    ).where(F.col("prev").isNotNull())
    m = p.groupBy("prev", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wb = Window.partitionBy("prev").orderBy(F.desc("n"), "nxt")
    best = (
        m.withColumn("r", F.row_number().over(wb))
        .where(F.col("r") == 1)
        .select(
            "prev",
            F.col("nxt").alias("predicted_next"),
            F.col("n").alias("correct"),
        )
    )
    tot = m.groupBy("prev").agg(F.sum("n").alias("total"))
    return (
        best.join(tot, "prev")
        .select(
            F.col("prev").alias("from_type"),
            "predicted_next",
            "correct",
            F.col("total").cast("bigint").alias("total"),
            (F.col("correct").cast("double") / F.col("total")).alias(
                "top1_accuracy"
            ),
        )
        .orderBy("from_type")
    )


# --------------------------------------------------------------------------
# Burstiness / overdispersion per event type — the Fano factor
# (variance-to-mean ratio of daily counts; 1 = Poisson, >1 = bursty)
# plus the Goh–Barabási burstiness index. Daily counts are integers,
# the moments are exact integer sums, and the two outputs are
# closed-form doubles (one sqrt each, correctly-rounded IEEE in both
# engines).
@query(
    "events_burstiness",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, COUNT(*) AS n, SUM(y) AS s, SUM(y * y) AS ss
      FROM d GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(s AS DOUBLE) / n AS mean_daily,
           ROUND((CAST(n * ss - s * s AS DOUBLE) / (n * n))
                 / (CAST(s AS DOUBLE) / n), 6) AS fano_factor,
           ROUND((sqrt(CAST(n * ss - s * s AS DOUBLE) / (n * n))
                  - CAST(s AS DOUBLE) / n)
                 / (sqrt(CAST(n * ss - s * s AS DOUBLE) / (n * n))
                    + CAST(s AS DOUBLE) / n), 6) AS burstiness
    FROM m ORDER BY event_type
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
        "double"
    ) / (F.col("n") * F.col("n"))
    sd = F.sqrt(var)
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        mean.alias("mean_daily"),
        F.round(var / mean, 6).alias("fano_factor"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# STL-residual anomaly detection — the composition the two pieces
# exist for: deseasonalize (events_seasonal_decomposition\'s integer
# machinery), then flag days whose residual exceeds 3 robust sigmas,
# where sigma = 1.4826·MAD of the residuals (orders_mad_outliers\'s
# histogram-CDF median, applied to the ×7-scaled INTEGER residuals so
# both medians stay exact). A z-score on raw counts would miss
# level+seasonality; this flags genuine shocks only.
@query(
    "events_stl_anomalies",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1),
    w AS (
      SELECT day, cnt,
             SUM(cnt) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7,
             COUNT(*) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw
      FROM d),
    f AS (
      SELECT day, cnt, 7 * cnt - t7 AS det7 FROM w WHERE nw = 7),
    s AS (
      SELECT isodow(day) - 1 AS wd, COUNT(*) AS k, SUM(det7) AS sdet
      FROM f GROUP BY 1),
    -- residual ×(7·k) stays integer: r7k = det7·k − sdet
    r AS (
      SELECT f.day, f.cnt,
             CAST(f.det7 * s.k - s.sdet AS BIGINT) AS r7k,
             CAST(s.k AS BIGINT) AS k
      FROM f JOIN s ON isodow(f.day) - 1 = s.wd),
    -- per-k normalization to a COMMON integer grid: kprod = Π k is
    -- overkill; instead compare |r7k|·k\' cross-scale by moving to the
    -- exact rational r7k/k — equality of medians is computed on the
    -- rounded 6-dp double (deterministic single division per row).
    rv AS (
      SELECT day, cnt,
             ROUND(CAST(r7k AS DOUBLE) / (7 * k), 6) AS residual
      FROM r),
    h AS (SELECT residual AS v, COUNT(*) AS c FROM rv GROUP BY 1),
    cdf AS (
      SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
             SUM(c) OVER () AS n
      FROM h),
    med AS (
      SELECT (MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END)
              + MIN(CASE WHEN cum >= (n + 2) // 2 THEN v END)) / 2
               AS m2
      FROM cdf),
    dh AS (
      SELECT ROUND(ABS(rv.residual - med.m2), 6) AS dv, COUNT(*) AS c
      FROM rv CROSS JOIN med GROUP BY 1),
    dcdf AS (
      SELECT dv, SUM(c) OVER (ORDER BY dv) AS cum,
             SUM(c) OVER () AS n
      FROM dh),
    mad AS (
      SELECT (MIN(CASE WHEN cum >= (n + 1) // 2 THEN dv END)
              + MIN(CASE WHEN cum >= (n + 2) // 2 THEN dv END)) / 2
               AS mad
      FROM dcdf)
    SELECT rv.day, rv.cnt, rv.residual,
           CAST(CASE WHEN ABS(rv.residual - med.m2)
                          > 3 * 1.4826 * mad.mad
                     THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM rv CROSS JOIN med CROSS JOIN mad
    ORDER BY rv.day
    """,
)
def events_stl_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wma = Window.orderBy("day").rowsBetween(-3, 3)
    w = d.select(
        "day",
        "cnt",
        F.sum("cnt").over(wma).alias("t7"),
        F.count(F.lit(1)).over(wma).alias("nw"),
    )
    f = w.where(F.col("nw") == 7).select(
        "day", "cnt", (7 * F.col("cnt") - F.col("t7")).alias("det7")
    )
    s = f.groupBy(F.weekday("day").alias("wd")).agg(
        F.count(F.lit(1)).alias("k"), F.sum("det7").alias("sdet")
    )
    r = f.join(F.broadcast(s), F.weekday(F.col("day")) == s["wd"]).select(
        "day",
        "cnt",
        (F.col("det7") * F.col("k") - F.col("sdet"))
        .cast("bigint")
        .alias("r7k"),
        F.col("k").cast("bigint").alias("k"),
    )
    rv = r.select(
        "day",
        "cnt",
        F.round(
            F.col("r7k").cast("double") / (7 * F.col("k")), 6
        ).alias("residual"),
    )

    def cdf_median(hist, val, out):
        wc = Window.orderBy(val).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        wn = Window.partitionBy()
        c = hist.select(
            val,
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(wn).alias("n"),
        )
        p1 = F.expr("(n + 1) div 2")
        p2 = F.expr("(n + 2) div 2")
        return c.agg(
            (
                (
                    F.min(F.when(F.col("cum") >= p1, F.col(val)))
                    + F.min(F.when(F.col("cum") >= p2, F.col(val)))
                )
                / 2
            ).alias(out)
        )

    h = rv.groupBy(F.col("residual").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    med = cdf_median(h, "v", "m2")
    dh = (
        rv.crossJoin(F.broadcast(med))
        .groupBy(
            F.round(F.abs(F.col("residual") - F.col("m2")), 6).alias("dv")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mad = cdf_median(dh, "dv", "mad")
    return (
        rv.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "day",
            "cnt",
            "residual",
            F.when(
                F.abs(F.col("residual") - F.col("m2"))
                > 3 * 1.4826 * F.col("mad"),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("is_anomaly"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# DAU / WAU / MAU and stickiness — the product-analytics headline.
# Exact rolling distinct users WITHOUT a rolling-window distinct: each
# (user, active-day) row fans out to the ≤7 (resp. ≤28) window-ends
# it supports (explode of a constant-length offset range — linear,
# whole-stage), then one distinct + count per window end. The fanout
# factor is the window length, not the data; no day-range self-join,
# no sketch needed for exactness. Stickiness = DAU/MAU in one
# division.
@query(
    "events_dau_wau_mau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
    w AS (
      SELECT DISTINCT ud.user_id,
             ud.day + CAST(o.o AS INTEGER) AS wend
      FROM ud, (SELECT unnest(generate_series(0, 6)) AS o) o),
    wau AS (
      SELECT w.wend AS day, COUNT(*) AS wau FROM w
      JOIN days d ON d.day = w.wend GROUP BY 1),
    m AS (
      SELECT DISTINCT ud.user_id,
             ud.day + CAST(o.o AS INTEGER) AS mend
      FROM ud, (SELECT unnest(generate_series(0, 27)) AS o) o),
    mau AS (
      SELECT m.mend AS day, COUNT(*) AS mau FROM m
      JOIN days d ON d.day = m.mend GROUP BY 1)
    SELECT dau.day, dau.dau, wau.wau, mau.mau,
           ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    JOIN mau ON dau.day = mau.day
    ORDER BY dau.day
    """,
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))

    def rolling_actives(n, out):
        fan = ud.select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(n - 1))
            ).alias("o"),
            "day",
        ).select(
            "user_id", F.date_add("day", F.col("o")).alias("wend")
        ).distinct()
        return (
            fan.join(
                F.broadcast(days.select(F.col("day").alias("wend"))),
                "wend",
            )
            .groupBy(F.col("wend").alias("day"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    wau = rolling_actives(7, "wau")
    mau = rolling_actives(28, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.round(
                F.col("dau").cast("double") / F.col("mau"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Activity heatmap profile — the dow × hour event-volume matrix every
# ops dashboard opens with, plus each cell\'s share of its weekday.
# One hash aggregate into a 168-cell frame; the share window runs
# over that bounded frame.
@query(
    "events_dow_hour_heatmap",
    oracle="""
    WITH c AS (
      SELECT isodow(CAST(ts AS DATE)) - 1 AS dow,
             EXTRACT(hour FROM ts) AS hour, COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour, n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY dow)
             AS dow_share
    FROM c ORDER BY dow, hour
    """,
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        F.weekday(F.col("ts").cast("date")).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        "dow",
        "hour",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("dow"))
        ).alias("dow_share"),
    ).orderBy("dow", "hour")


# --------------------------------------------------------------------------
# Cumulative unique users — the acquisition curve: each user counts
# once at their FIRST-seen day (one user-keyed min), daily first-seen
# counts cumulate over the calendar-bounded window. No rolling
# distinct, no fanout — the growth twin of events_dau_wau_mau.
@query(
    "events_cumulative_users",
    oracle="""
    WITH fs AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY 1),
    d AS (SELECT first_day AS day, COUNT(*) AS new_users FROM fs GROUP BY 1)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT)
             AS cumulative_users
    FROM d ORDER BY day
    """,
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    d = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return d.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Categorical mix drift — per-month total-variation distance between
# the month\'s order-priority mix and the whole-corpus mix, the drift
# monitor for categorical distributions (the TVD twin of the
# docs_source_js_drift divergence). Exact: TVD = Σ|c_mk·N − C_k·n_m|
# / (2·n_m·N) keeps every operand integer until one final division.
# The priority-domain join frames are bounded (months × 5 cells).
@query(
    "orders_priority_mix_drift",
    oracle="""
    WITH c AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
             o_orderpriority AS k, COUNT(*) AS cmk
      FROM orders GROUP BY 1, 2),
    mt AS (SELECT m, SUM(cmk) AS nm FROM c GROUP BY 1),
    kt AS (SELECT k, SUM(cmk) AS ck FROM c GROUP BY 1),
    t AS (SELECT SUM(cmk) AS n FROM c)
    SELECT c.m AS month_idx, CAST(mt.nm AS BIGINT) AS month_orders,
           CAST(SUM(ABS(c.cmk * t.n - kt.ck * mt.nm)) AS DOUBLE)
             / (2.0 * mt.nm * t.n) AS tv_distance
    FROM c JOIN mt ON c.m = mt.m JOIN kt ON c.k = kt.k CROSS JOIN t
    GROUP BY 1, 2, mt.nm, t.n
    ORDER BY 1
    """,
)
def orders_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    midx = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ).cast("bigint")
    c = o.groupBy(
        midx.alias("m"), F.col("o_orderpriority").alias("k")
    ).agg(F.count(F.lit(1)).alias("cmk"))
    mt = c.groupBy("m").agg(F.sum("cmk").alias("nm"))
    kt = c.groupBy("k").agg(F.sum("cmk").alias("ck"))
    t = c.agg(F.sum("cmk").alias("n"))
    return (
        c.join(F.broadcast(mt), "m")
        .join(F.broadcast(kt), "k")
        .crossJoin(F.broadcast(t))
        .groupBy(
            F.col("m").alias("month_idx"),
            F.col("nm").cast("bigint").alias("month_orders"),
            "nm",
            "n",
        )
        .agg(
            (
                F.sum(
                    F.abs(F.col("cmk") * F.col("n") - F.col("ck") * F.col("nm"))
                ).cast("double")
                / (2.0 * F.col("nm") * F.col("n"))
            ).alias("tv_distance")
        )
        .select("month_idx", "month_orders", "tv_distance")
        .orderBy("month_idx")
    )


# --------------------------------------------------------------------------
# Capped running balance — cumulative sum with a floor at zero
# (wallet/credit semantics: purchases add, errors claw back, the
# balance never goes negative). This recurrence is NOT window-
# expressible: b_t = max(0, b_{t-1} + delta_t) depends on every
# prior clamp, so it is the textbook case for the sanctioned Python
# escape hatch — grouped applyInPandas (Arrow-batched, one fold per
# user, deltas precomputed JVM-side as integer cents so Python only
# folds ints). The oracle is DuckDB's recursive CTE over the same
# per-user sequence. Scale shape: one shuffle on user_id, per-group
# work linear in that user's events, no cross-user state.
@query(
    "user_capped_balance",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100) AS BIGINT)
                  WHEN event_type = 'error'
                    THEN -CAST(ROUND(value * 100) AS BIGINT)
                  ELSE 0 END AS delta
      FROM events),
    walk(user_id, rn, bal, hits) AS (
      SELECT user_id, rn, GREATEST(0, delta),
             CASE WHEN delta < 0 THEN 1 ELSE 0 END
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, GREATEST(0, w.bal + s.delta),
             w.hits + CASE WHEN w.bal + s.delta < 0 THEN 1 ELSE 0 END
      FROM walk w JOIN seq s
        ON s.user_id = w.user_id AND s.rn = w.rn + 1),
    n AS (SELECT user_id, COUNT(*) AS n_events FROM seq GROUP BY 1)
    SELECT w.user_id,
           CAST(w.bal AS BIGINT) AS final_balance_cents,
           CAST(w.hits AS BIGINT) AS floor_hits,
           n.n_events
    FROM walk w JOIN n ON n.user_id = w.user_id AND w.rn = n.n_events
    ORDER BY w.user_id
    """,
)
def user_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 13 (guide §4.1): the per-user Python fold (applyInPandas)
    # is gone — the clamp recurrence has a CLOSED FORM over prefix
    # sums (the "reflected random walk" / max-drawdown identity,
    # provable by induction on b_t = max(0, b_{t-1} + d_t)):
    #
    #   S_t = Σ_{j≤t} d_j,   m_t = min(0, min_{j≤t} S_j)
    #   b_t = S_t − m_t
    #   floor hit at t  ⇔  b_{t-1} + d_t < 0  ⇔  S_t < m_{t-1}
    #
    # so the whole walk is two window passes over ONE exchange+sort
    # (running sum, then prefix-min of it) plus a groupBy — exact
    # integer cents throughout, so the result (and the driver hash)
    # is bit-identical to the sequential fold, with no JVM↔Python
    # boundary and no per-group pandas frames (the old path paid a
    # Python fold + a 1-row pandas DataFrame per user; AQE coalesced
    # the tiny-bytes shuffle to ~3 tasks, so the per-ROW Python cost
    # ran nearly serial — measured 10.3 s of an 11.5 s wall).
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .when(
            F.col("event_type") == "error",
            -F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("delta"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = ev.withColumn(
        "s",
        F.sum("delta").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # prefix-min of S over STRICTLY PRIOR rows — same partition/order,
    # so Catalyst plans both windows on one exchange+sort
    prior_min = F.min("s").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # m_{t-1} = min(0, min_{j<t} S_j); least() ignores the NULL at t=1
    hit = F.col("s") < F.least(F.lit(0).cast("long"), prior_min)
    return (
        run.withColumn("hit", hit.cast("long"))
        .groupBy("user_id")
        .agg(
            (
                F.sum("delta")
                - F.least(F.lit(0).cast("long"), F.min("s"))
            ).alias("final_balance_cents"),
            F.sum("hit").alias("floor_hits"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Multiple filtered DISTINCT aggregates in one pass — daily unique
# buyers vs unique viewers vs total actives, plus the buyer/viewer
# conversion ratio: three COUNT(DISTINCT) with different FILTER
# predicates over one scan. Spark expands multi-distinct into the
# expand-operator plan (one shuffle, grouping-id-tagged rows) rather
# than three scans — the shape to check when a dashboard stacks
# distinct measures.
@query(
    "events_daily_distinct_actors",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(DISTINCT user_id) AS actives,
           COUNT(DISTINCT user_id)
             FILTER (WHERE event_type = 'purchase') AS buyers,
           COUNT(DISTINCT user_id)
             FILTER (WHERE event_type = 'view') AS viewers,
           ROUND(COUNT(DISTINCT user_id)
                   FILTER (WHERE event_type = 'purchase')
                 * 1.0
                 / NULLIF(COUNT(DISTINCT user_id)
                            FILTER (WHERE event_type = 'view'), 0), 6)
             AS buyer_viewer_ratio
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def events_daily_distinct_actors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = F.count_distinct(
        F.when(F.col("event_type") == "purchase", F.col("user_id"))
    )
    viewers = F.count_distinct(
        F.when(F.col("event_type") == "view", F.col("user_id"))
    )
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .agg(
            F.count_distinct("user_id").alias("actives"),
            buyers.alias("buyers"),
            viewers.alias("viewers"),
            F.round(
                buyers * 1.0 / F.nullif(viewers, F.lit(0)), 6
            ).alias("buyer_viewer_ratio"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# LOCF (last-observation-carried-forward) gap imputation: the hourly
# per-type count series has genuinely missing hours (no events that
# hour); rebuild the dense hour spine per type and fill gaps forward —
# the standard imputation before feeding a regular-grid model
# (forecasting, anomaly scoring). All-integer counts, so the fill is
# exact in both engines.
# Scale shape: the spine is bounded by |types| x hour-domain (never
# event-sized); one window per type over that bounded frame; the raw
# scan is a single hash aggregate.
@query(
    "events_hourly_locf",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi
          FROM h GROUP BY 1),
    s AS (SELECT event_type,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
          FROM b),
    j AS (SELECT s.event_type, s.hr, h.cnt
          FROM s LEFT JOIN h
            ON h.event_type = s.event_type AND h.hr = s.hr)
    SELECT event_type, CAST(hr AS TIMESTAMP) AS hour,
           CAST(LAST_VALUE(cnt IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS locf_count,
           (cnt IS NULL) AS was_gap
    FROM j
    ORDER BY event_type, hour
    """,
)
def events_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_s(spark, sf_dir)
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts_s")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    j = spine.join(hourly, ["event_type", "hr"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        F.col("hr").alias("hour"),
        F.last("cnt", ignorenulls=True).over(w).cast("long").alias(
            "locf_count"
        ),
        F.col("cnt").isNull().alias("was_gap"),
    ).orderBy("event_type", "hour")


# --------------------------------------------------------------------------
# Modified z-score anomalies (Iglewicz & Hoaglin, "How to Detect and
# Handle Outliers"): the robust outlier flag 0.6745·(x − med)/MAD —
# mean/stddev z-scores move with the outliers they hunt; the median /
# median-absolute-deviation pair does not. Grouped per event type
# over the daily-count series, both medians LOWER medians picked from
# per-group value-domain histograms (order_value_mad's machinery,
# PARTITIONed BY type — bounded frames, no fact-row sorts; all
# decimal/integer until the one z division). MAD = 0 (more than half
# the days tie) yields NULL z via try_divide — undefined, not
# infinite. Flags |z| > 3.5 (the paper's cut).
@query(
    "events_daily_modified_zscore",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1),
    h AS (SELECT event_type, cnt AS v, COUNT(*) AS c FROM d GROUP BY 1, 2),
    cum AS (
      SELECT event_type, v,
             SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
             SUM(c) OVER (PARTITION BY event_type ORDER BY v) - c
               AS prev_cum
      FROM h),
    med AS (
      SELECT cum.event_type, cum.v AS med FROM cum JOIN t USING (event_type)
      WHERE cum.prev_cum < (t.n + 1) // 2 AND (t.n + 1) // 2 <= cum.cum),
    dev AS (
      SELECT d.event_type, ABS(d.cnt - med.med) AS dv
      FROM d JOIN med USING (event_type)),
    dh AS (SELECT event_type, dv, COUNT(*) AS c FROM dev GROUP BY 1, 2),
    dcum AS (
      SELECT event_type, dv,
             SUM(c) OVER (PARTITION BY event_type ORDER BY dv) AS cum,
             SUM(c) OVER (PARTITION BY event_type ORDER BY dv) - c
               AS prev_cum
      FROM dh),
    mad AS (
      SELECT dcum.event_type, dcum.dv AS mad
      FROM dcum JOIN t USING (event_type)
      WHERE dcum.prev_cum < (t.n + 1) // 2 AND (t.n + 1) // 2 <= dcum.cum)
    SELECT d.event_type, d.day, d.cnt,
           CAST(med.med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad,
           ROUND(0.6745 * (d.cnt - med.med) / NULLIF(mad.mad, 0), 6)
             AS mod_z,
           COALESCE(ABS(0.6745 * (d.cnt - med.med) / NULLIF(mad.mad, 0))
                    > 3.5, FALSE) AS is_outlier
    FROM d JOIN med USING (event_type) JOIN mad USING (event_type)
    ORDER BY d.event_type, d.day
    """,
)
def events_daily_modified_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.operators.anomaly import (
        modified_zscore_from_counts,
    )

    e = load_table(spark, sf_dir, "events")
    # NULL-ts policy matches the streaming twin (which filters ts IS
    # NOT NULL at the source): a NULL timestamp has no day and is not
    # monitorable — without this, data containing NULL ts would grow a
    # NULL-day group in batch only and break the stream==batch
    # row-for-row invariant the twin test pins
    d = e.where(F.col("ts").isNotNull()).groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # scoring core shared verbatim with the streaming twin
    # (streaming/events_stream.zscore_monitor_stream): the stream
    # folds the same (event_type, day) counts through the idempotent
    # rollup and feeds them to this exact arithmetic
    return modified_zscore_from_counts(d)


# --------------------------------------------------------------------------
# Ordered conversion funnel WITH a per-step conversion window
# (signup -> view -> click -> purchase) — the semantics the
# unwindowed events_funnel_conversion above cannot express, and what
# product-analytics tools mean by "conversion window": a user
# reaches step k iff their EARLIEST step-(k-1) completion is
# followed by a step-k event within _FUNNEL_WINDOW_H hours. On an
# always-active population the unwindowed funnel saturates (every
# user eventually does everything); the window is what produces real
# drop-off (150 -> 39 -> 16 -> 5 at sf0.01). First-match: each
# step anchors at the MIN qualifying timestamp, so a funnel is a
# chain of conditional min-aggregates, not a pattern-match over the
# whole history). Entirely relational — one min-aggregate + equi-join
# per step, no per-user event buffering, no window over events — so
# each step is a hash aggregate + broadcast-joinable frame at any
# corpus size, and step k's work is bounded by step k-1's survivors
# (the funnel IS a dedup-cascade shape over events). Rates round to
# 6 dp from exact integer counts.
_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]
_FUNNEL_WINDOW_H = 24


@query(
    "events_funnel_windowed",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'signup' AND ts IS NOT NULL GROUP BY 1),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t
        AND e.ts <= s1.t + INTERVAL {_FUNNEL_WINDOW_H} HOUR GROUP BY 1),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s2.t
        AND e.ts <= s2.t + INTERVAL {_FUNNEL_WINDOW_H} HOUR GROUP BY 1),
    s4 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s3 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s3.t
        AND e.ts <= s3.t + INTERVAL {_FUNNEL_WINDOW_H} HOUR GROUP BY 1),
    counts AS (
      SELECT 1 AS step, 'signup' AS step_name,
             (SELECT COUNT(*) FROM s1) AS users
      UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM s2)
      UNION ALL SELECT 3, 'click', (SELECT COUNT(*) FROM s3)
      UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM s4))
    SELECT CAST(step AS BIGINT) AS step, step_name,
           CAST(users AS BIGINT) AS users,
           ROUND(CAST(users AS DOUBLE)
                 / NULLIF(LAG(users) OVER (ORDER BY step), 0), 6)
             AS conv_from_prev,
           ROUND(CAST(users AS DOUBLE)
                 / NULLIF(FIRST_VALUE(users) OVER (ORDER BY step), 0), 6)
             AS conv_from_start
    FROM counts
    ORDER BY step
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the funnel arithmetic lives in operators/funnel.windowed_funnel,
    # shared verbatim with the streaming twin
    # (streaming/events_stream.funnel_monitor_stream): the stream
    # folds the deduped (user_id, event_type, ts) funnel-event rows
    # through the idempotent rollup and feeds them to this exact chain
    # of min-aggregate joins
    from fabric_claims_spark.operators.funnel import windowed_funnel

    e = load_table(spark, sf_dir, "events")
    return windowed_funnel(e, _FUNNEL_STEPS, _FUNNEL_WINDOW_H)


# --------------------------------------------------------------------------
# RFM segmentation — the classic marketing/lifecycle segmentation
# (Recency = days since last purchase, Frequency = purchase count,
# Monetary = purchase value), each scored into deterministic
# quintiles and mapped to named segments. Scores use the engine's
# distributed selection operator (operators/ranking.with_global_rank:
# range repartition -> per-bucket rank -> broadcast offsets — no
# partitionless window) with NTILE-of-known-total arithmetic, total
# order guaranteed by the (metric, user_id) tiebreak. Monetary sums
# fold as exact micro-unit longs (value is a double; a raw double
# sum would be partition-order-dependent). Output is the per-segment
# profile a lifecycle team reads: user count and the average R/F/M
# per segment, every average one exact-integer-sum / count division.
_RFM_SEGMENTS_CASE = """
CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
     WHEN f_score >= 4 THEN 'loyal'
     WHEN m_score >= 4 THEN 'big_spender'
     WHEN r_score <= 2 AND f_score <= 2 THEN 'dormant'
     WHEN r_score <= 2 THEN 'at_risk'
     ELSE 'casual' END
"""


@query(
    "events_user_rfm_segments",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(date_trunc('day', MAX(ts)) AS DATE) AS maxd FROM events),
    rfm AS (
      SELECT e.user_id,
             date_diff('day', CAST(date_trunc('day', MAX(e.ts)) AS DATE),
                       b.maxd) AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(ROUND(e.value * 1000000, 0) AS BIGINT)) AS m_micro
      FROM events e CROSS JOIN bounds b
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id, b.maxd),
    scored AS (
      SELECT user_id, recency_days, frequency, m_micro,
             6 - NTILE(5) OVER (ORDER BY recency_days, user_id) AS r_score,
             NTILE(5) OVER (ORDER BY frequency, user_id) AS f_score,
             NTILE(5) OVER (ORDER BY m_micro, user_id) AS m_score
      FROM rfm),
    seg AS (
      SELECT {_RFM_SEGMENTS_CASE} AS segment, recency_days, frequency,
             m_micro
      FROM scored)
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS users,
           ROUND(CAST(SUM(recency_days) AS DOUBLE) / COUNT(*), 6)
             AS avg_recency_days,
           ROUND(CAST(SUM(frequency) AS DOUBLE) / COUNT(*), 6)
             AS avg_frequency,
           ROUND(CAST(SUM(m_micro) AS DOUBLE) / (COUNT(*) * 1000000.0), 6)
             AS avg_monetary
    FROM seg GROUP BY segment ORDER BY segment
    """,
)
def events_user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.operators.ranking import (
        ntile_by_rank,
        with_global_rank,
    )

    e = load_table(spark, sf_dir, "events")
    day = lambda c: F.date_trunc("day", c).cast("date")  # noqa: E731
    bounds = e.agg(day(F.max("ts")).alias("maxd"))
    rfm = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            day(F.max("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias(
                "m_micro"
            ),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.datediff("maxd", "last_day").alias("recency_days"),
            "frequency",
            "m_micro",
        )
    )
    scored = rfm
    for metric, score, invert in (
        ("recency_days", "r_score", True),
        ("frequency", "f_score", False),
        ("m_micro", "m_score", False),
    ):
        ranked, n = with_global_rank(
            scored, [metric, "user_id"], rank_col="_rank"
        )
        tile = ntile_by_rank("_rank", n, 5)
        scored = ranked.withColumn(
            score, (F.lit(6) - tile) if invert else tile
        ).drop("_rank", "_pid")
    seg = scored.withColumn("segment", F.expr(_RFM_SEGMENTS_CASE))
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("users"),
            F.round(
                F.sum("recency_days").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_recency_days"),
            F.round(
                F.sum("frequency").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_frequency"),
            F.round(
                F.sum("m_micro").cast("double")
                / (F.count(F.lit(1)) * F.lit(1_000_000.0)),
                6,
            ).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Markov (removal-effect) attribution — the data-driven complement to
# the last-touch and linear attribution queries above (Anderl et al.,
# 2014; the standard "Markov chain attribution" of marketing
# analytics). Journeys = each user's ordered events strictly before
# their first purchase (ties broken by event_id — a total order both
# engines share); states = start, the four channel event types, and
# the absorbing conv/fail states. A channel's REMOVAL EFFECT is how
# much the model's conversion probability drops when every transition
# into that channel is redirected to fail; attribution shares
# normalize the removal effects.
#
# The conversion probability is DEFINED as 64-step absorption,
# computed by 6 successive matrix squarings (P^2, P^4, ... P^64) —
# the fixed-iteration discipline pagerank uses, squarings instead of
# steps so the chain is 6 joins, not 64. Matrix entries live in
# micro-units (longs): each squaring term is ROUND(a.p * b.p / 1e6)
# where the double product of two <= 1e6 micro-values is EXACT
# (< 2^53), and the <= |states| -term sums are integer — so every
# entry is bit-identical across engines and partition orders. All
# five scenarios (full + 4 removals) ride one frame with a scenario
# column: the whole post-aggregate computation operates on
# <= 5 x 7 x 7 rows (the PSI "bin-domain arithmetic" discipline).
_MARKOV_CHANNELS = ["click", "error", "signup", "view"]
_MARKOV_SQUARINGS = 6  # P^(2^6) = 64-step absorption


def _markov_square_ctes(iters: int = _MARKOV_SQUARINGS) -> str:
    ctes = []
    prev = "m0"
    for k in range(iters):
        nxt = f"m{k + 1}"
        ctes.append(f"""{nxt} AS MATERIALIZED (
      SELECT a.scenario, a.src, b.dst,
             SUM(CAST(ROUND(CAST(a.p AS DOUBLE) * b.p / 1000000, 0)
                      AS BIGINT)) AS p
      FROM {prev} a JOIN {prev} b
        ON a.scenario = b.scenario AND a.dst = b.src
      GROUP BY 1, 2, 3)""")
        prev = nxt
    return ",\n    ".join(ctes)


@query(
    "events_attribution_markov",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, date_trunc('second', ts) AS ts_s,
             event_id
      FROM events),
    fp AS (SELECT user_id, MIN(ts_s) AS pt FROM e
           WHERE event_type = 'purchase' GROUP BY 1),
    j AS (
      SELECT e.user_id, e.event_type, e.ts_s, e.event_id,
             (fp.user_id IS NOT NULL) AS converts
      FROM e LEFT JOIN fp USING (user_id)
      WHERE fp.pt IS NULL OR e.ts_s < fp.pt),
    seq AS (
      SELECT user_id, event_type, converts,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts_s, event_id) AS nxt,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts_s, event_id) AS rn
      FROM j),
    tr AS (
      SELECT 'start' AS src, event_type AS dst FROM seq WHERE rn = 1
      UNION ALL
      SELECT event_type,
             COALESCE(nxt, CASE WHEN converts THEN 'conv' ELSE 'fail' END)
      FROM seq),
    cnt AS MATERIALIZED (SELECT src, dst, COUNT(*) AS c FROM tr GROUP BY 1, 2),
    tot AS (SELECT src, SUM(c) AS t FROM cnt GROUP BY 1),
    prob AS (
      SELECT cnt.src, cnt.dst,
             CAST(ROUND(CAST(cnt.c AS DOUBLE) * 1000000 / tot.t, 0)
                  AS BIGINT) AS p
      FROM cnt JOIN tot USING (src)),
    scen AS (SELECT unnest(['full', 'click', 'error', 'signup', 'view'])
               AS scenario),
    m0 AS MATERIALIZED (
      SELECT scenario, src, dst, SUM(p) AS p FROM (
        SELECT s.scenario, prob.src,
               CASE WHEN prob.dst = s.scenario THEN 'fail'
                    ELSE prob.dst END AS dst,
               prob.p
        FROM prob CROSS JOIN scen s
        WHERE prob.src != s.scenario
        UNION ALL
        SELECT s.scenario, x.st, x.st, 1000000 FROM scen s
        CROSS JOIN (SELECT 'conv' AS st UNION ALL SELECT 'fail') x)
      GROUP BY 1, 2, 3),
    {_markov_square_ctes()},
    conv AS (
      SELECT scenario, p FROM m{_MARKOV_SQUARINGS}
      WHERE src = 'start' AND dst = 'conv'),
    base AS (SELECT p AS bp FROM conv WHERE scenario = 'full'),
    re AS (
      SELECT conv.scenario AS channel, base.bp, conv.p AS rp,
             1.0 - CAST(conv.p AS DOUBLE) / base.bp AS effect
      FROM conv CROSS JOIN base WHERE conv.scenario != 'full'),
    tot_re AS (SELECT SUM(effect) AS s FROM re)
    SELECT re.channel,
           ROUND(CAST(re.bp AS DOUBLE) / 1000000.0, 6) AS base_conversion,
           ROUND(CAST(re.rp AS DOUBLE) / 1000000.0, 6)
             AS removed_conversion,
           ROUND(re.effect, 6) AS removal_effect,
           ROUND(re.effect / tot_re.s, 6) AS attribution_share
    FROM re CROSS JOIN tot_re
    ORDER BY re.channel
    """,
)
def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _events_s(spark, sf_dir).select(
        "user_id", "event_type", "ts_s", "event_id"
    )
    fp = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("pt"))
    )
    j = (
        e.join(fp, "user_id", "left")
        .where(F.col("pt").isNull() | (F.col("ts_s") < F.col("pt")))
        .select(
            "user_id",
            "event_type",
            "ts_s",
            "event_id",
            F.col("pt").isNotNull().alias("converts"),
        )
    )
    w_u = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    seq = j.select(
        "user_id",
        "event_type",
        "converts",
        F.lead("event_type").over(w_u).alias("nxt"),
        F.row_number().over(w_u).alias("rn"),
    )
    tr = seq.where(F.col("rn") == 1).select(
        F.lit("start").alias("src"), F.col("event_type").alias("dst")
    ).unionByName(
        seq.select(
            F.col("event_type").alias("src"),
            F.coalesce(
                "nxt",
                F.when(F.col("converts"), "conv").otherwise("fail"),
            ).alias("dst"),
        )
    )
    cnt = tr.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("src").agg(F.sum("c").alias("t"))
    prob = cnt.join(tot, "src").select(
        "src",
        "dst",
        F.round(F.col("c").cast("double") * 1_000_000 / F.col("t"), 0)
        .cast("long")
        .alias("p"),
    )
    # scenario expansion via a literal-array explode — NOT a
    # crossJoin of driver-created frames (two BroadcastNestedLoopJoin
    # broadcasts on a 24-row input measured 13.5 s of pure overhead;
    # the explode is plan-local and costs nothing)
    scens = ["full"] + list(_MARKOV_CHANNELS)
    absorbing = local_frame(spark,
        [(s, st, st, 1_000_000) for s in scens for st in ("conv", "fail")],
        "scenario string, src string, dst string, p long",
    )
    m = (
        prob.select(
            F.explode(
                F.array(*[F.lit(s) for s in scens])
            ).alias("scenario"),
            "src",
            "dst",
            "p",
        )
        .where(F.col("src") != F.col("scenario"))
        .select(
            "scenario",
            "src",
            F.when(F.col("dst") == F.col("scenario"), "fail")
            .otherwise(F.col("dst"))
            .alias("dst"),
            "p",
        )
        .unionByName(absorbing)
        .groupBy("scenario", "src", "dst")
        .agg(F.sum("p").alias("p"))
        # each squaring below references the matrix TWICE — without
        # truncation the plan doubles per squaring (2^6 copies of the
        # whole journey pipeline; measured minutes instead of
        # seconds). The frame is <= scenarios x states^2 rows, so the
        # materialization is free.
        .localCheckpoint(eager=True)
    )
    for _ in range(_MARKOV_SQUARINGS):
        a = m.select(
            "scenario",
            F.col("src").alias("a_src"),
            F.col("dst").alias("mid"),
            F.col("p").alias("a_p"),
        )
        b = m.select(
            "scenario",
            F.col("src").alias("mid"),
            F.col("dst").alias("b_dst"),
            F.col("p").alias("b_p"),
        )
        m = (
            a.join(b, ["scenario", "mid"])
            .groupBy(
                "scenario",
                F.col("a_src").alias("src"),
                F.col("b_dst").alias("dst"),
            )
            .agg(
                F.sum(
                    F.round(
                        F.col("a_p").cast("double")
                        * F.col("b_p")
                        / 1_000_000,
                        0,
                    ).cast("long")
                ).alias("p")
            )
            .localCheckpoint(eager=True)
        )
    conv = m.where(
        (F.col("src") == "start") & (F.col("dst") == "conv")
    ).select("scenario", "p")
    base = conv.where(F.col("scenario") == "full").select(
        F.col("p").alias("bp")
    )
    re = (
        conv.where(F.col("scenario") != "full")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("scenario").alias("channel"),
            "bp",
            F.col("p").alias("rp"),
            (
                F.lit(1.0) - F.col("p").cast("double") / F.col("bp")
            ).alias("effect"),
        )
    )
    tot_re = re.agg(F.sum("effect").alias("s"))
    return (
        re.crossJoin(F.broadcast(tot_re))
        .select(
            "channel",
            F.round(F.col("bp").cast("double") / 1e6, 6).alias(
                "base_conversion"
            ),
            F.round(F.col("rp").cast("double") / 1e6, 6).alias(
                "removed_conversion"
            ),
            F.round(F.col("effect"), 6).alias("removal_effect"),
            F.round(F.col("effect") / F.col("s"), 6).alias(
                "attribution_share"
            ),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Theil–Sen robust trend — the breakdown-resistant twin of
# events_daily_trend's OLS: slope = median of all pairwise day-slopes
# (Theil 1950 / Sen 1968; 29% breakdown point vs OLS's zero — one
# anomalous day cannot swing it), intercept = median of
# (y − slope·x). The estimator the anomaly monitors should detrend
# with, since OLS is itself dragged by the anomalies they hunt.
#
# Determinism: pair slopes are single exact-IEEE divisions of integer
# deltas; the median of an even count is (a + b) expressed as
# SUM/COUNT over the two middle rows — one addition + one division,
# identical in both engines. Ties among equal slope values cannot
# affect the selected VALUES.
#
# Scale notes (100 TB): pairs form per event_type over the DAILY
# aggregate (x = day index), so the pair space is days², not events²
# — bounded by the calendar (a 10-year type is ~6.7M pairs, one
# shuffle-free flatmap over a broadcast-size per-type day list after
# the corpus-sized daily rollup). The rollup is the only corpus scan.
@query(
    "events_theil_sen_trend",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             date_diff('day', DATE '{_TREND_EPOCH}',
                       CAST(date_trunc('day', ts) AS DATE)) AS x,
             COUNT(*) AS y
      FROM events GROUP BY 1, 2),
    pr AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s
      FROM d a JOIN d b
        ON b.event_type = a.event_type AND b.x > a.x),
    med AS (
      SELECT event_type,
             CAST(SUM(s) AS DOUBLE) / COUNT(*) AS ts_slope,
             CAST(MAX(np) AS BIGINT) AS n_pairs
      FROM (
        SELECT event_type, s,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS np
        FROM pr)
      WHERE rn IN ((np + 1) // 2, (np + 2) // 2)
      GROUP BY event_type),
    resid AS (
      SELECT d.event_type, d.y - m.ts_slope * d.x AS r, m.ts_slope,
             m.n_pairs
      FROM d JOIN med m ON m.event_type = d.event_type),
    imed AS (
      SELECT event_type,
             CAST(SUM(r) AS DOUBLE) / COUNT(*) AS ts_intercept,
             CAST(MAX(ts_slope) AS DOUBLE) AS ts_slope,
             CAST(MAX(n_pairs) AS BIGINT) AS n_pairs
      FROM (
        SELECT event_type, r, ts_slope, n_pairs,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS nd
        FROM resid)
      WHERE rn IN ((nd + 1) // 2, (nd + 2) // 2)
      GROUP BY event_type)
    SELECT event_type, n_pairs,
           ROUND(ts_slope, 6) AS ts_slope,
           ROUND(ts_intercept, 6) AS ts_intercept
    FROM imed
    """,
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit(_TREND_EPOCH).cast("date"),
        ).alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    a = d.alias("a")
    b = d.alias("b")
    pr = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("s"),
    )

    def _median(df: DataFrame, val: str, keep: list[str]) -> DataFrame:
        wp = Window.partitionBy("event_type")
        ranked = df.select(
            "event_type",
            val,
            *keep,
            F.row_number().over(wp.orderBy(val)).alias("rn"),
            F.count(F.lit(1)).over(wp).alias("np"),
        )
        # integer-exact middle indices: (np+1) div 2 and (np+2) div 2
        mid = ranked.where(
            (F.col("rn") == F.expr("(np + 1) div 2"))
            | (F.col("rn") == F.expr("(np + 2) div 2"))
        )
        aggs = [
            (F.sum(val).cast("double") / F.count(F.lit(1))).alias(val),
            F.max("np").cast("long").alias("np"),
        ] + [F.max(k).alias(k) for k in keep]
        return mid.groupBy("event_type").agg(*aggs)

    med = _median(pr, "s", []).select(
        "event_type",
        F.col("s").alias("ts_slope"),
        F.col("np").alias("n_pairs"),
    )
    resid = d.join(med, "event_type").select(
        "event_type",
        (F.col("y") - F.col("ts_slope") * F.col("x")).alias("r"),
        "ts_slope",
        "n_pairs",
    )
    imed = _median(resid, "r", ["ts_slope", "n_pairs"])
    return imed.select(
        "event_type",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round("ts_slope", 6).alias("ts_slope"),
        F.round(F.col("r"), 6).alias("ts_intercept"),
    )


# --------------------------------------------------------------------------
# Split-conformal prediction interval for the daily forecast
# (Vovk et al. 2005; Lei et al. 2018) — distribution-free uncertainty
# for the forecasting family (ewma / holtwinters / seasonal naive):
# calibrate |y − ŷ| on held-out days, take the finite-sample-valid
# ⌈0.9·(n_cal+1)⌉-th smallest residual as the interval half-width
# q̂, and MEASURE the empirical coverage on the disjoint test days.
# Base forecast = seasonal naive ŷ(t) = y(t−7) (join on day index −7,
# robust to gaps); calibration/test split by day-index parity so both
# windows span the whole range.
#
# Determinism: residuals are integer |count deltas|; q̂ is an exact
# order statistic selected by integer rank arithmetic
# ((9·(n+1)+9) div 10 = ⌈0.9·(n+1)⌉); coverage is exact integers with
# one final division. No floats until the last column.
#
# Scale notes: everything after the corpus-sized daily rollup runs on
# the (type × day) table — the same bounded-aggregate shape as the
# trend/anomaly family.
@query(
    "events_conformal_daily_interval",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             date_diff('day', DATE '{_TREND_EPOCH}',
                       CAST(date_trunc('day', ts) AS DATE)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    f AS (
      SELECT c.event_type, c.x, ABS(c.y - p.y) AS r
      FROM d c JOIN d p
        ON p.event_type = c.event_type AND p.x = c.x - 7),
    cal AS (
      SELECT event_type, r,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY r, x) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_cal
      FROM f WHERE x % 2 = 0),
    q AS (
      SELECT event_type, CAST(MAX(n_cal) AS BIGINT) AS n_cal,
             CAST(MAX(r) AS BIGINT) AS q_hat
      FROM cal WHERE rn = (9 * (n_cal + 1) + 9) // 10
      GROUP BY event_type),
    t AS (
      SELECT f.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN f.r <= q.q_hat THEN 1 ELSE 0 END)
                  AS BIGINT) AS covered
      FROM f JOIN q ON q.event_type = f.event_type
      WHERE f.x % 2 = 1
      GROUP BY f.event_type)
    SELECT q.event_type, q.n_cal, t.n_test, q.q_hat, t.covered,
           CAST(t.covered AS DOUBLE) / t.n_test AS coverage
    FROM q JOIN t ON t.event_type = q.event_type
    """,
)
def events_conformal_daily_interval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit(_TREND_EPOCH).cast("date"),
        ).alias("x"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    cur = d.alias("c")
    prev = d.alias("p")
    f = cur.join(
        prev,
        (F.col("p.event_type") == F.col("c.event_type"))
        & (F.col("p.x") == F.col("c.x") - 7),
    ).select(
        F.col("c.event_type").alias("event_type"),
        F.col("c.x").alias("x"),
        F.abs(F.col("c.y") - F.col("p.y")).alias("r"),
    )
    wp = Window.partitionBy("event_type")
    cal = f.where(F.col("x") % 2 == 0).select(
        "event_type",
        "r",
        F.row_number().over(wp.orderBy("r", "x")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_cal"),
    )
    q = (
        cal.where(F.col("rn") == F.expr("(9 * (n_cal + 1) + 9) div 10"))
        .groupBy("event_type")
        .agg(
            F.max("n_cal").cast("long").alias("n_cal"),
            F.max("r").cast("long").alias("q_hat"),
        )
    )
    t = (
        f.where(F.col("x") % 2 == 1)
        .join(q, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("r") <= F.col("q_hat"), 1).otherwise(0)
            )
            .cast("long")
            .alias("covered"),
        )
    )
    return q.join(t, "event_type").select(
        "event_type",
        "n_cal",
        "n_test",
        "q_hat",
        "covered",
        (F.col("covered").cast("double") / F.col("n_test")).alias(
            "coverage"
        ),
    )


# --------------------------------------------------------------------------
# Daily autocorrelation function — the seasonality DETECTOR feeding
# the family that assumes a weekly cycle (events_dow_anomaly,
# events_seasonal_decomposition, the conformal gate's lag-7 naive):
# r_k at lags 1/7/14 per event type. With d_t = N·y_t − Σy (integer!)
# the mean-centering never leaves int64:
#   r_k = Σ_{t≤N−k} d_t·d_{t+k} / Σ_t d_t²
# (the 1/N² factors cancel) — exact integer numerator and
# denominator, ONE division per reported lag. No trig, no logs.
#
# Scale notes: daily rollup (the only corpus scan), then a bounded
# self-equi-join on (type, day+k) over the (type × day) table.
_ACF_LAGS = (1, 7, 14)


@query(
    "events_daily_acf",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             date_diff('day', DATE '{_TREND_EPOCH}',
                       CAST(date_trunc('day', ts) AS DATE)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s
      FROM d GROUP BY 1),
    c AS (
      SELECT d.event_type, d.x, m.n * d.y - m.s AS dt
      FROM d JOIN m ON m.event_type = d.event_type),
    den AS (
      SELECT event_type, CAST(SUM(dt * dt) AS BIGINT) AS den
      FROM c GROUP BY 1),
    num AS (
      SELECT a.event_type, k.lag,
             CAST(SUM(a.dt * b.dt) AS BIGINT) AS num
      FROM c a
      JOIN (SELECT UNNEST([{", ".join(str(k) for k in _ACF_LAGS)}]) AS lag) k
        ON TRUE
      JOIN c b ON b.event_type = a.event_type AND b.x = a.x + k.lag
      GROUP BY 1, 2)
    SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag, n.num, d.den,
           CAST(n.num AS DOUBLE) / NULLIF(d.den, 0) AS acf
    FROM num n JOIN den d ON d.event_type = n.event_type
    """,
)
def events_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit(_TREND_EPOCH).cast("date"),
        ).alias("x"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    c = d.join(m, "event_type").select(
        "event_type",
        "x",
        (F.col("n") * F.col("y") - F.col("s")).alias("dt"),
    )
    den = c.groupBy("event_type").agg(
        F.sum(F.col("dt") * F.col("dt")).cast("long").alias("den")
    )
    lags = local_frame(
        spark, [(k,) for k in _ACF_LAGS], "lag int"
    )
    a = c.alias("a")
    b = c.alias("b")
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.x") == F.col("a.x") + F.col("lag")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(F.sum(F.col("a.dt") * F.col("b.dt")).cast("long").alias("num"))
    )
    # NULL-on-degenerate parity (ADVICE r10): a constant daily series
    # has den = 0, where DuckDB's IEEE division yields Inf/NaN and
    # Spark's Divide yields NULL — the when-guard here and NULLIF in
    # the oracle make both engines agree on NULL.
    return num.join(den, "event_type").select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        "num",
        "den",
        F.when(
            F.col("den") != 0, F.col("num").cast("double") / F.col("den")
        ).alias("acf"),
    )


# --------------------------------------------------------------------------
# CUPED variance-reduced A/B lift (Deng et al., WSDM 2013) — the
# experimentation-platform op the plain readout (events_abtest_lift)
# lacks: adjust each user's post-period metric by their PRE-period
# activity, removing the between-user variance the experiment did not
# cause. θ = cov(x, y)/var(x) over all users (integer numerator and
# denominator via N·Σxy − Σx·Σy — exact), arm assignment is the
# deterministic user_id parity, and the adjusted lift
# (ȳ − θ·(x̄ − x̄_pool)) uses the identical expression tree in both
# engines.
#
# Scale notes: one conditional aggregate per user (corpus-sized
# groupBy), then 1-row reduces — the same shape as the plain A/B
# readout; θ adds no extra pass.
@query(
    "events_cuped_adjusted_lift",
    oracle=f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(SUM(CASE WHEN date_diff('day', DATE '{_TREND_EPOCH}',
                            CAST(date_trunc('day', ts) AS DATE)) < 15
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN date_diff('day', DATE '{_TREND_EPOCH}',
                            CAST(date_trunc('day', ts) AS DATE)) >= 15
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
    pool AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM u),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
             CAST(SUM(x) AS BIGINT) AS sx_arm,
             CAST(SUM(y) AS BIGINT) AS sy_arm
      FROM u GROUP BY 1),
    th AS (
      SELECT n, sx, sy,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / NULLIF(n * sxx - sx * sx, 0) AS theta
      FROM pool),
    adj AS (
      SELECT a.arm, a.n_arm,
             CAST(a.sy_arm AS DOUBLE) / a.n_arm AS raw_mean,
             CAST(a.sy_arm AS DOUBLE) / a.n_arm
               - t.theta * (CAST(a.sx_arm AS DOUBLE) / a.n_arm
                            - CAST(t.sx AS DOUBLE) / t.n) AS adj_mean,
             t.theta
      FROM arms a CROSS JOIN th t)
    SELECT
      MAX(CASE WHEN arm = 0 THEN n_arm END) AS n_a,
      MAX(CASE WHEN arm = 1 THEN n_arm END) AS n_b,
      ROUND(MAX(theta), 6) AS theta,
      ROUND(MAX(CASE WHEN arm = 1 THEN raw_mean END)
            - MAX(CASE WHEN arm = 0 THEN raw_mean END), 6) AS raw_lift,
      ROUND(MAX(CASE WHEN arm = 1 THEN adj_mean END)
            - MAX(CASE WHEN arm = 0 THEN adj_mean END), 6) AS cuped_lift
    FROM adj
    """,
)
def events_cuped_adjusted_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.date_trunc("day", F.col("ts")).cast("date"),
        F.lit(_TREND_EPOCH).cast("date"),
    )
    u = e.groupBy("user_id").agg(
        F.sum(F.when(day < 15, 1).otherwise(0)).cast("long").alias("x"),
        F.sum(F.when(day >= 15, 1).otherwise(0)).cast("long").alias("y"),
    ).select(
        (F.col("user_id") % 2).cast("long").alias("arm"), "x", "y"
    )
    pool = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ).select(
        "n",
        "sx",
        "sy",
        # NULL-on-degenerate parity (ADVICE r10): zero pre-period
        # variance makes the var denominator 0 — NULL in Spark,
        # Inf/NaN in DuckDB without the NULLIF twin in the oracle.
        F.when(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0,
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        ).alias("theta"),
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_arm"),
        F.sum("x").cast("long").alias("sx_arm"),
        F.sum("y").cast("long").alias("sy_arm"),
    )
    raw_mean = F.col("sy_arm").cast("double") / F.col("n_arm")
    adj_mean = raw_mean - F.col("theta") * (
        F.col("sx_arm").cast("double") / F.col("n_arm")
        - F.col("sx").cast("double") / F.col("n")
    )
    adj = arms.crossJoin(F.broadcast(pool)).select(
        "arm",
        "n_arm",
        raw_mean.alias("raw_mean"),
        adj_mean.alias("adj_mean"),
        "theta",
    )
    pick = lambda arm, col: F.max(  # noqa: E731
        F.when(F.col("arm") == arm, F.col(col))
    )
    return adj.agg(
        pick(0, "n_arm").alias("n_a"),
        pick(1, "n_arm").alias("n_b"),
        F.round(F.max("theta"), 6).alias("theta"),
        F.round(pick(1, "raw_mean") - pick(0, "raw_mean"), 6).alias(
            "raw_lift"
        ),
        F.round(pick(1, "adj_mean") - pick(0, "adj_mean"), 6).alias(
            "cuped_lift"
        ),
    )


# --------------------------------------------------------------------------
# Step-decay (half-life) attribution — completes the attribution
# family (last-touch, linear, Markov removal-effect): each prior
# touch earns weight 2^(−⌊Δdays/7⌋) relative to the purchase (credit
# halves per full week of staleness) and the purchase value splits
# proportionally. The DISCRETE half-life step is deliberate: the
# weight is the exact integer 10⁶ div 2^s (no libm pow anywhere), so
# the per-touch credit keeps the family's micro-unit determinism
# (one ROUND of value·10⁴·w/Σw per touch, the linear query's exact
# discipline).
#
# Scale notes: unlike linear (which needs only window COUNTS), decay
# needs per-(purchase, touch) Δt — a per-user pair join bounded by
# journeys² within each user, never cross-user; the heavy side
# shuffles once on user_id.
@query(
    "events_attribution_time_decay",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, value,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s
      FROM events),
    t AS (SELECT * FROM e WHERE event_type IN ('view', 'click')),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    j AS (
      SELECT p.event_id AS pid, p.value, t.event_type AS touch_type,
             1000000 // (1::BIGINT << LEAST(
               date_diff('day', CAST(date_trunc('day', t.ts_s) AS DATE),
                         CAST(date_trunc('day', p.ts_s) AS DATE)) // 7,
               19)) AS w
      FROM p JOIN t
        ON t.user_id = p.user_id
       AND (t.ts_s < p.ts_s
            OR (t.ts_s = p.ts_s AND t.event_id < p.event_id))),
    c AS (
      SELECT touch_type, pid,
             CAST(ROUND(value * 10000.0 * w
                        / SUM(w) OVER (PARTITION BY pid), 0) AS BIGINT)
               AS micro
      FROM j),
    touched AS (
      SELECT touch_type,
             CAST(COUNT(DISTINCT pid) AS BIGINT) AS purchases,
             CAST(SUM(micro) AS BIGINT) AS micro
      FROM c GROUP BY touch_type),
    direct AS (
      SELECT 'direct' AS touch_type,
             CAST(COUNT(*) AS BIGINT) AS purchases,
             CAST(SUM(CAST(ROUND(value * 10000.0, 0) AS BIGINT))
                  AS BIGINT) AS micro
      FROM p WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.pid = p.event_id))
    SELECT touch_type, purchases,
           ROUND(CAST(COALESCE(micro, 0) AS DOUBLE) / 10000.0, 4)
             AS attributed_value
    FROM (SELECT * FROM touched UNION ALL
          SELECT * FROM direct WHERE purchases > 0)
    """,
)
def events_attribution_time_decay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _events_s(spark, sf_dir)
    t = e.where(F.col("event_type").isin("view", "click")).alias("t")
    p = e.where(F.col("event_type") == "purchase").alias("p")
    delta_days = F.datediff(
        F.date_trunc("day", F.col("p.ts_s")).cast("date"),
        F.date_trunc("day", F.col("t.ts_s")).cast("date"),
    )
    j = p.join(
        t,
        (F.col("t.user_id") == F.col("p.user_id"))
        & (
            (F.col("t.ts_s") < F.col("p.ts_s"))
            | (
                (F.col("t.ts_s") == F.col("p.ts_s"))
                & (F.col("t.event_id") < F.col("p.event_id"))
            )
        ),
    ).select(
        F.col("p.event_id").alias("pid"),
        F.col("p.value").alias("value"),
        F.col("t.event_type").alias("touch_type"),
        delta_days.alias("dd"),
    ).withColumn(
        "w",
        F.expr(
            "1000000 div shiftleft(cast(1 as bigint),"
            " cast(least(dd div 7, 19) as int))"
        ),
    )
    wsum = Window.partitionBy("pid")
    c = j.select(
        "touch_type",
        "pid",
        F.round(
            F.col("value") * 10000.0 * F.col("w")
            / F.sum("w").over(wsum),
            0,
        )
        .cast("long")
        .alias("micro"),
    )
    touched = c.groupBy("touch_type").agg(
        F.count_distinct("pid").cast("long").alias("purchases"),
        F.sum("micro").cast("long").alias("micro"),
    )
    direct = (
        p.join(
            j.select(F.col("pid").alias("event_id")).distinct(),
            "event_id",
            "left_anti",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("purchases"),
            F.sum(F.round(F.col("value") * 10000.0, 0).cast("long"))
            .cast("long")
            .alias("micro"),
        )
        .select(F.lit("direct").alias("touch_type"), "purchases", "micro")
        .where(F.col("purchases") > 0)
    )
    return touched.unionByName(direct).select(
        "touch_type",
        "purchases",
        F.round(
            F.coalesce(F.col("micro"), F.lit(0)).cast("double") / 10000.0,
            4,
        ).alias("attributed_value"),
    )
