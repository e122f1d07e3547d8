"""Statistical / reshaping operators: pivot, exact percentiles,
moment-based variance.

Variance/stddev deliberately avoid the engines' native aggregates
(Welford accumulation is partition-order-dependent in floating
point); instead the moments Σx and Σx² are exact decimal sums and the
final formula is a handful of deterministic double ops — the same
trick the rest of the catalog uses for money sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fabric_claims_spark.localframe import local_frame
from fabric_claims_spark.queries import query
from fabric_claims_spark.queries._util import dsum, money
from fabric_claims_spark.sources.parquet import load_table


# --------------------------------------------------------------------------
# Pivot — long→wide reshape (report matrix visual shape). Column names
# must match the oracle's conditional-aggregate aliases.
@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
      CAST(ROUND(SUM(CASE WHEN o_orderstatus='F'
            THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 4) AS DOUBLE) AS F,
      CAST(ROUND(SUM(CASE WHEN o_orderstatus='O'
            THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 4) AS DOUBLE) AS O,
      CAST(ROUND(SUM(CASE WHEN o_orderstatus='P'
            THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 4) AS DOUBLE) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum(money("o_totalprice")), 4).cast("double"))
    )
    return pivoted


# --------------------------------------------------------------------------
# Unpivot — wide→long reshape (the pivot inverse; Spark df.unpivot /
# melt). Status-count columns fold back into (status, n) rows.
@query(
    "unpivot_status_counts",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
        CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS P
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, status, n
    FROM wide UNPIVOT (n FOR status IN (F, O, P))
    """,
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["F", "O", "P"],
        variableColumnName="status",
        valueColumnName="n",
    )


# --------------------------------------------------------------------------
# Range join — value-in-interval matching via the bucketized operator
# (operators/joins.range_join_bucketed): order values classified into
# price bands defined as an interval table.
@query(
    "orders_price_band_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
      ('low',    0.0,      100000.0),
      ('mid',    100000.0, 300000.0),
      ('high',   300000.0, 600000.0))
    SELECT b.band, COUNT(*) AS orders_in_band,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
             AS band_total
    FROM orders o JOIN bands b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def orders_price_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.operators.joins import range_join_bucketed

    o = load_table(spark, sf_dir, "orders")
    bands = local_frame(spark,
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 600000.0)],
        "band string, lo double, hi double",
    )
    # half-open intervals: shrink hi by epsilon is wrong for doubles —
    # re-check with the exact predicate instead
    joined = range_join_bucketed(
        o, bands, left_val="o_totalprice", right_lo="lo", right_hi="hi",
        bucket_width=50000.0,
    ).where(F.col("o_totalprice") < F.col("hi"))
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("orders_in_band"),
        dsum(money("o_totalprice")).alias("band_total"),
    )


# --------------------------------------------------------------------------
# Exact percentiles — sort-based with linear interpolation (same
# formula in both engines: rank = (n-1)*p).
@query(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


# --------------------------------------------------------------------------
# ntile — equal-frequency bucketing under a total deterministic order.
# No partitionless window: the global rank comes from the distributed
# selection operator (range repartition → per-bucket rank → broadcast
# offsets; operators/ranking.py), and NTILE(4) of a known total is
# pure cut-point arithmetic — every stage partition-parallel, same
# result hash as the window formulation.
@query(
    "order_value_quartiles",
    oracle="""
    WITH q AS (
      SELECT o_totalprice,
             CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
               AS quartile
      FROM orders)
    SELECT quartile, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM q GROUP BY quartile
    """,
)
def order_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.operators.ranking import ntile_by_rank, with_global_rank

    o = load_table(spark, sf_dir, "orders")
    ranked, n = with_global_rank(
        o.select("o_totalprice", "o_orderkey"), ["o_totalprice", "o_orderkey"]
    )
    q = ranked.select(
        "o_totalprice", ntile_by_rank("_rank", n, 4).alias("quartile")
    )
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


# --------------------------------------------------------------------------
# Approximate variants (HLL distinct, t-digest-style quantiles) — the
# scale substitutes offered beside every exact aggregate. Sketch
# internals differ across engines, so this registers rows-only; the
# companion exact queries above are the oracle-checked twins.
@query("approx_aggregates", oracle=None)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_unique_customers"),
        F.percentile_approx("o_totalprice", 0.5).alias("approx_median_price"),
        F.percentile_approx("o_totalprice", 0.99).alias("approx_p99_price"),
    )


# --------------------------------------------------------------------------
# Native session_window (batch form): gap-based sessions as a built-in
# grouping — the windowing twin of the lag/cumsum sessionization query
# (second-truncated timestamps; the gap boundary is INCLUSIVE — an
# event arriving exactly 1800 s after the previous one still merges,
# so a new session opens only at gap > 30 min, matching
# session_window's half-open [start, end+gap) semantics).
@query(
    "events_session_window",
    oracle="""
    WITH g AS (
      -- two subtleties pinned by an sf0.1 boundary case (user 511,
      -- events second-truncated to exactly 1800 s apart):
      -- (1) Spark's session_window gap boundary is INCLUSIVE — an
      --     event arriving exactly `gap` after the previous one
      --     still merges — so the new-session test is strict
      --     (diff > 1800), not >= 1800;
      -- (2) the cumulative sum must reuse the lag's (ts, event_id)
      --     total order: ordering by the truncated ts_s leaves
      --     same-second ties arbitrary, and a flipped (0,1) pair
      --     splits a session.
      SELECT user_id, ts, event_id,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s,
             CASE WHEN LAG(CAST(date_trunc('second', ts) AS TIMESTAMP))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR date_diff('second',
                       LAG(CAST(date_trunc('second', ts) AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       CAST(date_trunc('second', ts) AS TIMESTAMP)) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts_s,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g)
    SELECT user_id, MIN(ts_s) AS session_start, COUNT(*) AS events_in_session
    FROM s GROUP BY user_id, sid
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_s", F.date_trunc("second", F.col("ts"))
    )
    return (
        e.groupBy(F.session_window("ts_s", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("events_in_session"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "events_in_session",
        )
    )


# --------------------------------------------------------------------------
# Moment-based stats: mean / population variance / stddev from exact
# decimal Σx, Σx² (deterministic under any partitioning).
@query(
    "order_value_stats",
    oracle="""
    WITH m AS (
      -- DECIMAL(19,4): 18-digit decimals multiply in int64 in DuckDB
      -- and overflow; 19 digits forces int128. Σx² rounds to integer
      -- before the double cast so the scaled value stays under 2^53
      -- (DuckDB's decimal→double cast is not correctly rounded).
      SELECT o_orderstatus,
             COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(19,4))), 4) AS DOUBLE) AS sx,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                      * CAST(o_totalprice AS DECIMAL(19,4))), 0) AS DOUBLE) AS sxx
      FROM orders GROUP BY o_orderstatus)
    SELECT o_orderstatus, n,
           ROUND(sx / n, 4) AS mean_value,
           ROUND(sxx / n - (sx / n) * (sx / n), 2) AS var_pop,
           ROUND(sqrt(sxx / n - (sx / n) * (sx / n)), 4) AS stddev_pop
    FROM m
    """,
)
def order_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    moments = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(money("o_totalprice")), 4).cast("double").alias("sx"),
        F.round(F.sum(money("o_totalprice") * money("o_totalprice")), 0)
        .cast("double")
        .alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - mean * mean
    return moments.select(
        "o_orderstatus",
        "n",
        F.round(mean, 4).alias("mean_value"),
        F.round(var, 2).alias("var_pop"),
        F.round(F.sqrt(var), 4).alias("stddev_pop"),
    )


# --------------------------------------------------------------------------
# KMV (bottom-k / K-Minimum-Values) distinct-count sketch — the
# engine-agnostic alternative to HLL: hash every key, keep the k
# smallest DISTINCT hash values, estimate distinct = (k-1) / kth-min
# (normalized to [0,1)). Unlike approx_count_distinct (whose HLL
# register layout is engine-internal, hence rows-only above), KMV is
# a deterministic function of the md5 key hashes — so the ESTIMATE
# itself is hash-checked against DuckDB. Scale shape: one distinct on
# the hash (map-side combined) + TakeOrderedAndProject for the bottom
# k; the sketch is k values however large the corpus — mergeable
# across partitions/tables by union + re-limit.
_KMV_K = 256
_KMV_RANGE = float(1 << 60)  # md5_long values are uniform in [0, 2^60)


@query(
    "kmv_distinct_estimate",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),1,15))::BIGINT
               AS h
      FROM orders),
    bottom AS (
      SELECT MAX(h) AS kth_min, COUNT(*) AS k_seen FROM (
        SELECT h FROM h ORDER BY h LIMIT {_KMV_K})),
    exact AS (
      SELECT COUNT(DISTINCT o_custkey) AS exact_distinct FROM orders)
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST(b.kth_min AS BIGINT) AS kth_min,
           ({_KMV_K}.0 - 1.0) * {_KMV_RANGE!r} / b.kth_min AS est_distinct,
           CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
           (({_KMV_K}.0 - 1.0) * {_KMV_RANGE!r} / b.kth_min - e.exact_distinct)
             / e.exact_distinct AS rel_error
    FROM bottom b, exact e
    """,
)
def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.extensions.dedup import md5_long

    o = load_table(spark, sf_dir, "orders")
    bottom = (
        o.select(md5_long(F.col("o_custkey").cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(_KMV_K)
        .agg(F.max("h").alias("kth_min"))
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    est = F.lit(_KMV_K - 1.0) * F.lit(_KMV_RANGE) / F.col("kth_min")
    return (
        bottom.crossJoin(exact)
        .select(
            F.lit(_KMV_K).cast("long").alias("k"),
            F.col("kth_min").cast("long").alias("kth_min"),
            est.alias("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            ((est - F.col("exact_distinct")) / F.col("exact_distinct")).alias(
                "rel_error"
            ),
        )
    )


# --------------------------------------------------------------------------
# Pearson correlation matrix from exact decimal moments — the same
# moment trick as order_value_stats, extended to cross-moments. A
# built-in corr() sums doubles in partition order (non-deterministic
# at scale); here every Σx, Σy, Σxy, Σx², Σy² is an exact decimal sum
# (product sums rounded to integer so the double cast stays under
# 2^53), and each correlation is one deterministic double chain. One
# scan, one aggregate row, zero shuffles beyond the partial-agg merge.
@query(
    "lineitem_correlations",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,4))), 4) AS DOUBLE) AS sq,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,4))), 4) AS DOUBLE) AS sp,
             CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(19,4))), 4) AS DOUBLE) AS sd,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,4))
                            * CAST(l_quantity AS DECIMAL(19,4))), 0) AS DOUBLE) AS sqq,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                            * CAST(l_extendedprice AS DECIMAL(19,4))), 0) AS DOUBLE) AS spp,
             CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(19,4))
                            * CAST(l_discount AS DECIMAL(19,4))), 4) AS DOUBLE) AS sdd,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,4))
                            * CAST(l_extendedprice AS DECIMAL(19,4))), 0) AS DOUBLE) AS sqp,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,4))
                            * CAST(l_discount AS DECIMAL(19,4))), 4) AS DOUBLE) AS sqd,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                            * CAST(l_discount AS DECIMAL(19,4))), 4) AS DOUBLE) AS spd
      FROM lineitem)
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * sqp - sq * sp)
                 / sqrt((CAST(n AS DOUBLE) * sqq - sq * sq)
                        * (CAST(n AS DOUBLE) * spp - sp * sp)), 6)
             AS corr_qty_price,
           ROUND((CAST(n AS DOUBLE) * sqd - sq * sd)
                 / sqrt((CAST(n AS DOUBLE) * sqq - sq * sq)
                        * (CAST(n AS DOUBLE) * sdd - sd * sd)), 6)
             AS corr_qty_discount,
           ROUND((CAST(n AS DOUBLE) * spd - sp * sd)
                 / sqrt((CAST(n AS DOUBLE) * spp - sp * sp)
                        * (CAST(n AS DOUBLE) * sdd - sd * sd)), 6)
             AS corr_price_discount
    FROM m
    """,
)
def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(19,4)"
    q = F.col("l_quantity").cast(dec)
    p = F.col("l_extendedprice").cast(dec)
    d = F.col("l_discount").cast(dec)

    def s(c, scale):
        return F.round(F.sum(c), scale).cast("double")

    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        s(q, 4).alias("sq"),
        s(p, 4).alias("sp"),
        s(d, 4).alias("sd"),
        s(q * q, 0).alias("sqq"),
        s(p * p, 0).alias("spp"),
        s(d * d, 4).alias("sdd"),
        s(q * p, 0).alias("sqp"),
        s(q * d, 4).alias("sqd"),
        s(p * d, 4).alias("spd"),
    )
    nd = F.col("n").cast("double")

    def corr(sxy, sx, sy, sxx, syy):
        return F.round(
            (nd * F.col(sxy) - F.col(sx) * F.col(sy))
            / F.sqrt(
                (nd * F.col(sxx) - F.col(sx) * F.col(sx))
                * (nd * F.col(syy) - F.col(sy) * F.col(sy))
            ),
            6,
        )

    return m.select(
        "n",
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_discount"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_discount"),
    )


# --------------------------------------------------------------------------
# Exact per-group median — via the value-domain histogram CDF, NOT a
# per-group row sort: a window partitioned by a 5-value priority key
# would put 1/5 of all orders in one sort partition (the skew the
# docs_length_deciles histogram avoids). Here the window runs over
# (priority, distinct price) histogram rows — bounded by the value
# domain — and the median is the avg of the two middle positions
# ((n+1) div 2 and (n+2) div 2, equal when n is odd). The halving is
# a division by 2 in doubles (exact in binary), after the exact
# decimal sum of the two middle values.
@query(
    "orders_median_by_priority",
    oracle="""
    WITH h AS (
      SELECT o_orderpriority AS priority,
             CAST(o_totalprice AS DECIMAL(18,4)) AS v,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2),
    c AS (
      SELECT priority, v, cnt,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY v) AS cum,
             SUM(cnt) OVER (PARTITION BY priority) AS n
      FROM h)
    SELECT priority, CAST(MAX(n) AS BIGINT) AS orders,
           CAST(CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                     + MIN(CASE WHEN cum >= (n + 2) // 2 THEN v END)
                     AS DOUBLE) / 2 AS DOUBLE) AS median_price
    FROM c GROUP BY priority
    """,
)
def orders_median_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    h = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        money("o_totalprice").alias("v"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.partitionBy("priority").orderBy("v")
    wn = Window.partitionBy("priority")
    c = h.select(
        "priority",
        "v",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    p1 = F.expr("(n + 1) div 2")
    p2 = F.expr("(n + 2) div 2")
    return c.groupBy("priority").agg(
        F.max("n").cast("long").alias("orders"),
        (
            (
                F.min(F.when(F.col("cum") >= p1, F.col("v")))
                + F.min(F.when(F.col("cum") >= p2, F.col("v")))
            ).cast("double")
            / 2
        )
        .cast("double")
        .alias("median_price"),
    )


# --------------------------------------------------------------------------
# Column profiling (the Deequ/Great-Expectations summary an engine
# owes its users): one scan of orders producing per-column row count,
# null count, distinct count, and min/max rendered through
# decimal/ISO casts (the only cross-engine-stable string forms for
# numerics and dates). Single aggregate pass; the multiple exact
# distinct counts expand map-side, and the long-format reshape is a
# driver-free stack of the one result row.
@query(
    "orders_column_profile",
    oracle="""
    WITH a AS (
      SELECT COUNT(*) AS n,
        COUNT(o_orderkey) AS nn_key, COUNT(DISTINCT o_orderkey) AS d_key,
        CAST(CAST(MIN(o_orderkey) AS DECIMAL(18,4)) AS VARCHAR) AS mn_key,
        CAST(CAST(MAX(o_orderkey) AS DECIMAL(18,4)) AS VARCHAR) AS mx_key,
        COUNT(o_totalprice) AS nn_price,
        COUNT(DISTINCT o_totalprice) AS d_price,
        CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,4)) AS VARCHAR) AS mn_price,
        CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,4)) AS VARCHAR) AS mx_price,
        COUNT(o_orderstatus) AS nn_status,
        COUNT(DISTINCT o_orderstatus) AS d_status,
        MIN(o_orderstatus) AS mn_status, MAX(o_orderstatus) AS mx_status,
        COUNT(o_orderdate) AS nn_date, COUNT(DISTINCT o_orderdate) AS d_date,
        CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS mn_date,
        CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS mx_date
      FROM orders)
    SELECT 'o_orderkey' AS column_name, n AS n_rows, n - nn_key AS nulls,
           d_key AS distinct_count, mn_key AS min_repr, mx_key AS max_repr
    FROM a
    UNION ALL
    SELECT 'o_totalprice', n, n - nn_price, d_price, mn_price, mx_price FROM a
    UNION ALL
    SELECT 'o_orderstatus', n, n - nn_status, d_status, mn_status, mx_status
    FROM a
    UNION ALL
    SELECT 'o_orderdate', n, n - nn_date, d_date, mn_date, mx_date FROM a
    """,
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    def dec_s(c: F.Column) -> F.Column:
        # numeric extremum first, THEN the stable string rendering
        return c.cast("decimal(18,4)").cast("string")

    a = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("d_key"),
        dec_s(F.min("o_orderkey")).alias("mn_key"),
        dec_s(F.max("o_orderkey")).alias("mx_key"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("d_price"),
        dec_s(F.min("o_totalprice")).alias("mn_price"),
        dec_s(F.max("o_totalprice")).alias("mx_price"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("d_status"),
        F.min("o_orderstatus").alias("mn_status"),
        F.max("o_orderstatus").alias("mx_status"),
        F.count("o_orderdate").alias("nn_date"),
        F.countDistinct("o_orderdate").alias("d_date"),
        F.min("o_orderdate").cast("date").cast("string").alias("mn_date"),
        F.max("o_orderdate").cast("date").cast("string").alias("mx_date"),
    )
    stacked = a.select(
        F.expr(
            "stack(4,"
            " 'o_orderkey', n - nn_key, d_key, mn_key, mx_key,"
            " 'o_totalprice', n - nn_price, d_price, mn_price, mx_price,"
            " 'o_orderstatus', n - nn_status, d_status, mn_status, mx_status,"
            " 'o_orderdate', n - nn_date, d_date, mn_date, mx_date)"
            " AS (column_name, nulls, distinct_count, min_repr, max_repr)"
        ),
        F.col("n").alias("n_rows"),
    )
    return stacked.select(
        "column_name", "n_rows", "nulls", "distinct_count", "min_repr", "max_repr"
    )


# --------------------------------------------------------------------------
# Heavy hitters — exact two-pass frequent-key detection with
# Misra–Gries candidate pruning (extensions/sketches.py). Pass 1 runs
# a bounded-memory per-partition sketch (no shuffle, one of the two
# sanctioned Arrow map passes); pass 2 recounts only the broadcast
# candidate set exactly, so the result is identical to the plain SQL
# frequency filter the oracle runs — partitioning- and order-
# independent. The point at 100 TB: the full key domain never enters
# a shuffle; only ≤ ceil(1/s)·partitions candidate keys do.
@query(
    "events_heavy_hitters",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS total FROM events)
    SELECT e.event_type,
           COUNT(*) AS exact_count,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n.total), 6) AS share
    FROM events e CROSS JOIN n
    GROUP BY 1
    HAVING COUNT(*) >= CEIL(0.05 * MAX(n.total))
    ORDER BY exact_count DESC, event_type
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.extensions.sketches import heavy_hitters_2pass

    e = load_table(spark, sf_dir, "events")
    return heavy_hitters_2pass(e, "event_type", support=0.05).orderBy(
        F.col("exact_count").desc(), "event_type"
    )


# --------------------------------------------------------------------------
# Per-group KMV distinct sketch — the grouped form of
# kmv_distinct_estimate: bottom-k hash sketch PER event_type, so
# per-group distinct-user estimates merge across partitions/batches
# (union the hash sets, re-take bottom k) without ever holding a
# group's full key set. When a group has fewer than k distinct hashes
# the sketch IS the exact set (k_seen < k ⇒ estimate = k_seen) — both
# branches deterministic, so the estimate itself hash-checks.
#
# Scale notes (100 TB): one (type, hash) distinct aggregate (map-side
# partial), then a per-group window over at most the distinct-hash
# domain to take bottom-k; the final frame is |groups| rows. The rank
# window partitions by group — skew-safe for any group count; a
# single pathological group degenerates to the global-KMV TakeOrdered
# shape, which is the intended fallback.
_GKMV_K = 64


@query(
    "events_kmv_users_per_type",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
      FROM events),
    r AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h),
    b AS (
      SELECT event_type, MAX(h) AS kth_min,
             COUNT(*) AS k_seen
      FROM r WHERE rn <= {_GKMV_K} GROUP BY 1),
    e AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY 1)
    SELECT b.event_type,
           CAST(b.k_seen AS BIGINT) AS k_seen,
           CASE WHEN b.k_seen < {_GKMV_K} THEN CAST(b.k_seen AS DOUBLE)
                ELSE ({_GKMV_K}.0 - 1.0) * {float(1 << 60)!r} / b.kth_min
           END AS est_distinct,
           CAST(e.exact_distinct AS BIGINT) AS exact_distinct
    FROM b JOIN e ON b.event_type = e.event_type
    ORDER BY b.event_type
    """,
)
def events_kmv_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fabric_claims_spark.extensions.dedup import md5_long

    e = load_table(spark, sf_dir, "events")
    h = e.select(
        "event_type", md5_long(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    b = (
        h.withColumn("rn", rn)
        .where(F.col("rn") <= _GKMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("kth_min"), F.count(F.lit(1)).alias("k_seen"))
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = F.when(
        F.col("k_seen") < _GKMV_K, F.col("k_seen").cast("double")
    ).otherwise(
        F.lit(_GKMV_K - 1.0) * F.lit(float(1 << 60)) / F.col("kth_min")
    )
    return (
        b.join(exact, "event_type")
        .select(
            "event_type",
            F.col("k_seen").cast("long").alias("k_seen"),
            est.alias("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Join-key skew profile — the diagnostic that decides between a plain
# hash join and the salted/AQE path (operators/joins.py): per
# candidate key, distinct values, top-1 and top-10 key concentration,
# and rows-per-key max/avg ratio. Consumes only per-key counts
# (aggregate-then-analyze); the top-k window runs over the bounded
# per-key rollup ordered by count.
@query(
    "orders_key_skew_profile",
    oracle="""
    WITH k AS (
      SELECT o_custkey AS key, COUNT(*) AS c FROM orders GROUP BY 1),
    s AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, key) AS rn FROM k)
    SELECT 'o_custkey' AS key_col,
           CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS distinct_keys,
           CAST((SELECT SUM(c) FROM k) AS BIGINT) AS total_rows,
           CAST((SELECT MAX(c) FROM k) AS BIGINT) AS max_rows_per_key,
           ROUND((SELECT MAX(c) FROM k)
                 / ((SELECT SUM(c) FROM k) * 1.0 / (SELECT COUNT(*) FROM k)),
                 6) AS skew_ratio,
           ROUND((SELECT SUM(c) FROM s WHERE rn <= 1) * 1.0
                 / (SELECT SUM(c) FROM k), 6) AS top1_share,
           ROUND((SELECT SUM(c) FROM s WHERE rn <= 10) * 1.0
                 / (SELECT SUM(c) FROM k), 6) AS top10_share
    """,
)
def orders_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("c")
    )
    rn = F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("key")))
    s = k.withColumn("rn", rn)
    agg = k.agg(
        F.count(F.lit(1)).alias("distinct_keys"),
        F.sum("c").alias("total_rows"),
        F.max("c").alias("max_rows_per_key"),
    )
    tops = s.agg(
        F.sum(F.when(F.col("rn") <= 1, F.col("c"))).alias("t1"),
        F.sum(F.when(F.col("rn") <= 10, F.col("c"))).alias("t10"),
    )
    return agg.crossJoin(tops).select(
        F.lit("o_custkey").alias("key_col"),
        "distinct_keys",
        "total_rows",
        "max_rows_per_key",
        F.round(
            F.col("max_rows_per_key")
            / (F.col("total_rows") * F.lit(1.0) / F.col("distinct_keys")),
            6,
        ).alias("skew_ratio"),
        F.round(F.col("t1") * F.lit(1.0) / F.col("total_rows"), 6).alias(
            "top1_share"
        ),
        F.round(F.col("t10") * F.lit(1.0) / F.col("total_rows"), 6).alias(
            "top10_share"
        ),
    )


# --------------------------------------------------------------------------
# Z-order (Morton) keys — the bit-interleave at the heart of
# operators/layout.py (Delta OPTIMIZE ZORDER BY analog), hash-checked
# against the identical shift/mask/or expression in DuckDB. The
# domain is folded to 8 bits per column here purely so the oracle
# exercises every bit position; write_zordered + rank_normalize apply
# the same key to full domains. Pure codegen projection — the layout
# write's only extra cost is its range partition (test_layout proves
# the pruning payoff from parquet footer stats).
@query(
    "lineitem_zorder_keys",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ((((px >> 0) & 1) << 0) | (((sx >> 0) & 1) << 1) | (((px >> 1) & 1) << 2) | (((sx >> 1) & 1) << 3) | (((px >> 2) & 1) << 4) | (((sx >> 2) & 1) << 5) | (((px >> 3) & 1) << 6) | (((sx >> 3) & 1) << 7) | (((px >> 4) & 1) << 8) | (((sx >> 4) & 1) << 9) | (((px >> 5) & 1) << 10) | (((sx >> 5) & 1) << 11) | (((px >> 6) & 1) << 12) | (((sx >> 6) & 1) << 13) | (((px >> 7) & 1) << 14) | (((sx >> 7) & 1) << 15)) AS zval
    FROM (
      SELECT l_orderkey, l_linenumber,
             l_partkey % 256 AS px, l_suppkey % 256 AS sx
      FROM lineitem)
    ORDER BY zval DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def lineitem_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.operators.layout import zorder_key

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 256).alias("px"),
        (F.col("l_suppkey") % 256).alias("sx"),
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            zorder_key(["px", "sx"], bits=8).alias("zval"),
        )
        .orderBy(F.col("zval").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Count-of-counts distribution (the TPC-H Q13 shape): how many
# customers placed exactly k orders, including zero via a left join.
# A histogram OVER a histogram — both levels are hash aggregates with
# map-side combine; the second operates on the per-customer rollup.
@query(
    "customer_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1)
    SELECT n_orders, COUNT(*) AS customers
    FROM per_cust
    GROUP BY 1
    ORDER BY customers DESC, n_orders DESC
    """,
)
def customer_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("customers"))
        .orderBy(F.col("customers").desc(), F.col("n_orders").desc())
    )


# --------------------------------------------------------------------------
# MAD (median absolute deviation) robust outliers — the outlier
# detector that survives the outliers it hunts (3σ z-scores inflate σ
# with the very anomalies being flagged; the median/MAD pair does
# not). Both medians run the histogram-CDF construction of
# orders_median_by_priority — value-domain aggregates, never raw-row
# sorts — and the deviation histogram derives from the first by
# exact-decimal |v − med|, so every quantity matches DuckDB
# bit-for-bit. Output: per priority, the median, the MAD, and how
# many orders sit beyond 3 MADs.
@query(
    "orders_mad_outliers",
    oracle="""
    WITH h AS (
      SELECT o_orderpriority AS priority,
             CAST(o_totalprice AS DECIMAL(18,4)) AS v,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2),
    c AS (
      SELECT priority, v, cnt,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY v) AS cum,
             SUM(cnt) OVER (PARTITION BY priority) AS n
      FROM h),
    -- med2 = 2*median, mad4 = 4*MAD: sums of scale-4 decimals stay
    -- EXACT decimals (engine division by 2 promotes to double in
    -- DuckDB but stays decimal in Spark -- ulp divergence); the only
    -- IEEE divisions are the two output casts.
    med AS (
      SELECT priority,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END)
             + MIN(CASE WHEN cum >= (n + 2) // 2 THEN v END) AS med2
      FROM c GROUP BY priority),
    dh AS (
      SELECT h.priority, ABS(2 * h.v - m.med2) AS d2, SUM(h.cnt) AS cnt
      FROM h JOIN med m ON h.priority = m.priority
      GROUP BY 1, 2),
    dc AS (
      SELECT priority, d2, cnt,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY d2) AS cum,
             SUM(cnt) OVER (PARTITION BY priority) AS n
      FROM dh),
    mad AS (
      SELECT priority,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN d2 END)
             + MIN(CASE WHEN cum >= (n + 2) // 2 THEN d2 END) AS mad4
      FROM dc GROUP BY priority)
    SELECT m.priority,
           CAST(m.med2 AS DOUBLE) / 2 AS median_price,
           CAST(a.mad4 AS DOUBLE) / 4 AS mad,
           CAST(SUM(CASE WHEN 4 * ABS(2 * h.v - m.med2) > 3 * a.mad4
                    THEN h.cnt ELSE 0 END) AS BIGINT) AS outliers
    FROM h JOIN med m ON h.priority = m.priority
    JOIN mad a ON h.priority = a.priority
    GROUP BY 1, 2, 3
    ORDER BY 1
    """,
)
def orders_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    h = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        money("o_totalprice").alias("v"),
    ).agg(F.count(F.lit(1)).alias("cnt"))

    # doubled/quadrupled medians stay exact decimals (see oracle note)
    def cdf_median2(hist, val_col, out):
        wc = Window.partitionBy("priority").orderBy(val_col)
        wn = Window.partitionBy("priority")
        c = hist.select(
            "priority",
            val_col,
            F.sum("cnt").over(wc).alias("cum"),
            F.sum("cnt").over(wn).alias("n"),
        )
        p1 = F.expr("(n + 1) div 2")
        p2 = F.expr("(n + 2) div 2")
        return c.groupBy("priority").agg(
            (
                F.min(F.when(F.col("cum") >= p1, F.col(val_col)))
                + F.min(F.when(F.col("cum") >= p2, F.col(val_col)))
            ).alias(out)
        )

    med = cdf_median2(h, "v", "med2")
    dh = (
        h.join(med, "priority")
        .groupBy(
            "priority", F.abs(2 * F.col("v") - F.col("med2")).alias("d2")
        )
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = cdf_median2(dh, "d2", "mad4")
    return (
        h.join(med, "priority")
        .join(mad, "priority")
        .groupBy(
            "priority",
            (F.col("med2").cast("double") / 2).alias("median_price"),
            (F.col("mad4").cast("double") / 4).alias("mad"),
        )
        .agg(
            F.sum(
                F.when(
                    4 * F.abs(2 * F.col("v") - F.col("med2"))
                    > 3 * F.col("mad4"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("outliers")
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# Benford first-digit audit — the classic fraud/quality screen: the
# leading significant digit of a naturally-occurring monetary amount
# should follow P(d) = log10(1 + 1/d). One hash aggregate over a
# 9-value domain; the observed share is a single deterministic IEEE
# division and the expected share a single closed-form log10 per row,
# so both engines produce bit-identical doubles. At 100 TB this is a
# map-side-combined count by one derived byte — no shuffle pressure.
@query(
    "orders_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INTEGER) AS digit,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1),
    t AS (SELECT SUM(cnt) AS n FROM d)
    SELECT digit, cnt AS observed,
           CAST(cnt AS DOUBLE) / t.n AS observed_share,
           log10(1 + 1.0 / digit) AS benford_share
    FROM d CROSS JOIN t
    ORDER BY digit
    """,
)
def orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = (
        o.select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t = d.agg(F.sum("cnt").alias("n"))
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("cnt").alias("observed"),
            (F.col("cnt").cast("double") / F.col("n")).alias("observed_share"),
            F.log10(1 + 1.0 / F.col("digit")).alias("benford_share"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# Chi-square independence cells for status × priority — the
# contingency-table diagnostic behind "is fulfilment status independent
# of priority?". Emitting the 15 per-cell contributions (rather than
# one partition-order-dependent Σ of doubles) keeps every number a
# closed-form deterministic expression: expected = rt·ct/N in one
# division, contribution = (obs−exp)²/exp with an explicit product
# (never pow), identical token-for-token in both engines. The windows
# cumulate over the 15-cell frame — bounded by the value domains, not
# the data size.
@query(
    "status_priority_chisq_cells",
    oracle="""
    WITH cells AS (
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             COUNT(*) AS observed
      FROM orders GROUP BY 1, 2),
    m AS (
      SELECT status, priority, observed,
             SUM(observed) OVER (PARTITION BY status) AS rt,
             SUM(observed) OVER (PARTITION BY priority) AS ct,
             SUM(observed) OVER () AS n
      FROM cells)
    SELECT status, priority, observed,
           CAST(rt * ct AS DOUBLE) / n AS expected,
           (observed - CAST(rt * ct AS DOUBLE) / n)
             * (observed - CAST(rt * ct AS DOUBLE) / n)
             / (CAST(rt * ct AS DOUBLE) / n) AS contribution
    FROM m
    ORDER BY status, priority
    """,
)
def status_priority_chisq_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("observed"))
    m = cells.select(
        "status",
        "priority",
        "observed",
        F.sum("observed").over(Window.partitionBy("status")).alias("rt"),
        F.sum("observed").over(Window.partitionBy("priority")).alias("ct"),
        F.sum("observed").over(
            Window.partitionBy()
        ).alias("n"),
    )
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    return m.select(
        "status",
        "priority",
        "observed",
        exp.alias("expected"),
        (
            (F.col("observed") - exp) * (F.col("observed") - exp) / exp
        ).alias("contribution"),
    ).orderBy("status", "priority")


# --------------------------------------------------------------------------
# HyperLogLog distinct-user sketch per event type — the register-based
# mergeable cardinality estimator (Flajolet et al. 2007), next to the
# KMV bottom-k sketch as the second classic. 256 registers; the
# register max is one hash aggregate, and the harmonic-mean
# denominator Σ 2^−M stays EXACT by scaling through 2^53 (so it is an
# integer sum of shifted ones — no float accumulation anywhere; max
# 256·2^53 < 2^63). The only doubles are the final closed-form
# estimate (one constant, one division) and the small-range
# linear-counting branch, both rounded to 4 dp. Exact distinct is
# emitted alongside for the error column. At 100 TB the register
# table is 256 rows per group — this is THE scale-out cardinality
# pattern (mergeable across partitions by construction).
_HLL_NUM = 0.7213 / (1 + 1.079 / 256) * 65536 * 9007199254740992.0


@query(
    "events_hll_users_per_type",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM events),
    r AS (
      SELECT event_type, hv % 256 AS j,
             CASE WHEN hv // 256 > 0
                  THEN 53 - length(bin(hv // 256))
                  ELSE 53 END AS rho
      FROM h),
    m AS (SELECT event_type, j, MAX(rho) AS mj FROM r GROUP BY 1, 2),
    agg AS (
      SELECT event_type,
             SUM(CAST(1 AS BIGINT) << (53 - mj)) AS s_obs,
             COUNT(*) AS nreg
      FROM m GROUP BY 1),
    ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM events GROUP BY 1),
    est AS (
      SELECT a.event_type,
             {_HLL_NUM!r}
               / (a.s_obs + (256 - a.nreg)
                  * CAST(9007199254740992 AS BIGINT)) AS raw,
             256 - a.nreg AS zeros
      FROM agg a)
    SELECT e.event_type, ex.exact_users,
           ROUND(CASE WHEN e.raw <= 640 AND e.zeros > 0
                      THEN 256 * ln(256.0 / e.zeros)
                      ELSE e.raw END, 4) AS hll_estimate
    FROM est e JOIN ex ON e.event_type = ex.event_type
    ORDER BY e.event_type
    """,
)
def events_hll_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.extensions.dedup import md5_long

    e = load_table(spark, sf_dir, "events")
    h = e.select(
        "event_type",
        md5_long(F.col("user_id").cast("string")).alias("hv"),
    )
    r = h.select(
        "event_type",
        (F.col("hv") % 256).alias("j"),
        F.when(
            F.expr("hv div 256") > 0,
            F.lit(53) - F.length(F.bin(F.expr("hv div 256"))),
        )
        .otherwise(F.lit(53))
        .alias("rho"),
    )
    m = r.groupBy("event_type", "j").agg(F.max("rho").alias("mj"))
    agg = m.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), cast(53 - mj as int))"))
        .alias("s_obs"),
        F.count(F.lit(1)).alias("nreg"),
    )
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    raw = F.lit(_HLL_NUM) / (
        F.col("s_obs")
        + (256 - F.col("nreg")) * F.lit(9007199254740992).cast("long")
    )
    zeros = 256 - F.col("nreg")
    est = agg.select(
        "event_type", raw.alias("raw"), zeros.alias("zeros")
    )
    return (
        est.join(ex, "event_type")
        .select(
            "event_type",
            "exact_users",
            F.round(
                F.when(
                    (F.col("raw") <= 640) & (F.col("zeros") > 0),
                    256 * F.log(256.0 / F.col("zeros")),
                ).otherwise(F.col("raw")),
                4,
            ).alias("hll_estimate"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Exact Kendall tau-a rank correlation between quantity and discount —
# computed from the JOINT VALUE HISTOGRAM, not row pairs: both
# domains are bounded (~50 x ~11 cells), so concordant/discordant
# pair counts are an integer cross-product over <=550x550 cells while
# the data contributes only one hash aggregate. The n(n-1)/2 pair
# space never materializes — the bounded-domain answer to "rank
# correlation at 100 TB". tau_a = (C - D) / (n(n-1)/2), one final
# division.
@query(
    "lineitem_kendall_tau",
    oracle="""
    WITH h AS (
      SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
             CAST(l_discount AS DECIMAL(6,4)) AS d,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2),
    t AS (SELECT SUM(cnt) AS n FROM h),
    c AS (
      SELECT
        SUM(CASE WHEN a.q < b.q AND a.d < b.d
                 THEN a.cnt * b.cnt ELSE 0 END) AS concordant,
        SUM(CASE WHEN a.q < b.q AND a.d > b.d
                 THEN a.cnt * b.cnt ELSE 0 END) AS discordant
      FROM h a, h b)
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(c.concordant AS BIGINT) AS concordant,
           CAST(c.discordant AS BIGINT) AS discordant,
           CAST(2 * (c.concordant - c.discordant) AS DOUBLE)
             / (t.n * (t.n - 1)) AS tau_a
    FROM c CROSS JOIN t
    """,
)
def lineitem_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.round("l_quantity", 0).cast("bigint").alias("q"),
        F.col("l_discount").cast("decimal(6,4)").alias("d"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    t = h.agg(F.sum("cnt").alias("n"))
    a = h.select(
        F.col("q").alias("qa"), F.col("d").alias("da"),
        F.col("cnt").alias("ca"),
    )
    b = h.select(
        F.col("q").alias("qb"), F.col("d").alias("db"),
        F.col("cnt").alias("cb"),
    )
    cells = a.crossJoin(F.broadcast(b))
    c = cells.agg(
        F.sum(
            F.when(
                (F.col("qa") < F.col("qb")) & (F.col("da") < F.col("db")),
                F.col("ca") * F.col("cb"),
            ).otherwise(F.lit(0))
        ).alias("concordant"),
        F.sum(
            F.when(
                (F.col("qa") < F.col("qb")) & (F.col("da") > F.col("db")),
                F.col("ca") * F.col("cb"),
            ).otherwise(F.lit(0))
        ).alias("discordant"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "n",
        "concordant",
        "discordant",
        (
            (2 * (F.col("concordant") - F.col("discordant"))).cast("double")
            / (F.col("n") * (F.col("n") - 1))
        ).alias("tau_a"),
    )


# --------------------------------------------------------------------------
# Linearly-interpolated (type-7 / quantile_cont) percentiles of the
# order value — the continuous complement to the discrete
# percentile_disc family used elsewhere: v = lo + frac * (hi - lo)
# where h = (n-1)p + 1. Same histogram-CDF construction (no raw-row
# sort); the rank arithmetic stays integer by scaling the target
# position x100 (p in percent), and lo/hi resolve with the bounded
# range-join CDF lookup of docs_length_deciles.
@query(
    "order_value_percentiles_cont",
    oracle="""
    WITH h AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,4)) AS v, COUNT(*) AS cnt
      FROM orders GROUP BY 1),
    c AS (
      SELECT v,
             SUM(cnt) OVER (ORDER BY v) AS cum,
             SUM(cnt) OVER (ORDER BY v) - cnt AS prev_cum
      FROM h),
    t AS (SELECT SUM(cnt) AS n FROM h),
    p AS (SELECT unnest([50, 95]) AS pct),
    tgt AS (
      SELECT p.pct,
             ((t.n - 1) * p.pct + 100) // 100 AS flo,
             ((t.n - 1) * p.pct + 100) % 100 AS fracnum,
             t.n AS n
      FROM p CROSS JOIN t)
    SELECT g.pct,
           CAST(lo.v AS DOUBLE)
             + (g.fracnum / 100.0)
               * (CAST(hi.v AS DOUBLE) - CAST(lo.v AS DOUBLE))
             AS value_cont
    FROM tgt g
    JOIN c lo ON lo.prev_cum < g.flo AND g.flo <= lo.cum
    JOIN c hi ON hi.prev_cum < LEAST(g.flo + 1, g.n)
             AND LEAST(g.flo + 1, g.n) <= hi.cum
    ORDER BY g.pct
    """,
)
def order_value_percentiles_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    h = o.groupBy(money("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.select(
        "v",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("prev_cum"),
    )
    t = h.agg(F.sum("cnt").alias("n"))
    p = o.sparkSession.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(95))).alias("pct")
    )
    tgt = p.crossJoin(F.broadcast(t)).select(
        "pct",
        F.expr("((n - 1) * pct + 100) div 100").alias("flo"),
        F.expr("((n - 1) * pct + 100) % 100").alias("fracnum"),
        "n",
    )
    lo = c.select(
        F.col("v").alias("lov"),
        F.col("cum").alias("locum"),
        F.col("prev_cum").alias("loprev"),
    )
    hi = c.select(
        F.col("v").alias("hiv"),
        F.col("cum").alias("hicum"),
        F.col("prev_cum").alias("hiprev"),
    )
    hit = F.least(F.col("flo") + 1, F.col("n"))
    return (
        tgt.join(
            lo,
            (F.col("loprev") < F.col("flo"))
            & (F.col("flo") <= F.col("locum")),
        )
        .join(hi, (F.col("hiprev") < hit) & (hit <= F.col("hicum")))
        .select(
            "pct",
            (
                F.col("lov").cast("double")
                + (F.col("fracnum") / F.lit(100.0))
                * (F.col("hiv").cast("double") - F.col("lov").cast("double"))
            ).alias("value_cont"),
        )
        .orderBy("pct")
    )


# --------------------------------------------------------------------------
# Forecast-revenue-change scalar (the TPC-H Q6 shape) — the canonical
# "every predicate pushes to the scan" query: year + discount band +
# quantity cap reach the parquet reader as PushedFilters, the scan
# reads exactly three columns, and the answer is one exact-decimal
# product-sum. The what-if: revenue forgone to discounts in-band.
@query(
    "lineitem_discount_revenue_effect",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(6,4))), 4) AS DOUBLE)
             AS revenue_effect,
           COUNT(*) AS qualifying_lines
    FROM lineitem
    WHERE EXTRACT(year FROM l_shipdate) = 1998
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def lineitem_discount_revenue_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.year("l_shipdate") == 1998)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    eff = F.col("l_extendedprice").cast("decimal(18,4)") * F.col(
        "l_discount"
    ).cast("decimal(6,4)")
    return li.agg(
        F.round(F.sum(eff), 4).cast("double").alias("revenue_effect"),
        F.count(F.lit(1)).alias("qualifying_lines"),
    )


# --------------------------------------------------------------------------
# Winsorized mean — the robust-stats member between plain mean and
# median: clamp to the [p05, p95] cut points (histogram-CDF over the
# exact-decimal value domain — no raw-row sort), then an exact
# decimal mean of the CLAMPED values. Everything except the two final
# divisions is integer/decimal-exact; the clamped sum works on the
# histogram (value × count), so the second pass touches cells, not
# rows.
@query(
    "order_value_winsorized_mean",
    oracle="""
    WITH h AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,4)) AS v, COUNT(*) AS cnt
      FROM orders GROUP BY 1),
    c AS (
      SELECT v, cnt,
             SUM(cnt) OVER (ORDER BY v) AS cum,
             SUM(cnt) OVER (ORDER BY v) - cnt AS prev_cum
      FROM h),
    t AS (SELECT SUM(cnt) AS n FROM h),
    lo AS (
      SELECT MIN(v) AS p05 FROM c CROSS JOIN t
      WHERE c.cum >= (5 * t.n + 99) // 100),
    hi AS (
      SELECT MIN(v) AS p95 FROM c CROSS JOIN t
      WHERE c.cum >= (95 * t.n + 99) // 100)
    SELECT CAST(t.n AS BIGINT) AS n_orders,
           CAST(lo.p05 AS DOUBLE) AS p05,
           CAST(hi.p95 AS DOUBLE) AS p95,
           CAST(SUM(CASE WHEN h.v < lo.p05 THEN lo.p05 * h.cnt
                         WHEN h.v > hi.p95 THEN hi.p95 * h.cnt
                         ELSE h.v * h.cnt END) AS DOUBLE) / MAX(t.n)
             AS winsorized_mean,
           CAST(SUM(h.v * h.cnt) AS DOUBLE) / MAX(t.n) AS raw_mean
    FROM h CROSS JOIN t CROSS JOIN lo CROSS JOIN hi
    GROUP BY 1, 2, 3
    """,
)
def order_value_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    h = o.groupBy(money("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.select("v", "cnt", F.sum("cnt").over(w).alias("cum"))
    t = h.agg(F.sum("cnt").alias("n"))
    lo = (
        c.crossJoin(F.broadcast(t))
        .where(F.col("cum") >= F.expr("(5 * n + 99) div 100"))
        .agg(F.min("v").alias("p05"))
    )
    hi = (
        c.crossJoin(F.broadcast(t))
        .where(F.col("cum") >= F.expr("(95 * n + 99) div 100"))
        .agg(F.min("v").alias("p95"))
    )
    clamped = (
        F.when(F.col("v") < F.col("p05"), F.col("p05") * F.col("cnt"))
        .when(F.col("v") > F.col("p95"), F.col("p95") * F.col("cnt"))
        .otherwise(F.col("v") * F.col("cnt"))
    )
    return (
        h.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .groupBy(
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("p05").cast("double").alias("p05"),
            F.col("p95").cast("double").alias("p95"),
        )
        .agg(
            (F.sum(clamped).cast("double") / F.max("n")).alias(
                "winsorized_mean"
            ),
            (
                F.sum(F.col("v") * F.col("cnt")).cast("double")
                / F.max("n")
            ).alias("raw_mean"),
        )
    )


# --------------------------------------------------------------------------
# Median absolute deviation — the robust dispersion measure that
# ignores the outliers stddev amplifies. Exact, two-phase, and
# sort-free: both medians are LOWER medians (rank ceil(n/2), the
# discrete type-1 quantile) picked from a value-domain histogram via
# the cumulative-count bucket trick (order_value_percentiles'
# machinery) — everything stays DECIMAL, so both engines agree to the
# bit with no interpolation arithmetic.
# Scale shape: two hash aggregates over the value domain + one
# broadcast of a 1-row median — no global sort, no percentile
# buffer, fact rows scanned twice (or once with a cached histogram).
@query(
    "order_value_mad",
    oracle="""
    WITH vals AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,4)) AS v FROM orders),
    t AS (SELECT COUNT(*) AS n FROM vals),
    h AS (SELECT v, COUNT(*) AS cnt FROM vals GROUP BY 1),
    c AS (
      SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
             SUM(cnt) OVER (ORDER BY v) - cnt AS prev_cum
      FROM h),
    med AS (
      SELECT c.v AS m FROM c CROSS JOIN t
      WHERE c.prev_cum < (t.n + 1) // 2 AND (t.n + 1) // 2 <= c.cum),
    dh AS (
      SELECT ABS(vals.v - med.m) AS d, COUNT(*) AS cnt
      FROM vals CROSS JOIN med GROUP BY 1),
    dc AS (
      SELECT d, SUM(cnt) OVER (ORDER BY d) AS cum,
             SUM(cnt) OVER (ORDER BY d) - cnt AS prev_cum
      FROM dh),
    mad AS (
      SELECT dc.d FROM dc CROSS JOIN t
      WHERE dc.prev_cum < (t.n + 1) // 2 AND (t.n + 1) // 2 <= dc.cum)
    SELECT CAST(med.m AS DOUBLE) AS median_value,
           CAST(mad.d AS DOUBLE) AS mad,
           t.n AS n
    FROM med CROSS JOIN mad CROSS JOIN t
    """,
)
def order_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    vals = o.select(money("o_totalprice").alias("v"))
    t = vals.agg(F.count(F.lit(1)).alias("n"))

    def lower_median(frame: DataFrame, col: str) -> DataFrame:
        """Value at rank ceil(n/2) from a value-domain histogram —
        window over the (small) distinct-value domain, never the
        fact rows."""
        h = frame.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        c = h.select(
            col,
            F.sum("cnt").over(w).alias("cum"),
            (F.sum("cnt").over(w) - F.col("cnt")).alias("prev_cum"),
        )
        k = F.expr("(n + 1) div 2")
        return (
            c.crossJoin(F.broadcast(t))
            .where((F.col("prev_cum") < k) & (k <= F.col("cum")))
            .select(F.col(col).alias("m"))
        )

    med = lower_median(vals, "v")
    dev = vals.crossJoin(F.broadcast(med)).select(
        F.abs(F.col("v") - F.col("m")).alias("d")
    )
    mad = lower_median(dev, "d").select(F.col("m").alias("mad_v"))
    return (
        med.crossJoin(mad)
        .crossJoin(F.broadcast(t))
        .select(
            F.col("m").cast("double").alias("median_value"),
            F.col("mad_v").cast("double").alias("mad"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# Count-Min Sketch — the frequency-estimation counterpart of the
# engine's mergeable-summary family (KMV distinct, Misra-Gries heavy
# hitters, HLL registers): d=4 hash rows x w=64 counters, every
# occurrence increments one bucket per row, and a key's estimate is
# the MIN over its d buckets — an overestimate by construction
# (collisions only ever add). w is set well below the ~1.5k-user
# domain so collisions are real and the measured error is honest.
# All-integer counters with the md5-hex-prefix bucket hash both
# engines compute identically; output pairs every user's exact count
# with its CMS estimate so the gate hash-checks the sketch AND its
# error, and the over-estimate invariant is pytest-pinned.
# Scale shape: the sketch build is one groupBy over (row, bucket) —
# 256 cells regardless of corpus size (mergeable across partitions /
# days); the per-key probe joins the d·w cell table broadcast.
_CMS_D = 4
_CMS_W = 64


def _cms_bucket_sql(seed: str, key: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' || "
        f"CAST({key} AS VARCHAR)), 1, 15))::BIGINT % {_CMS_W})"
    )


@query(
    "events_cms_user_counts",
    oracle=f"""
    WITH seeds AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS i),
    tagged AS (
      SELECT s.i, {_cms_bucket_sql('s.i', 'e.user_id')} AS bucket
      FROM events e CROSS JOIN seeds s),
    cells AS (
      SELECT i, bucket, COUNT(*) AS cnt FROM tagged GROUP BY 1, 2),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY 1),
    probes AS (
      SELECT x.user_id, x.exact_count, s.i,
             {_cms_bucket_sql('s.i', 'x.user_id')} AS bucket
      FROM exact x CROSS JOIN seeds s)
    SELECT p.user_id, p.exact_count,
           CAST(MIN(c.cnt) AS BIGINT) AS cms_estimate
    FROM probes p
    JOIN cells c ON c.i = p.i AND c.bucket = p.bucket
    GROUP BY p.user_id, p.exact_count
    ORDER BY p.user_id
    """,
)
def events_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    seeds = F.array(*[F.lit(i) for i in range(_CMS_D)])

    def bucket(i: Column, key: Column) -> Column:
        h = F.md5(
            F.concat(i.cast("string"), F.lit(":"), key.cast("string"))
        )
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _CMS_W

    tagged = e.select("user_id").withColumn("i", F.explode(seeds)).select(
        "i", bucket(F.col("i"), F.col("user_id")).alias("bucket")
    )
    cells = tagged.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    probes = exact.withColumn("i", F.explode(seeds)).select(
        "user_id",
        "exact_count",
        "i",
        bucket(F.col("i"), F.col("user_id")).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# KMV set operations — the theta-sketch capability on the bottom-k
# sketch: estimate |A ∪ B|, |A ∩ B| and Jaccard between two key sets
# (view-users vs purchase-users) FROM THEIR SKETCHES ALONE. The union
# sketch is the bottom-k of the merged sketches; intersection uses
# the standard inclusion ratio rho = |K_union ∩ A ∩ B| / |K_union|
# (membership via the per-side sketches is sound: an h in the union's
# bottom-k that belongs to A necessarily sits in A's own bottom-k).
# k=64 < the user domain at every tested sf, so the estimates are
# genuine estimates; when a sketch holds the whole set (k_seen < k)
# the estimator degrades to exact, both branches deterministic.
# Exact values ride along, so the gate hash-checks the estimator AND
# its measured error. Everything below the first distinct is
# sketch-sized (bottom-k frames, TakeOrdered, no full-set joins).
_KMVOP_K = 64
_KMVOP_R = float(1 << 60)


@query(
    "events_kmv_set_operations",
    oracle=f"""
    WITH ah AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
      FROM events WHERE event_type = 'view'),
    bh AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
      FROM events WHERE event_type = 'purchase'),
    ka AS (SELECT h FROM ah ORDER BY h LIMIT {_KMVOP_K}),
    kb AS (SELECT h FROM bh ORDER BY h LIMIT {_KMVOP_K}),
    ku AS (
      SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
      ORDER BY h LIMIT {_KMVOP_K}),
    u AS (SELECT MAX(h) AS kth, COUNT(*) AS kc FROM ku),
    rho AS (
      SELECT COUNT(*) AS in_both FROM ku
      WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
    est AS (
      SELECT u.kc, rho.in_both,
             CASE WHEN u.kc < {_KMVOP_K} THEN CAST(u.kc AS DOUBLE)
                  ELSE ({_KMVOP_K}.0 - 1.0) * {_KMVOP_R!r} / u.kth
             END AS est_union
      FROM u CROSS JOIN rho),
    ex AS (
      SELECT
        (SELECT COUNT(*) FROM (SELECT h FROM ah UNION SELECT h FROM bh))
          AS exact_union,
        (SELECT COUNT(*) FROM ah WHERE h IN (SELECT h FROM bh))
          AS exact_intersection)
    SELECT CAST({_KMVOP_K} AS BIGINT) AS k,
           ROUND(est.est_union, 6) AS est_union,
           ROUND(CAST(est.in_both AS DOUBLE) / est.kc * est.est_union, 6)
             AS est_intersection,
           ROUND(CAST(est.in_both AS DOUBLE) / est.kc, 6) AS est_jaccard,
           CAST(ex.exact_union AS BIGINT) AS exact_union,
           CAST(ex.exact_intersection AS BIGINT) AS exact_intersection
    FROM est CROSS JOIN ex
    """,
)
def events_kmv_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.extensions.dedup import md5_long

    e = load_table(spark, sf_dir, "events")

    def side_hashes(t: str) -> DataFrame:
        return (
            e.where(F.col("event_type") == t)
            .select(md5_long(F.col("user_id").cast("string")).alias("h"))
            .distinct()
        )

    ah, bh = side_hashes("view"), side_hashes("purchase")
    ka = ah.orderBy("h").limit(_KMVOP_K)
    kb = bh.orderBy("h").limit(_KMVOP_K)
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(_KMVOP_K)
    u = ku.agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("kc"))
    in_both = (
        ku.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("in_both"))
    )
    exact_union = (
        ah.unionByName(bh).distinct().agg(F.count(F.lit(1)).alias("exact_union"))
    )
    exact_inter = ah.join(bh, "h", "left_semi").agg(
        F.count(F.lit(1)).alias("exact_intersection")
    )
    est_union = F.when(
        F.col("kc") < _KMVOP_K, F.col("kc").cast("double")
    ).otherwise(F.lit(_KMVOP_K - 1.0) * F.lit(_KMVOP_R) / F.col("kth"))
    return (
        u.crossJoin(F.broadcast(in_both))
        .crossJoin(F.broadcast(exact_union))
        .crossJoin(F.broadcast(exact_inter))
        .select(
            F.lit(_KMVOP_K).cast("long").alias("k"),
            F.round(est_union, 6).alias("est_union"),
            F.round(
                F.col("in_both").cast("double") / F.col("kc") * est_union, 6
            ).alias("est_intersection"),
            F.round(F.col("in_both").cast("double") / F.col("kc"), 6).alias(
                "est_jaccard"
            ),
            F.col("exact_union").cast("long").alias("exact_union"),
            F.col("exact_intersection")
            .cast("long")
            .alias("exact_intersection"),
        )
    )


# --------------------------------------------------------------------------
# Geometric mean per brand — the multiplicative average (the right
# mean for ratios/prices): exp(mean(ln x)). Per-value logs snap to
# 6 dp and sum as exact MICRO-nat longs (the unigram-logprob
# discipline — ln differs by 1 ulp between JVM and libm, and float
# sums are partition-order-dependent); the only floating steps are
# one division and one exp on a bit-identical input, rounded at
# output. One hash aggregate; no windows, no sorts.
@query(
    "part_price_geomean_by_brand",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS parts,
           CAST(SUM(CAST(ROUND(ROUND(ln(CAST(p_retailprice AS DOUBLE)), 6)
                               * 1000000, 0) AS BIGINT)) AS DOUBLE)
             / (1000000.0 * COUNT(*)) AS log_mean,
           ROUND(exp(CAST(SUM(CAST(ROUND(ROUND(ln(CAST(p_retailprice AS DOUBLE)), 6)
                                         * 1000000, 0) AS BIGINT)) AS DOUBLE)
                     / (1000000.0 * COUNT(*))), 4) AS geomean_price
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def part_price_geomean_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    micro_ln = F.round(
        F.round(F.log(F.col("p_retailprice").cast("double")), 6) * 1_000_000,
        0,
    ).cast("long")
    log_mean = F.sum("mln").cast("double") / (
        F.lit(1_000_000.0) * F.count(F.lit(1))
    )
    return (
        p.withColumn("mln", micro_ln)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("parts"),
            log_mean.alias("log_mean"),
            F.round(F.exp(log_mean), 4).alias("geomean_price"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Mann-Whitney U — the nonparametric two-sample test (does one group
# stochastically dominate the other?), computed EXACTLY in integers:
# tie-averaged ranks are half-integers, so everything runs in 2x
# units (2·avg_rank = 2·cum_before + ties + 1 — an integer), rank
# sums accumulate as exact longs over the VALUE-DOMAIN histogram
# (never a global sort of fact rows), and the AUC effect size
# U/(n1·n2) is the single final division. Compares fulfilled vs open
# order amounts.
@query(
    "order_value_mannwhitney",
    oracle="""
    WITH v AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,4)) AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS g1
      FROM orders WHERE o_orderstatus IN ('F', 'O')),
    h AS (
      SELECT v, SUM(g1) AS c1, COUNT(*) - SUM(g1) AS c2, COUNT(*) AS t
      FROM v GROUP BY v),
    c AS (
      SELECT *, SUM(t) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
               AS cum_before
      FROM h),
    agg AS (
      SELECT SUM(c1) AS n1, SUM(c2) AS n2,
             SUM(c1 * (2 * cum_before + t + 1)) AS r1_x2
      FROM c)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           ROUND(CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE)
                 / (2.0 * n1 * n2), 6) AS auc
    FROM agg
    """,
)
def order_value_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus").isin("F", "O")
    )
    v = o.select(
        money("o_totalprice").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("g1"),
    )
    h = v.groupBy("v").agg(
        F.sum("g1").alias("c1"),
        (F.count(F.lit(1)) - F.sum("g1")).alias("c2"),
        F.count(F.lit(1)).alias("t"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.withColumn("cum_before", F.sum("t").over(w) - F.col("t"))
    agg = c.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(
            F.col("c1") * (2 * F.col("cum_before") + F.col("t") + 1)
        ).alias("r1_x2"),
    )
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        u1_x2.cast("long").alias("u1_x2"),
        F.round(
            u1_x2.cast("double") / (2.0 * F.col("n1") * F.col("n2")), 6
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Poisson bootstrap confidence interval — THE distributed bootstrap
# [Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
# Google 2012]: classic resampling needs n draws per replicate from
# the whole dataset (impossible shuffled at scale), but Binomial(n,
# 1/n) -> Poisson(1) as n grows, so each ROW independently contributes
# w ~ Poisson(1) copies to each replicate — embarrassingly parallel,
# one pass, no sampling coordination. Here the Poisson draw is
# DETERMINISTIC: u = md5-uniform from (order key, replicate id),
# w = inverse-CDF via hard-coded Poisson(1) thresholds (identical
# literals both engines), so every replicate mean is a pure function
# of the data and the gate hash-checks the whole CI. Replicate means
# use exact decimal numerators (w·x) with one final division; the
# 2.5%/97.5% bounds are rank picks over the 64-replicate domain.
_BOOT_B = 64
_BOOT_THRESH = [
    0.367879441171, 0.735758882343, 0.919698602929, 0.981011843124,
    0.996340153173, 0.999405815182, 0.999916758851, 0.999989750803,
    0.999998874797,
]


def _bootstrap_oracle() -> str:
    fold = " + ".join(
        f"(CASE WHEN u >= {t!r} THEN 1 ELSE 0 END)" for t in _BOOT_THRESH
    )
    return f"""
    WITH reps AS (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b),
    w AS (
      SELECT r.b,
             CAST(o.o_totalprice AS DECIMAL(18,4)) AS x,
             {fold} AS w
      FROM orders o CROSS JOIN reps r
      CROSS JOIN LATERAL (
        SELECT ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || ':'
                                   || CAST(r.b AS VARCHAR)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS u) h),
    m AS (
      SELECT b,
             CAST(ROUND(SUM(w * x), 4) AS DOUBLE) / SUM(w) AS mean_b
      FROM w GROUP BY b),
    r AS (
      SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b) AS rk FROM m),
    pt AS (
      SELECT ROUND(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
                        AS DOUBLE) / COUNT(*), 6) AS point_mean
      FROM orders)
    SELECT CAST({_BOOT_B} AS BIGINT) AS replicates,
           pt.point_mean,
           ROUND((SELECT mean_b FROM r WHERE rk = 2), 6) AS ci_lo,
           ROUND((SELECT mean_b FROM r WHERE rk = {_BOOT_B - 1}), 6) AS ci_hi
    FROM pt
    """


@query("orders_bootstrap_ci", oracle=_bootstrap_oracle())
def orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fabric_claims_spark.extensions.dedup import md5_long

    from fabric_claims_spark.operators.partitioning import spread

    # Round 13 (guide §2.3/§2.4): spread the 150k BASE rows BEFORE the
    # 64× replicate explode instead of exchanging the 9.6M exploded
    # rows afterwards. The old shape shuffled every (o_orderkey, x, b)
    # row by (b, salt) — one full 9.6M-row exchange written from the
    # single-file scan's lone task; now the only exchange is the
    # spread() of the base rows (a no-op on a many-split cluster scan),
    # the explode + md5 + threshold fold run 32-way where the rows
    # already sit, and groupBy("b") reduces map-side to ≤64 partials
    # per partition. The md5 is NOT re-inlined into the nine threshold
    # CASEs (the round-6 concern that motivated the barrier): the
    # executed plan carries exactly one md5 call (plans/r13/
    # orders_bootstrap_ci_after.txt), and each replicate mean is the
    # same decimal sum regardless of partitioning, so the gate hash is
    # unchanged. Measured: replicate-means leg 5.3 s → 1.5 s warm.
    o = spread(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", money("o_totalprice").alias("x")
        )
    )
    b = F.explode(F.array(*[F.lit(i) for i in range(_BOOT_B)])).alias("b")
    hashed = o.select("o_orderkey", "x", b).withColumn(
        "u",
        md5_long(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        )
        / F.lit(float(1 << 60)),
    )
    wb = sum(
        F.when(F.col("u") >= F.lit(t), 1).otherwise(0)
        for t in _BOOT_THRESH
    )
    reps = hashed.withColumn("w", wb)
    m = reps.groupBy("b").agg(
        (
            F.round(F.sum(F.col("w") * F.col("x")), 4).cast("double")
            / F.sum("w")
        ).alias("mean_b")
    )
    # rank pick over the bounded replicate domain (64 rows)
    rk = F.row_number().over(Window.orderBy("mean_b"))
    r = m.withColumn("rk", rk)
    lo = r.where(F.col("rk") == 2).select(
        F.round("mean_b", 6).alias("ci_lo")
    )
    hi = r.where(F.col("rk") == _BOOT_B - 1).select(
        F.round("mean_b", 6).alias("ci_hi")
    )
    pt = o.agg(
        F.round(
            F.round(F.sum("x"), 4).cast("double") / F.count(F.lit(1)), 6
        ).alias("point_mean")
    )
    return (
        pt.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.lit(_BOOT_B).cast("long").alias("replicates"),
            "point_mean",
            "ci_lo",
            "ci_hi",
        )
    )


# --------------------------------------------------------------------------
# Population Stability Index — the production drift monitor for any
# scored/valued feature: bin the value in a FIXED grid (monitoring
# bins must not move between periods, or the metric measures the
# binning), compare two periods' bin shares, PSI = Σ (p−q)·ln(p/q)
# with add-one smoothing so empty bins stay finite. Determinism: bin
# indexes are integer arithmetic; p, q are exact rationals evaluated
# in the same op order; ln snaps to 6 dp (the engine's ln-ulp rule);
# each bin's term rounds to NANO-units and sums as exact longs —
# never a float sum over an unordered group. Rule of thumb pinned in
# the output: PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted.
# Scale shape: two filtered aggregates over the fixed 10-bin domain;
# everything after the scan is 10-row arithmetic.
_PSI_BIN_W = 50_000  # fixed-width monitoring bins over o_totalprice
_PSI_BINS = 10


@query(
    "orders_value_psi_periods",
    oracle=f"""
    WITH base AS (
      SELECT LEAST({_PSI_BINS - 1},
                   CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,4))
                              / {_PSI_BIN_W}) AS INT)) AS bin,
             (EXTRACT(year FROM o_orderdate) <= 1997) AS is_a
      FROM orders),
    bins AS (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin),
    h AS (
      SELECT b.bin,
             COALESCE(SUM(CASE WHEN base.is_a THEN 1 ELSE 0 END), 0) AS ca,
             COALESCE(SUM(CASE WHEN NOT base.is_a THEN 1 ELSE 0 END), 0) AS cb
      FROM bins b LEFT JOIN base ON base.bin = b.bin
      GROUP BY b.bin),
    t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM h),
    terms AS (
      SELECT h.bin, h.ca, h.cb,
             CAST(ROUND(
               (CAST(h.ca + 1 AS DOUBLE) / (t.na + {_PSI_BINS})
                - CAST(h.cb + 1 AS DOUBLE) / (t.nb + {_PSI_BINS}))
               * ROUND(ln((CAST(h.ca + 1 AS DOUBLE) / (t.na + {_PSI_BINS}))
                          / (CAST(h.cb + 1 AS DOUBLE) / (t.nb + {_PSI_BINS}))), 6)
               * 1000000000, 0) AS BIGINT) AS term_nano
      FROM h CROSS JOIN t),
    psi AS (SELECT SUM(term_nano) AS nano FROM terms)
    SELECT CAST(terms.bin AS BIGINT) AS bin,
           CAST(terms.ca AS BIGINT) AS count_a,
           CAST(terms.cb AS BIGINT) AS count_b,
           terms.term_nano,
           CAST(psi.nano AS DOUBLE) / 1000000000.0 AS psi_total,
           CASE WHEN psi.nano < 100000000 THEN 'stable'
                WHEN psi.nano < 250000000 THEN 'moderate_shift'
                ELSE 'shifted' END AS verdict
    FROM terms CROSS JOIN psi
    ORDER BY terms.bin
    """,
)
def orders_value_psi_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.least(
            F.lit(_PSI_BINS - 1),
            F.floor(money("o_totalprice") / _PSI_BIN_W).cast("int"),
        ).alias("bin"),
        (F.year("o_orderdate") <= 1997).alias("is_a"),
    )
    bins = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    h = (
        bins.join(base, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("is_a"), 1).otherwise(0)), F.lit(0)
            ).alias("ca"),
            F.coalesce(
                F.sum(F.when(~F.col("is_a"), 1).otherwise(0)), F.lit(0)
            ).alias("cb"),
        )
    )
    t = h.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    p = (F.col("ca") + 1).cast("double") / (F.col("na") + _PSI_BINS)
    q = (F.col("cb") + 1).cast("double") / (F.col("nb") + _PSI_BINS)
    term_nano = F.round(
        (p - q) * F.round(F.log(p / q), 6) * F.lit(1_000_000_000), 0
    ).cast("long")
    terms = h.crossJoin(F.broadcast(t)).select(
        "bin", "ca", "cb", term_nano.alias("term_nano")
    )
    psi = terms.agg(F.sum("term_nano").alias("nano"))
    return (
        terms.crossJoin(F.broadcast(psi))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("ca").cast("long").alias("count_a"),
            F.col("cb").cast("long").alias("count_b"),
            "term_nano",
            (F.col("nano").cast("double") / 1_000_000_000.0).alias(
                "psi_total"
            ),
            F.when(F.col("nano") < 100_000_000, "stable")
            .when(F.col("nano") < 250_000_000, "moderate_shift")
            .otherwise("shifted")
            .alias("verdict"),
        )
        .orderBy("bin")
    )


def _conversion_lifetimes(e: DataFrame) -> DataFrame:
    """(user_id, dur, conv) per user: duration to first purchase when
    it lands inside the follow-up window (horizon-capped, corpus-edge
    capped for late joiners), else the censoring duration. Shared by
    the KM curve and the log-rank test so the two can never disagree
    about the study design."""
    day = lambda c: F.date_trunc("day", c).cast("date")  # noqa: E731
    bounds = e.agg(day(F.max("ts")).alias("maxd"))
    u = e.groupBy("user_id").agg(day(F.min("ts")).alias("f"))
    p = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(day(F.min("ts")).alias("fp"))
    )
    fup = F.least(F.lit(_KM_HORIZON), F.datediff("maxd", "f"))
    conv = F.col("fp").isNotNull() & (F.datediff("fp", "f") <= fup)
    return (
        u.join(p, "user_id", "left")
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.when(conv, F.datediff("fp", "f")).otherwise(fup).alias("dur"),
            conv.alias("conv"),
        )
    )


# --------------------------------------------------------------------------
# Kaplan-Meier time-to-conversion — the censoring-aware survival
# curve (Kaplan & Meier, JASA 1958). Naive "average days to first
# purchase" is biased: users still inside their follow-up window who
# haven't converted yet aren't failures, and dropping them
# OVER-states conversion speed. KM treats them as censored — they
# leave the at-risk pool at their censoring time without counting as
# events. Subject = user; clock starts at the user's first event;
# the event is the first 'purchase'; follow-up is administratively
# capped at _KM_HORIZON days (and by the corpus edge for late
# joiners — both censoring mechanisms occur in the fixture data, and
# at sf0.001 the last step converts its entire at-risk pool, which
# exercises the factor-0 guard below).
#
# Exactness discipline: every count (at-risk, converted, censored)
# is an integer; each step factor (1 - d/n) is one IEEE division;
# its ln rounds to 6 dp and scales to micro-nat longs (the geomean /
# unigram-logprob trick), so the cumulative product is an EXACT
# integer window sum with one exp at the end. A step where every
# at-risk user converts (factor 0) poisons ln — a running "hit zero"
# max pins survival to 0.0 from that step on, in both engines.
# Scale shape: two hash aggregates (per-user, per-duration) and one
# cumulative window over the DURATION DOMAIN (<= _KM_HORIZON rows,
# bounded — the value-domain discipline order_value_mad uses),
# never a window over users or events.
_KM_HORIZON = 5


@query(
    "events_user_survival_km",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(date_trunc('day', MAX(ts)) AS DATE) AS maxd FROM events),
    u AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS f
      FROM events GROUP BY 1),
    p AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS fp
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    lif AS (
      SELECT CASE WHEN conv THEN tconv ELSE fup END AS dur, conv
      FROM (
        SELECT date_diff('day', u.f, p.fp) AS tconv,
               LEAST({_KM_HORIZON}, date_diff('day', u.f, b.maxd)) AS fup,
               (p.fp IS NOT NULL
                AND date_diff('day', u.f, p.fp)
                    <= LEAST({_KM_HORIZON}, date_diff('day', u.f, b.maxd)))
                 AS conv
        FROM u LEFT JOIN p USING (user_id) CROSS JOIN bounds b)),
    t AS (
      SELECT dur,
             SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS d,
             SUM(CASE WHEN conv THEN 0 ELSE 1 END) AS c
      FROM lif GROUP BY 1),
    r AS (
      SELECT dur, d, c,
             SUM(d + c) OVER (ORDER BY dur
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      FROM t),
    s AS (
      SELECT dur, d, c, n,
             SUM(CASE WHEN d > 0 AND d < n THEN
                   CAST(ROUND(ROUND(ln(1.0 - CAST(d AS DOUBLE) / n), 6)
                              * 1000000, 0) AS BIGINT)
                 ELSE 0 END)
               OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cum_micro,
             MAX(CASE WHEN d = n THEN 1 ELSE 0 END)
               OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS hit_zero
      FROM r)
    SELECT CAST(dur AS BIGINT) AS duration_days,
           CAST(n AS BIGINT) AS at_risk,
           CAST(d AS BIGINT) AS converted,
           CAST(c AS BIGINT) AS censored,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE ROUND(exp(CAST(cum_micro AS DOUBLE) / 1000000.0), 6)
           END AS km_survival
    FROM s
    ORDER BY duration_days
    """,
)
def events_user_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    lif = _conversion_lifetimes(e)
    t = lif.groupBy("dur").agg(
        F.sum(F.when(F.col("conv"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("conv"), 0).otherwise(1)).alias("c"),
    )
    # cumulative windows over the bounded duration domain (<= window
    # days): at-risk counts look forward, the product folds backward
    w_fwd = (
        Window.orderBy("dur")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_back = (
        Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = t.withColumn("n", F.sum(F.col("d") + F.col("c")).over(w_fwd))
    step_micro = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n")),
        F.round(
            F.round(
                F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n")), 6
            )
            * 1_000_000,
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    s = r.select(
        "dur",
        "d",
        "c",
        "n",
        F.sum(step_micro).over(w_back).alias("cum_micro"),
        F.max(F.when(F.col("d") == F.col("n"), 1).otherwise(0))
        .over(w_back)
        .alias("hit_zero"),
    )
    return s.select(
        F.col("dur").cast("long").alias("duration_days"),
        F.col("n").cast("long").alias("at_risk"),
        F.col("d").cast("long").alias("converted"),
        F.col("c").cast("long").alias("censored"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(F.col("cum_micro").cast("double") / 1_000_000.0), 6
            )
        )
        .alias("km_survival"),
    ).orderBy("duration_days")


# --------------------------------------------------------------------------
# Log-rank test — "did arm B convert faster than arm A?" with
# censoring handled correctly (Mantel, 1966; the standard two-sample
# comparison of survival curves). Arms come from a deterministic
# id-bucket assignment (pmod(user_id, 2) — the parity stand-in for a
# platform's hash-bucket split); the study design (clock start, event,
# horizon + corpus-edge censoring) is shared VERBATIM with the KM
# curve via _conversion_lifetimes. At every duration with at least
# one conversion: observed arm-1 conversions d1t vs expected
# E1t = dt*n1t/nt under the null, with hypergeometric variance
# Vt = dt*(n1t/nt)*(1-n1t/nt)*(nt-dt)/(nt-1); the statistic
# (O1-E1)^2/V is chi-square with 1 df.
#
# Exactness discipline: all counts integer; per-duration E and V
# terms round to nano-units and sum as exact longs (the PSI
# discipline); the final statistic is one double expression over the
# two integer sums, rounded to 6 dp. Scale shape: per-user aggregate,
# per-(arm, duration) aggregate, forward window over the bounded
# (arm x duration-domain) grid, one global fold — never a window
# over users.
_LOGRANK_CRIT_95 = 3.841459  # chi-square 1-df upper 5% point


@query(
    "events_conversion_logrank",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(date_trunc('day', MAX(ts)) AS DATE) AS maxd FROM events),
    u AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS f
      FROM events GROUP BY 1),
    p AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS fp
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    lif AS (
      SELECT user_id % 2 AS arm,
             CASE WHEN conv THEN tconv ELSE fup END AS dur, conv
      FROM (
        SELECT u.user_id, date_diff('day', u.f, p.fp) AS tconv,
               LEAST({_KM_HORIZON}, date_diff('day', u.f, b.maxd)) AS fup,
               (p.fp IS NOT NULL
                AND date_diff('day', u.f, p.fp)
                    <= LEAST({_KM_HORIZON}, date_diff('day', u.f, b.maxd)))
                 AS conv
        FROM u LEFT JOIN p USING (user_id) CROSS JOIN bounds b)),
    t AS (
      SELECT arm, dur, SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS d,
             COUNT(*) AS tot
      FROM lif GROUP BY 1, 2),
    spine AS (SELECT DISTINCT dur FROM t),
    grid AS (
      SELECT s.dur, a.arm, COALESCE(t.d, 0) AS d, COALESCE(t.tot, 0) AS tot
      FROM spine s CROSS JOIN (SELECT 0 AS arm UNION ALL SELECT 1) a
      LEFT JOIN t ON t.dur = s.dur AND t.arm = a.arm),
    r AS (
      SELECT dur, arm, d,
             SUM(tot) OVER (PARTITION BY arm ORDER BY dur
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      FROM grid),
    w AS (
      SELECT dur,
             SUM(CASE WHEN arm = 1 THEN d ELSE 0 END) AS d1,
             SUM(CASE WHEN arm = 1 THEN n ELSE 0 END) AS n1,
             SUM(d) AS dt, SUM(n) AS nt
      FROM r GROUP BY 1),
    sums AS (
      SELECT
        SUM(CASE WHEN dt > 0 THEN d1 ELSE 0 END) AS o1,
        SUM(CASE WHEN dt > 0 THEN
              CAST(ROUND(CAST(dt AS DOUBLE) * n1 / nt * 1000000000, 0)
                   AS BIGINT) ELSE 0 END) AS e1_nano,
        SUM(CASE WHEN dt > 0 AND nt > 1 THEN
              CAST(ROUND(CAST(dt AS DOUBLE) * (n1 * 1.0 / nt)
                         * (1 - n1 * 1.0 / nt)
                         * ((nt - dt) * 1.0 / (nt - 1))
                         * 1000000000, 0) AS BIGINT) ELSE 0 END) AS v_nano
      FROM w),
    arms AS (
      SELECT SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS users_a,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS users_b,
             SUM(CASE WHEN arm = 0 AND conv THEN 1 ELSE 0 END) AS conv_a,
             SUM(CASE WHEN arm = 1 AND conv THEN 1 ELSE 0 END) AS conv_b
      FROM lif)
    SELECT CAST(arms.users_a AS BIGINT) AS users_a,
           CAST(arms.users_b AS BIGINT) AS users_b,
           CAST(arms.conv_a AS BIGINT) AS conv_a,
           CAST(arms.conv_b AS BIGINT) AS conv_b,
           CAST(sums.o1 AS BIGINT) AS observed_b,
           ROUND(CAST(sums.e1_nano AS DOUBLE) / 1000000000.0, 6)
             AS expected_b,
           ROUND(CAST(sums.v_nano AS DOUBLE) / 1000000000.0, 6)
             AS variance,
           ROUND(CAST(sums.o1 * 1000000000 - sums.e1_nano AS DOUBLE)
                 * CAST(sums.o1 * 1000000000 - sums.e1_nano AS DOUBLE)
                 / (CAST(sums.v_nano AS DOUBLE) * 1000000000.0), 6)
             AS chi2,
           (CAST(sums.o1 * 1000000000 - sums.e1_nano AS DOUBLE)
            * CAST(sums.o1 * 1000000000 - sums.e1_nano AS DOUBLE)
            / (CAST(sums.v_nano AS DOUBLE) * 1000000000.0))
             > {_LOGRANK_CRIT_95} AS significant_95
    FROM sums CROSS JOIN arms
    """,
)
def events_conversion_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    lif = _conversion_lifetimes(e).select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"), "dur", "conv"
    )
    t = lif.groupBy("arm", "dur").agg(
        F.sum(F.when(F.col("conv"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("tot"),
    )
    spine = t.select("dur").distinct()
    arms = spark.range(2).select(F.col("id").alias("arm"))
    grid = (
        spine.crossJoin(F.broadcast(arms))
        .join(t, ["dur", "arm"], "left")
        .select(
            "dur",
            "arm",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("tot", F.lit(0)).alias("tot"),
        )
    )
    w_fwd = (
        Window.partitionBy("arm")
        .orderBy("dur")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    r = grid.withColumn("n", F.sum("tot").over(w_fwd))
    wt = r.groupBy("dur").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("d")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("arm") == 1, F.col("n")).otherwise(0)).alias("n1"),
        F.sum("d").alias("dt"),
        F.sum("n").alias("nt"),
    )
    nano = F.lit(1_000_000_000)
    e1_term = F.round(
        F.col("dt").cast("double") * F.col("n1") / F.col("nt") * nano, 0
    ).cast("long")
    share = F.col("n1") * F.lit(1.0) / F.col("nt")
    v_term = F.round(
        F.col("dt").cast("double")
        * share
        * (F.lit(1) - share)
        * ((F.col("nt") - F.col("dt")) * F.lit(1.0) / (F.col("nt") - 1))
        * nano,
        0,
    ).cast("long")
    sums = wt.agg(
        F.sum(F.when(F.col("dt") > 0, F.col("d1")).otherwise(0)).alias("o1"),
        F.sum(F.when(F.col("dt") > 0, e1_term).otherwise(F.lit(0))).alias(
            "e1_nano"
        ),
        F.sum(
            F.when((F.col("dt") > 0) & (F.col("nt") > 1), v_term).otherwise(
                F.lit(0)
            )
        ).alias("v_nano"),
    )
    arm_tot = lif.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("users_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("users_b"),
        F.sum(
            F.when((F.col("arm") == 0) & F.col("conv"), 1).otherwise(0)
        ).alias("conv_a"),
        F.sum(
            F.when((F.col("arm") == 1) & F.col("conv"), 1).otherwise(0)
        ).alias("conv_b"),
    )
    diff = (F.col("o1") * nano - F.col("e1_nano")).cast("double")
    chi2 = diff * diff / (F.col("v_nano").cast("double") * F.lit(1e9))
    return sums.crossJoin(F.broadcast(arm_tot)).select(
        F.col("users_a").cast("long"),
        F.col("users_b").cast("long"),
        F.col("conv_a").cast("long"),
        F.col("conv_b").cast("long"),
        F.col("o1").cast("long").alias("observed_b"),
        F.round(F.col("e1_nano").cast("double") / 1e9, 6).alias(
            "expected_b"
        ),
        F.round(F.col("v_nano").cast("double") / 1e9, 6).alias("variance"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(_LOGRANK_CRIT_95)).alias("significant_95"),
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift test on the order-value
# distribution across date periods — the distribution-shape
# complement of the binned PSI readout (orders_value_psi_periods):
# KS is binning-free and sensitive to any ECDF gap, PSI to mass
# re-allocation between coarse bins.
#
# Determinism: the KS statistic is max|F1(v) − F2(v)| over pooled
# values. Both ECDFs jump only at observed values, so the max is
# attained at a pooled value; with integer cumulative counts the
# numerator |cum1·n2 − cum2·n1| is EXACT integer arithmetic and the
# statistic needs exactly one division — bit-identical cross-engine
# (same discipline as the Mann–Whitney/logrank integer cores). The
# α=0.05 rejection threshold c(α)·sqrt((n1+n2)/(n1·n2)) uses only
# exactly-rounded IEEE ops (sqrt, *, /), so the boolean is
# deterministic too.
#
# Scale notes (100 TB): one column-pruned scan, a hash aggregate on
# value (the histogram is |distinct values|-sized, not row-sized), a
# single ordered window over that histogram, one final aggregate.
# The int64 numerator is exact while n1·n2 < 2^63 (≈3e9 rows per
# side); beyond that, promote the cumulative counts to DECIMAL(38,0)
# — same plan shape.
_KS_CRIT_95 = 1.358  # Smirnov asymptotic c(α) at α = 0.05


@query(
    "orders_value_ks_period_drift",
    oracle="""
    WITH v AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,4)) AS v,
             CASE WHEN year(o_orderdate) < 1998 THEN 1 ELSE 0 END AS g1
      FROM orders),
    h AS (
      SELECT v, SUM(g1) AS c1, COUNT(*) - SUM(g1) AS c2
      FROM v GROUP BY v),
    c AS (
      SELECT SUM(c1) OVER w AS cum1, SUM(c2) OVER w AS cum2
      FROM h WINDOW w AS (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM h),
    dmax AS (
      SELECT CAST(MAX(ABS(cum1 * (SELECT n2 FROM tot)
                          - cum2 * (SELECT n1 FROM tot))) AS BIGINT)
               AS d_num
      FROM c)
    SELECT t.n1, t.n2, d.d_num,
           CAST(d.d_num AS DOUBLE)
             / NULLIF(CAST(t.n1 AS DOUBLE) * t.n2, 0) AS ks_d,
           1.358 * sqrt((CAST(t.n1 AS DOUBLE) + t.n2)
                        / NULLIF(CAST(t.n1 AS DOUBLE) * t.n2, 0))
             AS crit_95,
           CAST(d.d_num AS DOUBLE)
             / NULLIF(CAST(t.n1 AS DOUBLE) * t.n2, 0)
             > 1.358 * sqrt((CAST(t.n1 AS DOUBLE) + t.n2)
                            / NULLIF(CAST(t.n1 AS DOUBLE) * t.n2, 0))
             AS reject_95
    FROM tot t CROSS JOIN dmax d
    """,
)
def orders_value_ks_period_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        money("o_totalprice").alias("v"),
        F.when(F.year("o_orderdate") < 1998, 1).otherwise(0).alias("g1"),
    )
    h = v.groupBy("v").agg(
        F.sum("g1").alias("c1"),
        (F.count(F.lit(1)) - F.sum("g1")).alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.select(
        F.sum("c1").over(w).alias("cum1"), F.sum("c2").over(w).alias("cum2")
    )
    tot = h.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    # The max runs over |cum1·n2 − cum2·n1| with the scalar totals
    # broadcast onto the histogram — exact int64 everywhere.
    joined = c.crossJoin(F.broadcast(tot))
    dmax = joined.agg(
        F.max(
            F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
        )
        .cast("long")
        .alias("d_num"),
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
    )
    # NULL-on-degenerate parity (ADVICE r10): with an empty period
    # side n1·n2 = 0 and DuckDB's IEEE division yields Inf/NaN while
    # Spark's Divide yields NULL — both engines now agree on NULL via
    # the explicit zero guard here and NULLIF in the oracle.
    n1d = F.col("n1").cast("double")
    den = n1d * F.col("n2")
    ks_d = F.when(den != 0, F.col("d_num").cast("double") / den)
    crit = F.when(
        den != 0, F.lit(_KS_CRIT_95) * F.sqrt((n1d + F.col("n2")) / den)
    )
    return dmax.select(
        "n1",
        "n2",
        "d_num",
        ks_d.alias("ks_d"),
        crit.alias("crit_95"),
        (ks_d > crit).alias("reject_95"),
    )
