"""Core relational operators from SURVEY.md §2 over the test tables.

Each query is the Spark-first expression of a reference operator
(citations are file:line into /root/reference). Aggregates follow the
exact-decimal determinism rules in ``queries/__init__``; computed
integer columns are cast to long to match DuckDB's BIGINT outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fabric_claims_spark.localframe import local_frame
from fabric_claims_spark.operators.partitioning import spread
from fabric_claims_spark.queries import query
from fabric_claims_spark.queries._util import davg, dsum, money, rate
from fabric_claims_spark.sources.parquet import load_table

SALT = "healthcare_secure_salt_2024"  # fixture salt, NBclaims_silver:51


# --------------------------------------------------------------------------
# A6/A7/A12 — grouped aggregates (TPC-H Q1 shape): the metrics-layer
# measure catalog (SM/tables/Claims.tmdl:5-102) re-expressed as one
# hash-aggregate pass. Map-side partial aggregation + AQE handle scale.
@query(
    "pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))
               * (CAST(1 AS DECIMAL(2,0)) + CAST(l_tax AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file scan => the whole 8-aggregate decimal pass runs in
    # ONE task (guide §2.5 input skew); spread() is a no-op once the
    # table has >= core-count splits (the cluster case)
    li = spread(load_table(spark, sf_dir, "lineitem"))
    disc_price = money("l_extendedprice") * (F.lit(1).cast("decimal(2,0)") - rate("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(2,0)") + rate("l_tax"))
    return (
        li.where(F.to_date("l_shipdate") <= F.lit("2000-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money("l_quantity")).alias("sum_qty"),
            dsum(money("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(money("l_quantity")).alias("avg_qty"),
            davg(money("l_extendedprice")).alias("avg_price"),
            davg(rate("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# W1 — dedup-by-rank, keep latest (NB_BRONZE:119-126: row_number over
# ClaimID ordered ClaimDate desc). Deterministic tie-break on the key.
# Scale: hash-partitioned window on the dedup key — no global sort.
@query(
    "dedup_latest_order_per_customer",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def dedup_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.to_date("o_orderdate").alias("o_orderdate"),
        )
    )


# --------------------------------------------------------------------------
# W1 complement — the rank>1 rows routed to the dupe quarantine
# (NB_BRONZE:122-126 dupe_claims analog).
@query(
    "duplicate_orders_routed",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
    WHERE rn > 1
    """,
)
def duplicate_orders_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") > 1)
        .select("o_custkey", "o_orderkey", "rn")
    )


# --------------------------------------------------------------------------
# J1 — left-anti equi-join (NB_BRONZE:182: subtract DQ-failed rows).
@query(
    "customers_without_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# Semi-join — the EXISTS complement of J1 (not in the reference, which
# only uses anti; included for the complete join family).
@query(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# J4 + A12 — star join with broadcast dims (SM/relationships.tmdl:1-12;
# WH_TABLES/Claims.sql:19-21). nation/region are tiny → explicit
# broadcast keeps the fact-side scan shuffle-free for the dim joins.
@query(
    "star_revenue_by_region_year",
    oracle="""
    SELECT r.r_name AS region, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(2,0)) - CAST(l.l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue,
      COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    -- (revenue product stays within DECIMAL(38) — no double fallback)
    """,
)
def star_revenue_by_region_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    # all four joins broadcast (see plan pin) — without spread() the
    # whole probe+aggregate pipeline over lineitem is one task on a
    # single-file scan (guide §2.5); no-op on a many-split scan
    li = spread(load_table(spark, sf_dir, "lineitem"))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(2,0)") - rate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            dsum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# --------------------------------------------------------------------------
# A9 — filtered aggregates (CALCULATE analogs, SM/tables/Claims.tmdl:
# 36-100): one pass of conditional sums instead of N filtered scans.
@query(
    "conditional_status_aggregates",
    oracle="""
    SELECT o_orderpriority,
      COUNT(*) AS total_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'F'
               THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
           AS DOUBLE) AS fulfilled_amount
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def conditional_status_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    zero = F.lit(0).cast("decimal(18,4)")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("fulfilled_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("open_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("pending_orders"),
        dsum(F.when(F.col("o_orderstatus") == "F", money("o_totalprice")).otherwise(zero)).alias(
            "fulfilled_amount"
        ),
    )


# --------------------------------------------------------------------------
# Claim Status calculation group (SM_Claims.SemanticModel/definition/
# tables/Claim Status.tmdl:5-13): All/Approved/Denied/Pending items
# applied to a *selection* of measures — realized as one Expand-style
# pass via plans.metrics.with_status_calc (order statuses F/O/P play
# the claim statuses). Single shuffle, any measure, incl. non-additive
# DISTINCTCOUNT.
@query(
    "status_calc_order_amounts",
    oracle="""
    WITH expanded AS (
      SELECT o_orderpriority, o_custkey, o_totalprice, 'All' AS calc_item
      FROM orders
      UNION ALL
      SELECT o_orderpriority, o_custkey, o_totalprice,
             CASE o_orderstatus WHEN 'F' THEN 'Fulfilled'
                                WHEN 'O' THEN 'Open'
                                WHEN 'P' THEN 'Pending' END
      FROM orders WHERE o_orderstatus IN ('F', 'O', 'P'))
    SELECT o_orderpriority, calc_item,
      COUNT(*) AS total_orders,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_amount,
      COUNT(DISTINCT o_custkey) AS unique_customers
    FROM expanded
    GROUP BY o_orderpriority, calc_item
    """,
)
def status_calc_order_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.plans.metrics import with_status_calc

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_custkey",
        money("o_totalprice").alias("_amt"),
        F.when(F.col("o_orderstatus") == "F", "Fulfilled")
        .when(F.col("o_orderstatus") == "O", "Open")
        .when(F.col("o_orderstatus") == "P", "Pending")
        .alias("_status"),
    )
    expanded = with_status_calc(
        o,
        status_col="_status",
        items=["Fulfilled", "Open", "Pending"],
        item_col="calc_item",
    )
    return expanded.groupBy("o_orderpriority", "calc_item").agg(
        F.count(F.lit(1)).alias("total_orders"),
        dsum(F.col("_amt")).alias("total_amount"),
        F.countDistinct("o_custkey").alias("unique_customers"),
    )


# --------------------------------------------------------------------------
# A3 — single-column DISTINCT domain views (WH_VIEWS/DistinctClaimStatus
# .sql:4-6 and 6 siblings).
@query(
    "distinct_order_status",
    oracle="SELECT DISTINCT o_orderstatus FROM orders",
)
def distinct_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()


# --------------------------------------------------------------------------
# A2 — full-row DISTINCT over a projection (WH_VIEWS/StagingClaims.sql:2-15).
@query(
    "distinct_customer_profile",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --------------------------------------------------------------------------
# A8 — DISTINCTCOUNT measures (SM/tables/Claims.tmdl:27,256).
@query(
    "unique_customers_per_status",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS unique_customers,
           COUNT(*) AS total_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def unique_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("unique_customers"),
        F.count(F.lit(1)).alias("total_orders"),
    )


# --------------------------------------------------------------------------
# A10/F14 — DIVIDE null-on-zero semantics (SM/tables/Claims.tmdl:115,
# 178,234,245): try_divide, with a genuinely-zero denominator branch.
@query(
    "priority_fulfillment_rates",
    oracle="""
    SELECT o_orderpriority,
      SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        / CAST(NULLIF(COUNT(*), 0) AS DOUBLE) AS fulfilled_rate,
      SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        / CAST(NULLIF(SUM(CASE WHEN o_orderstatus = 'X' THEN 1 ELSE 0 END), 0) AS DOUBLE)
        AS rate_vs_missing_status
    FROM orders GROUP BY o_orderpriority
    """,
)
def priority_fulfillment_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    fulfilled = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    missing = F.sum(F.when(F.col("o_orderstatus") == "X", 1).otherwise(0))
    return o.groupBy("o_orderpriority").agg(
        F.try_divide(fulfilled, F.count(F.lit(1)).cast("double")).alias("fulfilled_rate"),
        F.try_divide(fulfilled, missing.cast("double")).alias("rate_vs_missing_status"),
    )


# --------------------------------------------------------------------------
# A12 ext — rollup for the Dates Year→Month hierarchy drilldown
# (SM/tables/Dates.tmdl:109-124); built-in df.rollup, partial aggs.
@query(
    "rollup_revenue_year_priority",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           o_orderpriority,
           CAST(GROUPING(EXTRACT(year FROM o_orderdate)) AS BIGINT) AS g_year,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_amount
    FROM orders
    GROUP BY ROLLUP (EXTRACT(year FROM o_orderdate), o_orderpriority)
    """,
)
def rollup_revenue_year_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    return o.rollup("order_year", "o_orderpriority").agg(
        F.grouping("order_year").cast("long").alias("g_year"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("order_count"),
        dsum(money("o_totalprice")).alias("total_amount"),
    )


# --------------------------------------------------------------------------
# A12 ext — cube: all grouping-set combinations (rollup's superset)
# for cross-dim report matrices.
@query(
    "cube_orders_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS order_count
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("order_count"),
    )


# --------------------------------------------------------------------------
# lag/lead — inter-event gap analysis (complements W1's row_number:
# the offset-window family).
@query(
    "customer_order_gaps",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
               LAG(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders)
    SELECT o_custkey,
           COUNT(gap_days) AS gap_count,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
           CAST(SUM(gap_days) AS BIGINT) AS total_gap_days
    FROM gaps GROUP BY o_custkey
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
        ).alias("gap_days"),
    )
    return gaps.groupBy("o_custkey").agg(
        F.count("gap_days").alias("gap_count"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
        F.sum("gap_days").cast("long").alias("total_gap_days"),
    )


# --------------------------------------------------------------------------
# O-family — deterministic top-k per group (report "top N" pattern;
# rank window + filter, no global sort).
@query(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------------------
# W2 — global surrogate key over a bounded dimension (NB_SILVER:143-146
# DateID). Single-partition window is acceptable ONLY for bounded dims
# (a date spine); facts must never use a partitionless window.
@query(
    "surrogate_date_key",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS date_id, d AS order_date
    FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
    """,
)
def surrogate_date_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dates = o.select(F.to_date("o_orderdate").alias("order_date")).distinct()
    w = Window.orderBy("order_date")
    return dates.select(
        F.row_number().over(w).cast("long").alias("date_id"), "order_date"
    )


# --------------------------------------------------------------------------
# P10 — null-safe change detection gating updates (SP_UPSERT:19-20,
# 43-46,83-91: ISNULL(t.c,'') <> ISNULL(s.c,'')). Simulated staging =
# customer with deterministic drift; detector = NOT (a <=> b).
@query(
    "change_detection_nullsafe",
    oracle="""
    WITH staging AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 11 = 0 THEN NULL
                  WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
                  ELSE c_acctbal END AS new_acctbal
      FROM customer)
    SELECT c.c_nationkey, COUNT(*) AS changed_rows
    FROM customer c JOIN staging s ON c.c_custkey = s.c_custkey
    WHERE c.c_acctbal IS DISTINCT FROM s.new_acctbal
    GROUP BY c.c_nationkey
    """,
)
def change_detection_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    staging = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("double"))
        .when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + F.lit(10.0))
        .otherwise(F.col("c_acctbal"))
        .alias("new_acctbal"),
    )
    joined = c.join(staging, "c_custkey")
    return (
        joined.where(~F.col("c_acctbal").eqNullSafe(F.col("new_acctbal")))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("changed_rows"))
    )


# --------------------------------------------------------------------------
# A12 over the part dimension: min/max aggregates (exact on doubles —
# no accumulation, order-independent).
@query(
    "part_brand_stats",
    oracle="""
    SELECT p_brand, COUNT(*) AS part_count,
           CAST(COUNT(DISTINCT p_type) AS BIGINT) AS distinct_types,
           MIN(p_retailprice) AS min_price,
           MAX(p_retailprice) AS max_price,
           CAST(MIN(p_size) AS BIGINT) AS min_size,
           CAST(MAX(p_size) AS BIGINT) AS max_size
    FROM part GROUP BY p_brand
    """,
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("part_count"),
        F.countDistinct("p_type").alias("distinct_types"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        F.min("p_size").cast("long").alias("min_size"),
        F.max("p_size").cast("long").alias("max_size"),
    )


# --------------------------------------------------------------------------
# J4 on the supplier leg of the schema: supplier→nation→region rollup
# with broadcast dims (exact decimal balance sums).
@query(
    "supplier_balance_by_region",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS suppliers,
           CAST(ROUND(SUM(CAST(s.s_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE)
             AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def supplier_balance_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("suppliers"),
            dsum(money("s_acctbal")).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# F5 — salted SHA-256 pseudonymization (NB_SILVER:163-168, salt :51).
@query(
    "pseudonymize_customers",
    oracle=f"""
    SELECT c_custkey, sha256(c_name || '{SALT}') AS name_hash
    FROM customer
    """,
)
def pseudonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.sha2(F.concat(F.col("c_name"), F.lit(SALT)), 256).alias("name_hash"),
    )


# --------------------------------------------------------------------------
# Governance masked view as a gate-checked query (SURVEY.md §2.12 —
# the reference documents DDM/RLS without shipping code; here the
# masking view factory + RLS predicate run as one projection+filter,
# so the masking semantics themselves are oracle-verified, not just
# unit-tested). mask_partial keeps the last 4 chars behind a '*' fill;
# mask_hash is the join-stable SHA-256 pseudonym; the RLS predicate
# (AUTOMOBILE segment analog of the provider filter) pushes to the
# scan.
@query(
    "customers_masked_rls_view",
    oracle="""
    SELECT c_custkey,
           repeat('*', greatest(length(c_name) - 4, 0))
             || substr(c_name, greatest(length(c_name) - 3, 1), 4) AS c_name,
           sha256(c_address || 'governance-salt') AS c_address,
           '****' AS c_phone,
           c_mktsegment
    FROM (SELECT c_custkey, c_name,
                 CAST(c_custkey AS VARCHAR) AS c_address,
                 CAST(c_custkey AS VARCHAR) AS c_phone,
                 c_mktsegment
          FROM customer)
    WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def customers_masked_rls_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.plans.governance import (
        mask_full,
        mask_hash,
        mask_partial,
        masked_view,
        row_filtered_view,
    )

    # the test table has no address/phone columns; derive deterministic
    # stand-ins from the key so the masking chain has real inputs
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.col("c_custkey").cast("string").alias("c_address"),
        F.col("c_custkey").cast("string").alias("c_phone"),
        "c_mktsegment",
    )
    masked = masked_view(
        c,
        {
            "c_name": lambda col: mask_partial(col, keep_last=4),
            "c_address": lambda col: mask_hash(col, "governance-salt"),
            "c_phone": mask_full,
        },
    )
    return row_filtered_view(masked, F.col("c_mktsegment") == "AUTOMOBILE")


# --------------------------------------------------------------------------
# Incremental aggregate maintenance equivalence — orders arrive as
# three disjoint batches (o_orderkey mod 3), each folded into a
# stored rollup by operators/rollup.maintain_additive_rollup; the
# final state must hash-match the one-shot aggregate the oracle
# computes. This is the gate proof that the engine's incremental gold
# path (fold batch partials into domain-bounded state, never re-scan
# history) is exact, not approximate: count and decimal-sum are
# commutative-monoid measures, min/max are semilattice measures, so
# batch order and batch count cannot change the result.
@query(
    "incremental_rollup_equivalence",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
             AS revenue,
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,4)) AS DOUBLE)
             AS min_price,
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,4)) AS DOUBLE)
             AS max_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def incremental_rollup_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from fabric_claims_spark.operators.rollup import maintain_additive_rollup
    from fabric_claims_spark.sources.merge import TableStore

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
    )
    work = tempfile.mkdtemp(prefix="rollup_maint_")
    try:
        store = TableStore(spark, work)
        state = None
        for i in range(3):
            batch = o.where(F.col("o_orderkey") % 3 == i).select(
                "o_orderstatus",
                "o_orderpriority",
                "price",
                F.col("price").alias("price_min"),
                F.col("price").alias("price_max"),
            )
            state = maintain_additive_rollup(
                store,
                "status_rollup",
                batch,
                keys=["o_orderstatus", "o_orderpriority"],
                sum_cols=["price"],
                min_cols=["price_min"],
                max_cols=["price_max"],
            )
        out = state.select(
            "o_orderstatus",
            "o_orderpriority",
            F.col("n"),
            F.round(F.col("price"), 4).cast("double").alias("revenue"),
            F.col("price_min").cast("double").alias("min_price"),
            F.col("price_max").cast("double").alias("max_price"),
        )
        # materialize before the workspace disappears
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# Incremental SECOND-MOMENT maintenance with retraction (round 12):
# mergeable (n, Σx, Σx²) state supports mean/variance without
# re-scanning history, and because counts-with-sign and sums form a
# GROUP (not just a monoid), an erasure batch folds back OUT with
# weight -1 / negated columns — the rollup extension the
# serving-index delete path rests on, here oracled directly. Three
# add batches fold in, one retraction batch folds a deterministic
# subset out (and is REDELIVERED — the idempotence gate must no-op
# it), and the state must equal the one-shot aggregate over the
# surviving rows. Sums stay exact decimals until the final
# round-then-cast; mean/variance are fixed IEEE expression trees
# mirrored verbatim in the oracle.
@query(
    "incremental_variance_equivalence",
    oracle="""
    WITH surv AS (
      SELECT l_returnflag,
             CAST(l_quantity AS DECIMAL(12,4)) AS p
      FROM lineitem WHERE l_orderkey % 7 != 3)
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(ROUND(SUM(p), 4) AS DOUBLE) AS qty_sum,
           CAST(ROUND(SUM(p * p), 4) AS DOUBLE) AS qty_sumsq,
           CAST(ROUND(SUM(p), 4) AS DOUBLE) / COUNT(*) AS mean_qty,
           (CAST(ROUND(SUM(p * p), 4) AS DOUBLE)
            - CAST(ROUND(SUM(p), 4) AS DOUBLE)
              * CAST(ROUND(SUM(p), 4) AS DOUBLE) / COUNT(*))
             / COUNT(*) AS var_qty
    FROM surv GROUP BY 1 ORDER BY 1
    """,
)
def incremental_variance_equivalence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from fabric_claims_spark.operators.rollup import (
        maintain_additive_rollup_idempotent,
    )
    from fabric_claims_spark.sources.merge import TableStore

    # l_quantity (small exact 2-dp values): squares and their sums
    # stay far below 2^53, so every round-then-cast is ULP-safe in
    # both engines — the magnitude discipline the module docstring's
    # determinism rules require for derived-moment outputs.
    o = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.col("l_quantity").cast("decimal(12,4)").alias("p"),
    )
    work = tempfile.mkdtemp(prefix="m2_maint_")
    try:
        store = TableStore(spark, work)
        state = None
        for i in range(3):
            batch = o.where(F.col("l_orderkey") % 3 == i).select(
                "l_returnflag",
                F.col("p").alias("qty_sum"),
                (F.col("p") * F.col("p")).alias("qty_sumsq"),
                F.lit(1).alias("_w"),
            )
            state = maintain_additive_rollup_idempotent(
                store,
                "m2_rollup",
                batch,
                i,
                keys=["l_returnflag"],
                sum_cols=["qty_sum", "qty_sumsq"],
                count_col="n",
                weight_col="_w",
            )
        retract = o.where(F.col("l_orderkey") % 7 == 3).select(
            "l_returnflag",
            (-F.col("p")).alias("qty_sum"),
            (-(F.col("p") * F.col("p"))).alias("qty_sumsq"),
            F.lit(-1).alias("_w"),
        )
        state = maintain_additive_rollup_idempotent(
            store, "m2_rollup", retract, 3,
            keys=["l_returnflag"],
            sum_cols=["qty_sum", "qty_sumsq"],
            count_col="n", weight_col="_w",
        )
        # redelivered retraction: the idempotence gate must no-op it
        state = maintain_additive_rollup_idempotent(
            store, "m2_rollup", retract, 3,
            keys=["l_returnflag"],
            sum_cols=["qty_sum", "qty_sumsq"],
            count_col="n", weight_col="_w",
        )
        s = F.round(F.col("qty_sum"), 4).cast("double")
        s2 = F.round(F.col("qty_sumsq"), 4).cast("double")
        n = F.col("n")
        out = state.select(
            "l_returnflag",
            n.alias("n"),
            s.alias("qty_sum"),
            s2.alias("qty_sumsq"),
            (s / n).alias("mean_qty"),
            ((s2 - s * s / n) / n).alias("var_qty"),
        ).orderBy("l_returnflag")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# Gaps-and-islands — consecutive-month activity streaks per customer,
# the classic "islands" pattern (month_index − row_number is constant
# within a run of consecutive months). All integer arithmetic; the
# window partitions by customer so no partition ever exceeds one
# customer's order-month history, and the output is the streak-length
# distribution — bounded by the calendar span, not the data size.
@query(
    "customer_monthly_streaks",
    oracle="""
    WITH mo AS (
      SELECT DISTINCT o_custkey,
             CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS midx
      FROM orders),
    r AS (
      SELECT o_custkey, midx,
             midx - ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY midx) AS grp
      FROM mo),
    s AS (
      SELECT o_custkey, grp, COUNT(*) AS streak_months
      FROM r GROUP BY 1, 2)
    SELECT streak_months, COUNT(*) AS n_streaks,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM s GROUP BY 1 ORDER BY 1
    """,
)
def customer_monthly_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    mo = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("midx"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("midx")
    r = mo.select(
        "o_custkey",
        (F.col("midx") - F.row_number().over(w)).alias("grp"),
    )
    s = r.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).alias("streak_months")
    )
    return (
        s.groupBy("streak_months")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("streak_months")
    )


# --------------------------------------------------------------------------
# Operational SLA percentiles — p50/p90 order→ship lead time per
# supplier nation, the fulfilment-latency report. The two fact scans
# join on their co-partitioned order key; supplier and nation attach
# as M:1 broadcast dims; then percentiles come from the histogram-CDF
# construction over the (nation, lead-days) VALUE domain — bounded by
# the shipping-window calendar, so the per-nation cumulative windows
# never see data-sized frames and no raw-row sort exists. Discrete
# (percentile_disc) semantics, integer-exact: cum·2 ≥ n and
# cum·10 ≥ 9n pick the p50/p90 cells without any division at all.
@query(
    "nation_lead_time_percentiles",
    oracle="""
    WITH l AS (
      SELECT n.n_name AS nation,
             date_diff('day', o.o_orderdate,
                       CAST(l.l_shipdate AS DATE)) AS lead_days
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey),
    h AS (SELECT nation, lead_days, COUNT(*) AS cnt FROM l GROUP BY 1, 2),
    c AS (
      SELECT nation, lead_days, cnt,
             SUM(cnt) OVER (PARTITION BY nation ORDER BY lead_days) AS cum,
             SUM(cnt) OVER (PARTITION BY nation) AS n
      FROM h)
    SELECT nation, CAST(n AS BIGINT) AS n_lines,
           MIN(CASE WHEN cum * 2 >= n THEN lead_days END) AS p50_days,
           MIN(CASE WHEN cum * 10 >= 9 * n THEN lead_days END) AS p90_days
    FROM c GROUP BY 1, 2 ORDER BY 1
    """,
)
def nation_lead_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    lead = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate")
            ).alias("lead_days"),
        )
    )
    h = lead.groupBy("nation", "lead_days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wc = Window.partitionBy("nation").orderBy("lead_days")
    wn = Window.partitionBy("nation")
    c = h.select(
        "nation",
        "lead_days",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    return (
        c.groupBy("nation", "n")
        .agg(
            F.min(
                F.when(F.col("cum") * 2 >= F.col("n"), F.col("lead_days"))
            ).alias("p50_days"),
            F.min(
                F.when(
                    F.col("cum") * 10 >= 9 * F.col("n"), F.col("lead_days")
                )
            ).alias("p90_days"),
        )
        .select(
            "nation",
            F.col("n").alias("n_lines"),
            "p50_days",
            "p90_days",
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# GROUPING SETS — the non-hierarchical grouping shape rollup and cube
# cannot express: exactly the two single-column marginals, no grand
# total, no cross product. Declared through the SQL surface (the
# DataFrame API has only rollup/cube); Catalyst expands it to one
# Expand + aggregate, a single pass over the fact.
@query(
    "grouping_sets_status_priority",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
                AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY status NULLS FIRST, priority NULLS FIRST
    """,
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.select("o_orderstatus", "o_orderpriority", "o_totalprice").createOrReplaceTempView(
        "_gs_orders"
    )
    return spark.sql(
        """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
                    AS DOUBLE) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status NULLS FIRST, priority NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# Cohort LTV curve — cumulative revenue per customer by cohort age,
# the acquisition-quality report: cohort = first-order month, age =
# months since cohort, value = cumulative cohort revenue / cohort
# size. Decimal-exact sums throughout; the cumulative window runs
# over the (cohort × age) frame — bounded by the calendar squared,
# not the data.
@query(
    "customer_cohort_ltv",
    oracle="""
    WITH fo AS (
      SELECT o_custkey,
             MIN(CAST(EXTRACT(year FROM o_orderdate) * 12
                      + EXTRACT(month FROM o_orderdate) AS BIGINT)) AS cm
      FROM orders GROUP BY 1),
    cs AS (SELECT cm, COUNT(*) AS cohort_size FROM fo GROUP BY 1),
    r AS (
      SELECT f.cm,
             CAST(EXTRACT(year FROM o.o_orderdate) * 12
                  + EXTRACT(month FROM o.o_orderdate) AS BIGINT) - f.cm
               AS age_months,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders o JOIN fo f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2),
    c AS (
      SELECT cm, age_months,
             SUM(rev) OVER (PARTITION BY cm ORDER BY age_months) AS cum
      FROM r)
    SELECT c.cm AS cohort_month, c.age_months, cs.cohort_size,
           CAST(ROUND(c.cum, 4) AS DOUBLE) AS cum_revenue,
           CAST(c.cum AS DOUBLE) / cs.cohort_size AS ltv_per_customer
    FROM c JOIN cs ON c.cm = cs.cm
    ORDER BY cohort_month, age_months
    """,
)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    midx = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ).cast("bigint")
    fo = o.groupBy("o_custkey").agg(F.min(midx).alias("cm"))
    cs = fo.groupBy("cm").agg(F.count(F.lit(1)).alias("cohort_size"))
    r = (
        o.join(fo, "o_custkey")
        .groupBy("cm", (midx - F.col("cm")).alias("age_months"))
        .agg(F.sum(money("o_totalprice")).alias("rev"))
    )
    w = Window.partitionBy("cm").orderBy("age_months")
    c = r.select(
        "cm", "age_months", F.sum("rev").over(w).alias("cum")
    )
    return (
        c.join(F.broadcast(cs), "cm")
        .select(
            F.col("cm").alias("cohort_month"),
            "age_months",
            "cohort_size",
            F.round(F.col("cum"), 4).cast("double").alias("cum_revenue"),
            (F.col("cum").cast("double") / F.col("cohort_size")).alias(
                "ltv_per_customer"
            ),
        )
        .orderBy("cohort_month", "age_months")
    )


# --------------------------------------------------------------------------
# Herfindahl–Hirschman concentration index — how concentrated is
# supplier account balance within each region (the market-structure
# metric; >2500 basis-point-squared ≈ "highly concentrated"). Each
# squared share rounds to a 6-dp micro-unit int64 (the micro-nat
# rule), so the HHI sum is an exact integer aggregate — never a
# partition-order-dependent float sum. M:1 dims broadcast; one
# region-keyed aggregate.
@query(
    "region_supplier_hhi",
    oracle="""
    WITH s AS (
      SELECT r.r_name AS region, sup.s_suppkey,
             CAST(sup.s_acctbal AS DECIMAL(18,4)) AS bal
      FROM supplier sup
      JOIN nation n ON sup.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE sup.s_acctbal > 0),
    t AS (SELECT region, SUM(bal) AS tot, COUNT(*) AS n FROM s GROUP BY 1)
    SELECT s.region, CAST(t.n AS BIGINT) AS suppliers,
           CAST(SUM(CAST(ROUND(ROUND(
             (CAST(s.bal AS DOUBLE) / CAST(t.tot AS DOUBLE))
             * (CAST(s.bal AS DOUBLE) / CAST(t.tot AS DOUBLE))
             * 10000, 6) * 1000000, 0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS hhi
    FROM s JOIN t ON s.region = t.region
    GROUP BY 1, 2
    ORDER BY 1
    """,
)
def region_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") > 0
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    s = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select(
            F.col("r_name").alias("region"),
            F.col("s_acctbal").cast("decimal(18,4)").alias("bal"),
        )
    )
    t = s.groupBy("region").agg(
        F.sum("bal").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    share = F.col("bal").cast("double") / F.col("tot").cast("double")
    micro = F.round(
        F.round(share * share * 10000, 6) * 1_000_000, 0
    ).cast("long")
    return (
        s.join(F.broadcast(t), "region")
        .groupBy("region", F.col("n").cast("bigint").alias("suppliers"))
        .agg(
            (F.sum(micro).cast("double") / 1_000_000.0).alias("hhi")
        )
        .orderBy("region")
    )


# --------------------------------------------------------------------------
# Shipping-priority top-k (the TPC-H Q3 shape) — unshipped revenue of
# BUILDING-segment orders placed before the cutoff, shipped after it:
# two fact scans join on the co-partitioned order key, the segment
# dim filter arrives through a broadcast semi-side, revenue is the
# exact-decimal extendedprice*(1-discount), and the top-10 cut
# compiles to TakeOrderedAndProject (per-partition top-k + driver
# merge), never a global sort. Both date predicates push into the
# parquet scans.
@query(
    "shipping_priority_topk",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 4)
                AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(6,4)")
    )
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 4).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Local-supplier volume (the TPC-H Q5 shape) — revenue where the
# CUSTOMER and the SUPPLIER sit in the same nation, per nation: the
# one classic join graph with an equality between two different
# dimension paths (c_nationkey = s_nationkey), which forces the
# planner to thread both dim keys through the fact joins. Dims
# broadcast; the fact-fact join stays on the order key.
@query(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 4)
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXTRACT(year FROM o.o_orderdate) = 1997
    GROUP BY 1
    ORDER BY revenue DESC, nation
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1997
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(6,4)")
    )
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(sup),
            (li["l_suppkey"] == sup["s_suppkey"])
            & (F.col("c_nationkey") == sup["s_nationkey"]),
        )
        .join(F.broadcast(nat), F.col("c_nationkey") == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(rev), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


# --------------------------------------------------------------------------
# Stale stock — parts with NO demand since the cutoff: the reversed
# anti-join direction (dimension rows without matching facts) that
# inventory reviews run; the other anti-join queries all point
# fact→dim. The shipdate predicate pushes into the fact scan and the
# fact key distinct-projects before the anti-join, so the build side
# is the deduplicated recent-part set, not raw lineitems.
@query(
    "parts_no_recent_demand",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_type
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_partkey = p.p_partkey
        AND CAST(l.l_shipdate AS DATE) >= DATE '2001-01-01')
    ORDER BY p.p_partkey
    """,
)
def parts_no_recent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.col("l_shipdate").cast("date")
            >= F.lit("2001-01-01").cast("date")
        )
        .select("l_partkey")
        .distinct()
    )
    return (
        p.join(li, p["p_partkey"] == li["l_partkey"], "left_anti")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Greatest-n-per-group WITH TIES — rank() instead of row_number():
# every order tied at the cut survives (the SQL:2008 FETCH ... WITH
# TIES semantics). The deliberate contrast to
# top3_orders_per_customer (row_number — exactly 3, ties broken by
# key): tie handling is a correctness decision, not a detail, and the
# two variants pin both sides of it. Same scale shape: one
# user-keyed window over the fact, no global sort.
@query(
    "top_orders_per_customer_ties",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(RANK() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC) AS BIGINT)
               AS rnk
      FROM orders)
    WHERE rnk <= 2
    ORDER BY o_custkey, rnk, o_orderkey
    """,
)
def top_orders_per_customer_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        o.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .where(F.col("rnk") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "rnk",
        )
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Month-over-month revenue change per priority — lag() over the
# month×priority rollup (a calendar-bounded frame, never raw
# orders); the first month of each priority yields NULL change in
# both engines (lag's missing-row semantics, not a zero).
@query(
    "orders_mom_revenue_change",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
                  AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2)
    SELECT priority, month, revenue,
           ROUND((revenue - LAG(revenue) OVER w)
                 / LAG(revenue) OVER w, 6) AS mom_change
    FROM m
    WINDOW w AS (PARTITION BY priority ORDER BY month)
    ORDER BY priority, month
    """,
)
def orders_mom_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
    ).agg(
        F.round(F.sum(money("o_totalprice")), 4).cast("double").alias("revenue")
    )
    w = Window.partitionBy("priority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        m.withColumn(
            "mom_change",
            F.round((F.col("revenue") - prev) / prev, 6),
        )
        .orderBy("priority", "month")
    )


# --------------------------------------------------------------------------
# k-anonymity risk readout — the governance family's measurement
# piece (masking/RLS/erasure/pseudonymization transform data; this
# answers "is the remaining quasi-identifier combination safe to
# release?"). Equivalence classes over (nation, market segment,
# account-balance band — the Sweeney-style generalization of the
# continuous column); k = the smallest class, the worst-case
# re-identification pool. The release rule of thumb (k >= 5) gets
# its violating row count and share. One groupBy on the quasi-ID
# tuple then a scalar aggregate — corpus-linear, no window, no pair
# term; at 100 TB the class table is bounded by the QI domain, not
# the row count.
@query(
    "customers_k_anonymity",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             COUNT(*) AS n
      FROM customer
      GROUP BY 1, 2, 3)
    SELECT CAST(MIN(n) AS BIGINT) AS k_anonymity,
           CAST(COUNT(*) AS BIGINT) AS classes,
           CAST(SUM(n) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS singleton_classes,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS rows_below_k5,
           ROUND(CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
                 / SUM(n), 6) AS pct_below_k5
    FROM classes
    """,
)
def customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    below5 = F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
    return classes.agg(
        F.min("n").cast("bigint").alias("k_anonymity"),
        F.count(F.lit(1)).cast("bigint").alias("classes"),
        F.sum("n").cast("bigint").alias("rows_total"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("singleton_classes"),
        below5.cast("bigint").alias("rows_below_k5"),
        F.round(below5.cast("double") / F.sum("n"), 6).alias("pct_below_k5"),
    )


# --------------------------------------------------------------------------
# k-anonymity ENFORCEMENT (VERDICT r8 item 6): the readout above
# measures the risk; this query RELEASES the class table the
# plans/governance.k_anonymize transform produces — global recoding
# over the fixed generalization ladder (nation→region rollup,
# balance-band widening), level chosen in-plan as the first whose
# smallest class reaches k=5, residual below-k classes suppressed.
# min(n) over this output IS the released table's k-anonymity, so
# the k ≥ 5 floor is visible in the hash itself (and pinned by
# tests/test_governance.py). Suppression counts are audit-logged by
# enforce_k_anonymity; the released table never names them.
@query(
    "customers_k_anonymize_enforced",
    oracle="""
    WITH cj AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             'n' || CAST(c_nationkey AS VARCHAR) AS geo_n,
             'r' || CAST(n_regionkey AS VARCHAR) AS geo_r
      FROM customer JOIN nation ON n_nationkey = c_nationkey),
    allv AS (
      SELECT 0 AS level, geo_n AS geo, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM cj
      UNION ALL
      SELECT 1, geo_n, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) FROM cj
      UNION ALL
      SELECT 2, geo_r, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) FROM cj
      UNION ALL
      SELECT 3, geo_r, c_mktsegment,
             CAST(floor(c_acctbal / 4000) AS BIGINT) FROM cj),
    g AS (
      SELECT level, geo, segment, bal_band, COUNT(*) AS n
      FROM allv GROUP BY 1, 2, 3, 4),
    kml AS (SELECT level, MIN(n) AS kmin FROM g GROUP BY level),
    lv AS (SELECT COALESCE(MIN(level), 3) AS lv FROM kml WHERE kmin >= 5)
    SELECT CAST(g.level AS BIGINT) AS level, g.geo, g.segment,
           g.bal_band, CAST(g.n AS BIGINT) AS n
    FROM g JOIN lv ON g.level = lv.lv
    WHERE g.n >= 5
    ORDER BY geo, segment, bal_band
    """,
)
def customers_k_anonymize_enforced(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from fabric_claims_spark.plans.governance import k_anonymize

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    _, classes = k_anonymize(c, n, k=5)
    return classes.select(
        F.col("level"),
        "geo",
        "segment",
        "bal_band",
        F.col("n").cast("bigint").alias("n"),
    ).orderBy("geo", "segment", "bal_band")


# --------------------------------------------------------------------------
# l-diversity readout (round 9) — k-anonymity's partner measurement
# (Machanavajjhala et al.): a class can be large (k-safe) yet leak if
# everyone in it shares the SENSITIVE value. Quasi-identifiers here
# are (nation, market segment); the sensitive attribute is the
# account-balance band. l = the smallest number of distinct sensitive
# values in any QI class; the rule-of-thumb floor (l >= 3) gets its
# violating-class count and share. Same scale shape as the k readout:
# one groupBy bounded by the QI domain, then a scalar aggregate.
@query(
    "customers_l_diversity",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*) AS n,
             COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l
      FROM customer
      GROUP BY 1, 2)
    SELECT CAST(MIN(l) AS BIGINT) AS l_diversity,
           CAST(COUNT(*) AS BIGINT) AS classes,
           CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below_l3,
           ROUND(CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS pct_below_l3,
           CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
             AS rows_in_low_l_classes
    FROM classes
    """,
)
def customers_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000).cast("bigint")
        ).alias("l"),
    )
    low = F.when(F.col("l") < 3, 1).otherwise(0)
    return classes.agg(
        F.min("l").cast("bigint").alias("l_diversity"),
        F.count(F.lit(1)).cast("bigint").alias("classes"),
        F.sum(low).cast("bigint").alias("classes_below_l3"),
        F.round(
            F.sum(low).cast("double") / F.count(F.lit(1)), 6
        ).alias("pct_below_l3"),
        F.sum(F.when(F.col("l") < 3, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("rows_in_low_l_classes"),
    )


# --------------------------------------------------------------------------
# t-closeness readout (round 10) — the third leg of the privacy
# measurement triad (k-anonymity → l-diversity → t-closeness; Li,
# Li, Venkatasubramanian, ICDE 2007): an l-diverse class still leaks
# if its sensitive-value DISTRIBUTION skews far from the table's
# (e.g. a class whose balances are all in the top bands). t = the
# max over QI classes of the Earth Mover's Distance between the
# class's balance-band distribution and the global one; for an
# ordered attribute EMD has the closed form
#   (1/(m-1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|.
#
# Cross-engine determinism: p_j − q_j = n_cj/N_c − g_j/N is kept as
# the exact INTEGER numerator n_cj·N − g_j·N_c over the common
# denominator N_c·N; cumulative sums and |·| stay integer, and ONE
# final division (exactly-rounded IEEE in both engines) produces the
# per-class EMD, rounded to 6 dp only at the output edge. At sf0.1
# the numerators stay < 2^31; a 100-TB run casts the products to
# decimal(38,0) first (noted, not needed at gate scale).
#
# Scale shape: two groupBys bounded by |QI domain| and |band domain|,
# a dense (class × band) grid (bounded product, broadcast), one
# window over the band order per class (partition = class, bounded
# frames), then a scalar aggregate. Nothing row-shaped leaves the
# first groupBy.
@query(
    "customers_t_closeness",
    oracle="""
    WITH base AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
      FROM customer),
    tot AS (SELECT COUNT(*) AS n FROM base),
    gb AS (SELECT band, COUNT(*) AS g FROM base GROUP BY 1),
    cls AS (SELECT nat, seg, COUNT(*) AS nc FROM base GROUP BY 1, 2),
    cb AS (SELECT nat, seg, band, COUNT(*) AS ncb FROM base GROUP BY 1, 2, 3),
    grid AS (
      SELECT cls.nat, cls.seg, cls.nc, gb.band, gb.g,
             COALESCE(cb.ncb, 0) AS ncb
      FROM cls CROSS JOIN gb
      LEFT JOIN cb ON cb.nat = cls.nat AND cb.seg = cls.seg
                  AND cb.band = gb.band),
    cum AS (
      SELECT nat, seg, nc,
             SUM(ncb * (SELECT n FROM tot) - g * nc) OVER (
               PARTITION BY nat, seg ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cumnum
      FROM grid),
    emd AS (
      SELECT nat, seg,
             CAST(SUM(ABS(cumnum)) AS DOUBLE)
               / (MIN(nc) * (SELECT n FROM tot)
                  * ((SELECT COUNT(*) FROM gb) - 1)) AS t
      FROM cum GROUP BY 1, 2)
    SELECT ROUND(MAX(t), 6) AS t_closeness,
           CAST(COUNT(*) AS BIGINT) AS classes,
           CAST(SUM(CASE WHEN t > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_over_t02,
           ROUND(CAST(SUM(CASE WHEN t > 0.2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS pct_over_t02
    FROM emd
    """,
)
def customers_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    )
    n_total = base.count()
    gb = base.groupBy("band").agg(F.count(F.lit(1)).alias("g"))
    m = gb.count()
    cls = base.groupBy("nat", "seg").agg(F.count(F.lit(1)).alias("nc"))
    cb = base.groupBy("nat", "seg", "band").agg(
        F.count(F.lit(1)).alias("ncb")
    )
    grid = (
        cls.crossJoin(F.broadcast(gb))
        .join(cb, ["nat", "seg", "band"], "left")
        .select(
            "nat",
            "seg",
            "nc",
            "band",
            "g",
            F.coalesce(F.col("ncb"), F.lit(0)).alias("ncb"),
        )
    )
    w = (
        Window.partitionBy("nat", "seg")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "nat",
        "seg",
        "nc",
        F.sum(
            F.col("ncb") * F.lit(n_total) - F.col("g") * F.col("nc")
        ).over(w).alias("cumnum"),
    )
    emd = cum.groupBy("nat", "seg").agg(
        (
            F.sum(F.abs(F.col("cumnum"))).cast("double")
            / (F.min("nc") * F.lit(n_total) * F.lit(m - 1))
        ).alias("t")
    )
    over = F.when(F.col("t") > 0.2, 1).otherwise(0)
    return emd.agg(
        F.round(F.max("t"), 6).alias("t_closeness"),
        F.count(F.lit(1)).cast("bigint").alias("classes"),
        F.sum(over).cast("bigint").alias("classes_over_t02"),
        F.round(F.sum(over).cast("double") / F.count(F.lit(1)), 6).alias(
            "pct_over_t02"
        ),
    )


# --------------------------------------------------------------------------
# l-diversity ENFORCEMENT (round 10, VERDICT r9 item 3) — the
# transform behind the readout above, completing the measure→enforce
# pair the way customers_k_anonymize_enforced completed the k pair.
# plans/governance.kl_anonymize shares the k ladder machinery
# verbatim (k_anonymize IS kl_anonymize at l=1): the level choice
# requires min-k over full-QI cells AND min-l distinct balance bands
# per (geo, segment) group jointly; suppression is two-stage — below-k
# cells drop first, then any group whose SURVIVING cells carry < l
# distinct bands drops whole (removing a group cannot push a
# remaining cell below k, so two passes reach the fixpoint).
#
# Fixture regimes (measured, k=5 l=4): sf0.001 suppresses every
# group (empty release), sf0.01 — the driver's gate scale —
# suppresses 13 of 25 groups (PARTIAL: the hash witnesses the
# group-level cut, not a no-op), sf0.1 suppresses none. Both floors
# are visible in the released hash: min(n) ≥ 5 per cell, ≥ 4
# distinct bands per (geo, segment) group.
@query(
    "customers_kl_anonymize_enforced",
    oracle="""
    WITH cj AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             'n' || CAST(c_nationkey AS VARCHAR) AS geo_n,
             'r' || CAST(n_regionkey AS VARCHAR) AS geo_r
      FROM customer JOIN nation ON n_nationkey = c_nationkey),
    allv AS (
      SELECT 0 AS level, geo_n AS geo, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM cj
      UNION ALL
      SELECT 1, geo_n, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) FROM cj
      UNION ALL
      SELECT 2, geo_r, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) FROM cj
      UNION ALL
      SELECT 3, geo_r, c_mktsegment,
             CAST(floor(c_acctbal / 4000) AS BIGINT) FROM cj),
    g AS (
      SELECT level, geo, segment, bal_band, COUNT(*) AS n
      FROM allv GROUP BY 1, 2, 3, 4),
    kml AS (SELECT level, MIN(n) AS kmin FROM g GROUP BY level),
    lml AS (
      SELECT level, MIN(l_) AS lmin FROM (
        SELECT level, geo, segment, COUNT(DISTINCT bal_band) AS l_
        FROM g GROUP BY 1, 2, 3) GROUP BY level),
    lv AS (
      SELECT COALESCE(MIN(kml.level), 3) AS lv
      FROM kml JOIN lml ON kml.level = lml.level
      WHERE kmin >= 5 AND lmin >= 4),
    gk AS (
      SELECT g.* FROM g JOIN lv ON g.level = lv.lv WHERE g.n >= 5),
    gl AS (
      SELECT geo, segment FROM gk GROUP BY geo, segment
      HAVING COUNT(DISTINCT bal_band) >= 4)
    SELECT CAST(gk.level AS BIGINT) AS level, gk.geo, gk.segment,
           gk.bal_band, CAST(gk.n AS BIGINT) AS n
    FROM gk JOIN gl ON gk.geo = gl.geo AND gk.segment = gl.segment
    ORDER BY gk.geo, gk.segment, gk.bal_band
    """,
)
def customers_kl_anonymize_enforced(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from fabric_claims_spark.plans.governance import kl_anonymize

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    _, classes = kl_anonymize(c, n, k=5, l=4)
    return classes.select(
        F.col("level"),
        "geo",
        "segment",
        "bal_band",
        F.col("n").cast("bigint").alias("n"),
    ).orderBy("geo", "segment", "bal_band")


# --------------------------------------------------------------------------
# Full privacy-triad ENFORCEMENT (round 10): k-anonymity +
# l-diversity + t-closeness over the same generalization ladder —
# the measure→enforce pair for customers_t_closeness, sharing the
# kl machinery verbatim (plans/governance.klt_anonymize; kl IS klt
# at t=None, pytest-pinned). The level choice jointly requires
# min-k cells, min-l group diversity, AND max group EMD ≤ t vs the
# ORIGINAL table's band distribution (the attacker's prior — a
# fixed reference, so the two suppression stages stay
# non-iterative); the group stage then drops survivors' groups that
# are under-diverse OR over-skewed.
#
# Fixture regimes (measured, k=2 l=2 t=0.15): sf0.001 falls back to
# the last level and BOTH group conditions fire partially (of 24
# k-surviving groups: 9 drop on l, 3 drop on t, 12 release — the
# hash witnesses each cut); sf0.01 chooses level 2 via the joint
# rule; sf0.1 releases level 0 clean.
@query(
    "customers_klt_anonymize_enforced",
    oracle="""
    WITH cj AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             'n' || CAST(c_nationkey AS VARCHAR) AS geo_n,
             'r' || CAST(n_regionkey AS VARCHAR) AS geo_r
      FROM customer JOIN nation ON n_nationkey = c_nationkey),
    allv AS (
      SELECT 0 AS level, geo_n AS geo, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
      FROM cj
      UNION ALL
      SELECT 1, geo_n, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) FROM cj
      UNION ALL
      SELECT 2, geo_r, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) FROM cj
      UNION ALL
      SELECT 3, geo_r, c_mktsegment,
             CAST(floor(c_acctbal / 4000) AS BIGINT) FROM cj),
    tot AS (SELECT COUNT(*) AS n FROM customer),
    g AS (
      SELECT level, geo, segment, band, COUNT(*) AS ncb
      FROM allv GROUP BY 1, 2, 3, 4),
    glb AS (SELECT level, band, COUNT(*) AS gn FROM allv GROUP BY 1, 2),
    mlv AS (SELECT level, COUNT(*) AS m FROM glb GROUP BY 1),
    kml AS (SELECT level, MIN(ncb) AS kmin FROM g GROUP BY 1),
    lml AS (
      SELECT level, MIN(l_) AS lmin FROM (
        SELECT level, geo, segment, COUNT(DISTINCT band) AS l_
        FROM g GROUP BY 1, 2, 3) GROUP BY 1),
    grp AS (
      SELECT level, geo, segment, SUM(ncb) AS nc FROM g GROUP BY 1, 2, 3),
    grid AS (
      SELECT grp.level, grp.geo, grp.segment, grp.nc, glb.band, glb.gn,
             COALESCE(g.ncb, 0) AS ncb
      FROM grp JOIN glb ON glb.level = grp.level
      LEFT JOIN g ON g.level = grp.level AND g.geo = grp.geo
                 AND g.segment = grp.segment AND g.band = glb.band),
    cum AS (
      SELECT level, geo, segment, nc,
             SUM(ncb * (SELECT n FROM tot) - gn * nc) OVER (
               PARTITION BY level, geo, segment ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cumnum
      FROM grid),
    emd AS (
      SELECT c.level, geo, segment,
             CAST(SUM(ABS(cumnum)) AS DOUBLE)
               / (MIN(nc) * (SELECT n FROM tot) * (MIN(m.m) - 1)) AS t
      FROM cum c JOIN mlv m ON m.level = c.level GROUP BY 1, 2, 3),
    tml AS (SELECT level, MAX(t) AS tmax FROM emd GROUP BY 1),
    lv AS (
      SELECT COALESCE(MIN(kml.level), 3) AS lv
      FROM kml JOIN lml ON kml.level = lml.level
               JOIN tml ON tml.level = kml.level
      WHERE kmin >= 2 AND lmin >= 2 AND tmax <= 0.15),
    gk AS (
      SELECT g.* FROM g JOIN lv ON g.level = lv.lv WHERE g.ncb >= 2),
    grpk AS (
      SELECT level, geo, segment, SUM(ncb) AS nc,
             COUNT(DISTINCT band) AS lsur
      FROM gk GROUP BY 1, 2, 3),
    gridk AS (
      SELECT grpk.level, grpk.geo, grpk.segment, grpk.nc, grpk.lsur,
             glb.band, glb.gn, COALESCE(gk.ncb, 0) AS ncb
      FROM grpk JOIN glb ON glb.level = grpk.level
      LEFT JOIN gk ON gk.geo = grpk.geo AND gk.segment = grpk.segment
                  AND gk.band = glb.band),
    cumk AS (
      SELECT level, geo, segment, nc, lsur,
             SUM(ncb * (SELECT n FROM tot) - gn * nc) OVER (
               PARTITION BY geo, segment ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cumnum
      FROM gridk),
    emdk AS (
      SELECT c.level, geo, segment, MIN(lsur) AS lsur,
             CAST(SUM(ABS(cumnum)) AS DOUBLE)
               / (MIN(nc) * (SELECT n FROM tot) * (MIN(m.m) - 1)) AS t
      FROM cumk c JOIN mlv m ON m.level = c.level GROUP BY 1, 2, 3),
    keep AS (
      SELECT geo, segment FROM emdk WHERE lsur >= 2 AND t <= 0.15)
    SELECT CAST(gk.level AS BIGINT) AS level, gk.geo, gk.segment,
           gk.band AS bal_band, CAST(gk.ncb AS BIGINT) AS n
    FROM gk JOIN keep ON gk.geo = keep.geo AND gk.segment = keep.segment
    ORDER BY gk.geo, gk.segment, gk.band
    """,
)
def customers_klt_anonymize_enforced(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from fabric_claims_spark.plans.governance import klt_anonymize

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    _, classes = klt_anonymize(c, n, k=2, l=2, t=0.15)
    return classes.select(
        F.col("level"),
        "geo",
        "segment",
        "bal_band",
        F.col("n").cast("bigint").alias("n"),
    ).orderBy("geo", "segment", "bal_band")
