"""Decision-support join/decorrelation shapes (the rest of the TPC-H
pattern family) over the test tables.

The reference's relational surface (warehouse T-SQL views + DAX
measures, e.g. WH/Reporting/ClaimsSummary.sql:1-40) stops at
star-join aggregates; round 5 already covers the Q1/Q3/Q5/Q6 shapes
(queries/relational.py). This module adds the remaining *plan
patterns* a decision-support engine must execute well at 100 TB —
each query here exists to pin one optimizer/execution shape:

* Q4  — EXISTS decorrelated to a left-semi fact join
* Q7  — one dimension playing two roles (aliased twice) with a
        disjunctive pair predicate
* Q8  — market-share conditional ratio over a multi-join
* Q10 — agg-then-top-k with dim enrichment (TakeOrderedAndProject)
* Q13 — outer join preserving zero-match rows + two-level aggregate
* Q14 — conditional revenue share via a broadcast dim attribute
* Q16 — NOT IN decorrelated to a broadcast anti-join + count distinct
* Q17 — correlated scalar aggregate decorrelated to a self-agg join
* Q18 — HAVING on a fact aggregate, then join-back enrichment
* Q19 — OR-of-conjunctions (disjunctive pushdown across a join)
* Q21 — double correlated EXISTS / NOT EXISTS collapsed into ONE
        grouped pass (no fact self-joins)
* Q22 — per-group scalar subquery + anti-join on a date-windowed fact

Determinism follows queries/__init__: exact decimal money math,
integer quantity math (quantities are whole numbers stored as
double), single final double divisions, identical aliases both sides.

Broadcast-hint policy (the round-4 lesson, applied): explicit
F.broadcast appears ONLY on frames bounded by a domain, not by the
scale factor — nation (25 rows), the 5-row segment averages, 1-row
scalars. customer/supplier/part and every filtered or aggregated
slice of a fact are SF-proportional, so their join strategy is left
to the planner/AQE, which sees their real (file or runtime) sizes;
at 100 TB a forced broadcast of any of them is an OOM, while at test
scale the planner broadcasts them anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fabric_claims_spark.queries import query
from fabric_claims_spark.queries._util import dsum, money, rate
from fabric_claims_spark.sources.parquet import load_table


def _revenue() -> F.Column:
    return money("l_extendedprice") * (
        F.lit(1).cast("decimal(2,0)") - rate("l_discount")
    )


# --------------------------------------------------------------------------
# Q4 shape — EXISTS → left-semi. The correlated `EXISTS (SELECT 1
# FROM lineitem WHERE l_orderkey = o_orderkey AND ...)` decorrelates
# to a semi-join against the filtered, key-projected fact: the probe
# side never duplicates order rows (semi, not inner+distinct), the
# returnflag filter pushes into the lineitem scan, and both sides
# shuffle only the join key. At 100 TB the semi-join build side is
# the *filtered* returned-lines key set, not raw lineitem.
@query(
    "priority_returned_orders",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY 1 ORDER BY 1
    """,
)
def priority_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.to_date("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q7 shape — one dimension, two roles. `nation` joins once through
# the supplier path and once through the customer path (aliased
# frames), with the disjunctive (A,B)|(B,A) pair predicate applied
# AFTER both nationkeys are threaded through the fact joins. Both
# nation sides broadcast (25 rows); the only shuffles are the two
# fact joins on their natural keys. Ship-year comes from the fact, so
# the group-by is (supp_nation, cust_nation, year).
@query(
    "nation_pair_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS ship_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 4)
                AS DOUBLE) AS volume
    FROM supplier s
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nat.alias("n1")
    n2 = nat.alias("n2")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp_nation = F.col("n1.n_name")
    cust_nation = F.col("n2.n_name")
    return (
        li.join(
            s.join(F.broadcast(n1), s["s_nationkey"] == F.col("n1.n_nationkey")),
            li["l_suppkey"] == s["s_suppkey"],
        )
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(
            c.join(F.broadcast(n2), c["c_nationkey"] == F.col("n2.n_nationkey")),
            c["c_custkey"] == o["o_custkey"],
        )
        .where(
            ((supp_nation == "NATION_3") & (cust_nation == "NATION_7"))
            | ((supp_nation == "NATION_7") & (cust_nation == "NATION_3"))
        )
        .groupBy(
            supp_nation.alias("supp_nation"),
            cust_nation.alias("cust_nation"),
            F.year(F.to_date("l_shipdate")).cast("bigint").alias("ship_year"),
        )
        .agg(dsum(_revenue()).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# --------------------------------------------------------------------------
# Q8 shape — market share as a conditional ratio: within PROMO-type
# parts, Brand#11's share of yearly revenue. Numerator and
# denominator are exact decimal sums over the SAME joined frame
# (one aggregate pass, two conditional sums), surfaced as doubles and
# divided once — never two separate scans reconciled by a join.
@query(
    "brand_market_share",
    oracle="""
    SELECT EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS order_year,
           CAST(ROUND(SUM(CASE WHEN p.p_brand = 'Brand#11'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(6,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE)
             AS brand_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type LIKE 'PROMO%'
    GROUP BY 1 ORDER BY 1
    """,
)
def brand_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type").startswith("PROMO"))
        .select("p_partkey", "p_brand")
    )
    rev = _revenue()
    brand_rev = F.when(F.col("p_brand") == "Brand#11", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.year(F.to_date("o_orderdate")).cast("bigint").alias("order_year")
        )
        .agg(
            (
                # both sums round to scale 4 before the double cast
                # (dsum's rule): DuckDB's decimal->double cast is not
                # correctly rounded past 2^53, so an unrounded
                # denominator is latent hash drift at larger data
                F.round(F.sum(brand_rev), 4).cast("double")
                / F.round(F.sum(rev), 4).cast("double")
            ).alias("brand_share")
        )
        .orderBy("order_year")
    )


# --------------------------------------------------------------------------
# Q10 shape — returned-revenue top customers: aggregate the returned
# lines of one quarter per customer, enrich with the (broadcast)
# nation, and take the top 20 — which compiles to
# TakeOrderedAndProject (per-partition heap + driver merge of 20-row
# heads), NOT a global sort. The quarter predicate pushes into the
# orders scan and the returnflag into the lineitem scan.
@query(
    "returned_revenue_top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 4)
                AS DOUBLE) AS returned_revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-04-01'
    GROUP BY 1, 2, 3
    ORDER BY returned_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_revenue_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.to_date("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("o_orderdate") < F.lit("1997-04-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum(_revenue()).alias("returned_revenue"))
        .orderBy(F.desc("returned_revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13 shape with the join-condition filter — the unfiltered
# count-of-counts lives in stats.customer_order_count_distribution;
# THIS variant pins the part that trips planners: the exclusion
# predicate (o_orderpriority <> '5-LOW') must live in the JOIN
# CONDITION, not the WHERE clause. In the join condition it filters
# which orders count while the left outer join still preserves every
# customer (zero bucket included); hoisted to WHERE it would turn the
# outer join into an inner one and silently drop the zero bucket.
@query(
    "order_count_distribution_ex_low",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def order_count_distribution_ex_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "5-LOW")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q14 shape — promo revenue share per month: the part-type attribute
# arrives via an equi-join (planner-sized — part is SF-proportional)
# and the share is two conditional decimal sums in ONE aggregate
# pass, divided once as doubles.
@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(date_trunc('month', CAST(l.l_shipdate AS DATE)) AS DATE) AS ship_month,
           CAST(ROUND(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(6,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE)
             AS promo_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue()
    promo_rev = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.date_trunc("month", F.to_date("l_shipdate"))
            .cast("date")
            .alias("ship_month")
        )
        .agg(
            (
                # denominator rounds to scale 4 pre-cast too (dsum's
                # rule) — see brand_market_share
                F.round(F.sum(promo_rev), 4).cast("double")
                / F.round(F.sum(rev), 4).cast("double")
            ).alias("promo_share")
        )
        .orderBy("ship_month")
    )


# --------------------------------------------------------------------------
# Q16 shape — supplier diversity per part attribute, with a NOT IN
# exclusion: the `l_suppkey NOT IN (subquery)` decorrelates to a
# left-anti join against the (typically tiny) deficit-supplier list,
# the (partkey, suppkey) pairs distinct-project BEFORE the part
# join, and COUNT(DISTINCT) runs per (brand, size) group. Join
# strategies are the planner's: both the exclusion list and the
# filtered part slice are SF-proportional, so no forced broadcast —
# the planner picks broadcast from their real sizes. No fact
# self-join anywhere.
@query(
    "part_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select("p_partkey", "p_brand", "p_size")
    )
    return (
        pairs.join(
            bad_supp,
            pairs["l_suppkey"] == bad_supp["s_suppkey"],
            "left_anti",
        )
        .join(p, pairs["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 shape — correlated scalar aggregate, decorrelated: "lines whose
# quantity is under 20% of their part's average quantity" becomes a
# per-part aggregate joined back to the fact. The comparison is kept
# in INTEGER space (qty*5*cnt < sum_qty — quantities are whole
# numbers) so no float threshold can diverge across engines. The
# per-part aggregate is |part|-sized and joins on the same key the
# fact already groups by; AQE picks broadcast when the brand filter
# makes it tiny.
@query(
    "small_quantity_order_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             COUNT(*) AS cnt,
             SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 4)
                AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(l.l_quantity AS BIGINT) * 5 * pq.cnt < pq.sum_qty
    """,
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(pq, li["l_partkey"] == pq["pq_partkey"])
        .where(
            F.col("l_quantity").cast("bigint") * 5 * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            (F.round(F.sum(money("l_extendedprice")), 4).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q18 shape — HAVING on a fact aggregate, then enrichment join-back:
# the big-order keys come out of ONE grouped pass over lineitem
# (integer-exact quantity sums), and only those ~dozens of keys join
# back to orders/customer — AQE broadcasts the qualified-key side
# from its measured runtime size; lineitem is never re-scanned.
@query(
    "large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           big.total_qty
    FROM (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
    ) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY big.total_qty DESC, o.o_orderkey
    LIMIT 100
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 shape — disjunctive pushdown: an OR of three (brand, quantity
# band, size band) conjunctions across a lineitem⨝part join. The
# partkey equality is the single join key; the disjunction stays a
# post-join filter on broadcast-joined attributes, and the common
# bounds (quantity <= 30, size >= 1) are factored so the scans still
# prune. One exact-decimal sum out.
@query(
    "disjunctive_promo_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 4)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)
def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11) & sz.between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20) & sz.between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .where(cond)
        .agg(dsum(_revenue()).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q21 shape — the classic formulation is a double correlated
# EXISTS(another supplier's line) AND NOT EXISTS(...) — i.e. TWO
# lineitem self-joins. Here both existentials collapse into ONE
# grouped pass: per order, count lines, count distinct suppliers, and
# flag returns; orders with >1 line, exactly 1 supplier, and a
# returned line indict that sole supplier. At 100 TB this replaces
# two fact⨝fact shuffles with a single keyed aggregate.
@query(
    "sole_supplier_return_orders",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM (
      SELECT l_orderkey, MIN(l_suppkey) AS the_supp
      FROM lineitem
      GROUP BY l_orderkey
      HAVING COUNT(DISTINCT l_suppkey) = 1
         AND COUNT(*) > 1
         AND SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
    ) j
    JOIN supplier s ON s.s_suppkey = j.the_supp
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    """,
)
def sole_supplier_return_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("the_supp"),
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_returned"),
        )
        .where(
            (F.col("n_supp") == 1)
            & (F.col("n_lines") > 1)
            & (F.col("n_returned") > 0)
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(s, per_order["the_supp"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# --------------------------------------------------------------------------
# Q22 shape — per-group scalar subquery + windowed anti-join:
# "above-average-balance customers (vs their segment's positive-
# balance average) with no orders since 2000". The scalar subquery
# decorrelates to a 5-row segment-average frame (broadcast); the NOT
# EXISTS decorrelates to a left-anti join against the date-filtered,
# key-projected orders. The average is computed exactly once as
# decimal-sum→double/count, so the `>` comparison is bit-identical
# across engines.
@query(
    "idle_high_balance_customers",
    oracle="""
    WITH seg_avg AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0 GROUP BY 1
    )
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE)
             AS total_acctbal
    FROM customer c
    JOIN seg_avg a ON c.c_mktsegment = a.c_mktsegment
    WHERE CAST(c.c_acctbal AS DOUBLE) > a.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
    GROUP BY 1 ORDER BY 1
    """,
)
def idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    seg_avg = (
        c.where(F.col("c_acctbal") > 0)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1)))
            .alias("avg_bal")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.to_date("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(seg_avg), c["c_mktsegment"] == seg_avg["seg"])
        .where(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(money("c_acctbal")), 4)
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Set operations — INTERSECT / EXCEPT over the yearly active-customer
# sets. Spark compiles .intersect to a distinct left-semi join and
# .subtract to a distinct left-anti join, so both inherit the
# equi-join scale path (shuffle on the key, AQE-broadcast when one
# year is small) — no sort-based set algebra, no driver collection.
# The three one-row aggregates union into a tagged summary frame.
@query(
    "customer_retention_setops",
    oracle="""
    WITH y97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE EXTRACT(year FROM o_orderdate) = 1997),
         y98 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE EXTRACT(year FROM o_orderdate) = 1998)
    SELECT 'both_years' AS op, COUNT(*) AS n
    FROM (SELECT o_custkey FROM y97 INTERSECT SELECT o_custkey FROM y98)
    UNION ALL
    SELECT 'only_1997' AS op, COUNT(*) AS n
    FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y98)
    UNION ALL
    SELECT 'only_1998' AS op, COUNT(*) AS n
    FROM (SELECT o_custkey FROM y98 EXCEPT SELECT o_custkey FROM y97)
    ORDER BY op
    """,
)
def customer_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year(F.to_date("o_orderdate")).alias("yr")
    )
    y97 = o.where(F.col("yr") == 1997).select("o_custkey").distinct()
    y98 = o.where(F.col("yr") == 1998).select("o_custkey").distinct()

    def tagged(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        tagged(y97.intersect(y98), "both_years")
        .unionByName(tagged(y97.subtract(y98), "only_1997"))
        .unionByName(tagged(y98.subtract(y97), "only_1998"))
        .orderBy("op")
    )


# --------------------------------------------------------------------------
# Q2 shape — correlated MIN decorrelated to an argmin join-back: the
# cheapest line per Brand#33 part, with the supplier(s) offering it.
# The per-part MIN is one grouped pass; the join-back recovers the
# argmin rows by exact decimal equality (never a float ratio — the
# reference pattern `price = (SELECT MIN(price) ... WHERE partkey =
# outer.partkey)` keeps its tie semantics: every supplier at the min
# survives). The brand filter broadcasts into both passes, so the
# grouped pass runs over the filtered fact only.
@query(
    "cheapest_line_per_part",
    oracle="""
    WITH bl AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(l.l_extendedprice AS DECIMAL(18,4)) AS price
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#33'),
    mn AS (SELECT l_partkey, MIN(price) AS min_price
           FROM bl GROUP BY 1)
    SELECT b.l_partkey, s.s_name,
           CAST(b.price AS DOUBLE) AS min_price
    FROM bl b
    JOIN mn m ON m.l_partkey = b.l_partkey AND b.price = m.min_price
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    ORDER BY b.l_partkey, s.s_name
    """,
)
def cheapest_line_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#33")
        .select("p_partkey")
    )
    bl = (
        load_table(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", money("l_extendedprice").alias("price"))
    )
    mn = bl.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("price").alias("min_price")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        bl.join(
            mn,
            (bl["l_partkey"] == mn["mk"]) & (bl["price"] == mn["min_price"]),
        )
        .join(s, bl["l_suppkey"] == s["s_suppkey"])
        .select(
            "l_partkey", "s_name", F.col("price").cast("double").alias("min_price")
        )
        .orderBy("l_partkey", "s_name")
    )


# --------------------------------------------------------------------------
# Q11 shape — HAVING against a global scalar: supplier nations whose
# shipped value exceeds 4% of the corpus total. The scalar subquery
# decorrelates to a 1-row aggregate OVER THE SAME grouped frame
# (computed once, broadcast as a literal-sized cross join), and the
# comparison runs in EXACT decimal space on both sides — no float
# threshold to drift between engines.
@query(
    "nation_value_concentration",
    oracle="""
    WITH nv AS (
      SELECT n.n_name AS nation,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1)
    SELECT nation, CAST(ROUND(v, 4) AS DOUBLE) AS value
    FROM nv
    WHERE v > (SELECT SUM(v) * CAST(0.04 AS DECIMAL(3,2)) FROM nv)
    ORDER BY value DESC, nation
    """,
)
def nation_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nv = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(money("l_extendedprice")).alias("v"))
    )
    total = nv.agg(
        (F.sum("v") * F.lit(0.04).cast("decimal(3,2)")).alias("thresh")
    )
    return (
        nv.join(F.broadcast(total))
        .where(F.col("v") > F.col("thresh"))
        .select("nation", F.round("v", 4).cast("double").alias("value"))
        .orderBy(F.desc("value"), "nation")
    )


# --------------------------------------------------------------------------
# Q15 shape — max-of-aggregate with tie preservation: the top
# supplier(s) by quarterly revenue. The classic view + `total_revenue
# = (SELECT MAX(total_revenue) FROM view)` pattern: the per-supplier
# aggregate computes once, its 1-row MAX joins back by equality, and
# EVERY supplier at the max survives (a LIMIT 1 would silently break
# ties). Revenue is the exact-decimal sum rounded to scale 4 before
# the double cast, so the equality is bit-exact in both engines.
@query(
    "top_supplier_by_revenue",
    oracle="""
    WITH sr AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (1 - CAST(l_discount AS DECIMAL(6,4)))), 4)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, sr.total_revenue
    FROM sr
    JOIN supplier s ON s.s_suppkey = sr.l_suppkey
    WHERE sr.total_revenue = (SELECT MAX(total_revenue) FROM sr)
    ORDER BY s.s_suppkey
    """,
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    sr = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(_revenue()).alias("total_revenue"))
    )
    mx = sr.agg(F.max("total_revenue").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sr.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(s, sr["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Relational division — "customers who ordered in EVERY priority
# class": division-by-counting (one grouped pass; COUNT(DISTINCT
# attr) == |divisor domain|) instead of the textbook double-NOT-
# EXISTS, which would be two correlated anti-joins against the fact.
# The divisor cardinality is computed from the data (a 1-row
# broadcast), not hard-coded, so the query survives domain drift.
@query(
    "customers_all_priorities",
    oracle="""
    WITH dom AS (SELECT COUNT(DISTINCT o_orderpriority) AS n_prio
                 FROM orders)
    SELECT o.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    GROUP BY o.o_custkey
    HAVING COUNT(DISTINCT o.o_orderpriority) = (SELECT n_prio FROM dom)
    ORDER BY o.o_custkey
    """,
)
def customers_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    dom = o.agg(F.count_distinct("o_orderpriority").alias("n_prio"))
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("o_orderpriority").alias("n_prio_seen"),
    )
    return (
        per_cust.join(F.broadcast(dom))
        .where(F.col("n_prio_seen") == F.col("n_prio"))
        .select("o_custkey", "n_orders")
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Distribution ranking — cume_dist over the per-supplier revenue
# aggregate, partitioned by nation: the window runs on the
# |supplier|-sized rollup (dimension-bounded), never raw lineitems,
# and the nation partition keeps each frame at suppliers-per-nation.
# Revenue is the exact-decimal sum; cume_dist itself is a pure rank
# ratio (rows_le / rows), deterministic under ties in both engines.
@query(
    "supplier_revenue_cumedist",
    oracle="""
    WITH sr AS (
      SELECT s.s_nationkey, s.s_name,
             CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                            * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 4)
                  AS DOUBLE) AS revenue
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2)
    SELECT n.n_name AS nation, sr.s_name, sr.revenue,
           CUME_DIST() OVER (PARTITION BY sr.s_nationkey
                             ORDER BY sr.revenue) AS rev_cumedist
    FROM sr JOIN nation n ON n.n_nationkey = sr.s_nationkey
    ORDER BY nation, revenue, s_name
    """,
)
def supplier_revenue_cumedist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_name"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sr = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "s_name")
        .agg(dsum(_revenue()).alias("revenue"))
    )
    w = Window.partitionBy("s_nationkey").orderBy("revenue")
    return (
        sr.withColumn("rev_cumedist", F.cume_dist().over(w))
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "s_name",
            "revenue",
            "rev_cumedist",
        )
        .orderBy("nation", "revenue", "s_name")
    )


# --------------------------------------------------------------------------
# NOT IN null semantics — the correctness corner that silently drops
# every row: `x NOT IN (subquery)` is three-valued, so ONE NULL in
# the subquery output makes the whole predicate unknown for every
# non-matching row. Both counts run side by side: the null-poisoned
# subquery (NULLIF injects the NULL) and the sanitized one. Spark
# plans the former as a null-aware anti join — which is
# BROADCAST-ONLY for the subquery side, the scale reason production
# filters should write NOT EXISTS (a plain shuffleable anti-join,
# see customers_without_urgent_orders) unless they truly want
# three-valued semantics.
@query(
    "not_in_null_semantics",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM customer c
       WHERE c.c_custkey NOT IN
         (SELECT NULLIF(o_custkey, 7) FROM orders
          WHERE o_orderpriority = '1-URGENT')) AS with_null_cnt,
      (SELECT COUNT(*) FROM customer c
       WHERE c.c_custkey NOT IN
         (SELECT NULLIF(o_custkey, 7) FROM orders
          WHERE o_orderpriority = '1-URGENT'
            AND NULLIF(o_custkey, 7) IS NOT NULL)) AS without_null_cnt
    """,
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Direct-path table refs (parquet.`path`) rather than temp views:
    # registry queries must be side-effect-free on the shared session
    # (fixed global view names could collide across concurrent or
    # repeated invocations). The NOT IN stays in SQL form because the
    # point is how Spark PLANS it (null-aware anti join).
    import os

    cpath = os.path.join(sf_dir, "customer.parquet")
    opath = os.path.join(sf_dir, "orders.parquet")
    return spark.sql(
        f"""
        SELECT
          (SELECT COUNT(*) FROM parquet.`{cpath}` c
           WHERE c.c_custkey NOT IN
             (SELECT NULLIF(o_custkey, 7) FROM parquet.`{opath}`
              WHERE o_orderpriority = '1-URGENT')) AS with_null_cnt,
          (SELECT COUNT(*) FROM parquet.`{cpath}` c
           WHERE c.c_custkey NOT IN
             (SELECT NULLIF(o_custkey, 7) FROM parquet.`{opath}`
              WHERE o_orderpriority = '1-URGENT'
                AND NULLIF(o_custkey, 7) IS NOT NULL)) AS without_null_cnt
        """
    )


# --------------------------------------------------------------------------
# 2-D skyline (Pareto-dominance) — the multi-criteria shortlist
# operator (Börzsönyi et al., ICDE 2001): parts not dominated on
# (minimize retail price, maximize size). The naive plan is an O(n²)
# dominance theta-join; for two dimensions the skyline is computable
# in one sort-free pass over PRICE LEVELS: a part survives iff no
# strictly-cheaper level reaches its size (running max over levels)
# and nothing at its own price level strictly exceeds its size.
# Parts tied on both dimensions co-survive (neither dominates).
#
# Scale notes (100 TB): one fact scan + a price-level aggregate
# (|distinct prices|-sized), a single ordered window over the LEVEL
# table (not the fact), and a broadcast join back — no pair space
# ever materializes. Higher dimensions decompose into this shape per
# 2-D slice or fall back to block-nested-loop with pruning; the gate
# pins the 2-D sort-based shape.
@query(
    "parts_price_size_skyline",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_brand,
             CAST(p_retailprice AS DECIMAL(18,4)) AS price,
             CAST(p_size AS BIGINT) AS size
      FROM part),
    lvl AS (
      SELECT price, MAX(size) AS lmax FROM p GROUP BY price),
    lvl2 AS (
      SELECT price, lmax,
             MAX(lmax) OVER (ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM lvl)
    SELECT p.p_partkey, p.p_brand,
           CAST(p.price AS DOUBLE) AS price, p.size
    FROM p JOIN lvl2 l ON l.price = p.price
    WHERE (l.prev_max IS NULL OR l.prev_max < p.size)
      AND p.size = l.lmax
    """,
)
def parts_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        money("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )
    lvl = p.groupBy("price").agg(F.max("size").alias("lmax"))
    w = Window.orderBy("price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    lvl2 = lvl.select(
        "price", "lmax", F.max("lmax").over(w).alias("prev_max")
    )
    return (
        p.join(lvl2, "price")
        .where(
            (F.col("prev_max").isNull() | (F.col("prev_max") < F.col("size")))
            & (F.col("size") == F.col("lmax"))
        )
        .select(
            "p_partkey",
            "p_brand",
            F.col("price").cast("double").alias("price"),
            "size",
        )
    )
