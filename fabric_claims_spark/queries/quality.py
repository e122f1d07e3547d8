"""Bronze quality-gate operators (SURVEY.md §2.2 P5-P9, §2.7, F6/F7).

The reference's 9-rule DQ engine (NB_BRONZE:137-171) is data-driven:
an array of ``when(condition, reason)`` branches, a higher-order
``exists`` filter, and a ``concat_ws(';')`` reason string. The same
machinery is exercised here on the orders table with rules that
actually fire, plus the 4-way split invariant from SURVEY.md §2.7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fabric_claims_spark.queries import query
from fabric_claims_spark.sources.parquet import load_table

# Data-driven rule list — (reason, condition SQL for the oracle,
# condition Column builder for Spark) kept side by side so the two
# engines can't drift.
_ORDER_RULES: list[tuple[str, str]] = [
    ("nonpositive_amount", "o_totalprice <= 0"),
    ("pre_1996_order", "CAST(o_orderdate AS DATE) < DATE '1996-01-01'"),
    ("low_priority", "o_orderpriority = '5-LOW'"),
    ("invalid_status", "o_orderstatus NOT IN ('F', 'O', 'P')"),
]


def _rule_conditions():
    c = F.col
    return [
        ("nonpositive_amount", c("o_totalprice") <= 0),
        ("pre_1996_order", F.to_date("o_orderdate") < F.lit("1996-01-01").cast("date")),
        ("low_priority", c("o_orderpriority") == "5-LOW"),
        ("invalid_status", ~c("o_orderstatus").isin("F", "O", "P")),
    ]


# --------------------------------------------------------------------------
# P5-P9 + F6/F7 — the DQ reason pipeline: array of conditional reasons
# (NB_BRONZE:152-166), exists() keep-if-any (ibid.:167), concat_ws
# reason string (ibid.:168). All Catalyst expressions, no UDFs.
@query(
    "dq_reasons_orders",
    oracle=f"""
    SELECT o_orderkey,
           concat_ws(';',
             {", ".join(f"CASE WHEN {cond} THEN '{name}' END" for name, cond in _ORDER_RULES)}
           ) AS dq_reasons
    FROM orders
    WHERE {" OR ".join(f"({cond})" for _, cond in _ORDER_RULES)}
    """,
)
def dq_reasons_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    reasons = F.array(
        *[F.when(cond, F.lit(name)) for name, cond in _rule_conditions()]
    )
    return (
        o.withColumn("_reasons", reasons)
        .where(F.exists(F.col("_reasons"), lambda x: x.isNotNull()))
        .select("o_orderkey", F.concat_ws(";", F.col("_reasons")).alias("dq_reasons"))
    )


# --------------------------------------------------------------------------
# §2.7 — the 4-way disjoint split invariant (NB_BRONZE:96-182:
# |raw| = |malformed| + |dupes| + |bad| + |clean|). One pass with a
# precedence-tagged bucket column instead of 4 scans; the reference's
# successive filters become a single case expression (same semantics,
# one shuffle).
@query(
    "quality_split_buckets",
    oracle="""
    WITH tagged AS (
      SELECT CASE
        WHEN o_totalprice <= 0 THEN 'malformed'
        WHEN ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) > 1 THEN 'duplicate'
        WHEN o_orderpriority = '5-LOW' THEN 'bad_quality'
        ELSE 'clean' END AS bucket
      FROM orders)
    SELECT bucket, COUNT(*) AS n FROM tagged GROUP BY bucket
    """,
)
def quality_split_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    bucket = (
        F.when(F.col("o_totalprice") <= 0, "malformed")
        .when(F.row_number().over(w) > 1, "duplicate")
        .when(F.col("o_orderpriority") == "5-LOW", "bad_quality")
        .otherwise("clean")
    )
    return o.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------------------------------
# P5/P6/P7 — predicate families: set membership, regex, range
# (NB_BRONZE:137-161) as one counted pass.
@query(
    "predicate_rule_counts",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT)
        AS valid_status,
      CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
               THEN 1 ELSE 0 END) AS BIGINT) AS priority_format_ok,
      CAST(SUM(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS BIGINT)
        AS high_value,
      CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1996-01-01'
               THEN 1 ELSE 0 END) AS BIGINT) AS pre_1996,
      COUNT(*) AS total
    FROM orders
    """,
)
def predicate_rule_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bsum = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return o.agg(
        bsum(F.col("o_orderstatus").isin("F", "O", "P")).alias("valid_status"),
        bsum(F.col("o_orderpriority").rlike(r"^[1-5]-[A-Z ]+$")).alias("priority_format_ok"),
        bsum(F.col("o_totalprice") > 400000).alias("high_value"),
        bsum(F.to_date("o_orderdate") < F.lit("1996-01-01").cast("date")).alias("pre_1996"),
        F.count(F.lit(1)).alias("total"),
    )


# --------------------------------------------------------------------------
# §2.7 — unionByName reassembly check: disjoint status splits union
# back to the original row count (the reference's split-complement
# invariant as a query).
@query(
    "split_union_reassembly",
    oracle="""
    SELECT COUNT(*) AS reassembled_rows,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys
    FROM (
      SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      UNION ALL SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
      UNION ALL SELECT o_orderkey FROM orders WHERE o_orderstatus NOT IN ('F', 'O'))
    """,
)
def split_union_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    part_f = o.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    part_o = o.where(F.col("o_orderstatus") == "O").select("o_orderkey")
    rest = o.where(~F.col("o_orderstatus").isin("F", "O")).select("o_orderkey")
    return (
        part_f.unionByName(part_o)
        .unionByName(rest)
        .agg(
            F.count(F.lit(1)).alias("reassembled_rows"),
            F.countDistinct("o_orderkey").alias("distinct_keys"),
        )
    )


# --------------------------------------------------------------------------
# Referential-integrity + key-uniqueness audit — the constraint suite
# a warehouse load runs after every batch: orphan foreign keys
# (left_anti counts against the referenced dimension) and duplicate
# primary keys (group-by-key HAVING count > 1). Each check is one
# aggregate; the result is a fixed constraint × violation-count
# ledger, so downstream gates can alert on any non-zero row. At 100
# TB each anti-join is an equi-join Spark plans as broadcast (small
# dim) or shuffle-hash (fact-fact) — never a scan of pairs.
@query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'orders.custkey->customer' AS constraint_name,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
             AS violations
    UNION ALL
    SELECT 'lineitem.orderkey->orders',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem.partkey->part',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem.suppkey->supplier',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'orders.orderkey unique',
           (SELECT COUNT(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY 1 HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'lineitem.(orderkey,linenumber) unique',
           (SELECT COUNT(*) FROM (
              SELECT l_orderkey, l_linenumber FROM lineitem
              GROUP BY 1, 2 HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'documents.doc_id unique',
           (SELECT COUNT(*) FROM (
              SELECT doc_id FROM documents
              GROUP BY 1 HAVING COUNT(*) > 1))
    ORDER BY constraint_name
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fk_orphans(name, fact, fk, dim, pk):
        f = load_table(spark, sf_dir, fact).select(fk)
        d = load_table(spark, sf_dir, dim).select(pk)
        return (
            f.join(d, f[fk] == d[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(F.lit(name).alias("constraint_name"), "violations")
        )

    def pk_dups(name, table, *keys):
        t = load_table(spark, sf_dir, table).select(*keys)
        return (
            t.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(F.lit(name).alias("constraint_name"), "violations")
        )

    checks = [
        fk_orphans(
            "orders.custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey",
        ),
        fk_orphans(
            "lineitem.orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey",
        ),
        fk_orphans(
            "lineitem.partkey->part", "lineitem", "l_partkey",
            "part", "p_partkey",
        ),
        fk_orphans(
            "lineitem.suppkey->supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey",
        ),
        pk_dups("orders.orderkey unique", "orders", "o_orderkey"),
        pk_dups(
            "lineitem.(orderkey,linenumber) unique",
            "lineitem", "l_orderkey", "l_linenumber",
        ),
        pk_dups("documents.doc_id unique", "documents", "doc_id"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("constraint_name")


# --------------------------------------------------------------------------
# Approximate functional-dependency DISCOVERY — the profiling twin of
# the audit above: instead of asserting known constraints, measure how
# strongly each candidate A → B holds via the g3 error (Kivinen &
# Mannila 1995: the minimum fraction of rows to delete so the FD holds
# exactly — N minus the sum over determinant groups of the modal
# dependent count, over N). Emits the full strength spectrum (exact
# FDs, near-FDs worth enforcing, and non-FDs), plus the determinant's
# uniqueness ratio (a key is the g3 = 0, uniqueness = 1 corner).
#
# Scale notes (100 TB): each candidate is two hash aggregates —
# groupBy(det, dep) then groupBy(det) with max — so cost is one
# shuffle pair per candidate over the candidate's two columns only
# (column-pruned scan). The curated candidate list is the production
# shape too: schema-wide pairwise discovery is |cols|² aggregates and
# is run on a sample or over HLL sketches first (extensions/sketches)
# to shortlist, then exactly, like this, on the shortlist.
_FD_CANDIDATES: list[tuple[str, str, str]] = [
    # (table, determinant, dependent) — spans exact / near / non-FDs.
    ("customer", "c_custkey", "c_mktsegment"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("customer", "c_name", "c_nationkey"),
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("part", "p_partkey", "p_type"),
    ("part", "p_brand", "p_type"),
    ("supplier", "s_suppkey", "s_nationkey"),
    ("nation", "n_nationkey", "n_regionkey"),
]


def _fd_candidate_sql(tbl: str, det: str, dep: str) -> str:
    return f"""
    SELECT '{tbl}.{det}->{dep}' AS candidate,
           n_rows, det_groups, n_rows - kept AS g3_violations,
           CAST(n_rows - kept AS DOUBLE) / n_rows AS g3_error,
           CAST(det_groups AS DOUBLE) / n_rows AS det_uniqueness,
           n_rows = kept AS holds_exactly
    FROM (
      SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS det_groups,
             CAST(SUM(mx) AS BIGINT) AS kept
      FROM (
        SELECT {det}, MAX(c) AS mx, SUM(c) AS c
        FROM (SELECT {det}, {dep}, COUNT(*) AS c
              FROM {tbl}
              WHERE {det} IS NOT NULL AND {dep} IS NOT NULL
              GROUP BY 1, 2)
        GROUP BY 1))"""


@query(
    "fd_discovery_profile",
    oracle="\nUNION ALL\n".join(
        _fd_candidate_sql(t, a, b) for t, a, b in _FD_CANDIDATES
    ),
)
def fd_discovery_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    def profile(tbl: str, det: str, dep: str) -> DataFrame:
        t = (
            load_table(spark, sf_dir, tbl)
            .select(det, dep)
            .where(F.col(det).isNotNull() & F.col(dep).isNotNull())
        )
        per_pair = t.groupBy(det, dep).agg(F.count(F.lit(1)).alias("c"))
        per_det = per_pair.groupBy(det).agg(
            F.max("c").alias("mx"), F.sum("c").alias("c")
        )
        agg = per_det.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("det_groups"),
            F.sum("mx").cast("long").alias("kept"),
        )
        return agg.select(
            F.lit(f"{tbl}.{det}->{dep}").alias("candidate"),
            "n_rows",
            "det_groups",
            (F.col("n_rows") - F.col("kept")).alias("g3_violations"),
            (
                (F.col("n_rows") - F.col("kept")).cast("double")
                / F.col("n_rows")
            ).alias("g3_error"),
            (F.col("det_groups").cast("double") / F.col("n_rows")).alias(
                "det_uniqueness"
            ),
            (F.col("n_rows") == F.col("kept")).alias("holds_exactly"),
        )

    frames = [profile(t, a, b) for t, a, b in _FD_CANDIDATES]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# --------------------------------------------------------------------------
# Mutual-information dependence profile — the information-theoretic
# third leg of the dependence suite: FD g3 (above) measures
# functional determination, chi-squared (stats.py) tests
# independence, MI measures the SHARED INFORMATION in nats, directly
# comparable across pairs. For discrete columns:
#
#   MI = H(A) + H(B) − H(A,B)
#      = (N·L(N) − Σ_a c_a·L(c_a) − Σ_b c_b·L(c_b) + Σ_ab c_ab·L(c_ab))
#        / (N·10⁶)
#
# with L(x) = round(ln x, 6)·10⁶ as int64 — the suite's micro-nats
# discipline: every numerator term is exact integer arithmetic and
# each reported quantity pays exactly one IEEE division.
#
# Scale notes: per pair, three hash aggregates over the pair's two
# columns (value-, value-, and pair-cardinality-sized) plus a 1-row
# reduce — column-pruned scans, no joins.
_MI_PAIRS: list[tuple[str, str, str]] = [
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("part", "p_brand", "p_type"),
    ("nation", "n_regionkey", "n_name"),
]

_MICRO_LN = (
    "CAST(ROUND(ROUND(ln(CAST({x} AS DOUBLE)), 6) * 1000000, 0) AS BIGINT)"
)


def _mi_pair_sql(tbl: str, a: str, b: str) -> str:
    ln_n = _MICRO_LN.format(x="n")
    ln_c = _MICRO_LN.format(x="c")
    return f"""
    SELECT '{tbl}.{a}~{b}' AS pair, n AS n_rows,
           CAST(n * {ln_n} - sa AS DOUBLE) / (n * 1000000.0) AS h_a,
           CAST(n * {ln_n} - sb AS DOUBLE) / (n * 1000000.0) AS h_b,
           CAST(n * {ln_n} - sab AS DOUBLE) / (n * 1000000.0) AS h_ab,
           CAST(n * {ln_n} - sa - sb + sab AS DOUBLE)
             / (n * 1000000.0) AS mi_nats
    FROM (
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM {tbl}
         WHERE {a} IS NOT NULL AND {b} IS NOT NULL) AS n,
        (SELECT CAST(SUM(c * {ln_c}) AS BIGINT) FROM (
           SELECT CAST(COUNT(*) AS BIGINT) AS c FROM {tbl}
           WHERE {a} IS NOT NULL AND {b} IS NOT NULL
           GROUP BY {a})) AS sa,
        (SELECT CAST(SUM(c * {ln_c}) AS BIGINT) FROM (
           SELECT CAST(COUNT(*) AS BIGINT) AS c FROM {tbl}
           WHERE {a} IS NOT NULL AND {b} IS NOT NULL
           GROUP BY {b})) AS sb,
        (SELECT CAST(SUM(c * {ln_c}) AS BIGINT) FROM (
           SELECT CAST(COUNT(*) AS BIGINT) AS c FROM {tbl}
           WHERE {a} IS NOT NULL AND {b} IS NOT NULL
           GROUP BY {a}, {b})) AS sab)"""


@query(
    "mi_dependence_profile",
    oracle="\nUNION ALL\n".join(
        _mi_pair_sql(t, a, b) for t, a, b in _MI_PAIRS
    ),
)
def mi_dependence_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    def micro_ln(col: F.Column) -> F.Column:
        return (
            F.round(F.round(F.log(col.cast("double")), 6) * 1_000_000, 0)
        ).cast("long")

    def profile(tbl: str, a: str, b: str) -> DataFrame:
        t = (
            load_table(spark, sf_dir, tbl)
            .select(a, b)
            .where(F.col(a).isNotNull() & F.col(b).isNotNull())
        )

        def sum_c_ln(keys: list[str]) -> DataFrame:
            return (
                t.groupBy(*keys)
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
                .agg(
                    F.sum(F.col("c") * micro_ln(F.col("c")))
                    .cast("long")
                    .alias("s")
                )
            )

        n_df = t.agg(F.count(F.lit(1)).cast("long").alias("n"))
        parts = (
            n_df.crossJoin(sum_c_ln([a]).withColumnRenamed("s", "sa"))
            .crossJoin(sum_c_ln([b]).withColumnRenamed("s", "sb"))
            .crossJoin(sum_c_ln([a, b]).withColumnRenamed("s", "sab"))
        )
        n = F.col("n")
        n_ln_n = n * micro_ln(n)
        denom = n * F.lit(1_000_000.0)
        return parts.select(
            F.lit(f"{tbl}.{a}~{b}").alias("pair"),
            n.alias("n_rows"),
            ((n_ln_n - F.col("sa")).cast("double") / denom).alias("h_a"),
            ((n_ln_n - F.col("sb")).cast("double") / denom).alias("h_b"),
            ((n_ln_n - F.col("sab")).cast("double") / denom).alias("h_ab"),
            (
                (n_ln_n - F.col("sa") - F.col("sb") + F.col("sab")).cast(
                    "double"
                )
                / denom
            ).alias("mi_nats"),
        )

    frames = [profile(t, a, b) for t, a, b in _MI_PAIRS]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
