"""Distribution / co-occurrence / sampling analytics: Pareto revenue
concentration, market-basket brand pairs, deterministic stratified
sampling, corpus mixture weights, n-gram document frequency, and
histogram-CDF deciles.

The reference (lkv971/fabric-claims) stops at per-status KPI measures;
these are the next analytics shapes a warehouse user reaches for, and
the sampling/mixture/n-gram trio is core LLM-corpus tooling. All six
follow the cross-engine determinism rules from ``queries/__init__``
(exact decimal sums, single IEEE divisions rounded to 6 dp, md5-folded
hashes).

Scale notes (100 TB): the only per-row work is scans, hash aggregates,
and bounded-array explodes. Every window in this module runs over an
already-aggregated frame whose size is bounded by a *domain* (revenue
bands, distinct document lengths), never by row count; top-k is
TakeOrderedAndProject; the basket self-join is co-partitioned on the
order key with per-order pair fan-out bounded by lines-per-order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fabric_claims_spark.caching import tracked_cache
from fabric_claims_spark.extensions.graph import pagerank
from fabric_claims_spark.localframe import local_frame
from fabric_claims_spark.queries import query
from fabric_claims_spark.queries._util import MONEY, money
from fabric_claims_spark.sources.parquet import load_table

# Band width for the Pareto rollup: wide enough that the band domain
# stays small (dozens) at any scale factor.
_BAND = 250_000


# --------------------------------------------------------------------------
# Pareto revenue concentration — WITHOUT a global per-customer rank.
# The classic formulation (rank all customers by revenue, running
# share) needs an unpartitioned window over every customer: a
# single-reducer sort that dies at 100 TB. Instead, roll customers up
# into fixed-width revenue bands (bounded domain) and take the running
# share over bands, top band first: two hash aggregates + a window
# over a few dozen rows.
@query(
    "customers_pareto_bands",
    oracle=f"""
    WITH r AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders GROUP BY 1),
    b AS (
      SELECT CAST(FLOOR(CAST(ROUND(rev, 4) AS DOUBLE) / {_BAND}) AS BIGINT)
               AS revenue_band,
             COUNT(*) AS customers,
             SUM(rev) AS brev
      FROM r GROUP BY 1)
    SELECT revenue_band,
           customers,
           CAST(ROUND(brev, 4) AS DOUBLE) AS band_revenue,
           ROUND(CAST(ROUND(SUM(brev) OVER (ORDER BY revenue_band DESC), 4)
                      AS DOUBLE)
                 / CAST(ROUND(SUM(brev) OVER (), 4) AS DOUBLE), 6)
             AS cum_revenue_share
    FROM b
    """,
)
def customers_pareto_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(money("o_totalprice")).alias("rev"))
    )
    bands = rev.groupBy(
        F.floor(F.round(F.col("rev"), 4).cast("double") / _BAND)
        .cast("long")
        .alias("revenue_band")
    ).agg(
        F.count(F.lit(1)).alias("customers"),
        F.sum("rev").alias("brev"),
    )
    # windows over the band domain: bounded rows, safe unpartitioned
    cum = Window.orderBy(F.col("revenue_band").desc())
    return bands.select(
        "revenue_band",
        "customers",
        F.round(F.col("brev"), 4).cast("double").alias("band_revenue"),
        F.round(
            F.round(F.sum("brev").over(cum), 4).cast("double")
            / F.round(F.sum("brev").over(Window.partitionBy()), 4).cast(
                "double"
            ),
            6,
        ).alias("cum_revenue_share"),
    )


# --------------------------------------------------------------------------
# Market-basket analysis — which part brands co-occur in an order, with
# lift against independence. No self-join: one groupBy(order) builds
# the sorted distinct-brand set (bounded by lines-per-order), and the
# pair list is generated in-expression from that array — C(brands, 2)
# ≤ C(lines, 2) structs per order, whole-stage codegen. One shuffle on
# the order key total; the brand domain is bounded, so the pair
# aggregate and the two brand-count joins are broadcast-sized. (The
# oracle states the same semantics as the classic self-join.)
@query(
    "basket_brand_pairs",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob),
    bc AS (SELECT brand, COUNT(*) AS brand_orders FROM ob GROUP BY 1),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             COUNT(*) AS pair_orders
      FROM ob a JOIN ob b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3)
    SELECT p.brand_a, p.brand_b, p.pair_orders,
           ROUND((CAST(p.pair_orders AS DOUBLE) / ca.brand_orders)
                 * (CAST(n.n_orders AS DOUBLE) / cb.brand_orders), 6)
             AS lift
    FROM pairs p
    JOIN bc ca ON p.brand_a = ca.brand
    JOIN bc cb ON p.brand_b = cb.brand
    CROSS JOIN n
    """,
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # one shuffle: distinct brands per order as a sorted array
    # (tracked cache: three consumers — totals, brand counts, pair
    # counts; bench.py clears between queries, library callers
    # release via caching.scoped_caches())
    baskets = tracked_cache(
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("bs"))
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    bc = baskets.select(F.explode("bs").alias("brand")).groupBy("brand").agg(
        F.count(F.lit(1)).alias("brand_orders")
    )
    # ordered pairs from the sorted array: (bs[i], bs[j]) for i < j
    combos = F.flatten(
        F.transform(
            F.col("bs"),
            lambda x, i: F.transform(
                F.slice(F.col("bs"), i + 2, F.size("bs")),
                lambda y: F.struct(
                    x.alias("brand_a"), y.alias("brand_b")
                ),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .where(F.col("pair_orders") >= 3)
    )
    ca = F.broadcast(bc.select(F.col("brand"), F.col("brand_orders").alias("a_orders")))
    cb = F.broadcast(bc.select(F.col("brand"), F.col("brand_orders").alias("b_orders")))
    return (
        pairs.join(ca, pairs.brand_a == ca.brand)
        .drop("brand")
        .join(cb, pairs.brand_b == cb.brand)
        .drop("brand")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.round(
                (F.col("pair_orders").cast("double") / F.col("a_orders"))
                * (F.col("n_orders").cast("double") / F.col("b_orders")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling — per-language rates applied via an
# md5-folded uniform on the key, so the sample is reproducible,
# cross-engine identical, and needs no RNG state: one stateless filter,
# no shuffle at all (the classic Bernoulli-per-stratum design, with the
# hash as the uniform). Downsamples the over-represented 'en' stratum.
_RATES_BP = {"en": 2500}  # basis points of 10000; others keep 7500
_DEFAULT_BP = 7500


@query(
    "docs_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 10000 AS u_bp
      FROM documents)
    WHERE u_bp < CASE WHEN lang = 'en' THEN {_RATES_BP["en"]}
                      ELSE {_DEFAULT_BP} END
    """,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u_bp = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 10000
    )
    rate = F.when(F.col("lang") == "en", F.lit(_RATES_BP["en"])).otherwise(
        F.lit(_DEFAULT_BP)
    )
    return d.where(u_bp < rate).select("doc_id", "lang", "source")


# --------------------------------------------------------------------------
# Corpus mixture weights — the per-source resampling weight that moves
# the token mixture to uniform across sources (the standard knob in
# pretraining-data recipes). One hash aggregate over a bounded source
# domain; the totals row broadcasts back.
@query(
    "docs_mixture_weights",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS docs,
             CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
                  AS BIGINT) AS tokens
      FROM documents GROUP BY 1),
    t AS (SELECT COUNT(*) AS n_sources, SUM(tokens) AS total_tokens FROM s)
    SELECT s.source, s.docs, s.tokens,
           ROUND(CAST(s.tokens AS DOUBLE) / t.total_tokens, 6)
             AS token_share,
           ROUND(CAST(t.total_tokens AS DOUBLE)
                 / (t.n_sources * s.tokens), 6) AS uniform_weight
    FROM s CROSS JOIN t
    """,
)
def docs_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    tok = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"), F.sum(tok).alias("tokens")
    )
    totals = s.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("tokens").alias("total_tokens"),
    )
    return s.crossJoin(F.broadcast(totals)).select(
        "source",
        "docs",
        "tokens",
        F.round(
            F.col("tokens").cast("double") / F.col("total_tokens"), 6
        ).alias("token_share"),
        F.round(
            F.col("total_tokens").cast("double")
            / (F.col("n_sources") * F.col("tokens")),
            6,
        ).alias("uniform_weight"),
    )


# --------------------------------------------------------------------------
# Bigram document frequency, top-k — per-document *distinct* bigrams
# (document frequency, not term frequency), exploded and hash-counted;
# the top-k is ORDER BY + LIMIT, which Spark plans as
# TakeOrderedAndProject (per-partition heap + driver merge of k rows —
# no global sort). Ties broken by the bigram string for determinism.
@query(
    "docs_bigram_topk",
    oracle="""
    WITH bg AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(generate_series(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i + 1]))) AS bigram
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
            WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 2))
    SELECT bigram, COUNT(*) AS doc_freq
    FROM bg GROUP BY 1
    ORDER BY doc_freq DESC, bigram
    LIMIT 20
    """,
)
def docs_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", toks.alias("t")).where(F.size("t") >= 2)
    bigrams = F.array_distinct(
        F.zip_with(
            F.slice(F.col("t"), 1, F.size("t") - 1),
            F.slice(F.col("t"), 2, F.size("t") - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )
    return (
        base.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("bigram"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Exact global deciles WITHOUT a global sort — the histogram-CDF trick:
# aggregate counts by value (the distinct-length domain is bounded, a
# few thousand rows regardless of corpus size), cumulate over that tiny
# frame, and place each decile target ``ceil(q*n/10)`` into the CDF
# with a bounded range join. Contrast with Spark's percentile()
# aggregate, which buffers every value. Discrete (type-7-free)
# percentile_disc semantics, integer-exact in both engines.
@query(
    "docs_length_deciles",
    oracle="""
    WITH h AS (
      SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY 1),
    c AS (
      SELECT n_chars,
             SUM(cnt) OVER (ORDER BY n_chars) AS cum,
             SUM(cnt) OVER (ORDER BY n_chars) - cnt AS prev_cum
      FROM h),
    t AS (SELECT SUM(cnt) AS n FROM h),
    d AS (SELECT unnest(generate_series(1, 9)) AS decile)
    SELECT d.decile, c.n_chars AS value
    FROM d CROSS JOIN t
    JOIN c ON c.prev_cum < (d.decile * t.n + 9) // 10
          AND (d.decile * t.n + 9) // 10 <= c.cum
    """,
)
def docs_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (
        load_table(spark, sf_dir, "documents")
        .groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # cumulative over the bounded value domain (distinct lengths)
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.select(
        "n_chars",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("prev_cum"),
    )
    t = h.agg(F.sum("cnt").alias("n"))
    d = load_table(spark, sf_dir, "documents").sparkSession.range(
        1, 10
    ).select(F.col("id").alias("decile"))
    target = F.expr("(decile * n + 9) div 10")
    return (
        d.crossJoin(F.broadcast(t))
        .join(
            c,
            (F.col("prev_cum") < target) & (target <= F.col("cum")),
        )
        .select("decile", F.col("n_chars").alias("value"))
    )


# --------------------------------------------------------------------------
# Skew-safe deterministic per-group sampling — top-k per language by an
# md5-folded uniform. A naive row_number() over PARTITION BY lang puts
# an entire language (at 100 TB: most of the corpus) in one window
# partition; instead rank within (lang, salt) first — 64-way salted,
# each partition 1/64th of the stratum — then re-rank the 64·k
# survivors, a bounded frame. The oracle states the unsalted
# semantics; salting is a pure execution-strategy rewrite (phase-1
# survivors are a superset of the global per-language top-k).
_SAMPLE_K = 10
_SAMPLE_SALTS = 64


@query(
    "docs_sample_per_lang",
    oracle=f"""
    SELECT lang, sample_rank, doc_id
    FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                          ::BIGINT, doc_id) AS sample_rank
      FROM documents)
    WHERE sample_rank <= {_SAMPLE_K}
    """,
)
def docs_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    base = d.select(
        "lang", "doc_id", u.alias("u"),
        F.pmod(F.col("doc_id"), F.lit(_SAMPLE_SALTS)).alias("salt"),
    )
    w1 = Window.partitionBy("lang", "salt").orderBy("u", "doc_id")
    survivors = (
        base.withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= _SAMPLE_K)
        .drop("r1", "salt")
    )
    w2 = Window.partitionBy("lang").orderBy("u", "doc_id")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2))
        .where(F.col("sample_rank") <= _SAMPLE_K)
        .select("lang", "sample_rank", "doc_id")
    )


# --------------------------------------------------------------------------
# PageRank centrality over the brand co-occurrence graph (edges =
# basket pairs, weight = co-occurring orders). The Spark side is the
# generic extensions.graph.pagerank loop — one edge⋈rank join + one
# hash aggregate per round; the oracle unrolls the identical
# arithmetic into one CTE pair per iteration.
_PR_ITERS = 5


def _pagerank_oracle(iters: int) -> str:
    head = """
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    pairs AS (
      SELECT a.brand AS src, b.brand AS dst, COUNT(*) AS w
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand <> b.brand
      GROUP BY 1, 2),
    outw AS (SELECT src, SUM(w) AS out_w FROM pairs GROUP BY 1),
    er AS (SELECT p.src, p.dst, ROUND(CAST(p.w AS DOUBLE) / o.out_w, 9) AS r
           FROM pairs p JOIN outw o ON p.src = o.src),
    nodes AS (SELECT DISTINCT src AS node FROM pairs),
    t AS (SELECT COUNT(*) AS n FROM nodes),
    it0 AS (SELECT node, ROUND(CAST(1 AS DOUBLE) / t.n, 12) AS pr
            FROM nodes CROSS JOIN t)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""",
    c{k} AS (
      SELECT e.dst AS node,
             SUM(CAST(ROUND(p.pr * e.r, 12) AS DECIMAL(20,12))) AS s
      FROM er e JOIN it{k - 1} p ON e.src = p.node GROUP BY 1),
    it{k} AS (
      SELECT n.node,
             ROUND(CAST(0.15 AS DOUBLE) / t.n
                   + CAST(0.85 AS DOUBLE)
                     * CAST(COALESCE(c.s, CAST(0 AS DECIMAL(20,12)))
                            AS DOUBLE), 12) AS pr
      FROM nodes n CROSS JOIN t LEFT JOIN c{k} c ON n.node = c.node)""")
    return (
        head
        + "".join(steps)
        + f"\n    SELECT node AS brand, pr AS pagerank FROM it{iters}"
    )


@query("brand_pagerank", oracle=_pagerank_oracle(_PR_ITERS))
def brand_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # same no-self-join pair generation as basket_brand_pairs: pairs
    # come from each order's sorted distinct-brand array (fan-out
    # bounded by lines-per-order), then mirrored to a symmetric edge
    # list. The oracle's a.brand <> b.brand self-join states identical
    # semantics.
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("bs"))
    )
    combos = F.flatten(
        F.transform(
            F.col("bs"),
            lambda x, i: F.transform(
                F.slice(F.col("bs"), i + 2, F.size("bs")),
                lambda y: F.struct(x.alias("ba"), y.alias("bb")),
            ),
        )
    )
    upper = (
        baskets.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.ba").alias("src"), F.col("p.bb").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = upper.unionByName(
        upper.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    ranks = pagerank(edges, weight="w", iters=_PR_ITERS)
    return ranks.select(
        F.col("node").alias("brand"), F.col("pr").alias("pagerank")
    )


# --------------------------------------------------------------------------
# Triangle counting on the brand co-occurrence graph — graph motif
# analytics (community density; a triangle means three brands that
# pairwise co-sell). Edges are the support-≥3 basket pairs; counting
# uses the degree-ordered orientation in extensions/graph.triangles,
# whose wedge join is bounded O(m^1.5) regardless of hub skew — the
# plan that survives a celebrity node, where the naive wedge count
# explodes as C(degree, 2). The oracle states the same count as the
# canonical a<b<c three-way self-join.
@query(
    "brand_triangles",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    e AS (
      SELECT a.brand AS u, b.brand AS v
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2 HAVING COUNT(*) >= 3),
    t AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    nodes AS (SELECT u AS brand FROM e UNION SELECT v FROM e),
    m AS (SELECT a AS brand FROM t
          UNION ALL SELECT b FROM t
          UNION ALL SELECT c FROM t),
    cnt AS (SELECT brand, COUNT(*) AS tri FROM m GROUP BY 1)
    SELECT n.brand, CAST(COALESCE(cnt.tri, 0) AS BIGINT) AS triangles
    FROM nodes n LEFT JOIN cnt USING (brand)
    """,
)
def brand_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.extensions.graph import triangles

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("bs"))
    )
    combos = F.flatten(
        F.transform(
            F.col("bs"),
            lambda x, i: F.transform(
                F.slice(F.col("bs"), i + 2, F.size("bs")),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    edges = (
        baskets.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .where(F.col("pair_orders") >= 3)
        .select("u", "v")
    )
    return triangles(edges, "u", "v").select(
        F.col("node").alias("brand"), "triangles"
    )


# --------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis): each doc
# draws priority ln(u)/w where u is an md5-uniform and w its token
# count, and the global top-k by priority IS a weighted sample without
# replacement. Cross-engine exactness: u = k32/2^32 with k32 an
# integer, so ln(u) = ln(k32) − ln(2^32) — both micro-nat integer
# logs (the docs_token_entropy pattern; ln(2^32) is the precomputed
# constant below), and the only float op is one IEEE division by the
# integer weight. Scale shape: one projection + TakeOrderedAndProject;
# no shuffle, no RNG state, reproducible on any cluster layout.
_ES_K = 50
_LN_2_32_MICRO = 22_180_710  # round(round(ln(2^32), 6) * 1e6)


@query(
    "docs_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             CASE WHEN length(trim(text)) = 0 THEN 1
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               + 1 AS k32
      FROM documents),
    pr AS (
      SELECT doc_id, lang, n_tokens,
             CAST(CAST(ROUND(ROUND(ln(CAST(k32 AS DOUBLE)), 6)
                             * 1000000, 0) AS BIGINT)
                  - {_LN_2_32_MICRO} AS DOUBLE) / n_tokens AS priority
      FROM w)
    SELECT doc_id, lang, n_tokens, priority
    FROM pr ORDER BY priority DESC, doc_id LIMIT {_ES_K}
    """,
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = (
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(1))
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("long")
    )
    k32 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    )
    micro_ln_k = F.round(
        F.round(F.log(k32.cast("double")), 6) * 1_000_000, 0
    ).cast("long")
    priority = (micro_ln_k - F.lit(_LN_2_32_MICRO)).cast("double") / F.col(
        "n_tokens"
    )
    return (
        d.select("doc_id", "lang", n_tokens.alias("n_tokens"))
        .withColumn("priority", priority)
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_ES_K)
    )


# --------------------------------------------------------------------------
# Gini concentration of customer revenue per market segment — the
# single-number complement to customers_pareto_bands' Lorenz bands.
# Exact rank formula G = (2·Σ i·x_i − (n+1)·Σx_i) / (n·Σx_i) with
# ranks ascending by (revenue, custkey); every term is exact decimal
# or integer arithmetic and only the final quotient runs in IEEE
# doubles, so both engines agree bit-for-bit. Tie order is pinned by
# custkey, and a tie block's contribution to Σ i·x_i is independent
# of intra-block order anyway (constant x over consecutive ranks).
#
# Scale notes (100 TB): the input to the rank window is the
# per-customer rollup, not raw orders — but the window partitions by
# segment, so one task sorts each segment's customer list. At
# hundreds of millions of customers per segment the exact-rank sort
# becomes the bottleneck; the scale path is the banded Lorenz
# approximation (customers_pareto_bands' aggregate-then-analyze
# shape, trapezoid-summed), or a two-phase global rank
# (operators/ranking.with_global_rank) per segment. The exact form
# stays here because it is the oracle-checkable ground truth.
@query(
    "segment_revenue_gini",
    oracle="""
    WITH r AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders GROUP BY 1),
    s AS (
      SELECT c.c_mktsegment, r.rev,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY r.rev, r.o_custkey) AS i
      FROM r JOIN customer c ON r.o_custkey = c.c_custkey),
    g AS (
      SELECT c_mktsegment, COUNT(*) AS n,
             SUM(rev) AS sx, SUM(i * rev) AS six
      FROM s GROUP BY 1)
    SELECT c_mktsegment, n AS customers,
           CAST(ROUND(sx, 4) AS DOUBLE) AS segment_revenue,
           ROUND(CAST(ROUND(2 * six - (n + 1) * sx, 4) AS DOUBLE)
                 / CAST(ROUND(n * sx, 4) AS DOUBLE), 6) AS gini
    FROM g
    ORDER BY c_mktsegment
    """,
)
def segment_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(money("o_totalprice")).alias("rev"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    ranked = rev.join(
        cust, rev["o_custkey"] == cust["c_custkey"]
    ).withColumn(
        "i",
        F.row_number().over(
            Window.partitionBy("c_mktsegment").orderBy("rev", "o_custkey")
        ),
    )
    g = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("sx"),
        F.sum(F.col("i") * F.col("rev")).alias("six"),
    )
    return g.select(
        "c_mktsegment",
        F.col("n").alias("customers"),
        F.round(F.col("sx"), 4).cast("double").alias("segment_revenue"),
        F.round(
            F.round(
                2 * F.col("six") - (F.col("n") + 1) * F.col("sx"), 4
            ).cast("double")
            / F.round(F.col("n") * F.col("sx"), 4).cast("double"),
            6,
        ).alias("gini"),
    ).orderBy("c_mktsegment")


# --------------------------------------------------------------------------
# Blocked fuzzy matching — entity resolution's standard
# block-then-compare shape over customer names: candidate pairs share
# a blocking key (here the 17-char name prefix), and only
# within-block pairs pay the edit-distance comparison. Spark and
# DuckDB both implement classic Levenshtein, so the pair set and
# distances agree exactly.
#
# Scale notes (100 TB): the block join is a hash equi-join on the
# blocking key — never a cross join — and the comparison cost is
# Σ_blocks C(|block|, 2), governed by the blocking key's granularity
# exactly like the LSH band buckets in extensions/dedup.py (a hot
# block would get the same bucket-cap treatment). The a<b predicate
# halves the pair space and dedups symmetric matches.
def _blocked_fuzzy_pairs(c):
    """Blocked fuzzy match-pair generator shared by
    customers_fuzzy_blocked_match and customers_golden_records: pairs
    within a 17-char name-prefix block at Levenshtein distance <= 1
    (one hash equi-join on the block key — never a cartesian). Any
    change to the blocking key or threshold changes BOTH consumers'
    match graphs in lockstep."""
    a = c.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.substring("c_name", 1, 17).alias("block"),
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.substring("c_name", 1, 17).alias("block"),
    )
    return (
        a.join(
            b,
            (a["block"] == b["block"])
            & (F.col("custkey_a") < F.col("custkey_b")),
        )
        .where(F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1)
        .select(
            "custkey_a",
            "custkey_b",
            F.levenshtein(F.col("name_a"), F.col("name_b")).alias(
                "edit_dist"
            ),
        )
    )


@query(
    "customers_fuzzy_blocked_match",
    oracle="""
    SELECT a.c_custkey AS custkey_a,
           b.c_custkey AS custkey_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM customer a
    JOIN customer b
      ON substring(a.c_name, 1, 17) = substring(b.c_name, 1, 17)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY 1, 2
    """,
)
def customers_fuzzy_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return _blocked_fuzzy_pairs(c).orderBy("custkey_a", "custkey_b")


# --------------------------------------------------------------------------
# Entity resolution end-to-end: blocked fuzzy pairs → connected
# components → one golden record per entity cluster (survivorship:
# the minimum custkey is the canonical member and contributes the
# canonical name; balances aggregate exactly). Composes the
# customers_fuzzy_blocked_match pair generator with
# extensions/graph.connected_components, plus a union of unpaired
# customers as singleton clusters.
#
# Oracle derivation: within a 17-char-prefix block every pair of
# 18-char names differs in exactly the final character, so Levenshtein
# is always 1 and the match graph restricted to a block is COMPLETE —
# components are precisely the blocks, by construction rather than
# data luck. The oracle therefore computes the same golden records by
# grouping on the blocking prefix directly — independent ground truth
# for the pairs→components→survivorship pipeline.
#
# Scale notes (100 TB): pair generation is the blocked hash equi-join
# (never cartesian), components run the bounded label-propagation
# loop (near-clique blocks converge in 2 rounds), and survivorship is
# one hash aggregate on the cluster label. Nothing driver-side.
@query(
    "customers_golden_records",
    oracle="""
    SELECT MIN(c_custkey) AS canonical_custkey,
           MIN(c_name) AS canonical_name,
           COUNT(*) AS cluster_size,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4)
                AS DOUBLE) AS total_acctbal
    FROM customer
    GROUP BY substring(c_name, 1, 17)
    ORDER BY canonical_custkey
    """,
)
def customers_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.extensions.graph import connected_components

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    pairs = _blocked_fuzzy_pairs(c.select("c_custkey", "c_name")).select(
        "custkey_a", "custkey_b"
    )
    comp = connected_components(pairs, "custkey_a", "custkey_b")
    # unpaired customers are their own (singleton) cluster
    labels = comp.select(
        F.col("node").alias("c_custkey"), F.col("cluster")
    ).unionByName(
        c.join(comp, c["c_custkey"] == comp["node"], "left_anti").select(
            "c_custkey", F.col("c_custkey").alias("cluster")
        )
    )
    return (
        c.join(labels, "c_custkey")
        .groupBy("cluster")
        .agg(
            F.min("c_custkey").alias("canonical_custkey"),
            F.min("c_name").alias("canonical_name"),
            F.count(F.lit(1)).alias("cluster_size"),
            F.round(F.sum(F.col("c_acctbal").cast(MONEY)), 4)
            .cast("double")
            .alias("total_acctbal"),
        )
        .drop("cluster")
        .orderBy("canonical_custkey")
    )


# --------------------------------------------------------------------------
# RFM segmentation — recency/frequency quintiles with monetary rollup,
# the marketing-analytics staple. The quintile maps come from
# histogram-CDF over the recency-day and order-count VALUE domains
# (≤ calendar-span and ≤ max-orders-per-customer distinct values —
# data-size-independent frames, so the partitionless cumulative
# windows are bounded), then broadcast-joined back to the
# per-customer frame; no global sort, no ntile over all customers.
# Quintile of a tied value is decided by its bucket's last CDF
# position: ((cum−1)·5) div n + 1, identical in both engines.
# Recency quintile 1 = most recent.
@query(
    "customers_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT MAX(o_orderdate) AS ad FROM orders),
    per AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT ad FROM anchor)) AS rec,
             COUNT(*) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
      FROM orders GROUP BY 1),
    rh AS (SELECT rec AS v, COUNT(*) AS cnt FROM per GROUP BY 1),
    rc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
                  SUM(cnt) OVER () AS n FROM rh),
    rs AS (SELECT v, CAST((cum - 1) * 5 // n + 1 AS BIGINT) AS r_q FROM rc),
    fh AS (SELECT freq AS v, COUNT(*) AS cnt FROM per GROUP BY 1),
    fc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
                  SUM(cnt) OVER () AS n FROM fh),
    fs AS (SELECT v, CAST((cum - 1) * 5 // n + 1 AS BIGINT) AS f_q FROM fc)
    SELECT rs.r_q AS r_quintile, fs.f_q AS f_quintile,
           COUNT(*) AS customers,
           CAST(ROUND(SUM(p.monetary), 4) AS DOUBLE) AS total_monetary,
           CAST(SUM(p.monetary) AS DOUBLE) / COUNT(*) AS avg_monetary
    FROM per p JOIN rs ON p.rec = rs.v JOIN fs ON p.freq = fs.v
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("ad"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(money("o_totalprice")).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("ad", "last_d").alias("rec"),
            "freq",
            "monetary",
        )
    )

    def quintile_map(df, col, out):
        h = df.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        wc = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        wn = Window.partitionBy()
        c = h.select(
            "v",
            F.sum("cnt").over(wc).alias("cum"),
            F.sum("cnt").over(wn).alias("n"),
        )
        return c.select(
            "v", F.expr("((cum - 1) * 5) div n + 1").alias(out)
        )

    rs = quintile_map(per, "rec", "r_q")
    fs = quintile_map(per, "freq", "f_q")
    return (
        per.join(F.broadcast(rs), per["rec"] == rs["v"])
        .drop("v")
        .join(F.broadcast(fs), per["freq"] == fs["v"])
        .groupBy(
            F.col("r_q").alias("r_quintile"),
            F.col("f_q").alias("f_quintile"),
        )
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.round(F.sum("monetary"), 4)
            .cast("double")
            .alias("total_monetary"),
            (F.sum("monetary").cast("double") / F.count(F.lit(1))).alias(
                "avg_monetary"
            ),
        )
        .orderBy("r_quintile", "f_quintile")
    )


# --------------------------------------------------------------------------
# Theil T inequality index per market segment — the entropy-based
# complement to the Gini: T = (1/n)·Σ (x/μ)·ln(x/μ) over customer
# revenues, and unlike Gini it needs no pairwise or rank construction
# at all — one per-customer aggregate, a 5-row segment-mean broadcast
# back, and a per-row closed form. Each (x/μ)·ln(x/μ) term rounds to
# 6 dp and scales to an int64 micro-unit (the docs_token_entropy
# pattern), so the segment sum is exact and partition-order-free; μ
# itself is the exact-decimal-sum davg.
@query(
    "segment_revenue_theil",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS m
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    seg AS (
      SELECT segment, COUNT(*) AS n, SUM(m) AS tot FROM rev GROUP BY 1),
    t AS (
      SELECT r.segment,
             CAST(ROUND(ROUND(
               (CAST(r.m AS DOUBLE) / (CAST(s.tot AS DOUBLE) / s.n))
               * ln(CAST(r.m AS DOUBLE) / (CAST(s.tot AS DOUBLE) / s.n)),
               6) * 1000000, 0) AS BIGINT) AS micro
      FROM rev r JOIN seg s ON r.segment = s.segment)
    SELECT s.segment, s.n AS customers,
           CAST(s.tot AS DOUBLE) / s.n AS mean_revenue,
           CAST(SUM(t.micro) AS DOUBLE) / (1000000.0 * s.n) AS theil_t
    FROM t JOIN seg s ON t.segment = s.segment
    GROUP BY 1, 2, 3
    ORDER BY 1
    """,
)
def segment_revenue_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("o_custkey")
        )
        .agg(F.sum(money("o_totalprice")).alias("m"))
    )
    seg = rev.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("m").alias("tot")
    )
    mu = F.col("tot").cast("double") / F.col("n")
    r = F.col("m").cast("double") / mu
    micro = F.round(F.round(r * F.log(r), 6) * 1_000_000, 0).cast("long")
    return (
        rev.join(F.broadcast(seg), "segment")
        .select("segment", "n", mu.alias("mean_revenue"), micro.alias("micro"))
        .groupBy("segment", F.col("n").alias("customers"), "mean_revenue")
        .agg(
            (
                F.sum("micro").cast("double")
                / (1_000_000.0 * F.col("customers"))
            ).alias("theil_t")
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# XYZ demand-variability classification — the inventory-planning twin
# of the ABC/Pareto split: parts are classed by the coefficient of
# variation of their monthly demand (X = steady, Y = variable, Z =
# erratic). All moments are exact integer sums (quantities are
# integral), and cv² = (n·Σq² − S²)/S² needs no sqrt — the class
# thresholds compare against 0.25/1.0 directly. One part-keyed
# aggregate; the class rollup is a 3-row reduce.
@query(
    "part_demand_xyz",
    oracle="""
    WITH m AS (
      SELECT l_partkey,
             CAST(EXTRACT(year FROM l_shipdate) * 12
                  + EXTRACT(month FROM l_shipdate) AS BIGINT) AS midx,
             CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2),
    p AS (
      SELECT l_partkey, COUNT(*) AS months, SUM(q) AS s,
             SUM(q * q) AS qq
      FROM m GROUP BY 1),
    c AS (
      SELECT l_partkey, months,
             CAST(months * qq - s * s AS DOUBLE) / (s * s) AS cv2
      FROM p)
    SELECT CASE WHEN cv2 < 0.25 THEN 'X'
                WHEN cv2 < 1.0 THEN 'Y'
                ELSE 'Z' END AS xyz_class,
           COUNT(*) AS n_parts,
           CAST(SUM(months) AS BIGINT) AS total_active_months,
           CAST(SUM(months) AS DOUBLE) / COUNT(*) AS avg_active_months
    FROM c GROUP BY 1 ORDER BY 1
    """,
)
def part_demand_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("bigint")
        .alias("midx"),
    ).agg(
        F.sum(F.round(F.col("l_quantity"), 0).cast("bigint"))
        .cast("bigint")
        .alias("q")
    )
    p = m.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("months"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("qq"),
    )
    cv2 = (
        F.col("months") * F.col("qq") - F.col("s") * F.col("s")
    ).cast("double") / (F.col("s") * F.col("s"))
    c = p.select("months", cv2.alias("cv2"))
    return (
        c.groupBy(
            F.when(F.col("cv2") < 0.25, "X")
            .when(F.col("cv2") < 1.0, "Y")
            .otherwise("Z")
            .alias("xyz_class")
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("months").cast("bigint").alias("total_active_months"),
            (F.sum("months").cast("double") / F.count(F.lit(1))).alias(
                "avg_active_months"
            ),
        )
        .orderBy("xyz_class")
    )


# --------------------------------------------------------------------------
# Adamic–Adar link prediction on the brand co-purchase graph — which
# brand pairs are NOT yet co-purchased but share many co-purchase
# neighbors, each neighbor weighted by 1/ln(degree) (rare neighbors
# count more). Completes the graph suite: components → PageRank →
# triangles → link prediction. The co-purchase graph is dense at any
# fixed count threshold (every brand pair eventually co-occurs), so
# the edge set is the TOP-75 pairs by co-purchase count — a rank over
# the C(brands,2)-bounded pair frame, scale-invariant by construction.
# Wedges come from one self-join of the symmetric edge list keyed on
# the center node (degree-bounded, the brand_triangles shape);
# existing edges are removed with a broadcast left_anti. Every wedge
# center has degree ≥ 2, so ln(deg) > 0; each 1/ln(deg) term rounds
# to a 6-dp micro-unit and sums exactly.
_LP_TOP_EDGES = 75
@query(
    "brand_link_prediction",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    pc AS (
      SELECT a.brand AS ba, b.brand AS bb, COUNT(*) AS c
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2),
    e AS (
      SELECT ba, bb FROM (
        SELECT ba, bb,
               ROW_NUMBER() OVER (ORDER BY c DESC, ba, bb) AS r
        FROM pc)
      WHERE r <= 75),
    sym AS (
      SELECT ba AS u, bb AS v FROM e
      UNION ALL SELECT bb AS u, ba AS v FROM e),
    deg AS (SELECT u, COUNT(*) AS d FROM sym GROUP BY 1),
    wedge AS (
      SELECT x.v AS brand_a, y.v AS brand_b, x.u AS z
      FROM sym x JOIN sym y ON x.u = y.u AND x.v < y.v),
    cand AS (
      SELECT w.brand_a, w.brand_b, w.z FROM wedge w
      WHERE NOT EXISTS (
        SELECT 1 FROM e WHERE e.ba = w.brand_a AND e.bb = w.brand_b))
    SELECT c.brand_a, c.brand_b,
           COUNT(*) AS common_neighbors,
           CAST(SUM(CAST(ROUND(ROUND(1.0 / ln(CAST(d.d AS DOUBLE)), 6)
                                * 1000000, 0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS aa_score
    FROM cand c JOIN deg d ON c.z = d.u
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def brand_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("p_brand").alias("brand"),
        )
        .distinct()
    )
    a = ob.select(F.col("okey"), F.col("brand").alias("ba"))
    b = ob.select(F.col("okey"), F.col("brand").alias("bb"))
    pc = (
        a.join(b, "okey")
        .where(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = (
        pc.withColumn(
            "r",
            F.row_number().over(
                Window.orderBy(F.desc("c"), "ba", "bb")
            ),
        )
        .where(F.col("r") <= _LP_TOP_EDGES)
        .select("ba", "bb")
    )
    sym = e.select(F.col("ba").alias("u"), F.col("bb").alias("v")).unionByName(
        e.select(F.col("bb").alias("u"), F.col("ba").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    x = sym.select(F.col("u"), F.col("v").alias("brand_a"))
    y = sym.select(F.col("u"), F.col("v").alias("brand_b"))
    wedge = x.join(y, "u").where(F.col("brand_a") < F.col("brand_b"))
    cand = wedge.join(
        F.broadcast(
            e.select(
                F.col("ba").alias("brand_a"), F.col("bb").alias("brand_b")
            )
        ),
        ["brand_a", "brand_b"],
        "left_anti",
    )
    micro = F.round(
        F.round(1.0 / F.log(F.col("d").cast("double")), 6) * 1_000_000, 0
    ).cast("long")
    return (
        cand.join(F.broadcast(deg), cand["u"] == deg["u"])
        .groupBy("brand_a", "brand_b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            (F.sum(micro).cast("double") / 1_000_000.0).alias("aa_score"),
        )
        .orderBy("brand_a", "brand_b")
    )


# --------------------------------------------------------------------------
# Weekly cohort retention triangle — the classic growth-analytics
# matrix: users bucketed by first-active week, retention rate per
# week offset. Built from the distinct (user, week) activity grid:
# one distinct (user-keyed shuffle), one per-user min (same key — a
# reused partitioning), one user-keyed join back, then a cohort-week
# aggregate. NO per-event self-join and no row-count-sized window:
# every frame after the distinct is |users|- or |weeks²|-sized. The
# cohort-size frame is |weeks|-sized (bounded by the calendar, a few
# hundred rows even over a decade) and broadcasts.
@query(
    "events_retention_triangle",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
      FROM events),
    fw AS (SELECT user_id, MIN(wk) AS cohort_week FROM uw GROUP BY 1),
    coh AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM fw GROUP BY 1),
    act AS (
      SELECT f.cohort_week,
             CAST((u.wk - f.cohort_week) / 7 AS BIGINT) AS week_offset,
             COUNT(*) AS retained
      FROM uw u JOIN fw f ON u.user_id = f.user_id
      GROUP BY 1, 2)
    SELECT a.cohort_week, a.week_offset, a.retained, c.cohort_size,
           CAST(a.retained AS DOUBLE) / c.cohort_size AS retention_rate
    FROM act a JOIN coh c ON a.cohort_week = c.cohort_week
    ORDER BY 1, 2
    """,
)
def events_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = (
        ev.select(
            "user_id",
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("wk"),
        )
        .distinct()
    )
    fw = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    coh = fw.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    act = (
        uw.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    return (
        act.join(F.broadcast(coh), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "retained",
            "cohort_size",
            (F.col("retained").cast("double") / F.col("cohort_size")).alias(
                "retention_rate"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# Peak open-order backlog per month — interval concurrency WITHOUT
# interval fan-out: an order is "open" from its order date until the
# day after its last shipment. Instead of exploding each interval
# into its covered days (unbounded fan-out: a 2-year-open order is
# 730 rows), each interval contributes exactly TWO boundary events
# (+1 at open, -1 after close); a daily net-change aggregate and one
# cumulative sum over the day domain recover the concurrent count.
# The cumulative window is partitionless but runs over the DAY-domain
# aggregate (≈365·years rows, calendar-bounded — the same bounded-
# domain-window contract as the histogram-CDF queries), never over
# order rows.
#
# Carried-over peaks: the running count is only SAMPLED at boundary
# days, so a month with no events still has a backlog — the count
# carried in from the last prior event day. A month spine (calendar-
# bounded) forward-fills each month's carry-in (the previous months'
# last sampled value) and the peak is max(carry_in, within-month
# samples); event-less months report their carry-in instead of
# vanishing. (Found by review: the event-day-only grouping
# under-reported every carried-over month, and the oracle shared the
# blind spot — the monthly property test now checks against a
# brute-force day sweep.)
@query(
    "orders_backlog_monthly_peak",
    oracle="""
    WITH span AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS od,
             MAX(CAST(l.l_shipdate AS DATE)) AS cd
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    ev AS (
      SELECT od AS day, 1 AS n FROM span
      UNION ALL
      SELECT cd + 1 AS day, -1 AS n FROM span),
    daily AS (SELECT day, CAST(SUM(n) AS BIGINT) AS net FROM ev GROUP BY 1),
    run AS (
      SELECT day,
             SUM(net) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS open_orders
      FROM daily),
    bymonth AS (
      SELECT CAST(date_trunc('month', day) AS DATE) AS month,
             MAX(open_orders) AS mmax,
             MAX_BY(open_orders, day) AS mlast,
             MIN(day) AS mfirst
      FROM run GROUP BY 1),
    spine AS (
      SELECT CAST(UNNEST(generate_series(
               (SELECT MIN(month) FROM bymonth),
               (SELECT MAX(month) FROM bymonth),
               INTERVAL 1 MONTH)) AS DATE) AS month),
    filled AS (
      SELECT s.month, b.mmax, b.mfirst,
             COALESCE(LAST_VALUE(b.mlast IGNORE NULLS) OVER (
               ORDER BY s.month
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS carry_in
      FROM spine s LEFT JOIN bymonth b ON b.month = s.month)
    SELECT month,
           CAST(GREATEST(COALESCE(mmax, 0),
                         CASE WHEN mfirst IS NULL OR mfirst > month
                              THEN carry_in ELSE 0 END) AS BIGINT)
             AS peak_open
    FROM filled ORDER BY month
    """,
)
def orders_backlog_monthly_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    span = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "od")
        .agg(F.max("sd").alias("cd"))
    )
    ev = span.select(F.col("od").alias("day"), F.lit(1).alias("n")).unionByName(
        span.select(F.date_add("cd", 1).alias("day"), F.lit(-1).alias("n"))
    )
    daily = ev.groupBy("day").agg(F.sum("n").cast("bigint").alias("net"))
    run = daily.withColumn(
        "open_orders",
        F.sum("net").over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    bymonth = run.groupBy(
        F.date_trunc("month", F.col("day")).cast("date").alias("month")
    ).agg(
        F.max("open_orders").alias("mmax"),
        F.max_by("open_orders", "day").alias("mlast"),
        F.min("day").alias("mfirst"),
    )
    spine = bymonth.agg(
        F.min("month").alias("lo"), F.max("month").alias("hi")
    ).select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month")
    )
    filled = spine.join(bymonth, "month", "left").withColumn(
        "carry_in",
        F.coalesce(
            F.last("mlast", ignorenulls=True).over(
                Window.orderBy("month").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    # carry-in holds only for days BEFORE the month's first sampled
    # day; a sample on the month's first day makes it inapplicable
    carry_applies = F.col("mfirst").isNull() | (
        F.col("mfirst") > F.col("month")
    )
    return (
        filled.select(
            "month",
            F.greatest(
                F.coalesce(F.col("mmax"), F.lit(0)),
                F.when(carry_applies, F.col("carry_in")).otherwise(F.lit(0)),
            )
            .cast("bigint")
            .alias("peak_open"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# BFS shortest-path distances from one brand over the top-75
# co-occurrence edge graph (the link-prediction edge set, verbatim):
# level-synchronous frontier expansion (extensions/graph.bfs_distances
# — per-round work is frontier-adjacent edges only, Pregel-superstep
# shape), against DuckDB's recursive-CTE walk with the same depth cap.
# The brand domain bounds everything: |nodes| ≤ |brands|, ≤6 rounds.
@query(
    "brand_bfs_distances",
    oracle="""
    WITH RECURSIVE ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    pc AS (
      SELECT a.brand AS ba, b.brand AS bb, COUNT(*) AS c
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2),
    e AS (
      SELECT ba, bb FROM (
        SELECT ba, bb,
               ROW_NUMBER() OVER (ORDER BY c DESC, ba, bb) AS r
        FROM pc)
      WHERE r <= 75),
    sym AS (
      SELECT ba AS u, bb AS v FROM e
      UNION ALL SELECT bb AS u, ba AS v FROM e),
    walk(brand, dist) AS (
      SELECT 'Brand#11' AS brand, 0 AS dist
      UNION
      SELECT s.v, w.dist + 1
      FROM walk w JOIN sym s ON s.u = w.brand
      WHERE w.dist < 6)
    SELECT brand AS node, CAST(MIN(dist) AS BIGINT) AS dist
    FROM walk GROUP BY 1 ORDER BY dist, node
    """,
)
def brand_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fabric_claims_spark.extensions.graph import bfs_distances

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    a = ob.select("okey", F.col("brand").alias("ba"))
    b = ob.select("okey", F.col("brand").alias("bb"))
    pc = (
        a.join(b, "okey")
        .where(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = (
        pc.withColumn(
            "r",
            F.row_number().over(
                Window.orderBy(F.col("c").desc(), F.col("ba"), F.col("bb"))
            ),
        )
        .where(F.col("r") <= 75)
        .select(F.col("ba").alias("src"), F.col("bb").alias("dst"))
    )
    return (
        bfs_distances(e, "Brand#11", max_depth=6)
        .orderBy("dist", "node")
    )


# --------------------------------------------------------------------------
# Top-N + "Other" rollup — the report shape every BI surface renders
# (top 3 market segments per region by revenue, everything else
# folded into one Other bucket so the bars still sum to the total).
# Rank over the (region, segment) aggregate — a bounded frame, never
# fact rows — ties broken on the segment name; Other is a re-aggregate
# of the non-top rows, so SUM(revenue) per region is exactly the
# region total (exact decimal until the final cast).
@query(
    "region_segment_top3_other",
    oracle="""
    WITH rs AS (
      SELECT r.r_name AS region, c.c_mktsegment AS segment,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY region ORDER BY rev DESC, segment) AS rn
      FROM rs)
    SELECT region,
           CASE WHEN rn <= 3 THEN segment ELSE 'Other' END AS segment_slot,
           CAST(ROUND(SUM(rev), 4) AS DOUBLE) AS revenue
    FROM ranked
    GROUP BY 1, 2
    ORDER BY region, segment_slot
    """,
)
def region_segment_top3_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", money("o_totalprice").alias("amt")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rs = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.sum("amt").alias("rev"))
    )
    w = Window.partitionBy("region").orderBy(
        F.col("rev").desc(), F.col("segment").asc()
    )
    ranked = rs.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(
            "region",
            F.when(F.col("rn") <= 3, F.col("segment"))
            .otherwise(F.lit("Other"))
            .alias("segment_slot"),
        )
        .agg(F.round(F.sum("rev"), 4).cast("double").alias("revenue"))
        .orderBy("region", "segment_slot")
    )


# --------------------------------------------------------------------------
# Largest-remainder (Hamilton) allocation — distribute 10,000 basis
# points across order priorities proportional to revenue so the
# shares SUM EXACTLY to 10,000 (naive per-row rounding loses or
# invents basis points; the classic financial-allocation trap).
# Entirely integer: the basis is revenue rounded to whole currency
# units (BIGINT; 10000x it stays far under int64), floor shares via
# integer div, then the leftover units go to the largest remainders
# (priority name breaks ties). Exactness pinned by the oracle AND a
# sum-invariant test.
@query(
    "priority_revenue_allocation_bps",
    oracle="""
    WITH pr AS (
      SELECT o_orderpriority AS priority,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 0)
                  AS BIGINT) AS ri
      FROM orders GROUP BY 1),
    t AS (SELECT SUM(ri) AS total FROM pr),
    base AS (
      SELECT pr.priority, pr.ri,
             (10000 * pr.ri) // t.total AS floor_bps,
             (10000 * pr.ri) % t.total AS rem
      FROM pr CROSS JOIN t),
    lo AS (SELECT 10000 - SUM(floor_bps) AS leftover FROM base),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY rem DESC, priority) AS rr
      FROM base)
    SELECT rk.priority, rk.ri AS revenue_units,
           CAST(rk.floor_bps
                + CASE WHEN rk.rr <= lo.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS bps
    FROM rk CROSS JOIN lo
    ORDER BY rk.priority
    """,
)
def priority_revenue_allocation_bps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pr = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.round(F.sum(money("o_totalprice")), 0).cast("long").alias("ri")
    )
    t = pr.agg(F.sum("ri").alias("total"))
    base = pr.crossJoin(F.broadcast(t)).select(
        "priority",
        "ri",
        F.expr("10000 * ri div total").alias("floor_bps"),
        F.expr("(10000 * ri) % total").alias("rem"),
    )
    lo = base.agg((F.lit(10000) - F.sum("floor_bps")).alias("leftover"))
    w = Window.orderBy(F.col("rem").desc(), F.col("priority").asc())
    rk = base.withColumn("rr", F.row_number().over(w))
    return (
        rk.crossJoin(F.broadcast(lo))
        .select(
            "priority",
            F.col("ri").alias("revenue_units"),
            (
                F.col("floor_bps")
                + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("bps"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# Training-mixture sampling — the data-mixing step of a pre-training
# pipeline (fixed source weights a la The Pile; DoReMi's output is
# exactly such a weight vector): draw N documents with EXACT
# per-source allocation. Two exact-integer pieces compose:
#
# * allocation — Hamilton largest-remainder over basis-point weights
#   (the priority_revenue_allocation_bps machinery): floor quotas +
#   leftover seats to the largest remainders, so Σ alloc == N always,
#   with no float drift;
# * selection — per-source deterministic top-alloc by the md5-folded
#   uniform (the docs_sample_per_lang salted two-phase window: rank
#   within (source, salt) first, re-rank the bounded survivors — no
#   whole-stratum window partition at 100 TB).
#
# The draw is a pure function of the data: same corpus, same sample,
# any partitioning. A source with fewer documents than its quota
# returns what exists (the honest shortfall surfaces as a count
# mismatch downstream; repetition policy is a caller decision).
_MIX_N = 41
_MIX_BPS = (("src0", 3500), ("src1", 3000), ("src2", 2000), ("src3", 1500))
_MIX_SALTS = 64


@query(
    "docs_mixture_sample",
    oracle=f"""
    WITH w(source, bps) AS (VALUES {", ".join(f"('{s}', {b})" for s, b in _MIX_BPS)}),
    q AS (
      SELECT source, ({_MIX_N} * bps) // 10000 AS base,
             ({_MIX_N} * bps) % 10000 AS rem
      FROM w),
    seats AS (SELECT {_MIX_N} - SUM(base) AS s FROM q),
    alloc AS (
      SELECT source,
             base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                         <= (SELECT s FROM seats) THEN 1 ELSE 0 END AS n
      FROM q),
    ranked AS (
      SELECT d.source, d.doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                          ::BIGINT, d.doc_id) AS sample_rank
      FROM documents d JOIN w ON w.source = d.source)
    SELECT r.source, CAST(r.sample_rank AS BIGINT) AS sample_rank,
           r.doc_id, CAST(a.n AS BIGINT) AS alloc
    FROM ranked r JOIN alloc a ON a.source = r.source
    WHERE r.sample_rank <= a.n
    ORDER BY r.source, r.sample_rank
    """,
)
def docs_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = local_frame(
        d.sparkSession, list(_MIX_BPS), "source string, bps long"
    )
    # exact integer floor quota — `div`, not float `/` + cast, so a
    # future bps*N landing on (or rounding across) an exact multiple of
    # 10000 can never truncate differently from the oracle's `//`
    base = F.expr(f"(bps * {_MIX_N}) div 10000")
    rem = (F.col("bps") * _MIX_N) % 10000
    q = w.select("source", base.alias("base"), rem.alias("rem"))
    seats = q.agg((F.lit(_MIX_N) - F.sum("base")).alias("s"))
    w_seat = Window.orderBy(F.col("rem").desc(), F.col("source"))
    alloc = (
        q.crossJoin(F.broadcast(seats))
        .select(
            "source",
            (
                F.col("base")
                + F.when(
                    F.row_number().over(w_seat) <= F.col("s"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
    )
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    in_mix = d.join(
        F.broadcast(w.select("source")), "source"
    ).select(
        "source", "doc_id", u.alias("u"),
        F.pmod(F.col("doc_id"), F.lit(_MIX_SALTS)).alias("salt"),
    )
    # phase 1: rank within (source, salt) — max alloc bounds the keep
    max_alloc = _MIX_N  # a single source can hold at most all N seats
    w1 = Window.partitionBy("source", "salt").orderBy("u", "doc_id")
    survivors = (
        in_mix.withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= max_alloc)
        .drop("r1", "salt")
    )
    w2 = Window.partitionBy("source").orderBy("u", "doc_id")
    return (
        survivors.withColumn(
            "sample_rank", F.row_number().over(w2).cast("bigint")
        )
        .join(F.broadcast(alloc), "source")
        .where(F.col("sample_rank") <= F.col("alloc"))
        .select("source", "sample_rank", "doc_id", "alloc")
        .orderBy("source", "sample_rank")
    )


# --------------------------------------------------------------------------
# Edit-distance-1 entity pairs via SYMMETRIC DELETE neighborhoods
# (the SymSpell/FastSS trick) — the exact-recall complement of
# customers_fuzzy_blocked_match's prefix blocking: prefix blocks miss
# any pair whose edit sits inside the blocking prefix, while two
# strings are within Levenshtein distance 1 IFF their single-deletion
# neighborhoods (each string included as its own 0-deletion variant)
# intersect. Candidate generation is linear (len+1 variants per
# name), the candidate join is a hash equi-join on the variant — no
# pair scan — and one levenshtein verification removes the
# cross-position false positives (del_i(a) = del_j(b) with i ≠ j can
# pair distance-2 strings, e.g. 'ab'/'ba').
#
# Scale notes (100 TB): variants ≈ (len+1)·n rows feeding one
# equi-join; hot variants (shared deletion keys) are bounded by the
# alphabet and name length, and the verify step touches only
# candidate pairs. Distance k generalizes with C(len, k) variants —
# the standard spell-index trade.
@query(
    "customers_edit1_deletion_pairs",
    oracle="""
    WITH v AS (
      SELECT DISTINCT c_custkey, c_name,
             CASE WHEN j = 0 THEN c_name
                  ELSE substr(c_name, 1, j - 1) || substr(c_name, j + 1)
             END AS variant
      FROM customer,
           UNNEST(generate_series(0, length(c_name))) AS t(j)),
    cand AS (
      SELECT DISTINCT a.c_custkey AS custkey_a, a.c_name AS name_a,
             b.c_custkey AS custkey_b, b.c_name AS name_b
      FROM v a JOIN v b
        ON a.variant = b.variant AND a.c_custkey < b.c_custkey)
    SELECT custkey_a, custkey_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS distance
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    """,
)
def customers_edit1_deletion_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variants = F.transform(
        F.sequence(F.lit(0), F.length("c_name")),
        lambda j: F.when(j == 0, F.col("c_name")).otherwise(
            F.concat(
                F.col("c_name").substr(F.lit(1), j - 1),
                F.col("c_name").substr(j + 1, F.length("c_name")),
            )
        ),
    )
    v = (
        c.select("c_custkey", "c_name", F.explode(variants).alias("variant"))
        .distinct()
    )
    a = v.alias("a")
    b = v.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.where(dist <= 1).select(
        "custkey_a",
        "custkey_b",
        "name_a",
        "name_b",
        dist.cast("long").alias("distance"),
    )
