"""Round-8 scale evidence (SCALING.md), three sections:

1. serving — amortized rerun cost of the materialized indexes
   (VERDICT r7 item 2): in-plan consumer wall time per run vs
   store-build-once + served reruns, for the lexical RRF consumer and
   the LSH cluster consumer, at sf0.1.
2. behavioral — the round-7 behavioral family (KM, log-rank, windowed
   funnel, RFM, Markov) on x1 / x3 / x10 replicas of the sf0.1 events
   table (user-shifted copies: per-user series identical, population
   scales), rows + wall per scale (VERDICT r7 item 6).
3. textrank — Zipfian stopword-hub corpus (VERDICT r7 item 3): degree
   histogram of the co-occurrence graph, shipped pagerank wall vs the
   hot-key-split wall (extensions.graph.pagerank hot_degree_cap),
   results asserted identical.

Usage: python tools/scale_round8.py [serving|behavioral|textrank ...]
(no args = all three). Prints markdown tables for SCALING.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from fabric_claims_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"


def _clear(spark) -> None:
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(False)


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


# -- 1. serving amortization -------------------------------------------------


def serving(spark) -> None:
    from fabric_claims_spark.operators.serving_index import (
        apply_lexical_batch,
        apply_lsh_batch,
        read_lexical_index,
        read_lsh_pairs,
    )
    from fabric_claims_spark.queries import load_all_queries
    from fabric_claims_spark.queries.similarity import _rrf_indexed_core
    from fabric_claims_spark.sources.merge import TableStore
    from fabric_claims_spark.sources.parquet import load_table

    reg = load_all_queries()
    docs = load_table(spark, SF01, "documents")
    emb = load_table(spark, SF01, "embeddings")
    work = tempfile.mkdtemp(prefix="serve8_")
    try:
        store = TableStore(spark, work)

        print("\n### Serving amortization (sf0.1, cold cache per run)\n")
        print("| consumer | in-plan/run | store build (once) | served/run |")
        print("|---|---|---|---|")

        inplan = []
        for _ in range(3):
            _clear(spark)
            inplan.append(
                _timed(
                    lambda: reg["docs_hybrid_rrf_indexed"]
                    .fn(spark, SF01)
                    .count()
                )
            )
        _clear(spark)
        b_lex = _timed(lambda: apply_lexical_batch(store, docs, 0))
        served = []
        for _ in range(3):
            _clear(spark)

            def run_served():
                td, dfc, dn = read_lexical_index(store)
                _rrf_indexed_core(td, dfc, dn, emb).count()

            served.append(_timed(run_served))
        print(
            f"| hybrid RRF (lexical index) | {inplan} | {b_lex} |"
            f" {served} |"
        )

        from fabric_claims_spark.extensions.graph import (
            connected_components,
        )

        def clusters_from(pairs):
            connected_components(
                pairs.select("doc_a", "doc_b"), "doc_a", "doc_b"
            ).count()

        inplan_c = []
        for _ in range(3):
            _clear(spark)
            inplan_c.append(
                _timed(
                    lambda: reg["docs_dup_clusters"].fn(spark, SF01).count()
                )
            )
        _clear(spark)
        b_lsh = _timed(
            lambda: apply_lsh_batch(store, docs, 0, threshold=0.5, hasher="md5")
        )
        served_c = []
        for _ in range(3):
            _clear(spark)
            served_c.append(
                _timed(lambda: clusters_from(read_lsh_pairs(store)))
            )
        print(
            f"| dup clusters (LSH pair table) | {inplan_c} | {b_lsh} |"
            f" {served_c} |"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# -- 2. behavioral family at x1/x3/x10 ---------------------------------------

_BEHAVIORAL = [
    "events_user_survival_km",
    "events_conversion_logrank",
    "events_funnel_windowed",
    "events_user_rfm_segments",
    "events_attribution_markov",
]


def _events_replica(spark, copies: int, out_dir: str) -> int:
    """copies user-shifted copies of the sf0.1 events table: per-user
    series identical, user population x copies."""
    e = spark.read.parquet(f"{SF01}/events.parquet")
    c = spark.range(copies).select(F.col("id").alias("_c"))
    rep = e.crossJoin(c).select(
        (F.col("event_id") + F.col("_c") * F.lit(10**10)).alias("event_id"),
        (F.col("user_id") + F.col("_c") * F.lit(10**7)).alias("user_id"),
        "event_type",
        "ts",
        "value",
        "props",
    )
    rep.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    return spark.read.parquet(f"{out_dir}/events.parquet").count()


def behavioral(spark) -> None:
    from fabric_claims_spark.queries import load_all_queries

    reg = load_all_queries()
    print("\n### Behavioral family, x1/x3/x10 sf0.1-events replicas\n")
    header = "| scale | rows | " + " | ".join(_BEHAVIORAL) + " |"
    print(header)
    print("|---" * (len(_BEHAVIORAL) + 2) + "|")
    for copies in (1, 3, 10):
        work = tempfile.mkdtemp(prefix=f"beh8_x{copies}_")
        try:
            rows = _events_replica(spark, copies, work)
            walls = []
            for q in _BEHAVIORAL:
                _clear(spark)
                walls.append(_timed(lambda: reg[q].fn(spark, work).count()))
            print(
                f"| x{copies} | {rows} | "
                + " | ".join(str(w) for w in walls)
                + " |"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


# -- 3. textrank hub stress ---------------------------------------------------


def _zipf_corpus(spark, n_docs: int, doc_len: int, vocab: int):
    """Zipf-ish token stream: rank = floor(exp(u * ln(vocab))) maps a
    uniform hash to a log-uniform rank — rank 1 is the stopword hub."""
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(doc_len - 1)),
                    lambda i: F.format_string(
                        "w%d",
                        F.floor(
                            F.exp(
                                (
                                    F.pmod(
                                        F.xxhash64(
                                            F.col("doc_id") * doc_len + i,
                                            F.lit(8),
                                        ),
                                        F.lit(1_000_000),
                                    ).cast("double")
                                    / 1_000_000.0
                                )
                                * F.log(F.lit(float(vocab)))
                            )
                        ).cast("int"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )


def textrank(spark) -> None:
    from pyspark.sql import Window

    from fabric_claims_spark.extensions.graph import pagerank

    print("\n### TextRank hub stress (Zipfian corpus)\n")
    # parquet round-trips, not localCheckpoint: _clear() sweeps the
    # persistent-RDD registry between timed runs, which would destroy
    # checkpoint blocks and fail the next read
    work = tempfile.mkdtemp(prefix="tr8_")
    _zipf_corpus(spark, n_docs=20_000, doc_len=80, vocab=30_000).write.mode(
        "overwrite"
    ).parquet(f"{work}/docs.parquet")
    docs = spark.read.parquet(f"{work}/docs.parquet")

    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    adj = toks.select(
        F.col("tok").alias("w1"), F.lead("tok").over(w_doc).alias("w2")
    ).where(F.col("w2").isNotNull() & (F.col("w1") != F.col("w2")))
    upper = (
        adj.select(
            F.least("w1", "w2").alias("src"),
            F.greatest("w1", "w2").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    upper.unionByName(
        upper.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).write.mode("overwrite").parquet(f"{work}/edges.parquet")
    edges = spark.read.parquet(f"{work}/edges.parquet")

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.max("d").alias("max_deg"),
        F.expr("percentile_approx(d, 0.5)").alias("med_deg"),
        F.sum("d").alias("edges"),
    ).first()
    print(
        f"graph: {stats['nodes']} nodes, {stats['edges']} directed edges, "
        f"max degree {stats['max_deg']}, median {stats['med_deg']}"
    )

    _clear(spark)
    t_plain = _timed(lambda: pagerank(edges, weight="w", iters=5).count())
    _clear(spark)
    t_hot = _timed(
        lambda: pagerank(
            edges, weight="w", iters=5, hot_degree_cap=256
        ).count()
    )
    print("\n| plan | wall (5 rounds) |")
    print("|---|---|")
    print(f"| shipped (single exchange) | {t_plain} |")
    print(f"| hot-key split (cap=256) | {t_hot} |")

    a = {
        r["node"]: r["pr"]
        for r in pagerank(edges, weight="w", iters=5).collect()
    }
    b = {
        r["node"]: r["pr"]
        for r in pagerank(
            edges, weight="w", iters=5, hot_degree_cap=256
        ).collect()
    }
    assert a == b, "hot-key split changed results"
    print(f"\nresults identical over {len(a)} nodes")
    shutil.rmtree(work, ignore_errors=True)


def dsir(spark) -> None:
    """DSIR weight/resample walls on x1/x3/x10 doc-shifted replicas
    of the sf0.1 documents table — the estimator is corpus-linear by
    construction (one explode, one B-row aggregate, one broadcast
    join-back); this measures it."""
    from fabric_claims_spark.queries import load_all_queries

    reg = load_all_queries()
    print("\n### DSIR family, x1/x3/x10 sf0.1-documents replicas\n")
    print("| scale | rows | docs_dsir_weights | docs_dsir_resample |")
    print("|---|---|---|---|")
    base = spark.read.parquet(f"{SF01}/documents.parquet")
    for copies in (1, 3, 10):
        work = tempfile.mkdtemp(prefix=f"dsir8_x{copies}_")
        try:
            c = spark.range(copies).select(F.col("id").alias("_c"))
            base.crossJoin(c).select(
                (F.col("doc_id") + F.col("_c") * F.lit(10**9)).alias(
                    "doc_id"
                ),
                "text",
                "lang",
                "source",
                "n_chars",
            ).write.mode("overwrite").parquet(f"{work}/documents.parquet")
            rows = spark.read.parquet(f"{work}/documents.parquet").count()
            walls = []
            for q in ("docs_dsir_weights", "docs_dsir_resample"):
                _clear(spark)
                walls.append(_timed(lambda: reg[q].fn(spark, work).count()))
            print(f"| x{copies} | {rows} | {walls[0]} | {walls[1]} |")
        finally:
            shutil.rmtree(work, ignore_errors=True)


def semdedup(spark) -> None:
    """SemDeDup's k-regime claim, measured (SCALING r5/r7 prose: the
    pair space is Σ C(|cluster|,2) — a k-th of all-pairs — and 'the
    production lever is k'). On x1/x3/x10 vec-shifted replicas of the
    sf0.1 embeddings table: with k FIXED at 8 the within-cluster pair
    space grows ~quadratically (clusters get 10x denser); with k
    scaled ∝ corpus (the paper's regime) cluster size stays ~constant
    and the pair pass stays ~linear. Single-probe pair pass, cosine
    >= 0.3 drop rule, survivors counted."""
    from fabric_claims_spark.extensions.similarity import (
        _lloyd_assign,
        as_double_array,
        dot,
        kmeans_centroids,
    )

    print("\n### SemDeDup pair pass: fixed k vs corpus-scaled k\n")
    print(
        "| scale | vectors | k=8 pairs | k=8 drops | k=8 wall | k∝n |"
        " k∝n pairs | k∝n drops | k∝n wall |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    base = spark.read.parquet(f"{SF01}/embeddings.parquet")
    for copies in (1, 3, 10):
        # parquet round-trip, not localCheckpoint: _clear() sweeps the
        # persistent-RDD registry between timed runs
        work = tempfile.mkdtemp(prefix=f"sd8_x{copies}_")
        try:
            c = spark.range(copies).select(F.col("id").alias("_c"))
            base.crossJoin(c).select(
                (F.col("vec_id") + F.col("_c") * F.lit(10**7)).alias(
                    "vec_id"
                ),
                "embedding",
            ).write.mode("overwrite").parquet(f"{work}/embeddings.parquet")
            emb = spark.read.parquet(f"{work}/embeddings.parquet")
            n_vec = emb.count()
            row = [f"| x{copies} | {n_vec} "]
            for ki, k in enumerate((8, 8 * copies)):
                _clear(spark)
                t0 = time.time()
                cents = kmeans_centroids(emb, k=k, iters=3)
                ev = emb.select(
                    "vec_id", as_double_array("embedding").alias("v")
                )
                asg = _lloyd_assign(ev, cents).withColumn(
                    "nrm", F.sqrt(dot(F.col("v"), F.col("v")))
                )
                a = asg.select(
                    F.col("cluster").alias("ca"),
                    F.col("vec_id").alias("ia"),
                    F.col("v").alias("va"),
                    F.col("nrm").alias("na"),
                )
                b = asg.select(
                    F.col("cluster").alias("cb"),
                    F.col("vec_id").alias("ib"),
                    F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"),
                )
                pairs = a.join(
                    b,
                    (F.col("ca") == F.col("cb")) & (F.col("ia") < F.col("ib")),
                )
                cos = dot(F.col("va"), F.col("vb")) / (
                    F.col("na") * F.col("nb")
                )
                stats = pairs.agg(
                    F.count(F.lit(1)).alias("p"),
                    F.sum(
                        F.when(F.round(cos, 6) >= 0.3, 1).otherwise(0)
                    ).alias("drops"),
                ).first()
                wall = round(time.time() - t0, 2)
                if ki == 0:
                    row.append(f"| {stats['p']} | {stats['drops']} | {wall} ")
                else:
                    row.append(
                        f"| {k} | {stats['p']} | {stats['drops']} | {wall} |"
                    )
            print("".join(row))
        finally:
            shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    which = set(sys.argv[1:]) or {"serving", "behavioral", "textrank", "dsir"}
    spark = get_spark("scale-round8")
    spark.sparkContext.setLogLevel("ERROR")
    if "serving" in which:
        serving(spark)
    if "behavioral" in which:
        behavioral(spark)
    if "textrank" in which:
        textrank(spark)
    if "dsir" in which:
        dsir(spark)
    if "semdedup" in which:
        semdedup(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
