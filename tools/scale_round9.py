"""Round-9 scale evidence (SCALING.md), two sections:

1. kassign — the scaled-k assignment fix (VERDICT r8 item 3): wall of
   one full-corpus Lloyd assignment pass over the x10 sf0.1
   embeddings replica at k=80 and k=800, literal expression tree vs
   the broadcast-centroid-table join (lloyd_assign strategy flag).
   The literal plan embeds k*dim literal subtrees (n-independent
   compile cost, the residual the r8 k-regime table isolated); the
   join plan is O(1) in k. Outputs asserted same-cardinality; exact
   equality is pinned by tests/test_extensions.py.
2. serving_growth — apply-cost vs stored-corpus size (VERDICT r8
   item 4): apply_lexical_batch / apply_lsh_batch wall for a FIXED
   500-doc batch against a x1/x3/x10 stored corpus (replicas made
   textually distinct by per-copy token scrambling, so the batch does
   not trivially near-dup against every copy), plus
   vacuum_uncommitted wall and commit-table size. Claim under test:
   apply is O(batch) with the stored corpus behind equi-joins only.

Usage: python tools/scale_round9.py [kassign|serving_growth ...]
(no args = both). Prints markdown tables for SCALING.md.
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
SF001 = "/root/testdata/sf0.01"


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


# -- 1. scaled-k assignment: literal expression tree vs broadcast join --------


def kassign(spark) -> None:
    from fabric_claims_spark.extensions.similarity import (
        as_double_array,
        kmeans_centroids,
        lloyd_assign,
    )

    print("\n### Scaled-k assignment: literal tree vs centroid-table join\n")
    print("(x10 sf0.1 embeddings replica; seeds only — the pass under")
    print("test is the full-corpus assignment, the linear term every")
    print("Lloyd iteration and every IVF build repeats)\n")
    print(
        "| scale | vectors | k | literal wall | join wall | arrow wall |"
    )
    print("|---|---|---|---|---|---|")
    base = spark.read.parquet(f"{SF01}/embeddings.parquet")
    work = tempfile.mkdtemp(prefix="kas9_")
    try:
        # x1 rows isolate the literal path's n-INDEPENDENT term (plan
        # build/codegen of k*dim literal subtrees): if the x1 wall is
        # close to the x10 wall, the cost is the plan, not the data.
        for copies in (1, 10):
            c = spark.range(copies).select(F.col("id").alias("_c"))
            base.crossJoin(c).select(
                (F.col("vec_id") + F.col("_c") * F.lit(10**7)).alias(
                    "vec_id"
                ),
                "embedding",
            ).write.mode("overwrite").parquet(f"{work}/embeddings.parquet")
            emb = spark.read.parquet(f"{work}/embeddings.parquet")
            n_vec = emb.count()
            ev = emb.select(
                "vec_id", as_double_array("embedding").alias("v")
            )
            for k in (80, 800):
                cents = kmeans_centroids(emb, k=k, iters=0)
                walls = {}
                counts = {}
                for strat in ("literal", "join", "arrow"):
                    _clear(spark)
                    t0 = time.time()
                    counts[strat] = lloyd_assign(
                        ev, cents, strategy=strat
                    ).count()
                    walls[strat] = round(time.time() - t0, 2)
                assert len(set(counts.values())) == 1 and (
                    counts["literal"] == n_vec
                ), counts
                print(
                    f"| x{copies} | {n_vec} | {k} | {walls['literal']} |"
                    f" {walls['join']} | {walls['arrow']} |"
                )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# -- 2. serving-index apply cost vs stored-corpus size ------------------------


def _scrambled_replica(spark, copies: int, out_dir: str) -> int:
    """copies textually-DISTINCT copies of the sf0.1 documents table:
    copy 0 is verbatim; copy c>0 md5-scrambles every token with the
    copy index, so within-copy similarity structure is preserved but
    no document near-dups across copies (a real corpus-growth
    stand-in, not a dup explosion)."""
    d = spark.read.parquet(f"{SF01}/documents.parquet")
    c = spark.range(copies).select(F.col("id").alias("_c"))
    scrambled = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda t: F.substring(
                F.md5(F.concat(t, F.col("_c").cast("string"))), 1, 8
            ),
        ),
        " ",
    )
    d.crossJoin(c).select(
        (F.col("doc_id") + F.col("_c") * F.lit(10**7)).alias("doc_id"),
        F.when(F.col("_c") == 0, F.col("text"))
        .otherwise(scrambled)
        .alias("text"),
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    return spark.read.parquet(f"{out_dir}/documents.parquet").count()


def serving_growth(spark) -> None:
    from fabric_claims_spark.operators.serving_index import (
        LEX_COMMITS,
        LEX_POSTINGS,
        LSH_COMMITS,
        LSH_PAIRS,
        apply_lexical_batch,
        apply_lsh_batch,
        vacuum_uncommitted,
    )
    from fabric_claims_spark.sources.merge import TableStore

    # the FIXED batch: the 500 sf0.01 docs, ids shifted clear of any
    # replica range, tokens scrambled with a batch salt so the batch
    # is textually new at every scale
    batch = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .select(
            (F.col("doc_id") + F.lit(10**9)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.trim(F.col("text")), r"\s+"),
                    lambda t: F.substring(
                        F.md5(F.concat(t, F.lit("batch9"))), 1, 8
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )

    print("\n### Serving-index maintenance vs stored-corpus size\n")
    print("(fixed 500-doc batch applied AFTER a x1/x3/x10 stored corpus;")
    print("apply claim: O(batch), stored corpus behind equi-joins only)\n")
    print(
        "| scale | stored docs | build (once) | lex apply | lsh apply |"
        " vacuum | commit rows |"
    )
    print("|---|---|---|---|---|---|---|")
    for copies in (1, 3, 10):
        work = tempfile.mkdtemp(prefix=f"sg9_x{copies}_")
        try:
            n_docs = _scrambled_replica(spark, copies, work)
            corpus = spark.read.parquet(f"{work}/documents.parquet")
            store = TableStore(spark, f"{work}/store")
            _clear(spark)
            b = _timed(
                lambda: (
                    apply_lexical_batch(store, corpus, 0),
                    apply_lsh_batch(store, corpus, 0, hasher="md5"),
                )
            )
            _clear(spark)
            lex_w = _timed(lambda: apply_lexical_batch(store, batch, 1))
            _clear(spark)
            lsh_w = _timed(
                lambda: apply_lsh_batch(store, batch, 1, hasher="md5")
            )
            _clear(spark)
            vac_w = _timed(
                lambda: (
                    vacuum_uncommitted(store, LEX_POSTINGS, LEX_COMMITS),
                    vacuum_uncommitted(store, LSH_PAIRS, LSH_COMMITS),
                )
            )
            commits = (
                store.read(LEX_COMMITS).count()
                + store.read(LSH_COMMITS).count()
            )
            print(
                f"| x{copies} | {n_docs} | {b} | {lex_w} | {lsh_w} |"
                f" {vac_w} | {commits} |"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    which = set(sys.argv[1:]) or {"kassign", "serving_growth"}
    spark = get_spark("scale-round9")
    spark.sparkContext.setLogLevel("ERROR")
    if "kassign" in which:
        kassign(spark)
    if "serving_growth" in which:
        serving_growth(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
