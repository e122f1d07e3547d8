"""Round-10 scale evidence (SCALING.md), three sections:

1. ivf_crossover — maintenance vs REBUILD for the stored IVF index
   (VERDICT r9 item 2): a quantizer trained on the initial corpus
   goes stale as drifted increments fold in at O(batch·k) apply cost.
   Measures, per increments-folded checkpoint: bucket-assignment skew
   (max/mean bucket population) and ANN recall@10 for queries drawn
   from the NEWEST (most drifted) increment, probing with the STALE
   quantizer — then the same after ``rebuild_ivf_index`` retrains.
   The crossover: when recall drift exceeds tolerance, one rebuild
   (wall reported) buys back what incremental folds cannot.
2. compaction — serving-index read-side degradation vs increment
   count (VERDICT r9 item 6): the data tables accumulate one
   token-stamped parquet append per increment; measures reader wall
   at 1/20/100 increments of a FIXED total corpus, then the effect of
   ``compact_index_table`` (single-version rewrite under the same
   commit protocol).
3. decon_skew — hot-gram candidate blowup in decontamination
   (VERDICT r9 item 5): a boilerplate 8-gram shared by every eval doc
   and a large train slice makes the gram equi-join quadratic in the
   hot key; measures join-candidate counts and wall with and without
   the per-gram document-frequency cap.

Usage: python tools/scale_round10.py [ivf_crossover|compaction|decon_skew ...]
(no args = all). Prints markdown tables for SCALING.md.

Measurement discipline (memory: scale tools): prebuilt frames are
parquet-round-tripped via a temp dir, never localCheckpoint'd —
``_clear`` sweeps the persistent-RDD registry between timed runs and
would destroy checkpoint blocks.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

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


# -- 1. IVF maintenance vs rebuild crossover ---------------------------------


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cos(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _recall_at10(stored, cents_df, queries, nprobe: int = 4):
    """(mean recall@10, mean probe candidate share) over the query
    frame (qid, qv): IVF probe with the given quantizer vs
    brute-force cosine over the same stored corpus. Candidate share =
    the fraction of the corpus the probe actually scans — the number
    a hot (skewed) bucket inflates, i.e. the real per-query cost at
    scale. One windowed pass each — no per-query driver loop."""
    q = F.broadcast(queries)
    # ground truth: brute force top-10 per query
    rn = F.row_number().over(
        Window.partitionBy("qid").orderBy(
            F.col("sim").desc(), F.col("vec_id").asc()
        )
    )
    truth = (
        stored.crossJoin(q)
        .select(
            "qid",
            "vec_id",
            F.round(_cos(F.col("ev"), F.col("qv")), 6).alias("sim"),
        )
        .withColumn("rn", rn)
        .where(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    # probe routing: nprobe nearest centroids per query
    crn = F.row_number().over(
        Window.partitionBy("qid").orderBy(
            F.col("csim").desc(), F.col("centroid_id").asc()
        )
    )
    probes = (
        F.broadcast(cents_df)
        .crossJoin(q)
        .select(
            "qid",
            "centroid_id",
            F.round(_cos(F.col("cv"), F.col("qv")), 6).alias("csim"),
        )
        .withColumn("rn", crn)
        .where(F.col("rn") <= nprobe)
        .select("qid", "centroid_id")
    )
    got = (
        stored.join(
            F.broadcast(probes),
            stored["assigned_centroid"] == probes["centroid_id"],
        )
        .join(q, "qid")
        .select(
            "qid",
            "vec_id",
            F.round(_cos(F.col("ev"), F.col("qv")), 6).alias("sim"),
        )
        .withColumn("rn", rn)
        .where(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    hit = truth.join(got, ["qid", "vec_id"], "left_semi").count()
    n_q = queries.count()
    n_corpus = stored.count()
    scanned = stored.join(
        F.broadcast(probes),
        stored["assigned_centroid"] == probes["centroid_id"],
    ).count()
    share = round(scanned / float(n_q * n_corpus), 3)
    return round(hit / (10.0 * n_q), 3), share


def ivf_crossover(spark) -> None:
    from fabric_claims_spark.extensions.similarity import kmeans_centroids
    from fabric_claims_spark.operators.serving_index import (
        apply_ivf_batch,
        read_ivf_centroids,
        read_ivf_index,
        rebuild_ivf_index,
    )
    from fabric_claims_spark.sources.merge import TableStore

    K, NPROBE, N_INC = 16, 4, 8
    base = (
        spark.read.parquet(f"{SF01}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "ev"
            ),
        )
    )
    work = tempfile.mkdtemp(prefix="ivf_xover_")
    try:
        # initial corpus: 10 lightly-perturbed copies (20k vectors) —
        # parquet-round-tripped, never checkpointed
        copies = spark.range(10).select(F.col("id").alias("c"))
        init = base.crossJoin(copies).select(
            (F.col("vec_id") + F.col("c") * 100000).alias("vec_id"),
            F.transform(
                "ev", lambda x: x + F.col("c").cast("double") * 0.001
            ).alias("ev"),
        )
        init.write.parquet(f"{work}/init")
        init = spark.read.parquet(f"{work}/init")

        # drifted increments: one copy each, dims 1..32 progressively
        # rescaled — the distribution walks away from the quantizer
        for i in range(1, N_INC + 1):
            drift = base.select(
                (F.col("vec_id") + F.lit(i) * 1000000).alias("vec_id"),
                F.transform(
                    "ev",
                    lambda x, j: F.when(
                        j < 32, x * (1.0 + 0.2 * i)
                    ).otherwise(x + 0.05 * i),
                ).alias("ev"),
            )
            drift.write.parquet(f"{work}/inc{i}")

        store = TableStore(spark, f"{work}/store")
        cents = kmeans_centroids(
            init, k=K, iters=2, id_col="vec_id", vec_col="ev"
        )
        cent_df = spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in cents],
            "centroid_id long, cv array<double>",
        )
        t_init = _timed(
            lambda: apply_ivf_batch(store, init, 0, cent_df, vec_col="ev")
        )
        print(f"initial corpus 20000 vecs, k={K} quantizer trained on it; "
              f"apply(init) {t_init}s")
        print()
        print("| increments folded | corpus | apply wall (s) | "
              "skew max/mean | recall@10 (drifted queries) | "
              "probe candidate share (ideal nprobe/k = 0.25) |")
        print("|---|---|---|---|---|---|")
        applies = []
        for i in range(1, N_INC + 1):
            inc = spark.read.parquet(f"{work}/inc{i}")
            _clear(spark)
            applies.append(
                _timed(
                    lambda inc=inc, i=i: apply_ivf_batch(
                        store, inc, i, cent_df, vec_col="ev"
                    )
                )
            )
            if i in (1, 2, 4, 8):
                stored = read_ivf_index(store)
                n = stored.count()
                buckets = (
                    stored.groupBy("assigned_centroid").count().collect()
                )
                mx = max(r["count"] for r in buckets)
                skew = round(mx / (n / float(K)), 2)
                queries = (
                    spark.read.parquet(f"{work}/inc{i}")
                    .orderBy("vec_id")
                    .limit(10)
                    .select(F.col("vec_id").alias("qid"),
                            F.col("ev").alias("qv"))
                )
                rec, share = _recall_at10(stored, cent_df, queries, NPROBE)
                print(
                    f"| {i} | {n} | {applies[-1]} | {skew} | {rec} "
                    f"| {share} |"
                )
        # the rebuild: retrain on committed vectors, reassign, swap
        _clear(spark)
        t_rb = _timed(
            lambda: rebuild_ivf_index(store, k=K, iters=2)
        )
        stored = read_ivf_index(store)
        n = stored.count()
        buckets = stored.groupBy("assigned_centroid").count().collect()
        mx = max(r["count"] for r in buckets)
        skew = round(mx / (n / float(K)), 2)
        new_cents = read_ivf_centroids(store).select("centroid_id", "cv")
        queries = (
            spark.read.parquet(f"{work}/inc{N_INC}")
            .orderBy("vec_id")
            .limit(10)
            .select(F.col("vec_id").alias("qid"), F.col("ev").alias("qv"))
        )
        rec, share = _recall_at10(stored, new_cents, queries, NPROBE)
        print(
            f"| REBUILD after {N_INC} | {n} | {t_rb} | {skew} | {rec} "
            f"| {share} |"
        )
        print()
        print(
            f"cumulative apply wall {round(sum(applies), 1)}s over "
            f"{N_INC} increments vs one rebuild {t_rb}s"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# -- 2. serving-index compaction ----------------------------------------------


def compaction(spark) -> None:
    from fabric_claims_spark.operators.serving_index import (
        LEX_COMMITS,
        LEX_POSTINGS,
        apply_lexical_batch,
        compact_index_table,
        read_lexical_index,
    )
    from fabric_claims_spark.sources.merge import TableStore

    docs = (
        spark.read.parquet(f"{SF01}/documents.parquet")
        .select("doc_id", "text")
    )
    total = docs.count()
    print(f"fixed corpus {total} docs folded as 1 / 20 / 100 increments; "
          "reader wall = postings count + a term lookup")
    print()
    print("| increments | files in postings table | read wall (s) | "
          "after compact() wall (s) | compact wall (s) |")
    print("|---|---|---|---|---|")
    for n_inc in (1, 20, 100):
        work = tempfile.mkdtemp(prefix=f"lex_comp_{n_inc}_")
        try:
            store = TableStore(spark, work)
            for b in range(n_inc):
                batch = docs.where(
                    F.pmod("doc_id", F.lit(n_inc)) == b
                )
                apply_lexical_batch(store, batch, b)

            def _read():
                td, df_, dl = read_lexical_index(store)
                td.count()
                df_.where(F.col("term") == "the").count()

            import glob as _g

            files = len(
                _g.glob(f"{store._dir(LEX_POSTINGS)}/*/*.parquet")
            )
            _clear(spark)
            t_read = _timed(_read)
            t_comp = _timed(
                lambda: compact_index_table(
                    store, LEX_POSTINGS, LEX_COMMITS
                )
            )
            _clear(spark)
            t_read2 = _timed(_read)
            print(
                f"| {n_inc} | {files} | {t_read} | {t_read2} | {t_comp} |"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


# -- 3. decontamination hot-gram skew ------------------------------------------


def decon_skew(spark) -> None:
    from fabric_claims_spark.extensions.dedup import word_shingles
    from fabric_claims_spark.queries.text_docs import _DECON_GRAM

    def _grams(d):
        return d.where(F.length(F.trim(F.col("text"))) > 0).select(
            "doc_id",
            F.explode(
                F.array_distinct(word_shingles(F.col("text"), _DECON_GRAM))
            ).alias("gram"),
        )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "doc_id", "text"
    )
    # boilerplate-heavy fixture: every doc gets the same license
    # header prepended, so its 8-grams are shared corpus-wide
    boiler = (
        "licensed under the apache license version two point zero "
        "you may not use this file except in compliance"
    )
    heavy = docs.select(
        "doc_id", F.concat(F.lit(boiler + " "), F.col("text")).alias("text")
    )
    eval_docs = heavy.where(F.pmod("doc_id", F.lit(10)) == 0)
    train = heavy.where(F.pmod("doc_id", F.lit(10)) != 0)
    tg = _grams(train)
    eg = _grams(eval_docs).select("gram").distinct()
    print(
        f"boilerplate fixture: {train.count()} train docs / "
        f"{eval_docs.count()} eval docs, shared {_DECON_GRAM}-gram header"
    )
    print()
    print("| variant | join candidates | contaminated docs | wall (s) |")
    print("|---|---|---|---|")
    for cap in (None, 50):
        if cap is None:
            eg_v = eg
            label = "uncapped"
        else:
            # document-frequency cutoff on the EVAL gram table: a gram
            # matching more than `cap` train docs is boilerplate, not
            # contamination evidence — drop it from the probe set
            df_t = tg.groupBy("gram").agg(
                F.countDistinct("doc_id").alias("tdf")
            )
            eg_v = (
                eg.join(df_t, "gram", "left")
                .where(F.coalesce(F.col("tdf"), F.lit(0)) <= cap)
                .select("gram")
            )
            label = f"df-capped (tdf<={cap})"
        cand = tg.join(F.broadcast(eg_v), "gram").count()
        _clear(spark)
        t = _timed(
            lambda eg_v=eg_v: tg.join(F.broadcast(eg_v), "gram")
            .select("doc_id")
            .distinct()
            .count()
        )
        contaminated = (
            tg.join(F.broadcast(eg_v), "gram")
            .select("doc_id")
            .distinct()
            .count()
        )
        print(f"| {label} | {cand} | {contaminated} | {t} |")


SECTIONS = {
    "ivf_crossover": ivf_crossover,
    "compaction": compaction,
    "decon_skew": decon_skew,
}


def main() -> None:
    names = sys.argv[1:] or list(SECTIONS)
    spark = get_spark("scale-round10")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        print(f"\n## {n}\n")
        SECTIONS[n](spark)


if __name__ == "__main__":
    main()
