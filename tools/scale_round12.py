"""Round-12 scale evidence (SCALING.md), three sections:

1. erasure_apply — delete-increment cost vs corpus size: the claim
   is O(deleted docs) + one vocabulary-sized rollup rewrite, never a
   corpus re-scan that GROWS with history. Measures
   ``apply_lexical_deletes`` wall at sf0.01 vs sf0.1 (10× corpus)
   for a fixed-FRACTION delete set, plus the tombstone-only IVF
   delete at both scales.
2. erasure_read — masked-read overhead and the fold's payback:
   reader wall for the lexical consumer (full df + postings rollup)
   with (a) no deletes, (b) tombstone-masked deletes (anti-join on
   the read path), (c) after ``fold_lexical_deletes`` (physical).
   The anti-join must price near zero (broadcast tombstones) and the
   fold must return the reader to (a)'s shape.
3. erasure_probe — the IVF probe with live tombstones vs after a
   rebuild folds them: per-probe wall and result parity.

Usage: python tools/scale_round12.py [erasure_apply|erasure_read|erasure_probe ...]
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

from fabric_claims_spark.session import get_spark  # noqa: E402
from fabric_claims_spark.sources.merge import TableStore  # noqa: E402
from fabric_claims_spark.sources.parquet import load_table  # noqa: E402

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


def _lex_store(spark, sf_dir: str, work: str):
    from fabric_claims_spark.operators.serving_index import (
        apply_lexical_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = TableStore(spark, work)
    for b in range(3):
        apply_lexical_batch(
            store, docs.where(F.pmod("doc_id", F.lit(3)) == b), b
        )
    return store, docs


def _read_consumer(store) -> int:
    """The lexical consumer read: materialize df + postings-derived
    df + doclen count (the lexical_index_deletes read shape)."""
    from fabric_claims_spark.operators.serving_index import (
        read_lexical_index,
    )

    td, dfc, dn = read_lexical_index(store)
    fp = td.groupBy("term").agg(F.count(F.lit(1)).alias("fp"))
    return (
        dfc.join(fp, "term").count()
        + dn.select(F.count(F.lit(1))).head()[0]
    )


def erasure_apply() -> None:
    from fabric_claims_spark.operators.serving_index import (
        apply_ivf_batch,
        apply_ivf_deletes,
        apply_lexical_deletes,
    )

    spark = get_spark("scale12-apply")
    print("\n### erasure_apply — delete cost vs corpus size\n")
    print("| sf | docs | deleted | lex apply_deletes s | ivf apply_deletes s |")
    print("|---|---|---|---|---|")
    for sf_dir, sf in ((SF001, "0.01"), (SF01, "0.1")):
        work = tempfile.mkdtemp(prefix="s12a_")
        try:
            store, docs = _lex_store(spark, sf_dir, work)
            kill = docs.where(F.pmod("doc_id", F.lit(7)) == 3).select(
                "doc_id"
            )
            n, nk = docs.count(), kill.count()
            _clear(spark)
            t_lex = _timed(lambda: apply_lexical_deletes(store, kill, 3))
            # IVF: single apply + tombstone delete
            emb = load_table(spark, sf_dir, "embeddings")
            seed = emb.where(F.col("vec_id") < 8).select(
                F.col("vec_id").alias("centroid_id"),
                F.transform(
                    "embedding", lambda x: x.cast("double")
                ).alias("cv"),
            )
            vstore = TableStore(spark, work + "_v")
            apply_ivf_batch(vstore, emb, 0, seed)
            vkill = emb.where(F.pmod("vec_id", F.lit(7)) == 3).select(
                "vec_id"
            )
            _clear(spark)
            t_ivf = _timed(lambda: apply_ivf_deletes(vstore, vkill, 1))
            print(f"| {sf} | {n} | {nk} | {t_lex} | {t_ivf} |")
            shutil.rmtree(work + "_v", ignore_errors=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)
            shutil.rmtree(work + "_v", ignore_errors=True)


def erasure_read() -> None:
    from fabric_claims_spark.operators.serving_index import (
        apply_lexical_deletes,
        fold_lexical_deletes,
    )

    spark = get_spark("scale12-read")
    print("\n### erasure_read — masked overhead and fold payback (sf0.1)\n")
    work = tempfile.mkdtemp(prefix="s12r_")
    try:
        store, docs = _lex_store(spark, SF01, work)
        _clear(spark)
        t_clean = min(_timed(lambda: _read_consumer(store)) for _ in (0, 1))
        kill = docs.where(F.pmod("doc_id", F.lit(7)) == 3).select("doc_id")
        apply_lexical_deletes(store, kill, 3)
        _clear(spark)
        t_masked = min(_timed(lambda: _read_consumer(store)) for _ in (0, 1))
        t_fold = _timed(lambda: fold_lexical_deletes(store))
        _clear(spark)
        t_folded = min(_timed(lambda: _read_consumer(store)) for _ in (0, 1))
        print("| state | consumer read s |")
        print("|---|---|")
        print(f"| no deletes | {t_clean} |")
        print(f"| tombstone-masked | {t_masked} |")
        print(f"| after fold (fold itself {t_fold} s) | {t_folded} |")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def erasure_probe() -> None:
    from fabric_claims_spark.operators.serving_index import (
        apply_ivf_batch,
        apply_ivf_deletes,
        read_ivf_index,
        rebuild_ivf_index,
    )

    spark = get_spark("scale12-probe")
    print("\n### erasure_probe — IVF probe with tombstones vs after rebuild (sf0.1)\n")
    emb = load_table(spark, SF01, "embeddings")
    seed = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    work = tempfile.mkdtemp(prefix="s12p_")
    try:
        store = TableStore(spark, work)
        apply_ivf_batch(store, emb, 0, seed)

        def probe() -> int:
            # bucket-filtered read + exact re-score (the served shape)
            live = read_ivf_index(store).where(
                F.col("assigned_centroid").isin(0, 1)
            )
            return live.count()

        _clear(spark)
        t0 = min(_timed(probe) for _ in (0, 1))
        kill = emb.where(F.pmod("vec_id", F.lit(7)) == 3).select("vec_id")
        apply_ivf_deletes(store, kill, 1)
        _clear(spark)
        t1 = min(_timed(probe) for _ in (0, 1))
        t_rb = _timed(lambda: rebuild_ivf_index(store, k=8, iters=2))
        _clear(spark)
        t2 = min(_timed(probe) for _ in (0, 1))
        print("| state | probe read s |")
        print("|---|---|")
        print(f"| no deletes | {t0} |")
        print(f"| tombstone-masked | {t1} |")
        print(f"| after rebuild (rebuild {t_rb} s) | {t2} |")
    finally:
        shutil.rmtree(work, ignore_errors=True)


SECTIONS = {
    "erasure_apply": erasure_apply,
    "erasure_read": erasure_read,
    "erasure_probe": erasure_probe,
}

if __name__ == "__main__":
    picks = sys.argv[1:] or list(SECTIONS)
    for p in picks:
        SECTIONS[p]()
