"""BPE trainer scale evidence (extensions/bpe.py).

Two axes, one honesty check:

1. ``corpus``: train cost across sf0.001/0.01/0.1 (corpus ×100, vocab
   CONSTANT at 31 words) — after the one word_frequencies scan, merge
   rounds run on the vocab table, so wall time should be ~flat.
2. ``vocab``: train cost across synthetic vocabularies of 1k/10k/100k
   distinct words (hex words from md5, deterministic freqs) — the axis
   that actually grows on a real corpus. Rounds are vocab-sized
   groupBys; wall per round should grow far slower than vocab.
3. ``lineage``: the documented plan-blowup claim — per-round wall with
   the production localCheckpoint discipline vs the same loop with
   lazy lineage (capped at a few rounds; the lazy chain's analysis
   cost grows superlinearly).

Usage: python tools/scale_bpe.py [corpus|vocab|lineage|all]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from fabric_claims_spark.extensions.bpe import (  # noqa: E402
    _merge_fold,
    bpe_train,
    bpe_train_words,
    bpe_train_words_batched,
    init_symbols,
    pair_counts,
    word_frequencies,
)
from fabric_claims_spark.session import get_spark  # noqa: E402
from fabric_claims_spark.sources.parquet import load_table  # noqa: E402

N_MERGES = 12


def bench_corpus(spark) -> None:
    print("== train cost vs corpus size (vocab constant) ==")
    for sf in ("0.001", "0.01", "0.1"):
        d = load_table(spark, f"/root/testdata/sf{sf}", "documents")
        t0 = time.time()
        merges, _ = bpe_train(d, N_MERGES)
        print(
            f"sf{sf}: {time.time() - t0:6.1f} s for {len(merges)} merges "
            f"(top merge {merges[0][3]!r} cnt={merges[0][4]})"
        )


def _synth_words(spark, n: int):
    """Deterministic synthetic vocabulary: hex words (8-24 chars),
    freq cycling 1..100."""
    return spark.range(n).select(
        F.substring(
            F.md5(F.col("id").cast("string")),
            1,
            (F.col("id") % 17 + 8).cast("int"),
        ).alias("word"),
        (F.col("id") % 100 + 1).cast("long").alias("freq"),
    )


def bench_vocab(spark) -> None:
    print("== train cost vs vocabulary size (the real growth axis) ==")
    for n in (1_000, 10_000, 100_000):
        w = _synth_words(spark, n)
        t0 = time.time()
        merges, _ = bpe_train_words(w, N_MERGES)
        dt = time.time() - t0
        print(
            f"vocab {n:>7,}: {dt:6.1f} s total, {dt / N_MERGES:5.2f} s/round "
            f"(top merge {merges[0][3]!r} cnt={merges[0][4]})"
        )


def bench_lineage(spark) -> None:
    print("== localCheckpoint discipline vs lazy lineage ==")
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    from fabric_claims_spark.extensions.bpe import word_frequencies

    base = word_frequencies(d)
    # production path: checkpoint per round
    t0 = time.time()
    bpe_train_words(base, N_MERGES)
    print(f"checkpointed, {N_MERGES} rounds: {time.time() - t0:6.1f} s")
    # lazy path: identical loop, no checkpoints — every collect
    # re-analyzes the whole nested-fold chain
    words = init_symbols(base)
    t0 = time.time()
    for rank in range(1, N_MERGES + 1):
        round_t = time.time()
        top = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), "p1", "p2")
            .limit(1)
            .collect()
        )
        b = top[0]
        words = words.select(
            "word",
            "freq",
            F.split(_merge_fold(b.p1, b.p2, b.p1 + b.p2), " ").alias("syms"),
        )
        dt = time.time() - round_t
        print(f"  lazy round {rank}: {dt:6.1f} s")
        if time.time() - t0 > 300:
            print("  (lazy path aborted at 300 s — blowup demonstrated)")
            return
    print(f"lazy, {N_MERGES} rounds: {time.time() - t0:6.1f} s")


def bench_batched(spark) -> None:
    """Round 11 (VERDICT r10 item 3): how much does compatible-merge
    batching compress the driver round count at vocab scale? Train
    n_merges on the 100k synthetic vocabulary, sequential vs batched,
    and report pair-count rounds + wall. The merge lists must agree
    bit-exactly (asserted)."""
    print("== batched compatible merges vs sequential (100k vocab) ==")
    import fabric_claims_spark.extensions.bpe as bpe_mod

    w = _synth_words(spark, 100_000).localCheckpoint()
    for n_merges in (32, 128):
        t0 = time.time()
        seq, _ = bpe_train_words(w, n_merges)
        t_seq = time.time() - t0
        calls = {"n": 0}
        real = bpe_mod.pair_counts

        def counting(words):
            calls["n"] += 1
            return real(words)

        bpe_mod.pair_counts = counting
        try:
            t0 = time.time()
            bat, _ = bpe_train_words_batched(w, n_merges, max_batch=16)
            t_bat = time.time() - t0
        finally:
            bpe_mod.pair_counts = real
        assert bat == seq, "batched trainer diverged from sequential"
        print(
            f"n_merges {n_merges:>4}: sequential {t_seq:6.1f} s "
            f"({n_merges} rounds, {t_seq / n_merges:5.2f} s/merge) | "
            f"batched {t_bat:6.1f} s ({calls['n']} rounds, "
            f"{n_merges / calls['n']:4.1f} merges/round, "
            f"{t_bat / n_merges:5.2f} s/merge) — bit-equal"
        )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("scale-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("corpus", "all"):
        bench_corpus(spark)
    if which in ("vocab", "all"):
        bench_vocab(spark)
    if which in ("lineage", "all"):
        bench_lineage(spark)
    if which in ("batched", "all"):
        bench_batched(spark)
    if which in ("natural",):
        bench_natural(spark)




def bench_natural(spark) -> None:
    """Round 13 (VERDICT r12 item 5): the batched trainer measured on
    NATURAL-LANGUAGE text at production-shaped merge depths. The
    synthetic ``documents`` corpus is useless for this axis (31
    distinct words at every sf — probed) and the container ships no
    wordlist, so the corpus is the repository's own English prose:
    every .md and .py file read as text — real orthography, real
    Zipfian frequencies, the full a-z alphabet (the property the hex
    vocabulary lacks: frequent pairs spread over DISJOINT symbols).
    Reports rounds, merges/round, wall, and the incremental-pair-
    maintenance decision input: what fraction of the vocab each
    round's rewrite actually touches (the delta a maintained pair
    table would save re-aggregating)."""
    import glob
    import re

    print("== batched trainer on natural text (repo English prose) ==")
    texts = []
    for pat in ("/root/repo/*.md", "/root/repo/**/*.py"):
        for path in sorted(glob.glob(pat, recursive=True)):
            try:
                texts.append(open(path, encoding="utf-8").read())
            except OSError:
                continue
    blob = " ".join(texts).lower()
    # keep alphabetic words only — the natural-language vocabulary
    words = re.findall(r"[a-z]{2,}", blob)
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 2000:(i + 1) * 2000]))
         for i in range(len(words) // 2000)],
        "doc_id long, text string",
    )
    w = word_frequencies(docs).localCheckpoint()
    n_words = w.count()
    print(f"vocab: {n_words} distinct words from {len(words)} tokens")

    import fabric_claims_spark.extensions.bpe as bpe_mod

    for n_merges in (512, 1024, 2048):
        calls = {"n": 0}
        real = bpe_mod.pair_counts

        def counting(words):
            calls["n"] += 1
            return real(words)

        bpe_mod.pair_counts = counting
        try:
            t0 = time.time()
            merges, trained = bpe_mod.bpe_train_words_batched(
                w, n_merges, max_batch=16
            )
            t_bat = time.time() - t0
        finally:
            bpe_mod.pair_counts = real
        print(
            f"n_merges {n_merges:>5}: batched {t_bat:7.1f} s "
            f"({calls['n']} rounds, "
            f"{len(merges) / max(calls['n'], 1):4.1f} merges/round, "
            f"{t_bat / max(len(merges), 1):5.3f} s/merge)"
        )
        # incremental pair-count maintenance decision input: how much
        # of the vocab did the LAST batch of merges actually touch?
        # (a maintained pair table would re-aggregate only words
        # containing an accepted pair; the rest of the per-round wall
        # is fixed job overhead that maintenance cannot remove). A
        # word is "touched" if it contains any accepted merged symbol
        # from the final batch.
        last = merges[-min(16, len(merges)):]
        cond = None
        for _rank, _p1, _p2, merged_sym, _cnt in last:
            c = F.array_contains("syms", merged_sym)
            cond = c if cond is None else (cond | c)
        frac = trained.where(cond).count() / max(n_words, 1)
        print(
            f"   touched-vocab fraction (last {len(last)} merges): "
            f"{frac:.4f} — the re-aggregate share incremental pair "
            "maintenance would keep"
        )


if __name__ == "__main__":
    main()
