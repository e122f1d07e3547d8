"""Learned-BPE trainer/apply semantics (extensions/bpe.py).

The oracle gates (docs_bpe_train_merges / docs_bpe_tokenize_stats) pin
cross-engine parity on the real corpus; these tests pin the ALGORITHM
against an independent pure-Python reference implementing the classic
left-to-right scan merge (Sennrich et al. 2016) — including the
adversarial shapes where the common space-padded replace() trick
diverges (runs of a self-pair), and the OOV apply path the corpus
can't exercise (its vocabulary is shared across every source).
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from fabric_claims_spark.extensions.bpe import (
    WORD_MARKER,
    bpe_segment,
    bpe_train,
    word_frequencies,
)


@pytest.fixture(autouse=True)
def _release_checkpoints(spark):
    """The trainer keeps its LATEST vocab state checkpointed (it now
    releases superseded rounds itself — ADVICE r10); release the
    checkpoints each test leaves behind so the strict zero-storage
    assertions in test_caching.py (which runs later in the
    session-scoped Spark) see a clean slate. Snapshot-diff: unpersist
    only RDDs this test created, never caches owned by other session
    fixtures (ADVICE r10)."""
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keys())
    yield
    after = sc._jsc.getPersistentRDDs()
    for k in after.keys():
        if k not in before:
            after[k].unpersist()

# ---------------------------------------------------------------------------
# Pure-Python reference: classic scan-merge BPE.


def _ref_merge_word(syms: list[str], p1: str, p2: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
            out.append(p1 + p2)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(freqs: dict[str, int], n_merges: int):
    vocab = {w: [*w, WORD_MARKER] for w in freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freqs[w]
        if not counts:
            break
        # max count, then lexicographic (p1, p2) — the trainer's order
        (p1, p2), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, p1, p2, p1 + p2, cnt))
        vocab = {w: _ref_merge_word(s, p1, p2) for w, s in vocab.items()}
    return merges, vocab


def _ref_apply(word: str, merges) -> list[str]:
    syms = [*word, WORD_MARKER]
    for _, p1, p2, _m, _c in merges:
        syms = _ref_merge_word(syms, p1, p2)
    return syms


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def adversarial_corpus(spark):
    """Words chosen so replace()-style merging would diverge: runs of a
    repeated character (self-pair overlap) and alternating pairs whose
    occurrences share a boundary."""
    texts = [
        "aaaa aaa abab ababab",
        "aaaa abab banana banana",
        "aaa banana abab aaaa",
    ]
    return _docs(spark, texts)


def test_train_matches_reference_on_adversarial_runs(adversarial_corpus):
    freqs = {
        r.word: r.freq
        for r in word_frequencies(adversarial_corpus).collect()
    }
    got_merges, got_vocab = bpe_train(adversarial_corpus, n_merges=8)
    ref_merges, ref_vocab = _ref_train(freqs, n_merges=8)
    assert got_merges == ref_merges
    got = {r.word: list(r.syms) for r in got_vocab.collect()}
    assert got == ref_vocab


def test_segment_handles_oov_words(spark, adversarial_corpus):
    """Apply learned merges to words never seen in training — OOV words
    start as characters and pick up whatever merges fire, in rank
    order (the real tokenizer apply contract)."""
    merges, _ = bpe_train(adversarial_corpus, n_merges=8)
    oov = ["aab", "baba", "bananarama", "xyz", "a"]
    oov_df = spark.createDataFrame([(w, 1) for w in oov], ["word", "freq"])
    got = {r.word: list(r.syms) for r in bpe_segment(oov_df, merges).collect()}
    assert got == {w: _ref_apply(w, merges) for w in oov}


def test_segment_equals_train_final_state(spark, sf_dir):
    """bpe_segment(vocab, merges) must reproduce the trainer's final
    vocab exactly — the identity docs_bpe_tokenize_stats relies on when
    it joins segmented lengths back to the corpus."""
    from fabric_claims_spark.sources.parquet import load_table

    d = load_table(spark, sf_dir, "documents")
    merges, final_vocab = bpe_train(d, n_merges=6)
    seg = bpe_segment(word_frequencies(d), merges)
    got = {r.word: list(r.syms) for r in seg.collect()}
    want = {r.word: list(r.syms) for r in final_vocab.collect()}
    assert got == want


def test_train_stops_when_pairs_exhaust(spark):
    """A vocabulary that fully merges before the requested rounds stops
    early instead of emitting degenerate rows."""
    tiny = _docs(spark, ["ab ab ab"])
    merges, vocab = bpe_train(tiny, n_merges=10)
    # "ab_" fully merges in 2 rounds: (a,b) then (ab,_).
    assert [m[3] for m in merges] == ["ab", "ab_"]
    assert [list(r.syms) for r in vocab.collect()] == [["ab_"]]


# ---------------------------------------------------------------------------
# Batched compatible merges (round 11, VERDICT r10 item 3): the batched
# trainer must be BIT-EQUAL to the sequential one — merge table and
# final symbol arrays — while collecting once per batch.


def test_batched_train_bit_equals_sequential_adversarial(
    adversarial_corpus,
):
    """On the adversarial corpus (self-pair runs, shared-boundary
    alternations — exactly the shapes where naive batching diverges)
    the compatible-batch rule must reproduce the sequential trainer's
    merges and final vocab exactly, across batch caps including 1
    (degenerates to sequential) and larger-than-vocab."""
    from fabric_claims_spark.extensions.bpe import bpe_train_batched

    want_merges, want_vocab = bpe_train(adversarial_corpus, n_merges=8)
    want = {r.word: list(r.syms) for r in want_vocab.collect()}
    for cap in (1, 4, 16):
        got_merges, got_vocab = bpe_train_batched(
            adversarial_corpus, n_merges=8, max_batch=cap
        )
        assert got_merges == want_merges, cap
        got = {r.word: list(r.syms) for r in got_vocab.collect()}
        assert got == want, cap


def test_batched_train_bit_equals_sequential_corpus(spark, sf_dir):
    """Gate-fixture pin on the real corpus (the oracle gate
    docs_bpe_train_merges_batched re-checks this cross-engine via the
    verbatim-shared oracle); also asserts batching actually batches —
    fewer pair-count rounds than merges on natural text."""
    from fabric_claims_spark.extensions import bpe as bpe_mod
    from fabric_claims_spark.sources.parquet import load_table

    d = load_table(spark, sf_dir, "documents")
    want_merges, want_vocab = bpe_train(d, n_merges=12)
    calls = {"n": 0}
    real_pair_counts = bpe_mod.pair_counts

    def counting_pair_counts(words):
        calls["n"] += 1
        return real_pair_counts(words)

    bpe_mod.pair_counts = counting_pair_counts
    try:
        got_merges, got_vocab = bpe_mod.bpe_train_batched(d, n_merges=12)
    finally:
        bpe_mod.pair_counts = real_pair_counts
    assert got_merges == want_merges
    assert calls["n"] < 12  # batching actually batched
    got = {r.word: list(r.syms) for r in got_vocab.collect()}
    want = {r.word: list(r.syms) for r in want_vocab.collect()}
    assert got == want


def test_batched_train_stops_when_pairs_exhaust(spark):
    tiny = _docs(spark, ["ab ab ab"])
    from fabric_claims_spark.extensions.bpe import bpe_train_batched

    merges, vocab = bpe_train_batched(tiny, n_merges=10)
    assert [m[3] for m in merges] == ["ab", "ab_"]
    assert [list(r.syms) for r in vocab.collect()] == [["ab_"]]


def test_marker_collision_raises(spark):
    """ADVICE r10: a vocabulary word containing the end-of-word
    marker (or whitespace) must fail loudly, not corrupt arrays."""
    bad = spark.createDataFrame([("foo_bar", 1)], ["word", "freq"])
    from fabric_claims_spark.extensions.bpe import (
        bpe_segment,
        bpe_train_words,
        bpe_train_words_batched,
    )

    with pytest.raises(ValueError, match="marker"):
        bpe_train_words(bad, 2)
    with pytest.raises(ValueError, match="marker"):
        bpe_train_words_batched(bad, 2)
    with pytest.raises(ValueError, match="marker"):
        bpe_segment(bad, [])


def test_batched_train_rejects_nonpositive_max_batch(spark):
    """ADVICE r11: max_batch < 1 would accept zero merges per round
    and loop forever — reject it at entry instead."""
    tiny = spark.createDataFrame([("ab", 3)], ["word", "freq"])
    from fabric_claims_spark.extensions.bpe import bpe_train_words_batched

    with pytest.raises(ValueError, match="max_batch"):
        bpe_train_words_batched(tiny, 2, max_batch=0)
    with pytest.raises(ValueError, match="max_batch"):
        bpe_train_words_batched(tiny, 2, max_batch=-3)


def test_concurrent_tracked_checkpoints_do_not_cross_release(spark):
    """ADVICE r11: two threads checkpointing through the tracked
    window must each release only their OWN superseded state — the
    lock serializes the snapshot-checkpoint-snapshot diff, so one
    round's handles never capture the other thread's persist."""
    import threading as _t

    from fabric_claims_spark.extensions.bpe import (
        _release_checkpoint,
        _tracked_checkpoint,
    )

    results: dict[int, tuple] = {}

    def worker(i: int) -> None:
        df = spark.range(100 + i).withColumn("x", F.col("id") * (i + 2))
        results[i] = _tracked_checkpoint(df)

    threads = [_t.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # each window attributed at least its own checkpoint, and
    # releasing thread A's handles must not unpersist thread B's
    # still-live checkpoint data
    for i, (out, handles) in sorted(results.items()):
        assert handles, f"thread {i} captured no handles"
    for i in (0, 1):
        _release_checkpoint(results[i][1])
    for i in (2, 3):
        out = results[i][0]
        assert out.count() == 100 + i  # checkpoint data still readable
        _release_checkpoint(results[i][1])


def test_train_releases_superseded_checkpoints(spark, sf_dir):
    """ADVICE r10: only the latest round's vocab state may stay
    persisted after training — a 12-round train must not leave 13
    checkpointed RDDs behind."""
    from fabric_claims_spark.sources.parquet import load_table

    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keys())
    d = load_table(spark, sf_dir, "documents")
    _merges, _vocab = bpe_train(d, n_merges=12)
    after = set(sc._jsc.getPersistentRDDs().keys())
    assert len(after - before) <= 1


def test_batched_selection_on_engineered_danger_shapes(spark):
    """The compatibility rule's two danger shapes, engineered
    directly:

    * chain conflict — 'pqr': (p,q) and (q,r) tie at the top; a
      batcher that skipped the conflict (instead of stopping) or
      kept ties at the stopping count would apply (q,r) before the
      recount that destroys it ((p,q) consumes the shared q), so the
      scan must fall back to the single argmax.
    * created-pair hazard — after (a,b)->ab, the created (ab,_) pair
      can TIE lower-ranked batch picks; only picks with count
      strictly above the stopping bound survive.

    Both must stay bit-equal to the pure-Python sequential reference
    at every batch cap."""
    from fabric_claims_spark.extensions.bpe import bpe_train_batched

    shapes = [
        ["pqr pqr pqr", "pqr pqr", "pqr pqr pqr pqr"],  # chain ties
        ["xab xab ab ab cd", "ab ab cd cd", "xab cd"],  # created-pair
        ["ab ab ab ab cd cd cd ce ce", "ab cd ce"],  # mixed counts
    ]
    for texts in shapes:
        corpus = _docs(spark, texts)
        freqs = {
            r.word: r.freq for r in word_frequencies(corpus).collect()
        }
        ref_merges, ref_vocab = _ref_train(freqs, n_merges=10)
        for cap in (2, 16):
            got_merges, got_vocab = bpe_train_batched(
                corpus, n_merges=10, max_batch=cap
            )
            assert got_merges == ref_merges, (texts, cap)
            got = {r.word: list(r.syms) for r in got_vocab.collect()}
            assert got == ref_vocab, (texts, cap)
