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

from fabric_claims_spark.extensions.bpe import (
    WORD_MARKER,
    bpe_segment,
    bpe_train,
    word_frequencies,
)


@pytest.fixture(autouse=True)
def _release_checkpoints(spark):
    """The trainer localCheckpoints its vocab state per merge round
    (by design — see extensions/bpe.py). Release those persistent
    RDDs after each test so the strict zero-storage assertions in
    test_caching.py (which runs later in the session-scoped Spark)
    see a clean slate."""
    yield
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()

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
