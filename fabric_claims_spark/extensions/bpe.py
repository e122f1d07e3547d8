"""Distributed byte-pair-encoding tokenizer training and application.

True learned-merge BPE (Sennrich et al., ACL 2016) over the corpus
word-frequency table — the real tokenizer-training step of an LLM data
pipeline, complementing the fixed-regex cost proxy in
``extensions/text.bpe_ish_token_count``.

Algorithm (classic, expressed Spark-first):

1. ``word_frequencies``: one corpus scan → explode whitespace tokens →
   hash-aggregate to (word, freq). At 100 TB this is the only
   corpus-sized shuffle; everything after runs on the vocabulary table
   (≪ corpus — tens of millions of rows for web-scale text).
2. Each word becomes a symbol array: its characters plus a single
   end-of-word marker symbol (so merges can learn word-final units,
   and two words can never merge across a boundary).
3. Per merge round: count adjacent symbol pairs weighted by word
   frequency (posexplode + hash aggregate over the vocab table), pick
   the most frequent pair (deterministic tie-break: count DESC, then
   lexicographic), and rewrite every word's symbol array with that
   pair merged. The chosen pair is the round's ONLY driver state —
   one collected row, same bounded-scalar class as the k-means
   centroid loop (extensions/similarity.kmeans_centroids).

Merge semantics — exact left-to-right scan: positions merge greedily
left to right and a merged token is never re-paired within the same
round (the merged symbol ``p1||p2`` is strictly longer than ``p1``, so
the fold's last-element check can never re-fire on it). This is
implemented as an init-less left fold over the symbol array
(``F.aggregate`` seeded with the first element), NOT the common
space-padded ``replace`` trick: replace() consumes the shared boundary
space between adjacent occurrences and deterministically under-merges
runs (" a a a a a a " → " aa a aa a ", not "aa aa aa" — measured), and
iterating it to a fixpoint still converges to the wrong answer. The
DuckDB oracle twin expresses the identical fold via ``list_reduce``,
which is likewise init-less — proven bit-exact against this trainer
(merge table AND per-word symbol arrays) by the
docs_bpe_train_merges / docs_bpe_tokenize_stats gates.

Plan-size discipline: each round's rewrite nests a higher-order fold
inside the previous round's output. Leaving that as lazy lineage makes
round r's plan contain r nested folds — Catalyst analysis/codegen cost
grows superlinearly and a 12-round train takes >11 minutes on 31 words
(measured); an eager ``localCheckpoint`` per round truncates the
lineage, making every round O(1) plan depth and the whole train linear
(~0.5 s/round at gate scale). Production BPE trainers materialize the
vocab state per round for exactly this reason; at cluster scale the
checkpoint is a persisted vocab table, far smaller than the corpus.

Reference parity: the reference pipeline has no tokenizer trainer
(951-LoC Fabric notebook surface); this is a north-star extension op
(SURVEY.md §7.8) in the training-data-pipeline family.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType
from fabric_claims_spark.localframe import local_frame

#: End-of-word marker symbol. Any string disjoint from the word
#: alphabet works (corpus words are [a-z]+; verified per scale).
WORD_MARKER = "_"

#: Whitespace tokenizer shared with the rest of the text suite.
_WS = r"\s+"

MERGE_SCHEMA = StructType(
    [
        StructField("merge_rank", LongType(), False),
        StructField("left_sym", StringType(), False),
        StructField("right_sym", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def word_frequencies(docs: DataFrame) -> DataFrame:
    """Corpus → (word, freq) vocabulary table (one scan, one shuffle)."""
    nonempty = docs.where(F.length(F.trim("text")) > 0)
    return (
        nonempty.select(
            F.explode(F.split(F.trim("text"), _WS)).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _assert_marker_safe(words: DataFrame, marker: str) -> None:
    """The fold accumulator is a space-joined symbol string and the
    end-of-word marker must be disjoint from every word, so a word
    containing the marker (or any whitespace) would silently corrupt
    symbol arrays rather than fail. One cheap filter-limit on the
    vocabulary table makes the contract explicit (ADVICE r10)."""
    bad = (
        words.where(
            F.col("word").contains(marker) | F.col("word").rlike(r"\s")
        )
        .select("word")
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"BPE vocabulary word {bad[0]['word']!r} contains the "
            f"end-of-word marker {marker!r} or whitespace — pick a "
            "disjoint marker (e.g. a non-printable like '\\u0001')"
        )


_CHECKPOINT_LOCK = threading.Lock()


def _tracked_checkpoint(df: DataFrame) -> tuple[DataFrame, list]:
    """``localCheckpoint`` + handles to the persistent RDDs it
    registered, so the superseded round can be released once the next
    round materializes (ADVICE r10: a 12-round train × gates × scales
    otherwise accumulates dozens of persisted RDDs for the session's
    life).

    The snapshot diff attributes EVERY RDD persisted between its two
    ``getPersistentRDDs()`` reads to this checkpoint, so a concurrent
    persist on the shared SparkContext would get its cache released
    by ``_release_checkpoint`` (ADVICE r11). The module lock makes
    the snapshot-checkpoint-snapshot window exclusive among BPE
    callers on this driver; ``localCheckpoint`` is eager, so the lock
    spans the whole materialization and two same-process trainers
    can now interleave safely. (Non-BPE threads persisting during
    the window remain the documented out-of-scope case — the engine
    itself never does so: the only other persist sites are the
    pipeline's tracked_cache scopes, which run driver-sequentially.)
    """
    sc = df.sparkSession.sparkContext
    with _CHECKPOINT_LOCK:
        before = set(sc._jsc.getPersistentRDDs().keys())
        out = df.localCheckpoint()
        after = sc._jsc.getPersistentRDDs()
        return out, [after[k] for k in after.keys() if k not in before]


def _release_checkpoint(handles: list) -> None:
    """Unpersist a SUPERSEDED round's checkpointed RDDs. Never call
    on state still referenced — the checkpoint data is the plan."""
    for h in handles:
        h.unpersist()


def init_symbols(words: DataFrame, marker: str = WORD_MARKER) -> DataFrame:
    """Attach the initial symbol array: characters + end-of-word marker.

    ``F.split(word, '')`` yields exactly the character list (no empty
    trailing element on Spark 4; DuckDB's regexp_split_to_array(word,'')
    agrees — probed).
    """
    return words.withColumn(
        "syms", F.concat(F.split("word", ""), F.array(F.lit(marker)))
    )


def _merge_fold(p1: str, p2: str, merged: str) -> Column:
    """One merge round as an init-less left fold over ``syms``.

    Exact left-to-right scan semantics: the accumulator is the spaced
    symbol string; a step merges iff the accumulator's LAST symbol is
    ``p1`` and the incoming symbol is ``p2``. Symbols never contain
    spaces (chars + marker, merges concatenate them), so the
    last-symbol regex is exact.
    """

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.regexp_extract(acc, r"([^ ]+)$", 1) == F.lit(p1))
            & (x == F.lit(p2)),
            F.concat(F.regexp_replace(acc, r"[^ ]+$", ""), F.lit(merged)),
        ).otherwise(F.concat(acc, F.lit(" "), x))

    # Init-less: seed with the first symbol, fold the rest — the exact
    # shape list_reduce gives the DuckDB twin. Every word has ≥2
    # symbols (≥1 char + marker), so the slice is never out of range.
    return F.aggregate(
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        F.element_at(F.col("syms"), 1),
        step,
    )


def _rewrite_merge(words: DataFrame, p1: str, p2: str, merged: str) -> DataFrame:
    """Rewrite every word's symbol array with one pair merged — lazy
    (no checkpoint); callers chain rewrites then truncate lineage once
    per round (see module docstring: plan-size discipline)."""
    return words.select(
        "word",
        "freq",
        F.split(_merge_fold(p1, p2, merged), " ").alias("syms"),
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the vocab table (freq-weighted).

    posexplode of the first n-1 symbols + element_at(i+2) gives every
    adjacent pair without a join; the aggregate is a plain hash
    aggregate on (p1, p2) — vocab-sized, not corpus-sized.
    """
    sz = F.size("syms")
    return (
        words.where(sz >= 2)
        .select(
            "freq",
            F.posexplode(F.slice("syms", 1, sz - 1)).alias("i", "p1"),
            "syms",
        )
        .select(
            "freq", "p1", F.element_at("syms", F.col("i") + 2).alias("p2")
        )
        .groupBy("p1", "p2")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train_words(
    words: DataFrame,
    n_merges: int,
    marker: str = WORD_MARKER,
    checkpoint_every: int = 4,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    Returns (merge list, final vocab DataFrame with per-word symbol
    arrays). The merge list is the learned model — n rows of driver
    state, one collected row per round (bounded-scalar class). Stops
    early if the vocabulary runs out of pairs (every word fully
    merged); with the end-of-word marker this needs n_merges ≳ total
    distinct symbols, far beyond any configured gate.

    Rewrites chain LAZILY between lineage-truncating checkpoints
    (round 14, guide §1.2 — the per-round eager checkpoint doubled
    the trainer's action count; the argmax collect is the only
    per-round decision point, so up to ``checkpoint_every`` folds ride
    on it exactly as ``bpe_segment`` batches its apply folds). Plan
    depth stays bounded by ``checkpoint_every`` — the measured
    superlinear-analysis wall only appears when ALL rounds chain
    (>11 min at 12 nested folds; ≤8 is the segment path's proven
    budget). Each superseded checkpoint is unpersisted once the next
    materializes; the returned DataFrame's checkpoint belongs to the
    caller."""
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    _assert_marker_safe(words, marker)
    words, handles = _tracked_checkpoint(init_symbols(words, marker))
    merges: list[tuple[int, str, str, str, int]] = []
    pending = 0  # lazy folds chained on `words` since the last checkpoint
    for rank in range(1, n_merges + 1):
        top = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), "p1", "p2")
            .limit(1)
            .collect()
        )
        if not top:
            break
        b = top[0]
        merged = b.p1 + b.p2
        merges.append((rank, b.p1, b.p2, merged, int(b.cnt)))
        words = _rewrite_merge(words, b.p1, b.p2, merged)
        pending += 1
        if pending >= checkpoint_every:
            words, new_handles = _tracked_checkpoint(words)
            _release_checkpoint(handles)
            handles = new_handles
            pending = 0
    if pending:
        # final state checkpointed as before — the returned vocab is
        # lineage-truncated and reusable by segment/stats callers
        words, new_handles = _tracked_checkpoint(words)
        _release_checkpoint(handles)
        handles = new_handles
    return merges, words


def bpe_train(
    docs: DataFrame, n_merges: int, marker: str = WORD_MARKER
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus (one scan →
    vocabulary table → bpe_train_words)."""
    return bpe_train_words(word_frequencies(docs), n_merges, marker)


def _select_compatible_batch(
    rows, max_accept: int, fetched_all: bool
) -> list:
    """The exact-batching rule (VERDICT r10 item 3): from the sorted
    pair list (cnt DESC, p1, p2 — the sequential trainer's order),
    accept a greedy PREFIX of pairwise-compatible merges that is
    provably bit-equal to applying the same number of sequential
    rounds.

    Merging (a, b) → ab only changes the counts of pairs touching a
    symbol in {a, b, ab}: it destroys occurrences of (·,a) / (b,·) /
    (a,b) and creates (·,ab) / (ab,·) — a pair disjoint from all
    three strings keeps its exact count. So the scan accepts rows
    while disjoint from every accepted merge's {p1, p2, merged}
    strings and STOPS at the first conflict (after a conflict, the
    sequential trainer's next argmax depends on recounted state).
    Created pairs are the subtle hazard: (x, ab) can inherit up to
    cnt(x, a) occurrences, and (x, a) conflicts — so every conflicting
    pair's count bounds every created pair's count. ``c_stop`` (the
    count at the stopping row, or the last fetched row when the fetch
    window may hide deeper conflicts, or 0 when the whole pair table
    was fetched conflict-free) is that bound, and only accepted picks
    with cnt STRICTLY above it are kept — for those, no destroyed or
    created pair can reach their count, so each remains the argmax of
    its sequential round (ties among kept picks resolve in lex order,
    which is exactly the scan order). The fallback single pick is the
    global argmax — always exact.
    """
    used: set[str] = set()
    accepted: list = []
    c_stop = 0
    for r in rows:
        touched = {r["p1"], r["p2"], r["p1"] + r["p2"]}
        if (used & touched) or len(accepted) >= max_accept:
            c_stop = int(r["cnt"])
            break
        accepted.append(r)
        used |= touched
    else:
        c_stop = 0 if fetched_all else int(rows[-1]["cnt"])
    keep = [r for r in accepted if int(r["cnt"]) > c_stop]
    return keep or accepted[:1]


def bpe_train_words_batched(
    words: DataFrame,
    n_merges: int,
    marker: str = WORD_MARKER,
    max_batch: int = 16,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """``bpe_train_words`` with batched compatible merges — bit-equal
    output (merge table AND final symbol arrays; pinned by pytest
    against the sequential trainer and by the verbatim-shared oracle
    of ``docs_bpe_train_merges_batched``), but one pair-count job +
    one collect per BATCH instead of per merge. This bounds the
    sequential trainer's production wall (VERDICT r10: a 32k-merge
    vocab at ~0.7-0.9 s/round means hours of driver round-trips):
    natural-language pair distributions accept multi-merge batches
    most rounds once the head of the distribution spreads over
    disjoint symbols, so the round count drops by roughly the mean
    accepted batch size (measured in SCALING.md round 11).

    Within a round the kept merges apply as chained lazy folds with
    ONE lineage-truncating checkpoint — plan depth is bounded by
    ``max_batch``, and the superseded round's checkpoint is released
    once the next materializes.
    """
    if max_batch < 1:
        # ADVICE r11: max_accept=0 would accept nothing each round —
        # no progress, infinite loop — so reject the knob up front.
        raise ValueError(f"max_batch must be >= 1, got {max_batch}")
    _assert_marker_safe(words, marker)
    words, handles = _tracked_checkpoint(init_symbols(words, marker))
    merges: list[tuple[int, str, str, str, int]] = []
    # fetch window: enough rows past the batch to witness a conflict
    # or bound hidden ones; vocabulary-sized query either way
    fetch = max_batch * 4 + 8
    while len(merges) < n_merges:
        rows = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), "p1", "p2")
            .limit(fetch)
            .collect()
        )
        if not rows:
            break
        picks = _select_compatible_batch(
            rows, min(max_batch, n_merges - len(merges)), len(rows) < fetch
        )
        out = words
        for r in picks:
            merged = r["p1"] + r["p2"]
            merges.append(
                (len(merges) + 1, r["p1"], r["p2"], merged, int(r["cnt"]))
            )
            out = _rewrite_merge(out, r["p1"], r["p2"], merged)
        words, new_handles = _tracked_checkpoint(out)
        _release_checkpoint(handles)
        handles = new_handles
    return merges, words


def bpe_train_batched(
    docs: DataFrame,
    n_merges: int,
    marker: str = WORD_MARKER,
    max_batch: int = 16,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Corpus-level twin of ``bpe_train`` on the batched trainer."""
    return bpe_train_words_batched(
        word_frequencies(docs), n_merges, marker, max_batch
    )


def bpe_segment(
    words: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    marker: str = WORD_MARKER,
    fold_batch: int = 8,
) -> DataFrame:
    """Apply a learned merge list to a (word, freq) table — the
    tokenizer's APPLY path, valid for words never seen in training
    (out-of-vocabulary words start as characters and pick up whatever
    learned merges fire). Merges apply in rank order, each with the
    same exact-scan fold as training; the plan is checkpointed every
    ``fold_batch`` merges so it stays O(fold_batch) deep regardless
    of merge count, and each superseded checkpoint is unpersisted
    once the next materializes (the final one is the caller's).

    Unlike training, APPLY has no per-merge decision point — the
    merge list is fixed — so folds chain freely between checkpoints;
    ``fold_batch`` only balances Catalyst plan depth against
    checkpoint materialization count.
    """
    _assert_marker_safe(words, marker)
    out, handles = _tracked_checkpoint(init_symbols(words, marker))
    for i in range(0, len(merges), fold_batch):
        for _, p1, p2, merged, _cnt in merges[i : i + fold_batch]:
            out = _rewrite_merge(out, p1, p2, merged)
        out, new_handles = _tracked_checkpoint(out)
        _release_checkpoint(handles)
        handles = new_handles
    return out


def merges_as_df(
    spark: SparkSession, merges: list[tuple[int, str, str, str, int]]
) -> DataFrame:
    """The learned merge table as a DataFrame (model artifact)."""
    return local_frame(spark, merges, MERGE_SCHEMA)
