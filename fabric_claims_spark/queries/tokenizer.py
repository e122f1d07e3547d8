"""Learned-BPE tokenizer queries over the documents table.

North-star training-data-pipeline extension (SURVEY.md §7.8): real
byte-pair-encoding merge training (Sennrich et al., ACL 2016) and its
apply path, upgrading the fixed-regex token-cost proxy
(docs_bpe_token_estimate) to a learned tokenizer.

Oracle strategy: the DuckDB twin unrolls the identical merge loop as
MATERIALIZED CTEs — one (pair-count → argmax → fold-rewrite) stage per
merge round, with the rewrite expressed as the same init-less
left-fold via ``list_reduce`` that the Spark trainer runs via
``F.aggregate`` (see extensions/bpe.py for why fold, not replace).
MATERIALIZED is load-bearing: each round references the previous
round's vocab twice (pair counts + rewrite), so inlining would
duplicate the subtree 2^rounds times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fabric_claims_spark.extensions.bpe import (
    bpe_segment,
    bpe_train,
    merges_as_df,
    word_frequencies,
)
from fabric_claims_spark.queries import query
from fabric_claims_spark.sources.parquet import load_table

#: Merge rounds for the gate queries (plenty of pair supply at every
#: scale: the corpus vocabulary is 31 words / ~8 chars).
_N_MERGES = 12


def _bpe_ctes(n_merges: int = _N_MERGES) -> str:
    """The unrolled BPE training loop (w0 … w{n}, b1 … b{n}) shared by
    every tokenizer oracle — proven bit-exact vs the Spark trainer
    (merge table and per-word symbol arrays) by the two gates below.

    w{r}: vocab after r merges; b{r}: the r-th learned merge (1 row).
    The fold in w{r} is init-less ``list_reduce`` — the accumulator is
    the spaced symbol string, a step merges iff the accumulator's last
    symbol is p1 and the incoming symbol is p2 (exact left-to-right
    scan; a merged token never re-fires because p1||p2 ≠ p1).
    """
    ctes = [
        """w0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         regexp_split_to_array(word,'') || ['_'] AS syms
  FROM (SELECT unnest(regexp_split_to_array(trim(text),'\\s+')) AS word
        FROM documents WHERE length(trim(text))>0)
  GROUP BY word)"""
    ]
    for r in range(1, n_merges + 1):
        ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT syms[i] AS p1, syms[i+1] AS p2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w{r - 1}, UNNEST(generate_series(1, len(syms)-1)) AS t(i)
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""b{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS merge_rank, p1, p2, p1||p2 AS merged, cnt
  FROM p{r} ORDER BY cnt DESC, p1, p2 LIMIT 1)"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
  SELECT word, freq,
    string_split(list_reduce(syms, (acc,x) -> CASE
      WHEN regexp_extract(acc,'([^ ]+)$',1)=b.p1 AND x=b.p2
      THEN regexp_replace(acc,'[^ ]+$','')||b.merged
      ELSE acc||' '||x END), ' ') AS syms
  FROM w{r - 1}, b{r} b)"""
        )
    return ",\n".join(ctes)


# --------------------------------------------------------------------------
# BPE merge training: the learned merge table (the tokenizer model).
#
# Scale notes (100 TB): the corpus is scanned ONCE (word_frequencies);
# every merge round runs on the vocabulary table (≪ corpus), shuffles
# only vocab-sized pair counts, and collects exactly one row (the
# argmax pair) — the same bounded driver state class as the k-means
# centroid loop. localCheckpoint per round keeps plan depth O(1)
# (measured: lazy lineage makes 12 rounds take >11 min on 31 words;
# checkpointed, ~0.5 s/round).
_TRAIN_ORACLE = (
    "WITH "
    + _bpe_ctes()
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT merge_rank, p1 AS left_sym, p2 AS right_sym, merged, "
        f"cnt AS pair_count FROM b{r}"
        for r in range(1, _N_MERGES + 1)
    )
)


@query("docs_bpe_train_merges", oracle=_TRAIN_ORACLE)
def docs_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    merges, _vocab = bpe_train(d, _N_MERGES)
    return merges_as_df(spark, merges)


@query("docs_bpe_train_merges_batched", oracle=_TRAIN_ORACLE)
def docs_bpe_train_merges_batched(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The BATCHED trainer (round 11, VERDICT r10 item 3) under the
    sequential trainer's oracle, shared VERBATIM: the compatible-batch
    rule (extensions/bpe._select_compatible_batch) is exact, so the
    learned merge table must hash-equal the unrolled one-merge-per-CTE
    DuckDB loop even though the Spark side pays one pair-count job per
    batch instead of per merge."""
    from fabric_claims_spark.extensions.bpe import bpe_train_batched

    d = load_table(spark, sf_dir, "documents")
    merges, _vocab = bpe_train_batched(d, _N_MERGES)
    return merges_as_df(spark, merges)


# --------------------------------------------------------------------------
# Tokenizer APPLY + fertility stats: segment the corpus vocabulary with
# the learned merges (the explicit apply path — bpe_segment replays the
# merge list in rank order, OOV-capable), then join segment lengths
# back to the corpus tokens per source: whitespace tokens, BPE pieces,
# pieces-per-word fertility, and the surviving symbol vocabulary.
#
# Scale notes: the segmented vocab broadcasts to the corpus-token join
# (vocab ≪ corpus; for web-scale vocabs swap to a shuffle join — the
# join key is the word either way); both aggregates are plain hash
# aggregates keyed by source.
_STATS_ORACLE = f"""
WITH {_bpe_ctes()},
tok AS (
  SELECT source, unnest(regexp_split_to_array(trim(text),'\\s+')) AS word
  FROM documents WHERE length(trim(text))>0),
j AS (
  SELECT t.source, w.syms FROM tok t JOIN w{_N_MERGES} w USING (word)),
base AS (
  SELECT source, COUNT(*) AS ws_tokens,
         CAST(SUM(len(syms)) AS BIGINT) AS bpe_tokens
  FROM j GROUP BY source),
voc AS (
  SELECT source, CAST(COUNT(DISTINCT s) AS BIGINT) AS vocab_syms
  FROM (SELECT source, unnest(syms) AS s FROM j) GROUP BY source)
SELECT b.source, b.ws_tokens, b.bpe_tokens,
       CAST(b.bpe_tokens AS DOUBLE) / b.ws_tokens AS pieces_per_word,
       v.vocab_syms
FROM base b JOIN voc v USING (source)
"""


@query("docs_bpe_tokenize_stats", oracle=_STATS_ORACLE)
def docs_bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    merges, _vocab = bpe_train(d, _N_MERGES)
    seg = bpe_segment(word_frequencies(d), merges)
    tok = d.where(F.length(F.trim("text")) > 0).select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    )
    j = tok.join(F.broadcast(seg.select("word", "syms")), "word")
    base = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("ws_tokens"),
        F.sum(F.size("syms")).cast("long").alias("bpe_tokens"),
    )
    voc = (
        j.select("source", F.explode("syms").alias("s"))
        .groupBy("source")
        .agg(F.count_distinct("s").cast("long").alias("vocab_syms"))
    )
    return base.join(voc, "source").select(
        "source",
        "ws_tokens",
        "bpe_tokens",
        (F.col("bpe_tokens").cast("double") / F.col("ws_tokens")).alias(
            "pieces_per_word"
        ),
        "vocab_syms",
    )
