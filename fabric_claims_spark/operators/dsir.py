"""DSIR importance-weight core [Xie et al., NeurIPS 2023,
arXiv:2302.03169] — shared verbatim by the batch query
(queries/text_docs.docs_dsir_weights) and the streaming monitor
(streaming/corpus_stream.dsir_monitor_stream), so stream==batch
parity is structural.

The estimator state is the (doc_id, bucket, tgt) token-occurrence
count table: corpus-linear in documents, B-bounded per doc, and
ADDITIVE — each arriving micro-batch folds its own counts in with a
plain sum, which is exactly the idempotent-rollup contract. The
weights themselves are NOT incrementally summarizable (a new target
document shifts the llr table and therefore EVERY document's weight
— the correct semantics for a relative-likelihood score), so reads
recompute the B-row llr table and the weight join over the bounded
count table (the modified-z-score monitor discipline: fold counts,
recompute statistics at read).

Cross-engine determinism: md5-fold bucket hash (the docs_hash_split
idiom), add-one smoothing, logs rounded to 6-dp micro-nats (int64)
so per-doc sums are exact integer math until one final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fabric_claims_spark.extensions.dedup import md5_long

DSIR_B = 64
# the curated slice DSIR scores against — the paper's Wikipedia+books
# stand-in on this corpus
DSIR_TARGET = ("src0", "src1", "src2", "src3")
_WS = r"\s+"
U53 = 9007199254740992  # 2^53 — the md5-fold uniform grid


def dsir_gumbel_key(log_weight, doc_id):
    """Gumbel-top-k sampling key [Vieira 2014; Kool et al., ICML 2019]:
    log_weight perturbed by g = -ln(-ln(u)) where u is the md5-fold
    uniform of the doc id (offset +0.5 inside the 2^53 grid so
    u ∈ (0,1) strictly — ln(0) can't occur). Top-k by this key IS an
    exact sample ∝ softmax(log_weight) without replacement, and the
    draw is a pure function of the data — reproducible across runs,
    engines, and partitionings. Shared verbatim by docs_dsir_resample
    and the end-to-end docs_dsir_pipeline."""
    u = (
        F.pmod(md5_long(doc_id.cast("string")), F.lit(U53)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(U53))
    gumbel = F.round(-F.log(-F.log(u)), 6)
    return F.round(log_weight + gumbel, 6)


def dsir_bucket_rows(
    docs: DataFrame,
    b: int = DSIR_B,
    target_sources: tuple[str, ...] = DSIR_TARGET,
) -> DataFrame:
    """One (doc_id, bucket, tgt) row per token occurrence — the
    additive fact stream both the batch aggregate and the streaming
    rollup fold. ``tgt`` is functionally dependent on doc_id (a doc's
    source never changes) and rides as a grouping key so the fold
    stays a plain count."""
    return (
        docs.where(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.col("source").isin(*target_sources).alias("tgt"),
            F.explode(F.split(F.trim(F.col("text")), _WS)).alias("tok"),
        )
        .select(
            "doc_id", (md5_long(F.col("tok")) % b).alias("bucket"), "tgt"
        )
    )


def dsir_weights_from_bucket_counts(
    dc: DataFrame, b: int = DSIR_B
) -> DataFrame:
    """(doc_id, n_toks, log_weight) from the folded
    (doc_id, bucket, tgt, c) count table. One B-row aggregate over the
    count table (target and raw totals in a single pass), a broadcast
    of the B-row log-ratio table back onto the per-doc counts, one
    final groupBy doc_id — nothing here ever exceeds
    |docs| x B rows."""
    per = dc.groupBy("doc_id", "bucket").agg(
        F.sum("c").alias("c"),
    )
    corpus = dc.groupBy("bucket").agg(
        F.sum("c").alias("s_b"),
        F.sum(F.when(F.col("tgt"), F.col("c")).otherwise(0)).alias("t_b"),
    )
    tot = corpus.agg(
        F.sum("s_b").alias("s_tot"), F.sum("t_b").alias("t_tot")
    )

    def micro_ln(num, den):
        return F.round(
            F.round(F.log(num.cast("double") / den), 6) * 1_000_000, 0
        ).cast("long")

    llr = corpus.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            micro_ln(F.col("t_b") + 1, F.col("t_tot") + F.lit(b))
            - micro_ln(F.col("s_b") + 1, F.col("s_tot") + F.lit(b))
        ).alias("micro_llr"),
    )
    return (
        per.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_toks"),
            (
                F.sum(F.col("c") * F.col("micro_llr")).cast("double")
                / F.lit(1_000_000.0)
            ).alias("log_weight"),
        )
        .orderBy("doc_id")
    )
