"""Candidate-pair growth measurement for the blocked near-dup
operators (SCALING.md evidence; SURVEY.md §4 'would the plan survive
100×').

For each corpus scale it reports, per operator, the size of the
CANDIDATE pair space the blocking scheme actually generates — the
quantity that must grow sub-quadratically for the operator to survive
a 100 TB corpus. Wall-time is deliberately not the metric (local[32]
times don't transfer; pair counts do).

Scales: the driver corpora sf0.01 (500 docs) and sf0.1 (5,000 docs),
plus a synthetic 10× replication of sf0.1 (50,000 docs / 20,000
vectors ≈ sf1). The replication models how a real corpus grows — more
content at a roughly constant duplication RATE — by making replicas
mutually dissimilar while preserving each replica's internal dup
structure exactly:

* documents: replica i>0 maps every token through a replica-keyed
  bijection (t → hex(xxhash64(t, i))): token-set structure, token df
  ranks, and exact-duplicate text are preserved within the replica
  (shared tokens stay shared, so shingle overlap between related docs
  survives); across replicas vocabularies are disjoint. (A simpler
  same-prefix perturbation was rejected: prefixing every token with
  one literal string makes ALL docs in a replica share the prefix
  shingles, inflating within-replica MinHash similarity far above the
  natural corpus — the measurement then reports the artifact.)
* embeddings: replica i applies a deterministic per-replica sign flip
  per dimension — an orthogonal transform, so all within-replica
  cosines (and near-dup pairs) are preserved EXACTLY while
  cross-replica vectors land in unrelated LSH buckets.

Pair-space counts use sum-over-buckets of C(n,2) aggregates (no join
materialization), so the measurement itself scales.

Usage: python tools/scale_pairs.py [out.md]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from fabric_claims_spark.extensions.dedup import (  # noqa: E402
    minhash_signatures,
    simhash64,
)
from fabric_claims_spark.extensions.similarity import (  # noqa: E402
    hyperplane_band_sigs,
    hyperplanes,
)
from fabric_claims_spark.extensions.text import winnow_prints  # noqa: E402
from fabric_claims_spark.session import get_spark  # noqa: E402

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


def pair_space(keyed: DataFrame, key_cols: list[str]) -> int:
    """Σ over blocking key of C(n,2) — the number of candidate pairs
    the self-join on that key would generate (before any dedup)."""
    out = (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p"))
        .first()["p"]
    )
    return int(out or 0)


def replicate_docs(docs: DataFrame, times: int) -> DataFrame:
    out = None
    for i in range(times):
        if i == 0:
            text = F.col("text")
        else:
            text = F.array_join(
                F.transform(
                    F.split(F.trim(F.col("text")), r"\s+"),
                    lambda t: F.lower(F.hex(F.xxhash64(t, F.lit(i)))),
                ),
                " ",
            )
        rep = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        out = rep if out is None else out.unionByName(rep)
    return out


def replicate_vecs(vecs: DataFrame, times: int) -> DataFrame:
    out = None
    for i in range(times):
        if i == 0:
            emb = F.col("embedding")
        else:
            # orthogonal sign flip: within-replica cosines unchanged
            emb = F.transform(
                "embedding",
                lambda x, j: F.when(
                    F.pmod(F.xxhash64(j.cast("string"), F.lit(i)), 2) == 0, x
                ).otherwise(-x),
            )
        rep = vecs.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            emb.alias("embedding"),
            "label",
        )
        out = rep if out is None else out.unionByName(rep)
    return out


def minhash_lsh_space(
    docs: DataFrame, bands: int = 16, rows: int = 4, bucket_cap: int | None = None
) -> int:
    """Band-bucket pair space of the MinHash-LSH plan
    (extensions/dedup.py:lsh_candidate_pairs banding, xxhash64 keys).
    ``bucket_cap`` reproduces minhash_near_dups' hot-bucket guard:
    buckets above the cap are dropped before pairing, bounding any
    bucket's contribution at C(cap,2)."""
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=bands * rows)
    band_keys = [
        F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows).cast("string"), F.lit(b))
        for b in range(bands)
    ]
    banded = sigs.select(
        "doc", F.posexplode(F.array(*band_keys)).alias("band_idx", "band_hash")
    )
    counts = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("n")
    )
    if bucket_cap is not None:
        counts = counts.where(F.col("n") <= bucket_cap)
    out = counts.agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p")).first()["p"]
    return int(out or 0)


def incremental_space(
    docs: DataFrame,
    mod: int = 5,
    bands: int = 16,
    rows: int = 4,
    bucket_cap: int = 64,
) -> int:
    """Candidate pair space of the batch-vs-corpus incremental dedup
    (extensions/dedup.py:incremental_dedup over a doc_id%mod split):
    Σ over (band, key) of n_batch × n_corpus-capped — the rows the
    batch→corpus band join materializes. Per batch doc this is at
    most bands × bucket_cap regardless of corpus size."""
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=bands * rows)
    band_keys = [
        F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows).cast("string"), F.lit(b))
        for b in range(bands)
    ]
    banded = sigs.select(
        "doc", F.posexplode(F.array(*band_keys)).alias("band_idx", "band_hash")
    )
    cnt = lambda side: (  # noqa: E731
        side.groupBy("band_idx", "band_hash").agg(F.count(F.lit(1)).alias("n"))
    )
    corpus = cnt(banded.where(F.pmod("doc", mod) != 0)).where(
        F.col("n") <= bucket_cap
    )
    batch = cnt(banded.where(F.pmod("doc", mod) == 0)).withColumnRenamed("n", "nb")
    out = (
        batch.join(corpus, ["band_idx", "band_hash"])
        .agg(F.sum(F.col("nb") * F.col("n")).alias("p"))
        .first()["p"]
    )
    return int(out or 0)


def jaccard_prefix_space(docs: DataFrame, tau_num: int = 4, tau_den: int = 5) -> int:
    """PPJoin prefix-key pair space (mirrors queries/text_docs.py
    docs_jaccard_pairs: rarest-⌈n−τn⌉+1 tokens per doc, keys
    (lang, source, tok))."""
    from pyspark.sql import Window

    t = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("toks"),
    ).withColumn("n", F.size("toks"))
    tok = t.select("doc_id", "lang", "source", "n", F.explode("toks").alias("tok"))
    w_df = Window.partitionBy("tok")
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    prefix = (
        tok.withColumn("df", F.count(F.lit(1)).over(w_df))
        .withColumn("pos", F.row_number().over(w))
        .where(
            F.col("pos")
            <= F.col("n")
            - ((F.col("n") * tau_num + tau_num) / tau_den).cast("long")
            + 1
        )
    )
    return pair_space(prefix, ["lang", "source", "tok"])


def winnow_space(docs: DataFrame, max_doc_freq: int = 20) -> int:
    """Fingerprint-key pair space after the df-cutoff (mirrors
    extensions/text.py winnow_overlap_pairs)."""
    prints = winnow_prints(docs, "doc_id", "text")
    frequent = (
        prints.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > max_doc_freq)
        .select("fp")
    )
    kept = prints.join(F.broadcast(frequent), "fp", "left_anti")
    return pair_space(kept, ["fp"])


def simhash_space(
    docs: DataFrame,
    bands: int = 4,
    bits: int = 16,
    bucket_cap: int | None = None,
) -> int:
    """Hamming-band pair space of the SimHash plan
    (extensions/dedup.py:simhash_band_pairs over the prod 64-bit
    xxhash64 signatures; 4×16 tiles the full width). Like the
    hyperplane case, a fixed signature width gives a fixed per-pair
    collision probability — ``bucket_cap`` is the guard that bounds
    any band bucket's contribution at C(cap,2)."""
    sigs = simhash64(docs, "doc_id", "text")
    mask = F.lit((1 << bits) - 1)
    banded = sigs.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * bits).bitwiseAND(mask)
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "bv"),
    )
    counts = banded.groupBy("band_idx", "bv").agg(F.count(F.lit(1)).alias("n"))
    if bucket_cap is not None:
        counts = counts.where(F.col("n") <= bucket_cap)
    out = counts.agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p")).first()["p"]
    return int(out or 0)


def hyperplane_space(vecs: DataFrame, bits: int | None = None) -> int:
    """Hyperplane band-signature pair space (mirrors
    extensions/similarity.py hyperplane_neardup_pairs). ``bits``
    overrides HP_BITS — random sign bits collide at 2^-bits per pair
    per band, so bits must track log2(n) for a linear pair space."""
    dim = len(vecs.select("embedding").first()[0])
    planes = hyperplanes(dim) if bits is None else hyperplanes(dim, bits=bits)
    e = vecs.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    banded = e.select(
        "vec_id",
        F.posexplode(F.array(*hyperplane_band_sigs(F.col("ev"), planes))).alias(
            "band_idx", "sig"
        ),
    )
    return pair_space(banded, ["band_idx", "sig"])


def main() -> None:
    spark = get_spark("scale-pairs")
    spark.sparkContext.setLogLevel("ERROR")

    corpora = [
        ("sf0.01", spark.read.parquet(f"{SF001}/documents.parquet"), None),
        ("sf0.1", spark.read.parquet(f"{SF01}/documents.parquet"), None),
        (
            "sf0.1 ×10 (≈sf1)",
            replicate_docs(spark.read.parquet(f"{SF01}/documents.parquet"), 10),
            None,
        ),
    ]
    vec_corpora = [
        ("sf0.01", spark.read.parquet(f"{SF001}/embeddings.parquet")),
        ("sf0.1", spark.read.parquet(f"{SF01}/embeddings.parquet")),
        (
            "sf0.1 ×10 (≈sf1)",
            replicate_vecs(spark.read.parquet(f"{SF01}/embeddings.parquet"), 10),
        ),
    ]

    rows = []
    for label, docs, _ in corpora:
        docs = docs.cache()
        n = docs.count()
        allpairs = n * (n - 1) // 2
        mh = minhash_lsh_space(docs)
        mh_cap = minhash_lsh_space(docs, bucket_cap=64)  # prod default
        jac = jaccard_prefix_space(docs)
        win = winnow_space(docs)
        sh_cap = simhash_space(docs, bucket_cap=64)  # prod default
        inc = incremental_space(docs)
        rows.append((label, n, allpairs, mh, mh_cap, jac, win, sh_cap, inc))
        print(
            f"{label}: docs={n} allpairs={allpairs} minhash_lsh={mh} "
            f"minhash_capped={mh_cap} jaccard_prefix={jac} winnow={win} "
            f"simhash_capped={sh_cap} incremental={inc}",
            flush=True,
        )
        docs.unpersist()

    vrows = []
    for label, vecs in vec_corpora:
        vecs = vecs.cache()
        n = vecs.count()
        hp = hyperplane_space(vecs)
        # scale the signature with the corpus: 2^bits ≈ n keeps the
        # random-collision space ≈ bands × n/2 — linear
        bits = max(8, (n - 1).bit_length())
        hp_scaled = hyperplane_space(vecs, bits=bits)
        vrows.append((label, n, n * (n - 1) // 2, hp, bits, hp_scaled))
        print(
            f"{label}: vecs={n} hyperplane(8b)={hp} "
            f"hyperplane({bits}b)={hp_scaled}",
            flush=True,
        )
        vecs.unpersist()

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(
                "| corpus | docs | all-pairs | minhash-LSH (uncapped) "
                "| minhash-LSH (cap 64) | jaccard-prefix | winnow "
                "| simhash (cap 64) | incremental (batch×corpus) |\n"
            )
            f.write("|---|---|---|---|---|---|---|---|---|\n")
            for label, n, ap, mh, mhc, jac, win, shc, inc in rows:
                f.write(
                    f"| {label} | {n:,} | {ap:,} | {mh:,} | {mhc:,} "
                    f"| {jac:,} | {win:,} | {shc:,} | {inc:,} |\n"
                )
            f.write(
                "\n| corpus | vectors | all-pairs | hyperplane-LSH (8-bit) "
                "| scaled bits | hyperplane-LSH (scaled) |\n|---|---|---|---|---|---|\n"
            )
            for label, n, ap, hp, bits, hps in vrows:
                f.write(
                    f"| {label} | {n:,} | {ap:,} | {hp:,} | {bits} | {hps:,} |\n"
                )


if __name__ == "__main__":
    main()
