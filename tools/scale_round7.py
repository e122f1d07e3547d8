"""Round-7 scale evidence (SCALING.md): dedup-cascade stage ordering.

Round 7 moved the cascade's MinHash-LSH pass off the raw corpus and
onto the EXACT-dedup survivors (queries/lsh.py:docs_dedup_cascade) —
result-identical (exact copies carry identical text, hence identical
signatures; the oracle runs the same order), but the most expensive
stage (shingle + 64-hash signature build) now scales with the deduped
corpus, not the raw one. This tool measures that on the corpus the
reorder exists for: a crawl-like corpus where most documents are
exact copies.

Synthetic corpus: ``base`` distinct documents, each replicated
``copies`` times with distinct doc_ids (raw = base x copies docs,
exact survivors = base). Both cascade shapes run end-to-end; the
surviving id set is asserted identical; reported work proxy = docs
entering the LSH signature stage, plus wall time.

Usage: python tools/scale_round7.py [out.md]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from fabric_claims_spark.extensions.dedup import (  # noqa: E402
    minhash_near_dups,
)
from fabric_claims_spark.session import get_spark  # noqa: E402


def dup_heavy_corpus(spark, base: int, copies: int) -> DataFrame:
    """base distinct ~40-word documents, each with `copies` exact
    copies under distinct doc_ids (doc_id = copy * base + seed)."""
    words = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda i: F.format_string(
                "w%d", F.pmod(F.xxhash64(F.col("seed") * 40 + i), F.lit(997))
            ),
        ),
        " ",
    )
    return (
        spark.range(base)
        .select(F.col("id").alias("seed"))
        .crossJoin(spark.range(copies).select(F.col("id").alias("copy")))
        .select(
            (F.col("copy") * base + F.col("seed")).alias("doc_id"),
            words.alias("text"),
        )
    )


def _lsh_pairs(docs: DataFrame) -> DataFrame:
    return minhash_near_dups(
        docs, "doc_id", "text", threshold=0.5, num_hashes=64, bands=16,
        hasher="md5",
    ).select("doc_a", "doc_b")


def cascade_survivors(docs: DataFrame, lsh_over_raw: bool) -> DataFrame:
    """Both orderings of the round-6/7 cascade, returning the
    near-stage survivor ids (the part the reorder affects)."""
    exact_surv = docs.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id")
    )
    if lsh_over_raw:
        # round-6 shape: signatures over the raw corpus, pairs
        # post-filtered to exact survivors on both endpoints
        pairs = _lsh_pairs(docs)
        a = exact_surv.select(F.col("doc_id").alias("doc_a"))
        b = exact_surv.select(F.col("doc_id").alias("doc_b"))
        dropped = (
            pairs.join(a, "doc_a").join(b, "doc_b")
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
    else:
        # round-7 shape: signatures over the survivors only
        surv_docs = docs.join(
            exact_surv.select("doc_id"), "doc_id", "semi"
        )
        dropped = (
            _lsh_pairs(surv_docs)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
    return exact_surv.join(dropped, "doc_id", "left_anti").select("doc_id")


def main() -> int:
    spark = get_spark("scale-r7-cascade", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "| raw docs | exact survivors | LSH input (raw order) |"
        " LSH input (survivor order) | raw-order (s) |"
        " survivor-order (s) |",
        "|---|---|---|---|---|---|",
    ]
    for base, copies in ((2_000, 4), (2_000, 16), (8_000, 16)):
        docs = dup_heavy_corpus(spark, base, copies).localCheckpoint()
        raw_n = docs.count()

        t0 = time.monotonic()
        old = set(
            r["doc_id"]
            for r in cascade_survivors(docs, lsh_over_raw=True).collect()
        )
        t_old = time.monotonic() - t0

        t0 = time.monotonic()
        new = set(
            r["doc_id"]
            for r in cascade_survivors(docs, lsh_over_raw=False).collect()
        )
        t_new = time.monotonic() - t0

        # round-7 reorder can only ADD recall (a bucket that overflowed
        # bucket_cap purely from duplicate padding is retained), so
        # survivors(new) <= survivors(old); on this corpus the bucket
        # cap never tips, and the sets must be identical
        assert new == old, f"survivor mismatch at {base}x{copies}"
        lines.append(
            f"| {raw_n:,} | {base:,} | {raw_n:,} | {base:,} |"
            f" {t_old:.2f} | {t_new:.2f} |"
        )
        print(lines[-1], flush=True)
    out = "\n".join(lines)
    print(out)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
