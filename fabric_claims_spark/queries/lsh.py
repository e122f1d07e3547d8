"""MinHash-LSH / SimHash queries (rows-only driver checks).

These operators hinge on xxhash64, which DuckDB cannot reproduce, so
they register without an oracle — the driver records the weaker
rows-only check; the semantic assertions live in
tests/test_extensions.py (planted near-dups found, Hamming ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fabric_claims_spark.extensions.dedup import (
    minhash_near_dups,
    minhash_signatures,
    simhash64,
)
from fabric_claims_spark.queries import query
from fabric_claims_spark.sources.parquet import load_table


@query("docs_minhash_neardup", oracle=None)
def docs_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle → minhash → band → bucket-join near-dup pairs (same-vocabulary synthetic docs
    produce a tight band of high-overlap pairs; threshold 0.5 keeps
    the genuinely-similar tail)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_dups(
        docs, "doc_id", "text", threshold=0.5, num_hashes=64, bands=16
    ).orderBy("doc_a", "doc_b")


@query("docs_simhash", oracle=None)
def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (near-dup via small Hamming
    distance; deterministic given xxhash64)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash64(docs, "doc_id", "text").orderBy("doc")


@query("docs_winnow_overlap", oracle=None)
def docs_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap pairs (rolling k-gram hashes,
    window minima — substring-overlap guarantee the MinHash estimate
    lacks)."""
    from fabric_claims_spark.extensions.text import winnow_overlap_pairs

    docs = load_table(spark, sf_dir, "documents")
    # long grams + df-cutoff: this corpus's shared vocabulary makes
    # short substrings corpus-common (hot-key join bombs)
    return winnow_overlap_pairs(
        docs, "doc_id", "text", k=16, window=8, min_shared=4, max_doc_freq=10
    ).orderBy("doc_a", "doc_b")


@query("docs_minhash_signatures", oracle=None)
def docs_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix (doc → 64 min-hash slots)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs, "doc_id", "text", num_hashes=64).orderBy("doc")
