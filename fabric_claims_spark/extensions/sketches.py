"""Frequency-sketch operators: Misra–Gries heavy-hitter candidates
and the exact two-pass heavy-hitters pipeline built on them.

Why a sketch at all: the one-shuffle ``groupBy(key).count()`` answer
breaks down when the key domain is enormous (URLs, shingles, user
agents at 100 TB) — the shuffle carries every distinct key and the
reduce side materializes the full group table. The classic fix is
two passes [Misra & Gries 1982; Agarwal et al., "Mergeable Summaries",
PODS 2012]:

1. **Candidate pass** — each input partition runs a Misra–Gries
   summary with ``k`` counters over its local rows (bounded memory,
   single sequential scan, no shuffle). Pigeonhole guarantee: any key
   with global frequency > n/(k+1) must exceed the local n_p/(k+1)
   threshold in at least one partition, so the union of per-partition
   survivors has perfect recall for support s with k = ceil(1/s).
   The union is tiny: ≤ k × partitions rows.
2. **Exact pass** — broadcast-semi-join the candidate set back onto
   the input and count exactly, filtering to ``count >= ceil(s·n)``.
   False positives from pass 1 die here, so the FINAL output is
   exact and independent of partitioning and arrival order — which is
   what makes the operator oracle-checkable against plain SQL.

The per-partition summary is imperative by nature (counter eviction),
so pass 1 is one of the catalog's two sanctioned Arrow exceptions
(the other is the multimodal decode, queries/text_docs.py): an
Arrow-batched ``mapInPandas`` that scans each partition once and
emits at most ``k`` rows. Everything else is JVM-side DataFrame ops.

No counterpart in the reference (lkv971/fabric-claims) — its
warehouse counts full domains; this is the bounded-memory path a
100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries with ``k`` counters.

    Returns a deduplicated one-column DataFrame of candidate keys.
    Recall guarantee: every key with global frequency > n/(k+1)
    appears; precision is cleaned up by the exact second pass.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            # Vectorized per-batch counting, then a mergeable-summary
            # fold into the running counters: add, and if the counter
            # set exceeds k, subtract the (k+1)-th largest count from
            # every counter and drop the non-positive ones (the merge
            # rule of Agarwal et al. — same guarantee as row-at-a-time
            # decrement, batch-friendly).
            for key, cnt in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - cut for key, c in counters.items() if c > cut
                }
        yield pd.DataFrame({key_col: list(counters.keys())})

    field = df.schema[key_col]
    out = df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} {field.dataType.simpleString()}"
    )
    return out.distinct()


def heavy_hitters_2pass(
    df: DataFrame, key_col: str, support: float
) -> DataFrame:
    """Exact heavy hitters (frequency >= ceil(support·n)) via
    Misra–Gries candidate pruning + an exact broadcast-semi-joined
    recount. Output: (key, exact_count, share) — exact, deterministic,
    partitioning-independent.

    Scale notes (100 TB): pass 1 never shuffles (bounded per-partition
    scan); the candidate set (≤ ceil(1/s) × partitions rows) is
    broadcast, so pass 2's only shuffle carries candidate keys alone —
    the full key domain never crosses the wire. The total-count scalar
    rides along as a broadcast 1-row frame, not a driver round-trip
    inside the plan.
    """
    if not (0.0 < support <= 1.0):
        raise ValueError(f"support must be in (0, 1], got {support}")
    k = max(1, int(1.0 / support))
    candidates = misra_gries_candidates(df, key_col, k)
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .crossJoin(F.broadcast(total))
        .where(
            F.col("exact_count")
            >= F.ceil(F.lit(support) * F.col("_total")).cast("long")
        )
        .select(
            key_col,
            "exact_count",
            F.round(
                F.col("exact_count").cast("double") / F.col("_total"), 6
            ).alias("share"),
        )
    )
