"""Scoped lifetime for operator-internal caches.

Several operators cache a loop-invariant or multiply-consumed
intermediate (MinHash signatures, PageRank edge ratios, basket
arrays). The cache is correct — it amortizes one scan across several
consumers — but the operators return LAZY frames, so the cache cannot
be unpersisted inside the operator without defeating it: the consuming
action happens in the caller. Left alone, a library user composing
operators in one long-lived session accretes executor storage.

``tracked_cache`` is a drop-in for ``DataFrame.cache()`` that also
registers the frame with the innermost active ``scoped_caches`` block,
which unpersists everything registered inside it on exit:

    with scoped_caches():
        pairs = minhash_near_dups(docs, "doc_id", "text")
        pairs.write.parquet(out)          # consuming action
    # signatures cache released here

Outside any scope the behavior is exactly ``cache()`` (the bench
harness clears between queries via ``spark.catalog.clearCache()``;
one-shot scripts end the JVM anyway). Scopes nest: each block releases
only the caches created within it.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_SCOPES: list[list[DataFrame]] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()``, registered with the innermost open scope."""
    df = df.cache()
    if _SCOPES:
        _SCOPES[-1].append(df)
    return df


@contextmanager
def scoped_caches():
    """Release every ``tracked_cache`` created inside the block."""
    scope: list[DataFrame] = []
    _SCOPES.append(scope)
    try:
        yield
    finally:
        _SCOPES.pop()
        for df in scope:
            try:
                df.unpersist(blocking=False)
            except Exception:  # session already stopped — nothing to free
                pass
