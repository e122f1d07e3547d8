"""Security/governance operators (SURVEY.md §2.12).

The reference documents — but does not ship code for — Dynamic Data
Masking, column-level security, and RLS via a predicate function +
security policy (README.md:166-172 of the reference). In a single-
engine Spark design these become view factories: masking is a
projection wrapper, RLS is a predicate-injecting wrapper. The salted-
hash pseudonymization that IS in reference code lives in
functions/hashing.py and is applied at silver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_full(col: Column) -> Column:
    """DDM 'default()' analog: full redaction."""
    return F.lit("****")


def mask_partial(col: Column, keep_last: int = 4) -> Column:
    """DDM partial() analog: keep the last N characters."""
    n = F.length(col)
    return F.concat(
        F.repeat(F.lit("*"), F.greatest(n - keep_last, F.lit(0))),
        col.substr(F.greatest(n - keep_last + 1, F.lit(1)), F.lit(keep_last)),
    )


def mask_hash(col: Column, salt: str) -> Column:
    """Masking by pseudonymization (join-stable)."""
    return F.sha2(F.concat(col, F.lit(salt)), 256)


def masked_view(
    df: DataFrame, masks: dict[str, Callable[[Column], Column]]
) -> DataFrame:
    """Column-masking view factory: apply per-column mask functions,
    pass everything else through (projection-only — no shuffle)."""
    return df.select(
        *[
            masks[c](F.col(c)).alias(c) if c in masks else F.col(c)
            for c in df.columns
        ]
    )


def row_filtered_view(df: DataFrame, predicate: Column) -> DataFrame:
    """RLS view factory (Security.fnClaimsProviderPredicate analog):
    the predicate is injected under the consumer's identity and pushes
    down to the scan like any filter."""
    return df.where(predicate)


def provider_rls(df: DataFrame, provider_ids: list[str]) -> DataFrame:
    """The reference's RLS shape: a provider sees only their rows."""
    return row_filtered_view(df, F.col("ProviderID").isin(provider_ids))


def forget_subject(
    store,
    subject_tables: dict[str, str],
    subject_id,
    audit_pipeline: str = "gdpr_erasure",
) -> dict[str, int]:
    """Right-to-be-forgotten: delete every row for ``subject_id``
    across ``subject_tables`` ({table_name: key_column}) and append a
    per-table audit row recording the erasure counts.

    Each table is one ``TableStore.delete`` — a native Delta DELETE
    on clusters, an atomic anti-filter commit on the parquet
    fallback. The audit row carries only the COUNT and the pipeline
    tag, never the subject key itself (an erasure log that names the
    erased subject defeats the erasure). Returns {table: rows_erased}.
    """
    from fabric_claims_spark.sources.audit import append_audit_row

    results: dict[str, int] = {}
    for table, key_col in subject_tables.items():
        n = store.delete(table, F.col(key_col) == F.lit(subject_id))
        results[table] = n
        append_audit_row(
            store.spark,
            store,
            pipeline=audit_pipeline,
            layer="governance",
            status="Succeeded",
            rows_written=n,
            target_object=table,
        )
    return results
