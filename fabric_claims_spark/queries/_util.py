"""Shared helpers for driver-contract queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact-decimal casts: the test data's money/rate doubles carry <=2dp
# of true precision, so these casts are exact and engine-independent.
MONEY = "decimal(18,4)"
RATE = "decimal(6,4)"


def money(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(MONEY)


def rate(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(RATE)


def dsum(c: Column) -> Column:
    """Exact decimal sum surfaced as double (deterministic cross-engine).

    Rounded to scale 4 before the cast: DuckDB's decimal→double cast is
    not correctly rounded once the scaled integer exceeds 2^53, so both
    engines reduce to scale 4 (exactly representable) first.
    """
    return F.round(F.sum(c), 4).cast("double")


def davg(c: Column) -> Column:
    """Deterministic average: exact decimal sum cast double, / count."""
    return F.sum(c).cast("double") / F.count(F.lit(1))
