"""PII pseudonymization (F5 — NBclaims_silver.Notebook/
notebook-content.py:163-168, salt at :51).

sha2(concat(value, salt), 256) — deterministic, join-stable across
tables (the same ID hashes identically in dims and facts, preserving
referential integrity without storing the raw identifier).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pseudonymize(col: str | Column, salt: str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.concat(col, F.lit(salt)), 256)
