"""JSON-lines ingestion with declared schema and corrupt-record
capture — the JSONL twin of sources/csv.read_claims_csv (S1), for the
document/LLM-corpus landing path where upstream producers emit
newline-delimited JSON.

Same contract as the CSV path (reference
NBclaims_bronze.Notebook/notebook-content.py:58-81 schema-on-read):
explicit StructType, PERMISSIVE mode, malformed lines captured into
the CorruptRecord column, never schema inference (an inference pass
is a second full scan of the corpus at 100 TB, and a schema drift
upstream silently changes the contract instead of landing in the
corrupt bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from fabric_claims_spark.schemas import CORRUPT_COL


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> DataFrame:
    """Read newline-delimited JSON under an explicit schema; rows that
    fail to parse (or whose fields violate the schema) land with all
    declared columns NULL and the raw line in ``CorruptRecord``.

    The corrupt column must be part of the declared schema for Spark
    to populate it under PERMISSIVE mode — appended here so callers
    pass only their data schema.
    """
    # build a NEW StructType — StructType.add mutates the caller's
    full = (
        StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
        if CORRUPT_COL not in schema.names
        else schema
    )
    return spark.read.json(
        path,
        schema=full,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
    )
