"""CSV ingestion with declared schema and corrupt-record capture (S1).

Mirrors the reference's permissive schema-on-read contract
(NBclaims_bronze.Notebook/notebook-content.py:58-81): explicit
StructType, header, PERMISSIVE mode, malformed lines captured into the
CorruptRecord column — never schema inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from fabric_claims_spark.schemas import CLAIMS_RAW_SCHEMA, CORRUPT_COL


def read_claims_csv(
    spark: SparkSession,
    path: str,
    schema: StructType = CLAIMS_RAW_SCHEMA,
) -> DataFrame:
    return spark.read.csv(
        path,
        schema=schema,
        header=True,
        sep=",",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
    )
