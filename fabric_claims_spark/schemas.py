"""Declared schemas, value domains, and validation patterns.

Mirrors the reference's explicit schema-on-read contract: the bronze
ingest StructType (NBclaims_bronze.Notebook/notebook-content.py:58-77),
the valid-value domains used by the quality rules (ibid.:137-140), and
the UUID regex (ibid.:141). Schema inference is never used at a layer
boundary.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Corrupt-record capture column for PERMISSIVE reads
# (NBclaims_bronze.Notebook/notebook-content.py:76,81).
CORRUPT_COL = "CorruptRecord"

# Bronze ingest schema (NBclaims_bronze.Notebook/notebook-content.py:58-77).
CLAIMS_RAW_SCHEMA = StructType(
    [
        StructField("ClaimID", StringType(), True),
        StructField("PatientID", StringType(), True),
        StructField("ProviderID", StringType(), True),
        StructField("ClaimAmount", DecimalType(18, 2), True),
        StructField("ClaimDate", DateType(), True),
        StructField("DiagnosisCode", StringType(), True),
        StructField("ProcedureCode", StringType(), True),
        StructField("PatientAge", IntegerType(), True),
        StructField("PatientGender", StringType(), True),
        StructField("ProviderSpecialty", StringType(), True),
        StructField("ClaimStatus", StringType(), True),
        StructField("PatientIncome", DecimalType(18, 2), True),
        StructField("PatientMaritalStatus", StringType(), True),
        StructField("PatientEmploymentStatus", StringType(), True),
        StructField("ProviderLocation", StringType(), True),
        StructField("ClaimType", StringType(), True),
        StructField("ClaimSubmissionMethod", StringType(), True),
        StructField(CORRUPT_COL, StringType(), True),
    ]
)

# Valid-value domains (NBclaims_bronze.Notebook/notebook-content.py:137-140).
VALID_GENDERS = ["F", "M", "U", "Other"]
VALID_STATUSES = ["Approved", "Denied", "Pending", "Partial"]
VALID_TYPES = ["Routine", "Emergency", "Inpatient", "Outpatient", "Urgent Care"]
VALID_SUBMISSION_METHODS = ["Paper", "Online", "Phone"]

# Version-agnostic UUID regex (NBclaims_bronze.Notebook/notebook-content.py:141).
UUID_REGEX = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

# Date-spine bounds (NBclaims_silver.Notebook/notebook-content.py:134-135).
DATE_SPINE_START = "2015-01-01"
DATE_SPINE_END = "2030-12-31"

# Driver-provided test tables (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
