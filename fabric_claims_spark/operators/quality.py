"""Data-driven DQ rule engine (SURVEY.md §2.2 P5-P9, F6/F7).

The reference hard-codes 9 ``when(condition, reason)`` branches into
an array, keeps rows where any reason is non-null via the ``exists``
higher-order function, and joins reasons with ';'
(NBclaims_bronze.Notebook/notebook-content.py:137-171). Here the rule
list is data: each rule is (name, Column condition-of-violation), and
the whole evaluation stays in Catalyst — one projection, no UDFs, no
extra passes per rule.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fabric_claims_spark.schemas import (
    UUID_REGEX,
    VALID_GENDERS,
    VALID_STATUSES,
    VALID_SUBMISSION_METHODS,
    VALID_TYPES,
)

REASON_COL = "DataQualityReason"


@dataclass(frozen=True)
class Rule:
    name: str
    violation: Column  # true ⇒ row fails this rule


def claims_rules() -> list[Rule]:
    """The reference's 9 bronze rules (NB_BRONZE:137-162)."""
    c = F.col
    return [
        Rule("invalid_gender", ~c("PatientGender").isin(VALID_GENDERS)),
        Rule("invalid_status", ~c("ClaimStatus").isin(VALID_STATUSES)),
        Rule("invalid_type", ~c("ClaimType").isin(VALID_TYPES)),
        Rule("invalid_submission", ~c("ClaimSubmissionMethod").isin(VALID_SUBMISSION_METHODS)),
        Rule("nonpositive_amount", c("ClaimAmount") <= 0),
        Rule("invalid_age", (c("PatientAge") < 0) | (c("PatientAge") > 120)),
        Rule("invalid_claim_id", ~c("ClaimID").rlike(UUID_REGEX)),
        Rule("invalid_patient_id", ~c("PatientID").rlike(UUID_REGEX)),
        Rule("invalid_provider_id", ~c("ProviderID").rlike(UUID_REGEX)),
    ]


def with_reasons(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Adds the ';'-joined reason string (null-skipping concat_ws,
    NB_BRONZE:164-168) and a boolean ``_has_violation``."""
    reasons = F.array(*[F.when(r.violation, F.lit(r.name)) for r in rules])
    return df.withColumn(
        REASON_COL, F.concat_ws(";", reasons)
    ).withColumn(
        "_has_violation", F.exists(reasons, lambda x: x.isNotNull())
    )


def split_by_rules(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """(passing, failing-with-reasons) — the NB_BRONZE:166-182 split,
    expressed as one tagged projection + two filters instead of a
    left-anti join back onto the input (same semantics, one scan)."""
    tagged = with_reasons(df, rules)
    good = tagged.where(~F.col("_has_violation")).drop(REASON_COL, "_has_violation")
    bad = tagged.where(F.col("_has_violation")).drop("_has_violation")
    return good, bad
