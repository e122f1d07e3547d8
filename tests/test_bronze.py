"""Bronze quality-gate golden tests (SURVEY.md §5 plan items 1 & 3)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from fabric_claims_spark.pipeline.bronze import (
    BAD_TABLE,
    CLEAN_TABLE,
    DUPES_TABLE,
    MALFORMED_TABLE,
    run_bronze,
)
from fabric_claims_spark.sources.merge import TableStore
from tests.fixtures import write_claims_fixture

RUN_TS = datetime(2024, 7, 1, 2, 0, 0, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def bronze_run(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bronze")
    expected = write_claims_fixture(tmp / "claims.csv")
    store = TableStore(spark, str(tmp / "tables"))
    metrics = run_bronze(
        spark, store, str(tmp / "claims.csv"), run_ts=RUN_TS, batch_id="batch-1"
    )
    return store, metrics, expected


def test_split_invariant(bronze_run):
    """|raw| = |malformed| + |dupes| + |bad| + |clean| (SURVEY.md §2.7)."""
    store, metrics, expected = bronze_run
    q = metrics["quality_metrics"]
    assert metrics["rows_processed"] == expected["total"]
    assert sum(q.values()) == expected["total"]
    assert q["malformed"] == expected["malformed"]
    assert q["duplicates"] == expected["duplicates"]
    assert q["bad_quality"] == expected["bad_quality"]
    assert q["valid"] == expected["valid"]


def test_tables_match_metrics(bronze_run):
    store, metrics, _ = bronze_run
    q = metrics["quality_metrics"]
    assert store.read(MALFORMED_TABLE).count() == q["malformed"]
    assert store.read(DUPES_TABLE).count() == q["duplicates"]
    assert store.read(BAD_TABLE).count() == q["bad_quality"]
    assert store.read(CLEAN_TABLE).count() == q["valid"]


def test_dedup_keeps_latest(bronze_run):
    """W1: the survivor of each dup pair has the later ClaimDate."""
    store, _, expected = bronze_run
    clean = store.read(CLEAN_TABLE)
    for cid in expected["dup_survivor_ids"]:
        rows = clean.where(F.col("ClaimID") == cid).collect()
        assert len(rows) == 1
        assert str(rows[0]["ClaimDate"]) == "2024-06-30"
    dupes = store.read(DUPES_TABLE)
    assert dupes.where(F.col("ClaimDate") == "2024-01-05").count() == 3


def test_multi_violation_reasons_joined(bronze_run):
    """F6: multiple failing rules → ';'-joined reason string."""
    store, _, _ = bronze_run
    bad = store.read(BAD_TABLE)
    multi = bad.where(F.col("DataQualityReason").contains(";")).collect()
    assert len(multi) == 1
    assert set(multi[0]["DataQualityReason"].split(";")) == {
        "invalid_type",
        "invalid_submission",
    }


def test_corrupt_rows_have_payload(bronze_run):
    store, _, _ = bronze_run
    malformed = store.read(MALFORMED_TABLE)
    assert malformed.where(F.col("CorruptRecord").isNull()).count() == 0


def test_rerun_is_idempotent(spark, tmp_path):
    """MERGE idempotency (SURVEY.md §5 item 4): run(batch); run(batch)
    ≡ run(batch) for the clean table."""
    expected = write_claims_fixture(tmp_path / "claims.csv")
    store = TableStore(spark, str(tmp_path / "tables"))
    m1 = run_bronze(spark, store, str(tmp_path / "claims.csv"), run_ts=RUN_TS, batch_id="b1")
    m2 = run_bronze(spark, store, str(tmp_path / "claims.csv"), run_ts=RUN_TS, batch_id="b1")
    assert store.read(CLEAN_TABLE).count() == expected["valid"]
    assert m2["clean_inserted"] == 0
    assert m2["clean_updated"] == 0  # identical bytes → no-op update
    # reject tables are append sinks — they accumulate (reference
    # behavior: append mode, NB_BRONZE:221-223)
    assert store.read(DUPES_TABLE).count() == 2 * expected["duplicates"]


def test_jsonl_permissive_captures_corrupt_lines(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from fabric_claims_spark.schemas import CORRUPT_COL
    from fabric_claims_spark.sources.jsonl import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        "not json at all\n"
        '{"doc_id": "NaN-ish", "text": 3}\n'
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema)
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert {r["doc_id"] for r in good} == {1, 2}
    assert len(bad) == 2  # the non-JSON line AND the schema-violating doc
    assert any("not json" in r[CORRUPT_COL] for r in bad)
    # caller's schema object was not mutated by the corrupt-col append
    assert CORRUPT_COL not in schema.names
