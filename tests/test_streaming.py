"""Streaming bronze twin: same results as batch, exactly-once across
restarts (SURVEY.md §7.5)."""

from datetime import datetime, timezone

from fabric_claims_spark.pipeline.bronze import CLEAN_TABLE, DUPES_TABLE
from fabric_claims_spark.sources.merge import TableStore
from fabric_claims_spark.streaming.bronze_stream import run_bronze_streaming
from tests.fixtures import write_claims_fixture

RUN_TS = datetime(2024, 7, 1, 2, 0, 0, tzinfo=timezone.utc)


def test_streaming_matches_batch_and_is_exactly_once(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    expected = write_claims_fixture(landing / "claims_batch1.csv")

    store = TableStore(spark, str(tmp_path / "tables"))
    metrics = run_bronze_streaming(
        spark,
        store,
        str(landing),
        checkpoint_dir=str(tmp_path / "ckpt"),
        run_ts=RUN_TS,
    )
    assert len(metrics) == 1
    q = metrics[0]["quality_metrics"]
    assert q["valid"] == expected["valid"]
    assert q["duplicates"] == expected["duplicates"]
    assert store.read(CLEAN_TABLE).count() == expected["valid"]

    # restart with the same checkpoint: file already processed → no-op
    metrics2 = run_bronze_streaming(
        spark, store, str(landing), checkpoint_dir=str(tmp_path / "ckpt"), run_ts=RUN_TS
    )
    processed = [m for m in metrics2 if m["rows_processed"] > 0]
    assert processed == []
    assert store.read(CLEAN_TABLE).count() == expected["valid"]
    assert store.read(DUPES_TABLE).count() == expected["duplicates"]

    # a new file arrives → exactly the new batch is processed
    write_claims_fixture(landing / "claims_batch2.csv", seed=11)
    metrics3 = run_bronze_streaming(
        spark, store, str(landing), checkpoint_dir=str(tmp_path / "ckpt"), run_ts=RUN_TS
    )
    processed = [m for m in metrics3 if m["rows_processed"] > 0]
    assert len(processed) == 1
    assert store.read(CLEAN_TABLE).count() == 2 * expected["valid"]
