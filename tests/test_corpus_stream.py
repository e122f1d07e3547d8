"""Streaming corpus ingest with incremental dedup: only genuinely new
documents reach the store; drained re-runs and redelivered batches
change nothing."""

from pyspark.sql import functions as F

from fabric_claims_spark.streaming.corpus_stream import (
    INGEST_BATCH_COL,
    corpus_ingest_stream,
)

BASE_A = "the quick brown fox jumps over the lazy dog again and again " * 4
BASE_B = "pack my box with five dozen liquor jugs every single day now " * 4
BASE_C = "sphinx of black quartz judge my vow said the typing tutor app " * 4
BASE_D = "how vexingly quick daft zebras jump over the sleeping guards " * 4


def _write_batches(spark, docs_dir):
    rows_by_file = [
        [(1, BASE_A), (2, BASE_B)],
        [
            (3, BASE_A),                       # exact dup of stored 1
            (4, BASE_B + "tiny suffix here"),  # near dup of stored 2
            (5, BASE_C),                       # new
        ],
        [
            (6, BASE_C),  # exact dup of stored 5
            (7, BASE_D),  # new
            (8, BASE_D),  # intra-batch exact dup of 7 — collapses
        ],
    ]
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(docs_dir), mode="append")
        # one file per append → one micro-batch per file (modulo
        # file-listing order, which only affects which doc of an
        # exact-dup pair survives, not the count)
    return rows_by_file


def test_corpus_ingest_dedups_across_batches(spark, tmp_path):
    docs_dir = tmp_path / "docs"
    _write_batches(spark, docs_dir)
    got = corpus_ingest_stream(
        spark,
        str(docs_dir),
        str(tmp_path / "ckpt"),
        str(tmp_path / "store"),
        threshold=0.5,
    )
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    # one survivor per content family: A, B, C, D
    assert len(ids) == 4
    texts = {r["text"] for r in got.collect()}
    assert BASE_A in texts and BASE_B in texts
    assert BASE_C in texts and BASE_D in texts
    assert INGEST_BATCH_COL not in got.columns


def test_corpus_ingest_rerun_is_noop(spark, tmp_path):
    docs_dir = tmp_path / "docs"
    _write_batches(spark, docs_dir)
    first = corpus_ingest_stream(
        spark,
        str(docs_dir),
        str(tmp_path / "ckpt"),
        str(tmp_path / "store"),
        threshold=0.5,
    )
    n = first.count()
    # re-run with the same checkpoint: no new files → no new batches;
    # the store must be byte-identical
    again = corpus_ingest_stream(
        spark,
        str(docs_dir),
        str(tmp_path / "ckpt"),
        str(tmp_path / "store"),
        threshold=0.5,
    )
    assert again.count() == n


def test_corpus_ingest_redelivery_skipped(spark, tmp_path):
    """Simulated at-least-once redelivery: replaying an already-
    committed batch id against the store must be a no-op (the marker
    committed atomically with the data gates the append), while a
    genuinely new batch id still folds."""
    from fabric_claims_spark.sources.merge import TableStore
    from fabric_claims_spark.streaming.corpus_stream import ingest_batch

    store = TableStore(spark, str(tmp_path / "store"))
    b0 = spark.createDataFrame([(1, BASE_A), (2, BASE_B)], "doc_id long, text string")
    assert ingest_batch(store, "corpus", b0, 0) is True
    before = store.read("corpus").count()
    # redeliver the SAME batch id (crash between sink and checkpoint
    # commit) — must refuse and leave the store untouched
    assert ingest_batch(store, "corpus", b0, 0) is False
    assert store.read("corpus").count() == before
    # a stale id below the watermark also refuses
    b1 = spark.createDataFrame([(9, BASE_C)], "doc_id long, text string")
    assert ingest_batch(store, "corpus", b1, 0) is False
    assert store.read("corpus").count() == before
    # the next id folds, and only the genuinely new doc lands
    b2 = spark.createDataFrame(
        [(10, BASE_A), (11, BASE_D)], "doc_id long, text string"
    )
    assert ingest_batch(store, "corpus", b2, 1) is True
    after = store.read("corpus")
    assert after.count() == before + 1
    assert after.where(F.col("doc_id") == 11).count() == 1
