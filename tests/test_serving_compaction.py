"""compact_index_table (VERDICT r9 item 6): reader-visible state is
bit-identical across a compaction, orphans are reclaimed for free,
and the physical file count collapses to the target."""

import glob

from pyspark.sql import functions as F

from fabric_claims_spark.operators.serving_index import (
    LEX_COMMITS,
    LEX_POSTINGS,
    apply_lexical_batch,
    compact_index_table,
    lexical_postings,
    read_lexical_index,
    vacuum_uncommitted,
)
from fabric_claims_spark.sources.merge import TableStore
from fabric_claims_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _postings_files(store) -> int:
    version = store._current_version(LEX_POSTINGS)
    return len(
        glob.glob(f"{store._dir(LEX_POSTINGS)}/{version}/*.parquet")
    )


def test_compaction_preserves_visible_state_and_drops_orphans(
    spark, tmp_path
):
    docs = load_table(spark, SF, "documents")
    store = TableStore(spark, str(tmp_path / "lex"))
    for b in range(5):
        apply_lexical_batch(
            store, docs.where(F.pmod("doc_id", F.lit(5)) == b), b
        )
    td, df_, dl = read_lexical_index(store)
    before = sorted(map(tuple, td.collect()))
    df_before = sorted(map(tuple, df_.collect()))

    # a torn-apply orphan rides along and must vanish on compact
    orphan = lexical_postings(
        docs.limit(3).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
    ).withColumn("_token", F.lit("dead-attempt"))
    n_orphan = orphan.count()
    assert n_orphan > 0
    store.append(LEX_POSTINGS, orphan)

    n = compact_index_table(store, LEX_POSTINGS, LEX_COMMITS, n_files=4)
    assert n == len(before)
    td2, df2, _ = read_lexical_index(store)
    assert sorted(map(tuple, td2.collect())) == before
    assert sorted(map(tuple, df2.collect())) == df_before
    assert _postings_files(store) <= 4
    # the orphans were dropped by the rewrite itself
    assert vacuum_uncommitted(store, LEX_POSTINGS, LEX_COMMITS) == 0

    # post-compaction increments still fold in (tokens were retained,
    # so the commit protocol is undisturbed)
    extra = docs.limit(5).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    apply_lexical_batch(store, extra, 99)
    td3, _, _ = read_lexical_index(store)
    assert td3.count() > len(before)


def test_compaction_on_missing_table_is_noop(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "empty"))
    assert compact_index_table(store, LEX_POSTINGS, LEX_COMMITS) == 0
