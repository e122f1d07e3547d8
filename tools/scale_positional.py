"""Positional serving-index scale evidence (round-10 continuation).

The positions table is token-stream-sized (one row per token, not per
distinct (doc, term) like lex_postings) — the axis to verify is that
per-increment APPLY cost stays flat as the STORED corpus grows (the
apply never re-scans stored rows), and that phrase-query read cost
grows with the postings of the phrase terms, not with increments.

Usage: python tools/scale_positional.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from fabric_claims_spark.operators.serving_index import (  # noqa: E402
    POS_COMMITS,
    POS_POSTINGS,
    apply_positional_batch,
    compact_index_table,
    phrase_occurrences,
    read_positional_index,
)
from fabric_claims_spark.session import get_spark  # noqa: E402
from fabric_claims_spark.sources.merge import TableStore  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N_INCREMENTS = 12


def main() -> None:
    spark = get_spark("scale-positional")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    phrase = spark.createDataFrame(
        [("key", "agg", "row")], ["w1", "w2", "w3"]
    )
    work = tempfile.mkdtemp(prefix="pos_scale_")
    try:
        store = TableStore(spark, work)
        print("== apply cost vs stored size (sf0.1 corpus, "
              f"{N_INCREMENTS} increments) ==")
        for b in range(N_INCREMENTS):
            batch = docs.where(
                F.pmod("doc_id", F.lit(N_INCREMENTS)) == b
            )
            t0 = time.time()
            apply_positional_batch(store, batch, b)
            dt = time.time() - t0
            if b in (0, 3, 7, 11):
                t1 = time.time()
                n = phrase_occurrences(
                    read_positional_index(store), phrase
                ).count()
                rt = time.time() - t1
                print(
                    f"  increment {b:2d}: apply {dt:5.2f} s | "
                    f"phrase read {rt:5.2f} s ({n} occurrences)"
                )
            else:
                print(f"  increment {b:2d}: apply {dt:5.2f} s")
        stored = read_positional_index(store).count()
        t0 = time.time()
        compact_index_table(store, POS_POSTINGS, POS_COMMITS)
        print(
            f"compacted {stored:,} stored positions in "
            f"{time.time() - t0:5.2f} s"
        )
        t1 = time.time()
        n = phrase_occurrences(read_positional_index(store), phrase).count()
        print(
            f"post-compaction phrase read {time.time() - t1:5.2f} s "
            f"({n} occurrences)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
