"""Z-order layout: correctness of the interleave and MEASURED pruning
benefit from parquet footer statistics (the quantity that matters at
100 TB — files a box predicate can skip without reading)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fabric_claims_spark.operators.layout import (
    rank_normalize,
    write_zordered,
    zorder_key,
    zorder_key_sql,
)


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x long, y long"
    )
    got = [
        r["z"]
        for r in df.select(zorder_key(["x", "y"], bits=8).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]

    def morton(x, y):
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    want = [morton(x, y) for x, y in [(0, 0), (0, 1), (1, 0), (3, 5), (255, 255)]]
    assert got == want


def test_zorder_sql_twin_matches_column_expr(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 256).alias("x"), ((F.col("id") * 7) % 256).alias("y")
    )
    a = df.select(zorder_key(["x", "y"], bits=8).alias("z"))
    b = df.selectExpr(f"{zorder_key_sql(['x', 'y'], bits=8)} AS z")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_zorder_key_validates_args(spark):
    with pytest.raises(ValueError):
        zorder_key(["x"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)


def _files_surviving_box(path, x_col, x_lo, x_hi, y_col, y_lo, y_hi):
    """Files whose footer min/max box intersects the predicate box —
    exactly what the scan planner cannot prune."""
    ds = pq.ParquetDataset(path)
    alive = 0
    for frag in ds.fragments:
        md = frag.metadata
        names = [md.row_group(0).column(j).path_in_schema for j in range(md.num_columns)]
        xi, yi = names.index(x_col), names.index(y_col)
        xmn = min(md.row_group(i).column(xi).statistics.min for i in range(md.num_row_groups))
        xmx = max(md.row_group(i).column(xi).statistics.max for i in range(md.num_row_groups))
        ymn = min(md.row_group(i).column(yi).statistics.min for i in range(md.num_row_groups))
        ymx = max(md.row_group(i).column(yi).statistics.max for i in range(md.num_row_groups))
        if xmx >= x_lo and xmn <= x_hi and ymx >= y_lo and ymn <= y_hi:
            alive += 1
    return alive, len(ds.fragments)


def test_zorder_layout_prunes_more_files_than_single_sort(spark, tmp_path):
    """A 1/16 × 1/16 box predicate on (x, y): under z-order BOTH
    dimensions prune; under a sort on x alone, y's min/max spans every
    file and only x prunes. Deterministic data → deterministic file
    boxes."""
    # the full 256x256 grid, one point per cell — x and y independent
    # (a multiplicative hash of id for both would make y a function of
    # x and let even a single-column sort partially prune on y)
    df = spark.range(0, 1 << 16).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted_x")
    write_zordered(df, zpath, ["x", "y"], bits=8, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )
    # box on y ALONE: the x-sorted layout cannot prune a single file
    # (every file spans the full y domain); z-order keeps y-locality
    # per file and prunes the large majority.
    z_alive, z_total = _files_surviving_box(zpath, "x", 0, 255, "y", 0, 15)
    s_alive, s_total = _files_surviving_box(spath, "x", 0, 255, "y", 0, 15)
    assert z_total >= 8 and s_total >= 8
    assert s_alive == s_total  # single-column sort: zero pruning on y
    assert z_alive < s_alive
    assert z_alive <= z_total // 2
    # box on x: the x-sort prunes perfectly (its best case); z-order
    # still prunes most files — the curve trades a little per-column
    # locality for locality on EVERY column.
    zx_alive, _ = _files_surviving_box(zpath, "x", 0, 15, "y", 0, 255)
    assert zx_alive <= z_total // 2


def test_rank_normalize_buckets_are_bounded(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") * F.col("id") % 7919).alias("v")
    )
    b = df.select(rank_normalize(df, "v", bits=4).alias("b"))
    stats = b.agg(
        F.min("b").alias("mn"), F.max("b").alias("mx"),
        F.countDistinct("b").alias("d"),
    ).collect()[0]
    assert stats["mn"] >= 0 and stats["mx"] < 16
    assert stats["d"] >= 12  # roughly uniform occupancy


def test_compaction_rewrites_small_files(spark, tmp_path):
    """200 tiny files → a handful of right-sized ones, data intact,
    and the shrink path must be shuffle-free (coalesce)."""
    from fabric_claims_spark.operators.layout import compact_parquet_dir

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    spark.range(0, 20000).selectExpr(
        "id", "id % 97 AS k"
    ).repartition(200).write.parquet(src)
    n_src_files = len(
        [p for p in __import__("os").listdir(src) if p.endswith(".parquet")]
    )
    assert n_src_files >= 150  # genuinely fragmented

    n_out = compact_parquet_dir(spark, src, dst, target_file_mb=128)
    assert n_out <= 4  # tiny data → one-ish target file

    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert b.count() == 20000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # shuffle-free shrink: the coalesce plan has no Exchange
    df = spark.read.parquet(src).coalesce(1)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Exchange" not in plan


def test_bloom_sidecar_prunes_files_and_is_exact(spark, tmp_path):
    """The bloom sidecar must (a) never lose a row — the pruned point
    lookup equals the full-scan filter, (b) genuinely skip files for
    a key living in one file, (c) prune everything for an absent key
    (modulo false positives, which only ever ADD files)."""
    import os

    from fabric_claims_spark.operators.layout import (
        bloom_probe_files,
        bloom_pruned_read,
        build_bloom_sidecar,
    )

    src = str(tmp_path / "bloomed")
    # 16 files, keys range-partitioned so each key lives in ~1 file
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.repartitionByRange(16, "o_orderkey").write.parquet(src)
    n_files = len(
        [p for p in os.listdir(src) if p.endswith(".parquet")]
    )
    assert n_files >= 8

    build_bloom_sidecar(spark, src, "o_orderkey")
    some_key = o.select("o_orderkey").orderBy("o_orderkey").first()[0]

    files = bloom_probe_files(spark, src, some_key, "o_orderkey")
    assert 1 <= len(files) < n_files / 2  # real skipping

    got = bloom_pruned_read(spark, src, some_key, "o_orderkey").collect()
    want = (
        spark.read.parquet(src)
        .where(F.col("o_orderkey") == some_key)
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)) and want

    absent = 10**12  # far outside the key domain
    assert bloom_pruned_read(spark, src, absent, "o_orderkey").count() == 0


def test_stats_pruned_range_read_is_exact_and_skips(spark, tmp_path):
    """File-level min/max pruning: on range-clustered data a narrow
    range opens a small fraction of files and returns exactly the
    full-scan result; on random layout it honestly reports no
    pruning (every box intersects)."""
    from fabric_claims_spark.operators.layout import (
        stats_prune_files,
        stats_pruned_read,
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    clustered = str(tmp_path / "clustered")
    o.repartitionByRange(16, "o_orderkey").write.parquet(clustered)

    lo, hi = 100, 200
    files, total = stats_prune_files(clustered, "o_orderkey", lo, hi)
    assert total >= 8 and len(files) <= total / 4  # real skipping

    got = stats_pruned_read(spark, clustered, "o_orderkey", lo, hi)
    want = o.where(F.col("o_orderkey").between(lo, hi))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # random layout: boxes all overlap — no pruning, still exact
    shuffled = str(tmp_path / "shuffled")
    o.repartition(16).write.parquet(shuffled)
    files2, total2 = stats_prune_files(shuffled, "o_orderkey", lo, hi)
    assert len(files2) == total2


def test_bloom_sidecar_incremental_update(spark, tmp_path):
    """Index maintenance: update_bloom_sidecar hashes ONLY files not
    yet indexed (0 work on a no-op call), keys in newly landed files
    become findable, and the safe read treats unindexed files as
    always-qualifying during the lag window."""
    import os

    from fabric_claims_spark.operators.layout import (
        bloom_pruned_read_safe,
        build_bloom_sidecar,
        update_bloom_sidecar,
    )

    src = str(tmp_path / "grow")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    first = o.where(F.col("o_orderkey") < 1000)
    first.repartitionByRange(8, "o_orderkey").write.parquet(src)
    build_bloom_sidecar(spark, src, "o_orderkey")
    assert update_bloom_sidecar(spark, src, "o_orderkey") == 0  # no-op

    # land new files with the remaining keys
    late = o.where(F.col("o_orderkey") >= 1000)
    late.repartitionByRange(4, "o_orderkey").write.mode("append").parquet(src)
    late_key = late.select(F.max("o_orderkey")).first()[0]

    # lag window: key only findable via the SAFE read until indexed
    got_safe = bloom_pruned_read_safe(
        spark, src, late_key, "o_orderkey"
    ).count()
    want = o.where(F.col("o_orderkey") == late_key).count()
    assert got_safe == want and want > 0

    n_new = update_bloom_sidecar(spark, src, "o_orderkey")
    assert n_new >= 4  # exactly the late files (+ none of the old)
    got = bloom_pruned_read_safe(spark, src, late_key, "o_orderkey").count()
    assert got == want
    # and the indexed probe now prunes: far fewer files than total
    from fabric_claims_spark.operators.layout import bloom_probe_files

    n_total = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    )
    files = bloom_probe_files(spark, src, late_key, "o_orderkey")
    assert 1 <= len(files) < n_total / 2
