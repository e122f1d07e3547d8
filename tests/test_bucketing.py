"""Bucketed co-located join: the write-time shuffle must eliminate
the join-time exchange (operators/bucketing)."""

from pyspark.sql import functions as F

from fabric_claims_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, df, mode="simple"):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_bucketed_smj_has_no_join_key_exchange(spark, tmp_path):
    for t in ("bt_orders", "bt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(
        spark.read.parquet(f"{SF}/orders.parquet"),
        "bt_orders",
        "o_orderkey",
        8,
        path=str(tmp_path / "o"),
    )
    write_bucketed(
        spark.read.parquet(f"{SF}/lineitem.parquet"),
        "bt_lineitem",
        "l_orderkey",
        8,
        path=str(tmp_path / "l"),
    )
    try:
        j = (
            read_bucketed(spark, "bt_orders")
            .hint("merge")  # pin SMJ: broadcast would hide the claim
            .join(
                read_bucketed(spark, "bt_lineitem").hint("merge"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(spark, j)
        assert "SortMergeJoin" in plan
        # the whole point: neither side shuffles on the join key
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Bucketed: true" in _plan(spark, j, "formatted")
        # and the result is still the plain join's result
        want = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_ivf_index_probe_prunes_buckets_no_exchange(spark, tmp_path):
    """The persisted ANN path end-to-end: kmeans-trained centroids →
    vectors written bucketed by assigned_centroid → probe reads ONLY
    the probed buckets (bucket pruning visible in the plan), no
    Exchange, TakeOrderedAndProject top-k — and on well-separated
    blobs nprobe=1 recall vs brute force is exact."""
    from fabric_claims_spark.extensions.similarity import (
        as_double_array,
        cosine,
        ivf_index_build,
        ivf_index_probe,
    )

    spark.sql("DROP TABLE IF EXISTS bt_ivf")
    rows = []
    for blob, base in enumerate([(10.0, 0.0), (0.0, 10.0), (-10.0, 0.0), (0.0, -10.0)]):
        for i in range(50):
            rows.append(
                (blob * 100 + i, [base[0] + (i % 7) * 0.05, base[1] + (i % 5) * 0.05])
            )
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    try:
        cents = ivf_index_build(
            spark, vectors, "bt_ivf", k=4, iters=3, path=str(tmp_path / "ivf")
        )
        assert len(cents) == 4
        q = [10.0, 0.2]
        probe = ivf_index_probe(spark, "bt_ivf", cents, q, nprobe=1, topk=10)
        plan = _plan(spark, probe, "formatted")
        assert "SelectedBucketsCount: 1 out of 4" in plan
        assert "Exchange" not in plan
        assert "TakeOrderedAndProject" in _plan(spark, probe)
        got = [r["vec_id"] for r in probe.collect()]
        # exact reference: the SAME scoring (rounded cosine, id
        # tie-break) over ALL vectors — nprobe=1 on separated blobs
        # must lose nothing to the pruning
        qv = F.array(*[F.lit(x) for x in q])
        want = [
            r["vec_id"]
            for r in vectors.select(
                "vec_id",
                F.round(cosine(as_double_array("embedding"), qv), 6).alias(
                    "score"
                ),
            )
            .orderBy(F.col("score").desc(), F.col("vec_id").asc())
            .limit(10)
            .collect()
        ]
        assert got == want and len(got) == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_ivf")
