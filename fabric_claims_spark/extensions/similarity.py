"""Similarity search over embedding columns (array<float>).

Brute-force cosine is the correctness baseline; the scale path is
IVF: assign every vector to its nearest of K broadcast centroids,
then search only within the probe's bucket(s). Both paths use
zip_with/aggregate higher-order functions — JVM-side, no UDFs.

At 100 TB: centroids come from a sampled k-means (or are sampled
rows, as here); vectors are written bucketed by ``assigned_centroid``
so a query touches 1/K of the data, and the per-bucket scan is an
embarrassingly parallel map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def as_double_array(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Top-k cosine neighbors of a (broadcastable) query set. Returns
    one ranked frame per query row; the orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k, no global sort)."""
    scored = vectors.join(F.broadcast(query)).select(
        id_col,
        cosine(as_double_array(vec_col), F.col(query_vec_col)).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "cv",
) -> DataFrame:
    """Nearest-centroid assignment (IVF coarse quantizer): broadcast
    centroids × vectors, argmax cosine with deterministic ties."""
    scored = vectors.join(F.broadcast(centroids)).select(
        id_col,
        centroid_id_col,
        cosine(as_double_array(vec_col), as_double_array(centroid_vec_col)).alias(
            "score"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col(centroid_id_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, F.col(centroid_id_col).alias("assigned_centroid"), "score")
    )


def ivf_search(
    vectors: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: route the query to its centroid bucket, then
    brute-force only within that bucket (assignments computed inline
    here; a real index persists them bucketed)."""
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    bucketed = vectors.join(assigned.select(id_col, "assigned_centroid"), id_col)
    q_assigned = ivf_assign(
        query.select(F.lit(-1).alias(id_col), F.col("qv").alias(vec_col)),
        centroids,
        id_col,
        vec_col,
    ).select(F.col("assigned_centroid").alias("probe_centroid"))
    candidates = bucketed.join(
        F.broadcast(q_assigned),
        F.col("assigned_centroid") == F.col("probe_centroid"),
    )
    return brute_force_topk(candidates, query, k, id_col, vec_col)
