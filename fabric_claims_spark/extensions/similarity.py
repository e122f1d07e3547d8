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

import random

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
    nprobe: int = 1,
) -> DataFrame:
    """IVF probe: route the query to its ``nprobe`` nearest centroid
    buckets, then brute-force only within those buckets (assignments
    computed inline here; a real index persists them bucketed).

    nprobe is the recall knob — nprobe=K degenerates to brute force;
    tests/test_extensions.py pins recall@10 ≥ 0.8 at nprobe=2 on the
    synthetic table."""
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    bucketed = vectors.join(assigned.select(id_col, "assigned_centroid"), id_col)
    q = query.select(F.lit(-1).alias(id_col), F.col("qv").alias(vec_col))
    q_scored = q.join(F.broadcast(centroids)).select(
        cosine(as_double_array(vec_col), as_double_array("cv")).alias("score"),
        F.col("centroid_id").alias("probe_centroid"),
    )
    q_assigned = (
        q_scored.orderBy(F.col("score").desc(), F.col("probe_centroid").asc())
        .limit(nprobe)
        .select("probe_centroid")
    )
    candidates = bucketed.join(
        F.broadcast(q_assigned),
        F.col("assigned_centroid") == F.col("probe_centroid"),
    )
    return brute_force_topk(candidates, query, k, id_col, vec_col)


# -- random-hyperplane LSH (SimHash for real vectors) ------------------------
HP_BANDS = 4
HP_BITS = 8


def hyperplanes(
    dim: int, bands: int = HP_BANDS, bits: int = HP_BITS, seed: int = 0xC05
) -> list[list[list[float]]]:
    """Deterministic gaussian hyperplanes, rounded to 6dp so the same
    constants embed exactly in both Spark literals and oracle SQL
    text (decimal → nearest-double is identical in both parsers)."""
    rng = random.Random(seed)
    return [
        [[round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(bits)]
        for _ in range(bands)
    ]


def hyperplane_band_sigs(vec: Column, planes: list[list[list[float]]]) -> list[Column]:
    """One bit-string signature per band: bit j = sign(v·h_j). The dot
    is the sequential zip_with/aggregate fold, matching DuckDB's
    list_dot_product op order bit-exactly, so bucket keys agree across
    engines even for near-zero dots."""
    sigs = []
    for band in planes:
        bits = [
            F.when(
                dot(vec, F.array(*[F.lit(c) for c in h])) >= 0, F.lit("1")
            ).otherwise(F.lit("0"))
            for h in band
        ]
        sigs.append(F.concat(*bits))
    return sigs


def hyperplane_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    planes: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via hyperplane-LSH blocking: only vectors
    sharing a band signature ever meet, so the self-join is keyed on
    (band, 2^bits-ary bucket) — cardinality grows with the corpus,
    unlike label/metadata blocking whose handful of giant blocks go
    quadratic at scale. Candidates verify exact cosine ≥ threshold
    (LSH recall: a pair hashing into no common band is not emitted —
    the deliberate approximation that buys the linear pair space)."""
    e = vectors.select(
        F.col(id_col).alias("vid"), as_double_array(vec_col).alias("ev")
    )
    banded = e.select(
        "vid",
        F.posexplode(F.array(*hyperplane_band_sigs(F.col("ev"), planes))).alias(
            "band_idx", "sig"
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"))
        .distinct()
    )
    ea = e.select(F.col("vid").alias("vec_a"), F.col("ev").alias("ev_a"))
    eb = e.select(F.col("vid").alias("vec_b"), F.col("ev").alias("ev_b"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("ev_a"), F.col("ev_b")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
