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
from fabric_claims_spark.localframe import local_frame


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


# -- distributed k-means (Lloyd) ---------------------------------------------
def kmeans_assignments(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column — the
    trainer for the IVF coarse quantizer (``ivf_assign`` consumes the
    centroids this loop converges to). Returns the final assignment
    ``(vec_id, cluster, dist)`` after ``iters`` update rounds.

    Scale shape — MLlib's discipline: centroids are DRIVER state
    (k·dim doubles, bounded), never a joined frame:

    * assignment: a pure PROJECTION — per row, ``array_min`` over k
      literal (dist, cid) structs built from the driver-held
      centroids. ZERO shuffle; the vectors never move.
    * update: posexplode to (cluster, dim) micro-units — n·dim rows,
      linear, map-side combined down to ≤ k·dim partials; the shuffle
      is k·dim rows, and only those k·dim means come back to the
      driver for the next round.
    * empty clusters keep their previous centroid, so k is stable.

    Cross-engine determinism (the oracle unrolls this loop in SQL):
    distances are ``dot(v,v) − 2·dot(v,c) + dot(c,c)`` — sequential
    zip_with folds matching DuckDB's list_dot_product op order
    bit-exactly (centroid literals round-trip through the driver
    exactly: binary64 in, binary64 out); component sums use integer
    MICRO-UNITS (round(x·1e6) as long — exact, order-independent
    addition, the text_docs entropy pattern); means divide once in
    IEEE doubles and ROUND to 9 dp IN SPARK (never Python's
    banker's rounding); argmin ties break on the smaller centroid id.
    Seeds are the k smallest ids' vectors (deterministic, no RNG).
    """
    ev = vectors.select(
        F.col(id_col).alias("vec_id"), as_double_array(vec_col).alias("v")
    )
    cents = kmeans_centroids(vectors, k, iters, id_col, vec_col)
    return _lloyd_assign(ev, cents).select(
        "vec_id", "cluster", F.round(F.col("d"), 6).alias("dist")
    )


def _self_dot(cv: list[float]) -> float:
    """dot(cv, cv) computed driver-side with the EXACT fold order of
    ``aggregate(zip_with(ca, ca, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)``
    — a sequential left fold of IEEE binary64 adds of products, so the
    value is bit-identical to what Catalyst constant-folding produces
    from the expression form (pinned by test_extensions)."""
    acc = 0.0
    for x in cv:
        acc = acc + float(x) * float(x)
    return acc


def _dist_struct(cid: int, cv: list[float], dv: Column | None = None) -> Column:
    """(squared-distance, cid) struct vs one literal centroid — struct
    ordering is (d, cid), so min/sort tie-break on the smaller id.

    Construction cost matters (guide §1.2 applied to the DRIVER): the
    Lloyd loop rebuilds k of these per iteration, and the old
    ``F.array(*[F.lit(x) for x in cv])`` + ``dot(ca, ca)`` form paid
    ~200 py4j round trips per centroid — measured 1.3-1.9 s of pure
    Python expression construction per training iteration at k=8,
    dim=64. ``F.lit(cv)`` builds the same ArrayType(Double) literal in
    one call, the centroid self-dot folds to the identical double
    driver-side (``_self_dot``), and callers pass the shared
    ``dot(v, v)`` subtree in as ``dv`` instead of rebuilding it per
    centroid. The analyzed expression is value-identical; only the
    construction path changed."""
    ca = F.lit([float(x) for x in cv])
    if dv is None:
        dv = dot(F.col("v"), F.col("v"))
    d = dv - F.lit(2.0) * dot(F.col("v"), ca) + F.lit(_self_dot(cv))
    return F.struct(d.alias("d"), F.lit(cid).cast("long").alias("cid"))


def _lloyd_assign(
    ev: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Zero-shuffle argmin assignment: array_min over k literal
    (dist, cid) structs. ``ev`` must expose (vec_id, v: array<double>)."""
    dv = dot(F.col("v"), F.col("v"))  # shared subtree, built once
    m = F.array_min(
        F.array(*[_dist_struct(cid, cv, dv) for cid, cv in cents])
    )
    return ev.select(
        "vec_id",
        F.col("v"),
        m.getField("cid").alias("cluster"),
        m.getField("d").alias("d"),
    )


def _lloyd_assign_join(
    ev: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Join-based argmin assignment for paper-scale k (VERDICT r8
    item 3): the centroids ride as a broadcast TABLE instead of k
    literal expression subtrees, so the PLAN is O(1) in k — the
    literal path's n-independent compile cost (k·dim literals per
    row, the residual the SCALING r8 k-regime table measured at
    37.8 s for k=80 and which won't compile at k in the thousands)
    disappears. Shape: broadcast-nested-loop join (k rows, no
    shuffle of the corpus) → per-row (d, cid) struct → min per
    (vec_id, v). The groupBy keys on v too (functionally dependent
    on vec_id) so no second join is needed to carry the vector;
    partial aggregation collapses the k rows per vector map-side, so
    the one shuffle moves n rows, not n·k.

    Bit-identical to ``_lloyd_assign``: ``dot`` is the same
    left-fold over zip_with whether the centroid array is a literal
    or a column, and the (d, cid) struct-min tie-break is the same —
    pinned by tests/test_extensions.py."""
    spark = ev.sparkSession
    cdf = local_frame(
        spark,
        [(int(cid), [float(x) for x in cv]) for cid, cv in cents],
        "cid long, cv array<double>",
    )
    d = (
        dot(F.col("v"), F.col("v"))
        - F.lit(2.0) * dot(F.col("v"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv"))
    )
    s = F.struct(d.alias("d"), F.col("cid").alias("cid"))
    return (
        ev.crossJoin(F.broadcast(cdf))
        .groupBy("vec_id", "v")
        .agg(F.min(s).alias("m"))
        .select(
            "vec_id",
            F.col("v"),
            F.col("m").getField("cid").alias("cluster"),
            F.col("m").getField("d").alias("d"),
        )
    )


def _lloyd_assign_arrow(
    ev: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Vectorized argmin assignment (sanctioned Arrow ``mapInPandas``,
    SURVEY §2.10): the centroid matrix rides to every task as a
    closure constant (k·dim doubles — the same bounded driver state
    the literal path embeds), and each Arrow batch computes all
    batch×k distances as ONE BLAS matmul — no n·k row
    materialization, no shuffle, O(1) plan size.

    This is the paper-scale regime both in k AND in n·k: the literal
    tree pays a plan/codegen term superlinear in k (measured 158 s at
    k=800 before touching data — SCALING.md r9) and the join pays an
    interpreted per-(row,centroid) cost. Matmul summation order
    differs from the fold, so distances can differ in the last ulp —
    this path is opt-in for scale, NEVER the oracle-pinned default;
    parity (same clusters, distances to 1e-9 relative) is pinned by
    tests/test_extensions.py."""
    import numpy as np
    import pandas as pd

    ordered = sorted(cents)  # ascending cid == the struct-min tie-break
    cmat = np.asarray([cv for _, cv in ordered], dtype=np.float64)
    cids = np.asarray([cid for cid, _ in ordered], dtype=np.int64)
    c2 = (cmat * cmat).sum(axis=1)
    # declared output: input id/vector columns + (cluster, d)
    out_schema = (
        f"vec_id {ev.schema['vec_id'].dataType.simpleString()}, "
        "v array<double>, cluster bigint, d double"
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.stack(pdf["v"].to_numpy())
            d = (
                (vmat * vmat).sum(axis=1)[:, None]
                - 2.0 * (vmat @ cmat.T)
                + c2[None, :]
            )
            j = d.argmin(axis=1)  # first minimum == smallest cid on ties
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "cluster": cids[j],
                    "d": d[np.arange(len(j)), j],
                }
            )

    return ev.mapInPandas(assign, out_schema)


def lloyd_assign(
    ev: DataFrame,
    cents: list[tuple[int, list[float]]],
    strategy: str = "literal",
) -> DataFrame:
    """Assignment dispatcher: ``literal`` (default — zero-shuffle
    array_min over k literal structs, the setting every oracle query
    pins), ``join`` (broadcast centroid table + group-min, O(1) plan
    size), or ``arrow`` (mapInPandas BLAS matmul — O(1) plan AND
    vectorized execution; last-ulp distance drift, so opt-in only)."""
    if strategy == "join":
        return _lloyd_assign_join(ev, cents)
    if strategy == "arrow":
        return _lloyd_assign_arrow(ev, cents)
    if strategy == "literal":
        return _lloyd_assign(ev, cents)
    raise ValueError(f"unknown assignment strategy: {strategy!r}")


def _lloyd_assign_probes(
    ev: DataFrame, cents: list[tuple[int, list[float]]], probes: int = 2
) -> DataFrame:
    """Zero-shuffle top-``probes`` assignment (SemDeDup boundary
    multi-probe): array_sort over the k literal (dist, cid) structs,
    sliced to the ``probes`` nearest. Same row-local expression tree
    as ``_lloyd_assign`` — element 0 IS the argmin assignment, so the
    primary cluster is bit-identical to the single-probe path.
    Returns (vec_id, v, cluster, probes: array<long>)."""
    dv = dot(F.col("v"), F.col("v"))  # shared subtree, built once
    arr = F.array_sort(
        F.array(*[_dist_struct(cid, cv, dv) for cid, cv in cents])
    )
    top = F.slice(arr, 1, probes)
    return ev.select(
        "vec_id",
        F.col("v"),
        top[0].getField("cid").alias("cluster"),
        F.transform(top, lambda s: s.getField("cid")).alias("probes"),
    )


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int | None = None,
    assign: str = "literal",
) -> list[tuple[int, list[float]]]:
    """The Lloyd loop itself; returns the trained centroids as driver
    state [(cid, vector)] — the form ``_lloyd_assign`` embeds as
    literals and ``ivf_index_build`` persists alongside the index.

    ``sample_cap`` bounds the TRAINING set (assignment always covers
    the full corpus): when the corpus exceeds the cap, train on the
    deterministic md5-hash sample of ~cap vectors. This is the fix
    for the measured k-regime wall (SCALING.md §round-8): the Lloyd
    assignment embeds k literal centroid expressions per row, so
    full-corpus training is O(n·k·dim) — quadratic once k scales
    with the corpus, while a capped sample keeps training
    O(cap·k·dim) and leaves only the one linear full-corpus
    assignment pass to the caller. Hash-based (not random): the same
    corpus always trains the same centroids, on any partitioning.
    ``None`` (default) keeps exact full-corpus training — the
    determinism-gate setting every oracle-checked query pins.

    A cut that under-fills k (cap near k, sparse hash density) widens
    ×4 per step — still deterministic (a bigger cut is a strict
    superset of the smaller sample) — and each widening emits a
    ``UserWarning``; only if no cut short of the whole grid yields k
    vectors does training fall back to the full corpus, with a
    louder warning, so the O(n·k·iters) cost the cap exists to avoid
    is never reintroduced silently (ADVICE r9).

    ``assign`` picks the Lloyd-step assignment strategy (see
    ``lloyd_assign``): ``literal`` (default, the oracle-pinned
    zero-shuffle expression tree) or ``join`` (broadcast centroid
    table — O(1) plan size, the paper-scale-k path; bit-identical
    centroids, pinned by pytest)."""
    ev = vectors.select(
        F.col(id_col).alias("vec_id"), as_double_array(vec_col).alias("v")
    )
    if sample_cap is not None:
        n = ev.count()
        if n > sample_cap:
            from fabric_claims_spark.extensions.dedup import md5_long

            grid = 1 << 20
            cut = max(1, (sample_cap * grid) // n)
            # a cap near k (or sparse hash density) can yield < k
            # rows; training on that would silently return < k
            # centroids and degrade every downstream assignment.
            # Widen the hash cut (×4 per step — a strict superset of
            # the prior sample, so still deterministic) before giving
            # up on sampling: abandoning it outright reintroduces the
            # O(n·k·iters) full-corpus cost the cap exists to avoid.
            # Every widening/fallback warns, so callers can tell the
            # training cost silently grew (ADVICE r9).
            import warnings

            def sampled_n(frame, c: int) -> int:
                return frame.where(
                    F.pmod(
                        md5_long(F.col("vec_id").cast("string")),
                        F.lit(grid),
                    )
                    < F.lit(c)
                ).count()

            while cut < grid and sampled_n(ev, cut) < k:
                warnings.warn(
                    f"kmeans_centroids: hash sample at cut={cut}/{grid} "
                    f"yielded < k={k} vectors; widening the cut ×4",
                    stacklevel=2,
                )
                cut = min(grid, cut * 4)
            if cut >= grid:
                warnings.warn(
                    "kmeans_centroids: sample_cap could not yield k "
                    "vectors at any cut — training on the FULL corpus "
                    f"(n={n}); sampled-training cost guarantees do not "
                    "apply to this call",
                    stacklevel=2,
                )
            else:
                ev = ev.where(
                    F.pmod(
                        md5_long(F.col("vec_id").cast("string")),
                        F.lit(grid),
                    )
                    < F.lit(cut)
                )
    cents: list[tuple[int, list[float]]] = [
        (r["vec_id"], list(r["v"])) for r in ev.orderBy("vec_id").limit(k).collect()
    ]
    if len(cents) < k:
        raise ValueError(
            f"kmeans_centroids: corpus has only {len(cents)} vectors, "
            f"cannot seed k={k} centroids"
        )
    for _ in range(iters):
        micro = lloyd_assign(ev, cents, strategy=assign).select(
            "cluster",
            F.posexplode(
                F.transform("v", lambda x: F.round(x * 1e6, 0).cast("long"))
            ).alias("dim", "micro"),
        )
        means = (
            micro.groupBy("cluster", "dim")
            .agg(F.sum("micro").alias("s"), F.count(F.lit(1)).alias("c"))
            .select(
                "cluster",
                "dim",
                F.round(
                    F.col("s").cast("double") / (F.col("c") * F.lit(1e6)), 9
                ).alias("m"),
            )
        )
        got: dict[int, list[tuple[int, float]]] = {}
        for r in means.collect():  # ≤ k·dim rows — bounded driver state
            got.setdefault(r["cluster"], []).append((r["dim"], r["m"]))
        cents = [
            (
                cid,
                [m for _, m in sorted(got[cid])] if cid in got else cv,
            )
            for cid, cv in cents
        ]
    return cents


# -- persisted IVF index (bucketed layout) -----------------------------------
def ivf_index_build(
    spark,
    vectors: DataFrame,
    table: str,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    path: str | None = None,
    sample_cap: int | None = None,
    assign: str = "literal",
) -> list[tuple[int, list[float]]]:
    """Train centroids (Lloyd) and persist the vectors BUCKETED on
    ``assigned_centroid`` — the write-once layout that makes every
    probe a bucket-pruned scan: Spark's bucket pruning turns an
    equality/IN filter on the bucket column into reading only the
    matching files (``SelectedBucketsCount: nprobe out of k`` in the
    plan), so a query touches 1/k of a 100 TB index per probed
    centroid with no shuffle and no index-wide scan. Returns the
    trained centroids (persist them beside the table in production).

    ``sample_cap`` / ``assign`` are the paper-scale-k levers (see
    ``kmeans_centroids`` / ``lloyd_assign``): hash-sampled training
    and O(1)-plan assignment. Defaults keep the exact oracle-pinned
    paths bit-identical.
    """
    from fabric_claims_spark.operators.bucketing import write_bucketed

    cents = kmeans_centroids(
        vectors, k, iters, id_col, vec_col,
        sample_cap=sample_cap, assign=assign,
    )
    ev = vectors.select(
        F.col(id_col).alias("vec_id"), as_double_array(vec_col).alias("v")
    )
    indexed = vectors.join(
        lloyd_assign(ev, cents, strategy=assign).select(
            F.col("vec_id").alias(id_col),
            F.col("cluster").alias("assigned_centroid"),
        ),
        id_col,
    )
    write_bucketed(indexed, table, "assigned_centroid", buckets=k, path=path)
    return cents


def ivf_index_probe(
    spark,
    table: str,
    cents: list[tuple[int, list[float]]],
    query_vec: list[float],
    nprobe: int = 2,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors from the ``nprobe`` nearest buckets of a
    persisted IVF index. Centroid routing is driver-side arithmetic
    over the k-row centroid list; the scan reads ONLY the probed
    buckets (``SelectedBucketsCount: nprobe out of k``) and finishes
    with TakeOrderedAndProject — no exchange anywhere.

    Planning note: Spark's auto-bucketed-scan heuristic drops the
    bucketed read (and with it bucket pruning) when no join/agg wants
    the hash distribution — a pure filter+top-k probe is exactly that
    case. The probe plans under
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false``
    and pins its physical plan before restoring the conf, so only
    this Dataset is affected."""
    from fabric_claims_spark.operators.bucketing import read_bucketed

    def sq(c):  # squared euclidean, driver-side routing only
        return sum((a - b) * (a - b) for a, b in zip(c, query_vec))

    probed = [cid for cid, cv in sorted(cents, key=lambda t: (sq(t[1]), t[0]))][
        :nprobe
    ]
    qv = F.array(*[F.lit(x) for x in query_vec])
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        df = (
            read_bucketed(spark, table)
            .where(F.col("assigned_centroid").isin(probed))
            .select(
                id_col,
                F.round(cosine(as_double_array(vec_col), qv), 6).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(topk)
        )
        # QueryExecution.executedPlan is a once-per-Dataset lazy val:
        # touching it here pins the bucket-pruned plan for all later
        # actions on this frame, regardless of the restored conf.
        df._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set(conf_key, prev)
    return df
