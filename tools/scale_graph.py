"""Graph-operator scaling measurement (SCALING.md evidence, graph
section; companion to tools/scale_pairs.py).

The graph the engine actually feeds its graph operators at corpus
scale is the near-dup PAIR graph (docs_dup_clusters: MinHash-LSH
edges → connected components; triangles/pagerank run on brand
co-occurrence, which is domain-bounded, so the dup graph is the one
whose growth matters). This tool measures, at sf0.01 / sf0.1 / a 10×
replication of sf0.1 (same replica scheme as scale_pairs.py):

* **Triangle counting** (`extensions/graph.py:triangle_counts`): the
  work is the wedge join — one row per (center, spoke-pair) after
  degree-ordered orientation. We report Σ C(outdeg⃗(v), 2) for the
  oriented graph vs Σ C(deg(v), 2) naive, and the m^1.5 bound the
  orientation guarantees [Schank & Wagner 2005]: oriented out-degree
  is ≤ √(2m), so oriented wedges ≤ m·√(2m).
* **Connected components** (`graph.py:connected_components`): each
  min-label-propagation round is one equi-join of the symmetrized
  edge list with the label frame plus one min-aggregate — per-round
  shuffle rows = 2m (propagation) + n (labels), CONSTANT across
  rounds; rounds-to-converge tracks component diameter (2-4 for
  near-clique dup graphs), not corpus size. Both measured here.
* **PageRank** (`graph.py:pagerank`): identical shuffle shape —
  per-round rows = m (contributions) + n (ranks), reported from the
  same degree aggregates.

All counts come from groupBy aggregates (Σ C(n,2) forms) — the
measurement never materializes a wedge or pair join.

Usage: python tools/scale_graph.py [out.md]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from fabric_claims_spark.caching import scoped_caches  # noqa: E402
from fabric_claims_spark.extensions.dedup import minhash_near_dups  # noqa: E402
from fabric_claims_spark.session import get_spark  # noqa: E402
from tools.scale_pairs import SF001, SF01, replicate_docs  # noqa: E402


def dup_edges(docs: DataFrame) -> DataFrame:
    """The production dup-graph edge list (doc_a < doc_b, distinct)."""
    return (
        minhash_near_dups(docs, "doc_id", "text", threshold=0.7)
        .select("doc_a", "doc_b")
        .distinct()
    )


def measure(edges: DataFrame) -> dict[str, int]:
    # localCheckpoint, not cache: the ×10 replicated corpus drags a
    # plan tree (10-way union × 64-wide minhash) that compounds
    # through the cc loop until the driver OOMs just STRINGIFYING it
    # for the InMemoryRelation name — truncate the lineage instead.
    edges = edges.localCheckpoint(eager=True)
    m = edges.count()
    sym = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionAll(edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).cache()
    n = deg.count()
    wedges_naive = int(
        deg.agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")).first()["w"]
        or 0
    )
    # degree-ordered orientation: keep u→v iff (deg(u), u) < (deg(v), v)
    # — mirrors triangle_counts' orientation, bounding outdeg at √(2m)
    da = deg.select(F.col("u").alias("doc_a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("u").alias("doc_b"), F.col("deg").alias("degb"))
    oriented = (
        edges.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            F.when(
                (F.col("dega") < F.col("degb"))
                | ((F.col("dega") == F.col("degb")) & (F.col("doc_a") < F.col("doc_b"))),
                F.col("doc_a"),
            )
            .otherwise(F.col("doc_b"))
            .alias("src")
        )
    )
    odeg = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    wedges_oriented = int(
        odeg.agg(F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w")).first()["w"]
        or 0
    )
    max_od = odeg.agg(F.max("od")).first()[0] or 0

    # connected-components rounds: min-label propagation until stable
    # (mirrors graph.py:connected_components; per-round rows are the
    # CONSTANT 2m + n — only the round count is data-dependent)
    labels = deg.select("u", F.col("u").alias("lab"))
    rounds = 0
    while True:
        rounds += 1
        prop = (
            sym.join(labels, "u")
            .select(F.col("v").alias("u"), "lab")
            .unionAll(labels)
            .groupBy("u")
            .agg(F.min("lab").alias("lab"))
        ).localCheckpoint(eager=True)  # truncate per-round lineage
        changed = (
            prop.join(labels.select("u", F.col("lab").alias("old")), "u")
            .where(F.col("lab") != F.col("old"))
            .count()
        )
        labels = prop
        if changed == 0 or rounds > 50:
            break
    # star-contraction rounds (mirrors graph.py:_star_components —
    # the O(log n) alternative for exactly the high-diameter replica
    # graphs where propagation's round count blows up), plus a label
    # parity check against the production implementation
    pairs = (
        edges.select(
            F.least("doc_a", "doc_b").alias("lo"),
            F.greatest("doc_a", "doc_b").alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    star_rounds = 0
    while star_rounds <= 50:
        star_rounds += 1
        nbrs = pairs.select(
            F.col("lo").alias("u"), F.col("hi").alias("v")
        ).unionByName(
            pairs.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mm = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        ls = (
            nbrs.join(mm, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .where(F.col("lo") != F.col("hi"))
            .distinct()
        )
        sm = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        stepped = (
            ls.join(sm, "hi")
            .select(F.col("m").alias("lo"), F.col("lo").alias("hi"))
            .where(F.col("lo") != F.col("hi"))
            .unionByName(
                sm.select(F.col("m").alias("lo"), F.col("hi").alias("hi"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        done = (
            stepped.count() == pairs.count()
            and stepped.subtract(pairs).limit(1).count() == 0
        )
        pairs = stepped
        if done:
            break
    from fabric_claims_spark.extensions.graph import connected_components

    star = connected_components(
        edges, "doc_a", "doc_b", max_iter=60, algorithm="star"
    )
    label_mismatch = (
        star.join(
            labels.select(
                F.col("u").alias("node"), F.col("lab").alias("prop_cluster")
            ),
            "node",
        )
        .where(F.col("cluster") != F.col("prop_cluster"))
        .count()
    )
    deg.unpersist()
    return {
        "n": n,
        "m": m,
        "wedges_naive": wedges_naive,
        "wedges_oriented": wedges_oriented,
        "m15_bound": int(m * (2 * m) ** 0.5),
        "max_outdeg": int(max_od),
        "cc_rounds": rounds,
        "star_rounds": star_rounds,
        "star_label_mismatch": label_mismatch,
        "cc_rows_per_round": 2 * m + n,
        "pr_rows_per_round": m + n,
    }


def main() -> None:
    spark = get_spark("scale-graph")
    spark.sparkContext.setLogLevel("ERROR")
    corpora = [
        ("sf0.01", spark.read.parquet(f"{SF001}/documents.parquet")),
        ("sf0.1", spark.read.parquet(f"{SF01}/documents.parquet")),
        (
            "sf0.1 ×10 (≈sf1)",
            replicate_docs(spark.read.parquet(f"{SF01}/documents.parquet"), 10),
        ),
    ]
    rows = []
    for label, docs in corpora:
        with scoped_caches():  # release minhash signature caches per corpus
            r = measure(dup_edges(docs))
        rows.append((label, r))
        print(f"{label}: {r}", flush=True)

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(
                "| corpus | nodes | edges | wedges naive | wedges oriented "
                "| m·√(2m) bound | max out-deg | cc rounds | star rounds "
                "| star label mismatches | cc rows/round | pr rows/round |\n"
            )
            f.write("|---|---|---|---|---|---|---|---|---|---|---|---|\n")
            for label, r in rows:
                f.write(
                    f"| {label} | {r['n']:,} | {r['m']:,} "
                    f"| {r['wedges_naive']:,} | {r['wedges_oriented']:,} "
                    f"| {r['m15_bound']:,} | {r['max_outdeg']:,} "
                    f"| {r['cc_rounds']} | {r['star_rounds']} "
                    f"| {r['star_label_mismatch']} "
                    f"| {r['cc_rows_per_round']:,} "
                    f"| {r['pr_rows_per_round']:,} |\n"
                )


if __name__ == "__main__":
    main()
