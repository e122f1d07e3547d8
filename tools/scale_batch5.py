"""Scale evidence for the round-5 continuation operators (SCALING.md):
the quantities that must stay bounded as data grows ×10.

* PMI pair space — pairs are generated inside the top-150 df-ranked
  vocabulary only, so the per-doc candidate count is ≤ C(150,2) and
  the TOTAL grows linearly with docs. Measured: Σ C(|vocab∩doc|, 2)
  at sf0.01, sf0.1, and a ×10 doc replica (ids offset, text
  unchanged — same vocabulary, 10× the docs).
* Adamic–Adar wedge space — edges are the top-75 count-ranked brand
  pairs, so Σ deg(z)² (the wedge bound) is a constant of the brand
  domain, independent of data size.
* HLL state — registers per event_type are capped at 256 no matter
  how many distinct users stream through; measured with user ids
  offset ×10.

Usage: python tools/scale_batch5.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from fabric_claims_spark.session import get_spark  # noqa: E402

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
_WS = r"\s+"
PMI_VOCAB = 150


def replicate_docs(d: DataFrame, times: int) -> DataFrame:
    out = None
    for i in range(times):
        r = d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000_000)).alias("doc_id"),
            "text",
            *(["source"] if "source" in d.columns else []),
        )
        out = r if out is None else out.unionByName(r)
    return out


def pmi_pair_space(docs: DataFrame) -> int:
    d = docs.where(F.length(F.trim(F.col("text"))) > 0)
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), _WS)).alias("tok")
    ).distinct()
    df = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    vocab = (
        df.withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("df"), "tok"))
        )
        .where(F.col("r") <= PMI_VOCAB)
        .select("tok")
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return per_doc.agg(
        F.sum(F.col("k") * (F.col("k") - 1) / 2).cast("long")
    ).head()[0]


def wedge_space(sf: str, spark) -> tuple[int, int]:
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    part = spark.read.parquet(f"{sf}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("p_brand").alias("brand"),
        )
        .distinct()
    )
    a = ob.select(F.col("okey"), F.col("brand").alias("ba"))
    b = ob.select(F.col("okey"), F.col("brand").alias("bb"))
    pc = (
        a.join(b, "okey")
        .where(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = (
        pc.withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("c"), "ba", "bb"))
        )
        .where(F.col("r") <= 75)
        .select("ba", "bb")
    )
    sym = e.select(F.col("ba").alias("u"), F.col("bb").alias("v")).unionByName(
        e.select(F.col("bb").alias("u"), F.col("ba").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    wedge_bound = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long")
    ).head()[0]
    x = sym.select(F.col("u"), F.col("v").alias("brand_a"))
    y = sym.select(F.col("u"), F.col("v").alias("brand_b"))
    wedges = (
        x.join(y, "u").where(F.col("brand_a") < F.col("brand_b")).count()
    )
    return wedges, wedge_bound


def hll_state(events: DataFrame) -> int:
    from fabric_claims_spark.extensions.dedup import md5_long

    h = events.select(
        "event_type",
        md5_long(F.col("user_id").cast("string")).alias("hv"),
    )
    return (
        h.select("event_type", (F.col("hv") % 256).alias("j"))
        .distinct()
        .count()
    )


def main() -> None:
    spark = get_spark("scale-batch5")
    rows = []

    for label, sf in (("sf0.01", SF001), ("sf0.1", SF01)):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        n = docs.count()
        pairs = pmi_pair_space(docs)
        rows.append(("pmi", label, n, pairs))
    docs10 = replicate_docs(
        spark.read.parquet(f"{SF01}/documents.parquet"), 10
    )
    rows.append(("pmi", "sf0.1×10", docs10.count(), pmi_pair_space(docs10)))

    for label, sf in (("sf0.01", SF001), ("sf0.1", SF01)):
        w, bound = wedge_space(sf, spark)
        rows.append(("wedges", label, w, bound))

    for label, sf in (("sf0.01", SF001), ("sf0.1", SF01)):
        ev = spark.read.parquet(f"{sf}/events.parquet")
        rows.append(
            ("hll_regs", label, ev.select("user_id").distinct().count(),
             hll_state(ev))
        )
    ev10 = None
    base = spark.read.parquet(f"{SF01}/events.parquet").select(
        "event_type", "user_id"
    )
    for i in range(10):
        r = base.select(
            "event_type",
            (F.col("user_id") + F.lit(i * 100_000_000)).alias("user_id"),
        )
        ev10 = r if ev10 is None else ev10.unionByName(r)
    rows.append(
        ("hll_regs", "sf0.1×10", ev10.select("user_id").distinct().count(),
         hll_state(ev10))
    )

    for r in rows:
        print(r)


if __name__ == "__main__" and "extra" not in sys.argv:
    main()


def cross_source_pair_space(spark, docs) -> tuple[int, int]:
    """Pair structs = Σ C(|sources(gram)|,2) — bounded by C(20,2) per
    gram; returns (distinct grams, pair structs)."""
    from fabric_claims_spark.extensions.dedup import md5_long

    g = (
        docs.where(F.length("text") >= 8)
        .select(
            "source",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.length("text") - 7, F.lit(0))
                )
            ).alias("pos"),
            "text",
        )
        .select(
            "source", md5_long(F.expr("substr(text, pos, 8)")).alias("gh")
        )
        .distinct()
    )
    sets = g.groupBy("gh").agg(F.count(F.lit(1)).alias("k"))
    row = sets.agg(
        F.count(F.lit(1)).alias("grams"),
        F.sum(F.col("k") * (F.col("k") - 1) / 2).cast("long").alias("pairs"),
    ).head()
    return row["grams"], row["pairs"]


def dau_fanout(spark, events) -> tuple[int, int]:
    ud = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    n = ud.count()
    return n, n * (7 + 28)  # exact fanout rows by construction


def extra() -> None:
    spark = get_spark("scale-batch5b")
    for label, sf in (("sf0.01", SF001), ("sf0.1", SF01)):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        print(("xsource", label) + cross_source_pair_space(spark, docs))
    docs10 = replicate_docs(
        spark.read.parquet(f"{SF01}/documents.parquet"), 10
    )
    print(("xsource", "sf0.1x10") + cross_source_pair_space(spark, docs10))
    for label, sf in (("sf0.01", SF001), ("sf0.1", SF01)):
        ev = spark.read.parquet(f"{sf}/events.parquet")
        print(("dau_fanout", label) + dau_fanout(spark, ev))


if __name__ == "__main__" and "extra" in sys.argv:
    extra()
