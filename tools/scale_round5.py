"""Round-5 scale evidence (SCALING.md): candidate-space growth for the
blocked fuzzy matcher and the Misra–Gries heavy-hitter pass.

Same methodology as tools/scale_pairs.py — measure the quantity that
must stay sub-quadratic (candidate counts), not local wall-time, at
sf0.01, sf0.1, and a ×10 replica of sf0.1:

* customers ×10: replica i offsets custkeys by i·10^8 and rewrites the
  name to the canonical ``Customer#%09d`` of the new key — block
  structure (17-char prefix → blocks of ≤10 consecutive keys) is
  preserved exactly, replicas never share a block.
* events ×10: replica i suffixes event_type with the replica index for
  i>0 — per-replica frequency shape preserved, key domain grows ×10
  (the regime where the MG bound matters).

Usage: python tools/scale_round5.py [out.md]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from fabric_claims_spark.extensions.sketches import (  # noqa: E402
    misra_gries_candidates,
)
from fabric_claims_spark.session import get_spark  # noqa: E402

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


def replicate_customers(c: DataFrame, times: int) -> DataFrame:
    out = None
    for i in range(times):
        r = c.select(
            (F.col("c_custkey") + F.lit(i * 100_000_000)).alias("c_custkey")
        ).select(
            "c_custkey",
            F.format_string("Customer#%09d", "c_custkey").alias("c_name"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def replicate_events(e: DataFrame, times: int) -> DataFrame:
    out = None
    for i in range(times):
        r = e.select(
            (
                F.concat(F.col("event_type"), F.lit(f"_{i}"))
                if i
                else F.col("event_type")
            ).alias("event_type")
        )
        out = r if out is None else out.unionByName(r)
    return out


def fuzzy_block_pairs(c: DataFrame) -> tuple[int, int]:
    """(rows, Σ_blocks C(n,2)) — the candidate space the block join
    generates, via a bucket aggregate (no join materialization)."""
    b = (
        c.groupBy(F.substring("c_name", 1, 17).alias("block"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum("n").alias("rows"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
        )
        .collect()[0]
    )
    return int(b["rows"]), int(b["pairs"])


def main() -> None:
    spark = get_spark("scale-round5")
    lines = ["## Round-5 operators: candidate growth (tools/scale_round5.py)", ""]

    lines += [
        "| corpus | customers | block-join candidate pairs | all-pairs C(n,2) |",
        "|---|---|---|---|",
    ]
    for label, df in (
        ("sf0.01", spark.read.parquet(f"{SF001}/customer.parquet")),
        ("sf0.1", spark.read.parquet(f"{SF01}/customer.parquet")),
        (
            "sf0.1 ×10",
            replicate_customers(
                spark.read.parquet(f"{SF01}/customer.parquet"), 10
            ),
        ),
    ):
        rows, pairs = fuzzy_block_pairs(df.select("c_custkey", "c_name"))
        lines.append(
            f"| {label} | {rows:,} | {pairs:,} | {rows * (rows - 1) // 2:,} |"
        )
    lines.append("")

    lines += [
        "| corpus | events | distinct keys | MG candidates (k=20, 32 parts) | bound k·parts |",
        "|---|---|---|---|---|",
    ]
    for label, df in (
        ("sf0.01", spark.read.parquet(f"{SF001}/events.parquet")),
        ("sf0.1", spark.read.parquet(f"{SF01}/events.parquet")),
        (
            "sf0.1 ×10",
            replicate_events(spark.read.parquet(f"{SF01}/events.parquet"), 10),
        ),
    ):
        e = df.select("event_type").repartition(32)
        n = e.count()
        d = e.distinct().count()
        c = misra_gries_candidates(e, "event_type", k=20).count()
        lines.append(f"| {label} | {n:,} | {d:,} | {c:,} | {20 * 32:,} |")

    report = "\n".join(lines)
    print(report)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
