"""The sort-based 2-D skyline must equal the O(n²) dominance
definition (parts_price_size_skyline's level-pass algorithm vs the
brute-force NOT EXISTS semantics), including ties on either or both
dimensions."""

from fabric_claims_spark.queries import load_all_queries


def _brute_skyline(rows):
    out = []
    for a in rows:
        dominated = any(
            q["price"] <= a["price"]
            and q["size"] >= a["size"]
            and (q["price"] < a["price"] or q["size"] > a["size"])
            for q in rows
        )
        if not dominated:
            out.append((a["p_partkey"], a["p_brand"], a["price"], a["size"]))
    return sorted(out)


def test_skyline_matches_bruteforce_definition(spark, sf_dir):
    reg = load_all_queries()
    got = sorted(
        tuple(r) for r in reg["parts_price_size_skyline"].fn(
            spark, sf_dir
        ).collect()
    )
    parts = [
        {
            "p_partkey": r["p_partkey"],
            "p_brand": r["p_brand"],
            "price": round(float(r["p_retailprice"]), 4),
            "size": int(r["p_size"]),
        }
        for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    ]
    assert got == _brute_skyline(parts)


def test_skyline_keeps_coextremal_ties(spark):
    """Two items tied on BOTH dimensions co-survive (neither dominates);
    an item tied on one dimension but beaten on the other drops."""
    import importlib

    tp = importlib.import_module("fabric_claims_spark.queries.tpch_shapes")
    df = spark.createDataFrame(
        [
            (1, "B1", 10.0, 5),   # skyline
            (2, "B1", 10.0, 5),   # tied on both with 1 -> co-survives
            (3, "B2", 10.0, 4),   # same price, smaller size -> dominated
            (4, "B2", 9.0, 3),    # cheaper, small -> skyline
            (5, "B3", 11.0, 5),   # pricier, no size gain -> dominated
            (6, "B3", 12.0, 6),   # pricier but biggest -> skyline
        ],
        ["p_partkey", "p_brand", "p_retailprice", "p_size"],
    )
    import fabric_claims_spark.sources.parquet as pq

    orig = pq.load_table
    try:
        pq.load_table = lambda spark, sf_dir, name: df
        tp.load_table = pq.load_table
        got = sorted(
            r["p_partkey"]
            for r in tp.parts_price_size_skyline(spark, "ignored").collect()
        )
    finally:
        pq.load_table = orig
        tp.load_table = orig
    assert got == [1, 2, 4, 6]
