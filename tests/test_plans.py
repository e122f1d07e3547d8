"""Physical-plan regression tests: the scale properties we rely on
must survive refactors — broadcasts stay broadcasts, filters stay
pushed, scans stay pruned (SURVEY.md §4)."""

import pytest

from fabric_claims_spark.operators.joins import (
    asof_join_backward,
    salted_groupby_count,
    salted_join_skewed_left,
)
from fabric_claims_spark.queries import load_all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all_queries()


def _plan(spark, df, mode="simple"):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_star_join_broadcasts_dims(spark, registry):
    plan = _plan(spark, registry["star_revenue_by_region_year"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pricing_summary_pushes_filter_and_prunes(spark, registry):
    plan = _plan(spark, registry["pricing_summary"].fn(spark, SF), "formatted")
    # the to_date(ts) <= date predicate must reach the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: l_orderkey etc. must NOT be read
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema
    assert "l_extendedprice" in read_schema


def test_knn_is_take_ordered_not_global_sort(spark, registry):
    plan = _plan(spark, registry["embeddings_knn_bruteforce"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_incremental_slice_pushes_timestamp_filter(spark, registry):
    plan = _plan(
        spark, registry["incremental_slice_after_watermark"].fn(spark, SF), "formatted"
    )
    assert "PushedFilters" in plan and "GreaterThan(ts" in plan


def test_jaccard_candidates_are_equi_joined(spark, registry):
    """Prefix filtering must compile to hash/sort-merge equi-joins on
    the rare-token key — a nested-loop or cartesian anywhere means the
    pair space degenerated to all-pairs."""
    plan = _plan(spark, registry["docs_jaccard_pairs"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_neardup_banded_join_is_equi(spark, registry):
    plan = _plan(spark, registry["embeddings_neardup_pairs"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quartiles_avoid_global_data_window(spark, registry):
    """NTILE must come from the distributed-selection operator (range
    repartition + cut-point arithmetic), never a partitionless window
    over the fact rows."""
    plan = _plan(spark, registry["order_value_quartiles"].fn(spark, SF))
    assert "ntile" not in plan
    assert "rangepartitioning" in plan


def test_ivf_assign_broadcasts_centroids(spark, registry):
    plan = _plan(spark, registry["embeddings_ivf_assign"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_salted_groupby_matches_plain(spark):
    df = spark.range(0, 10000).selectExpr(
        "CASE WHEN id % 100 < 90 THEN 'hot' ELSE concat('k', id % 7) END AS k"
    )
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_groupby_count(df, ["k"]).collect()}
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = spark.range(0, 5000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 50 END AS k", "id AS v"
    )
    right = spark.range(0, 50).selectExpr("id AS k", "id * 10 AS w")
    plain = left.join(right, "k").count()
    salted = salted_join_skewed_left(left, right, "k").count()
    assert salted == plain


def test_asof_null_value_columns_come_from_matched_row(spark):
    """The matched right row's NULLs must surface as NULLs — carrying
    value columns independently would skip the NULL cell and leak an
    older row's value; and every asof_* column must come from the SAME
    matched row (merge_asof / ASOF JOIN semantics)."""
    left = spark.createDataFrame(
        [(1, 10, "q1"), (1, 20, "q2")], "k int, ts int, probe string"
    )
    right = spark.createDataFrame(
        [(1, 5, "a5", 50.0), (1, 15, None, None)],
        "k int, ts int, name string, score double",
    )
    got = {
        r["probe"]: (r["asof_name"], r["asof_score"])
        for r in asof_join_backward(
            left, right, key="k", ts="ts", right_value_cols=["name", "score"]
        ).collect()
    }
    assert got["q1"] == ("a5", 50.0)  # only the ts=5 row qualifies
    # ts=15 is the match for q2: its NULLs must NOT fall back to ts=5
    assert got["q2"] == (None, None)


def test_spread_is_noop_on_already_parallel_scan(spark, tmp_path):
    """The bronze landing path (and every generate-heavy operator)
    guards parallelism with spread(); on a many-split scan — the
    100 TB case — it must NOT inject a shuffle, and on a single-file
    scan it must."""
    from fabric_claims_spark.operators.partitioning import spread

    many = str(tmp_path / "many")
    spark.range(0, 1000).repartition(4).write.parquet(many)
    df = spark.read.parquet(many)
    assert spread(df, min_partitions=4) is df  # no-op, not even a new plan
    plan = _plan(spark, spread(df, min_partitions=64))
    assert "Exchange RoundRobinPartitioning(64" in plan.replace("rebalance", "")


def test_bronze_has_no_unconditional_repartition():
    """Regression guard for bronze.py: the raw frame must go through
    spread(), not a bare .repartition(defaultParallelism)."""
    import inspect

    from fabric_claims_spark.pipeline import bronze

    src = inspect.getsource(bronze)
    assert ".repartition(" not in src
    assert "spread(" in src


def test_chunk_split_is_shuffle_free(spark, registry):
    """Chunking is a narrow map over the scan — any Exchange means a
    pointless full shuffle of the corpus at 100 TB."""
    plan = _plan(spark, registry["docs_chunk_split"].fn(spark, SF))
    assert "Exchange" not in plan


def test_pack_sequences_no_global_window_on_docs(spark, registry):
    """The two-phase prefix sum must keep the doc-sized side
    partitioned by shard; the only partitionless window runs over the
    tiny shard-totals aggregate, and the offsets come back via a
    broadcast join (no shuffle of the doc side for the join)."""
    plan = _plan(spark, registry["docs_pack_sequences"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    # two windows: the shard-partitioned doc cumsum + the tiny
    # shard-offsets cumsum (the only partitionless one)
    assert plan.count("Window") >= 2
    assert "hashpartitioning(shard" in plan


def test_simhash_neardup_banded_join_is_equi(spark, registry):
    plan = _plan(spark, registry["docs_simhash_neardup"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_search_broadcasts_probe_and_query(spark, registry):
    """The probed-bucket scan must join broadcast sides only (probe
    set, query vector) and finish with a top-k, not a global sort."""
    plan = _plan(spark, registry["embeddings_ivf_search"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_clean_corpus_label_joins_equi_no_forced_broadcast(spark, registry):
    """The cleaning composition must keep every join equi (no
    cartesian / nested-loop) and must never broadcast the
    component-label frames UNCONDITIONALLY: labels grow with the
    near-dup population (unbounded at LLM-corpus dup rates), and a
    checkpointed frame has unknown stats, so the hint is gated on the
    MEASURED label count. Both gate arms are pinned: the tiny sf0.001
    label set broadcasts; with the gate forced to 0 the same query
    must carry zero broadcast hints."""
    import fabric_claims_spark.queries.lsh as lsh_mod

    df = registry["docs_clean_corpus"].fn(spark, SF)
    plan = _plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # tiny labels → the measured gate applies the hint
    assert "BroadcastHashJoin" in plan

    prev = lsh_mod._CLEAN_LABEL_BROADCAST_MAX
    lsh_mod._CLEAN_LABEL_BROADCAST_MAX = 0
    try:
        big = registry["docs_clean_corpus"].fn(spark, SF)
        logical = big._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical
    finally:
        lsh_mod._CLEAN_LABEL_BROADCAST_MAX = prev


def test_shuffle_order_uses_shard_windows_and_broadcast_offsets(spark, registry):
    """Global hash rank must come from shard-partitioned windows plus
    broadcast offsets — same two-phase discipline as pack_sequences."""
    plan = _plan(spark, registry["docs_shuffle_order"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(shard" in plan


def test_unigram_logprob_window_is_token_partitioned(spark, registry):
    """Corpus token frequencies come from a count-over-partition
    window keyed on the token — never a partitionless window over the
    exploded corpus."""
    plan = _plan(spark, registry["docs_unigram_logprob"].fn(spark, SF))
    assert "hashpartitioning(tok" in plan


def test_basket_pairs_no_self_join(spark, registry):
    """Brand pairs come from per-order array expansion (Generate),
    never a sort-merge self-join on the order key; the brand-count
    and totals joins broadcast."""
    plan = _plan(spark, registry["basket_brand_pairs"].fn(spark, SF))
    assert "SortMergeJoin" not in plan
    assert "Generate explode" in plan
    assert "BroadcastHashJoin" in plan


def test_pareto_window_runs_on_band_aggregate(spark, registry):
    """The cumulative-share window must consume the band rollup (a
    bounded domain), not per-customer rows: the per-customer and
    per-band aggregates shuffle on their keys, and the only
    single-partition exchange feeds the tiny band window. The scan
    reads exactly the two columns the query needs."""
    plan = _plan(spark, registry["customers_pareto_bands"].fn(spark, SF))
    assert "hashpartitioning(o_custkey" in plan
    assert "ReadSchema: struct<o_custkey:bigint,o_totalprice:double>" in plan
    before_single, _, after_single = plan.partition("Exchange SinglePartition")
    assert "HashAggregate" in after_single  # band rollup below the window


def test_sample_per_lang_salted_and_rank_limited(spark, registry):
    """Phase 1 must shuffle on (lang, salt) — the skew guard — and
    both row_number phases must carry the WindowGroupLimit rank-limit
    pushdown so each partition keeps only k rows before the sort."""
    import re

    plan = _plan(spark, registry["docs_sample_per_lang"].fn(spark, SF))
    assert re.search(r"hashpartitioning\(lang#\d+, salt#\d+", plan)
    assert plan.count("WindowGroupLimit") >= 2


def test_length_deciles_window_on_histogram(spark, registry):
    """The CDF window consumes the value-domain histogram (grouped on
    n_chars), never raw document rows, and the scan is pruned to the
    single column."""
    plan = _plan(spark, registry["docs_length_deciles"].fn(spark, SF))
    assert "hashpartitioning(n_chars" in plan
    assert "ReadSchema: struct<n_chars:bigint>" in plan


def test_pagerank_caches_loop_invariants(spark, registry):
    """The edge-ratio and node frames are re-read every iteration;
    they must come from InMemoryRelation, not a recompute of the
    whole edge build per round."""
    plan = _plan(spark, registry["brand_pagerank"].fn(spark, SF))
    assert "InMemoryRelation" in plan


def test_tfidf_broadcasts_df_and_rank_limits(spark, registry):
    """The vocabulary-sized document-frequency table must broadcast
    (never shuffle the tf frame on the term key), and the per-doc
    top-3 window must carry the WindowGroupLimit pushdown."""
    plan = _plan(spark, registry["docs_tfidf_topterms"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "hashpartitioning(doc_id" in plan


def test_brand_triangles_no_cartesian_edge_build(spark, registry):
    """Edges come from per-order array expansion (Generate), and the
    wedge/closing joins are equi-joins — no cartesian anywhere."""
    plan = _plan(spark, registry["brand_triangles"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan


def test_pii_redaction_single_pass_scan(spark, registry):
    """PII scrub is a projection chain + one hash aggregate; the scan
    must not read columns the contact build never touches."""
    plan = _plan(spark, registry["customers_pii_redaction"].fn(spark, SF))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "c_acctbal" not in read_schema
    assert "c_nationkey" not in read_schema


def test_rolling_7d_window_user_partitioned(spark, registry):
    """The RANGE-frame rolling window must partition on user_id —
    never a global (single-partition) time window."""
    plan = _plan(spark, registry["events_rolling_7d_user"].fn(spark, SF))
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" not in plan


def test_weighted_sample_is_shuffle_free_topk(spark, registry):
    """Efraimidis–Spirakis priorities are a pure projection; the
    global top-k must be TakeOrderedAndProject (per-partition heaps +
    driver merge of k rows), not a sort shuffle."""
    plan = _plan(spark, registry["docs_weighted_sample"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_transition_matrix_user_window_broadcast_totals(spark, registry):
    """The successor window shuffles once on user_id; the bounded
    (from_type) row-totals join must broadcast."""
    plan = _plan(spark, registry["events_transition_matrix"].fn(spark, SF))
    assert "hashpartitioning(user_id" in plan
    assert "BroadcastHashJoin" in plan
    assert "SinglePartition" not in plan


def test_daily_trend_fits_on_day_rollup(spark, registry):
    """OLS moments must consume the per-(type, day) rollup — two hash
    aggregates, no raw-row window, no single-partition exchange."""
    plan = _plan(spark, registry["events_daily_trend"].fn(spark, SF))
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 stages
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_posting_lists_single_term_shuffle(spark, registry):
    """Posting lists build from one explode (Generate) and one
    term-keyed aggregate; the df cap filters after the aggregate
    without another shuffle."""
    plan = _plan(spark, registry["docs_posting_lists"].fn(spark, SF))
    assert "Generate explode" in plan
    assert "hashpartitioning(term" in plan


def test_median_window_on_price_histogram(spark, registry):
    """The median CDF window must consume the (priority, price)
    histogram — its exchange partitions on the priority key and a
    HashAggregate sits below it (never a raw-row sort of 1/5 of the
    table per partition)."""
    plan = _plan(spark, registry["orders_median_by_priority"].fn(spark, SF))
    assert "hashpartitioning(priority" in plan
    assert "SinglePartition" not in plan


def test_column_profile_single_scan(spark, registry):
    """The whole profile comes from ONE pass over orders (multiple
    exact distincts expand, they don't rescan)."""
    plan = _plan(spark, registry["orders_column_profile"].fn(spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan


def test_dup_span_fraction_hashed_gram_stats_stay_linear(spark, registry):
    """Span-dup is LINEAR: gram frequencies shuffle on the HASHED gram
    (int64 payload, not gram text), and the only join is the
    df-statistic equi join back onto the gram stream (the round-6
    skew playbook — never a gram-partitioned window, never a PAIR
    join: this is the metric, not a pair generator)."""
    plan = _plan(spark, registry["docs_dup_span_fraction"].fn(spark, SF))
    assert "hashpartitioning(g#" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # exactly one join: the (g -> df) stats attach; its keys are the
    # hashed gram on both sides
    assert plan.count("Join [g#") + plan.count("Join [cast(g#") >= 1
    assert plan.count("Join") == plan.count("Join [g#")


def test_bootstrap_spreads_base_rows_not_replicas(spark, registry):
    """Round 13 (guide §2.3): the Poisson bootstrap parallelizes by
    spreading the BASE rows BEFORE the 64× replicate explode — the
    old shape exchanged every exploded (o_orderkey, x, b) row by
    (b, salt), a 64× larger shuffle written from the single-file
    scan's lone task. Pinned invariants of the new plan:

    * no exchange keyed on the replicate id except the
      post-partial-agg ENSURE_REQUIREMENTS one (map-side partial
      aggregation reduces each partition to ≤64 replicate partials
      before it — decimal sums are associative, results unchanged);
    * the pre-explode spread is the only row-multiplying-side
      exchange (round-robin of base rows, a no-op on a many-split
      cluster scan);
    * the md5 draw is evaluated ONCE — the nine threshold CASEs
      must not re-inline it (the round-6 regression this query's
      old exchange barrier existed to prevent)."""
    plan = _plan(spark, registry["orders_bootstrap_ci"].fn(spark, SF))
    import re

    # no salted replicate exchange anywhere in the new shape
    assert "pmod(hash(o_orderkey" not in plan
    bare = re.findall(r"hashpartitioning\(b#\d+, \d+\), (\w+)", plan)
    assert bare and all(k == "ENSURE_REQUIREMENTS" for k in bare)
    # the spread of the base rows — runner-independent pin (ADVICE
    # r13): spread() is deliberately a no-op when the scan's file
    # count already covers defaultParallelism (a local[1] runner
    # satisfies 1 file >= 1), so only assert the repartition where
    # spread can actually fire
    if spark.sparkContext.defaultParallelism > 1:
        assert "REPARTITION_BY_NUM" in plan
    # each projection evaluates the md5 draw ONCE (the ci_lo / ci_hi
    # rank picks print the shared replicate-means subtree twice —
    # exchange reuse dedups that at runtime; re-inlining into the
    # nine threshold CASEs would put 9 md5 calls on ONE line)
    md5_lines = [ln for ln in plan.splitlines() if "md5" in ln]
    assert md5_lines and all(ln.count("md5") == 1 for ln in md5_lines)


def test_masked_view_rls_predicate_pushes_down(spark, registry):
    """The RLS predicate must reach the parquet scan even through the
    masking projection (masking is projection-only, so Catalyst can
    push the untouched segment filter past it)."""
    plan = _plan(spark, registry["customers_masked_rls_view"].fn(spark, SF), "formatted")
    assert "EqualTo(c_mktsegment,AUTOMOBILE)" in plan


def test_incremental_dedup_joins_equi_no_cartesian(spark, registry):
    """Batch-vs-corpus dedup must reach the corpus only through
    equi-joins on precomputable keys (content hash, band keys) — a
    cartesian or nested-loop anywhere means a corpus rescan per
    batch doc at 100 TB."""
    plan = _plan(spark, registry["docs_incremental_dedup"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_assignment_is_shuffle_free(spark, registry):
    """Lloyd assignment must be a pure projection over the vector
    scan (array_min over driver-literal centroid structs) — any
    Exchange means the vectors are being moved to meet the centroids,
    which is backwards at 100 TB."""
    plan = _plan(spark, registry["embeddings_kmeans"].fn(spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_fuzzy_match_is_hash_equi_join(spark, registry):
    """Blocked fuzzy matching must join on the blocking key (hash
    equi-join) with the edit-distance predicate applied after — never
    a cartesian/BNLJ over all name pairs."""
    plan = _plan(spark, registry["customers_fuzzy_blocked_match"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_heavy_hitters_broadcasts_candidates(spark, registry):
    """Pass 2's semi-join must broadcast the bounded candidate set so
    the full key domain never shuffles."""
    plan = _plan(spark, registry["events_heavy_hitters"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_hopping_window_no_join_expansion(spark, registry):
    """The ×4 hopping-window expansion is the native window generator
    feeding one hash aggregate — no self-join, no cartesian."""
    plan = _plan(spark, registry["events_hopping_windows"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_ewma_consumes_day_rollup_not_raw_events(spark, registry):
    """The 30-term EWMA self-join runs over the per-(type, day)
    aggregate: both join inputs must sit above HashAggregates of the
    raw scan (aggregate-then-analyze), and the weighted fold is one
    more aggregate — bounded by 30 × day-domain rows."""
    plan = _plan(spark, registry["events_ewma_daily"].fn(spark, SF), "formatted")
    assert "CartesianProduct" not in plan
    # two logical scans (one per join branch), each mentioned twice in
    # formatted mode (tree + detail); each must aggregate before joining
    assert plan.count("Scan parquet") <= 4
    # the bounded day-rollup side ships broadcast — the range self-join
    # never shuffles raw events
    assert "BroadcastHashJoin" in plan


def test_pit_join_is_hash_join_on_key(spark, registry):
    """The point-in-time join must hash-join on the equi key with the
    validity range as a post-join filter — never a nested-loop over
    fact × history."""
    plan = _plan(spark, registry["orders_pit_segment_revenue"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan


def test_quantized_ann_plans_take_ordered(spark, registry):
    """SQ8 and PQ searches must end in TakeOrderedAndProject (per-
    partition top-k + k-row driver merge), with broadcast-only support
    frames — no global sort, no unintended shuffle joins."""
    for name in ("embeddings_sq8_knn", "embeddings_pq_adc_knn"):
        plan = _plan(spark, registry[name].fn(spark, SF))
        assert "TakeOrderedAndProject" in plan, name
        assert "CartesianProduct" not in plan, name


def test_snapshot_diff_single_full_outer_join(spark, registry):
    """The CDC feed is ONE co-partitioned full-outer join plus a
    generate/explode projection — no second pass over the snapshots,
    no cache."""
    df = registry["customers_snapshot_diff"].fn(spark, SF)
    plan = _plan(spark, df)
    assert plan.count("FullOuter") == 1
    assert plan.count("Join") == 1  # nothing besides the full-outer
    assert "Generate explode" in plan


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Spark's runtime row-level filtering must inject a bloom filter
    built from the selective dim side into the fact scan when the join
    shuffles — the AQE-era semi-join reduction that, at 100 TB, drops
    non-matching fact rows BEFORE the exchange. Pinned here so a
    session-config regression (bloomFilter.enabled off, or a broadcast
    threshold that hides the behavior) is caught."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(spark, j)
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_rfm_broadcasts_quintile_maps(spark, registry):
    """The histogram-CDF quintile maps are value-domain-bounded and
    must come back to the per-customer frame as broadcast joins — a
    shuffle join on the score maps would serialize the whole customer
    frame through two extra exchanges."""
    plan = _plan(spark, registry["customers_rfm_segments"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_pmi_pairs_no_token_self_join(spark, registry):
    """PMI pairs must come from the in-expression array combination
    over the per-doc vocab intersection — a SortMergeJoin keyed on
    doc_id between two exploded token frames would be the quadratic
    token-level self-join the design avoids."""
    plan = _plan(spark, registry["docs_pmi_pairs"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    # the vocab gate joins broadcast (150-row side)
    assert "BroadcastHashJoin" in plan


def test_link_prediction_edges_removed_via_broadcast_anti(spark, registry):
    plan = _plan(spark, registry["brand_link_prediction"].fn(spark, SF))
    assert "LeftAnti, BuildRight" in plan
    assert "CartesianProduct" not in plan


def test_hll_register_aggregate_shape(spark, registry):
    """The HLL estimate must reduce through the (type, register) max
    aggregate — 256 rows per group — with partial aggregation
    (map-side combine) on the raw-event side, and no join wider than
    the per-type frames."""
    plan = _plan(spark, registry["events_hll_users_per_type"].fn(spark, SF))
    assert "partial_max" in plan or "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_cusum_windows_run_on_daily_rollup(spark, registry):
    """Both windows (cumulative sum, peak max) must consume the daily
    rollup, never the raw event frame: exactly one aggregate keyed on
    day sits below the first Window."""
    plan = _plan(spark, registry["events_cusum_changepoint"].fn(spark, SF))
    assert "Window" in plan and "HashAggregate" in plan
    # column pruning: the scans read ONLY ts (the day rollup needs
    # nothing else), proving the windows consume the aggregate, not
    # the raw six-column event frame
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "struct<ts:" in line


def test_split_leakage_is_pure_projection_over_pairs(spark, registry):
    """Split labels derive in-projection from the doc ids — the plan
    must contain no join against a split-assignment table beyond the
    pair generator's own equi-joins."""
    plan = _plan(spark, registry["docs_split_leakage"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    # simhash verify join + band self-join only; conv(md5) runs as
    # projection, visible in the final Project
    assert "conv" in plan.lower()


def test_audience_jaccard_no_user_self_join(spark, registry):
    """Type pairs must come from the per-user sorted-set combination
    expression — a join keyed on user_id between two event-sized
    frames would be the quadratic path the design avoids. The only
    joins are the two broadcast audience-count attaches."""
    plan = _plan(spark, registry["events_audience_jaccard"].fn(spark, SF))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cross_source_grams_pairs_from_arrays(spark, registry):
    plan = _plan(spark, registry["docs_cross_source_grams"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # source pairs are in-expression


def test_kendall_tau_cross_join_is_bounded_broadcast(spark, registry):
    """The 550-cell histogram cross product must be a broadcast
    nested-loop over the BOUNDED side, with the raw fact reduced by a
    hash aggregate first — never a fact-level cartesian."""
    plan = _plan(spark, registry["lineitem_kendall_tau"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_survival_windows_per_customer_then_value_domain(spark, registry):
    """The lead() window partitions by customer (no global frame over
    raw orders); the KM cumulative windows run on the interval-day
    rollup only."""
    plan = _plan(spark, registry["customer_reorder_survival"].fn(spark, SF))
    assert "windowspecdefinition(o_custkey" in plan
    assert "CartesianProduct" not in plan


def test_minhash_error_joins_pairs_broadcast(spark, registry):
    """The exact-Jaccard pass must gate shingle sets through the
    broadcast pair list — a shuffle join of two corpus-wide shingle
    frames without the pair filter would be quadratic."""
    plan = _plan(spark, registry["docs_minhash_estimate_error"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_abtest_single_aggregate_pivot(spark, registry):
    """One aggregate over (type, variant), one pivot aggregate — the
    JSON extraction is a projection feeding the partial aggregate
    (whole-stage, no UDF)."""
    plan = _plan(spark, registry["events_abtest_lift"].fn(spark, SF))
    assert "get_json_object" in plan
    assert "BatchEvalPython" not in plan


def test_hive_partitioned_write_prunes_partitions(spark, tmp_path):
    """The 100 TB table layout contract: a write partitioned by a
    date-derived column must let a reader's filter prune at the
    PLANNER level — PartitionFilters on the scan, non-matching
    directories never listed as input files."""
    import os

    path = str(tmp_path / "orders_by_year")
    spark.range(0, 1000).selectExpr(
        "id", "2000 + CAST(id % 4 AS INT) AS yr"
    ).write.partitionBy("yr").parquet(path)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("yr=")
    ) == ["yr=2000", "yr=2001", "yr=2002", "yr=2003"]

    df = spark.read.parquet(path).where("yr = 2002")
    plan = _plan(spark, df, "formatted")
    # the pushed partition predicate appears on the scan node
    # (inputFiles() lists pre-pruning files, so assert on the plan)
    scan_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert scan_lines and any("2002" in ln for ln in scan_lines)
    assert df.count() == 250


def test_q4_exists_is_left_semi(spark, registry):
    """The EXISTS decorrelates to a left-semi join: order rows must
    never duplicate per matching lineitem (no inner+distinct)."""
    plan = _plan(spark, registry["priority_returned_orders"].fn(spark, SF))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q10_top20_is_take_ordered(spark, registry):
    """ORDER BY revenue LIMIT 20 must compile to
    TakeOrderedAndProject, never a global Sort+Limit, and the two
    dims must broadcast."""
    plan = _plan(spark, registry["returned_revenue_top_customers"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_q13_variant_keeps_outer_join(spark, registry):
    """The exclusion predicate lives in the join condition; the plan
    must keep LeftOuter (a WHERE-hoisted predicate would collapse it
    to Inner and silently drop the zero-order bucket)."""
    plan = _plan(spark, registry["order_count_distribution_ex_low"].fn(spark, SF))
    assert "LeftOuter" in plan


def test_q16_not_in_is_broadcast_anti(spark, registry):
    """NOT IN (deficit suppliers) must decorrelate to a broadcast
    left-anti join; the (part,supp) pairs distinct BEFORE the part
    join (an aggregate below the join)."""
    plan = _plan(spark, registry["part_supplier_diversity"].fn(spark, SF))
    assert "LeftAnti" in plan and "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_q21_single_pass_no_fact_self_join(spark, registry):
    """Both correlated existentials fold into ONE grouped pass: the
    plan reads lineitem exactly once and contains no
    lineitem-lineitem join (the classic Q21 plan has two)."""
    plan = _plan(
        spark, registry["sole_supplier_return_orders"].fn(spark, SF), "formatted"
    )
    scans = [
        ln
        for ln in plan.splitlines()
        if "Location" in ln and "lineitem" in ln
    ]
    assert len(scans) == 1, scans


def test_backlog_window_consumes_daily_aggregate(spark, registry):
    """The cumulative backlog window is partitionless but must run
    over the DAY-domain aggregate (calendar-bounded), never raw
    order/line rows: an aggregate keyed on day sits below the single
    Window, and the scans read only the key/date columns."""
    plan = _plan(spark, registry["orders_backlog_monthly_peak"].fn(spark, SF))
    assert plan.count("Window") >= 1
    assert "HashAggregate" in plan
    for line in plan.splitlines():
        if "ReadSchema" in line and "lineitem" in line:
            assert "l_extendedprice" not in line


def test_not_in_compiles_to_null_aware_broadcast_anti(spark, registry):
    """The NOT IN subqueries must plan as broadcast null-aware anti
    joins — and that broadcast-only constraint is exactly why the
    docstring steers scale users to NOT EXISTS."""
    plan = _plan(spark, registry["not_in_null_semantics"].fn(spark, SF))
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_division_single_grouped_pass(spark, registry):
    """Relational division by counting: no correlated anti-joins (the
    textbook double-NOT-EXISTS shape would carry two), and at most two
    orders scans — the grouped fact pass plus the priority-column-only
    scan that sizes the divisor domain."""
    plan = _plan(
        spark, registry["customers_all_priorities"].fn(spark, SF), "formatted"
    )
    scans = [
        ln for ln in plan.splitlines() if "Location" in ln and "orders" in ln
    ]
    assert len(scans) <= 2
    assert "LeftAnti" not in plan
    # the domain scan reads only the priority column
    domain_schemas = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "o_custkey" not in ln
    ]
    assert any("o_orderpriority" in ln for ln in domain_schemas)


def test_cumedist_runs_on_supplier_rollup(spark, registry):
    """The window consumes the |supplier|-sized aggregate: the
    lineitem scan reads only the three aggregate inputs."""
    plan = _plan(
        spark, registry["supplier_revenue_cumedist"].fn(spark, SF), "formatted"
    )
    for line in plan.splitlines():
        if "ReadSchema" in line and "l_suppkey" in line:
            assert "l_orderkey" not in line and "l_quantity" not in line


def test_setops_compile_to_semi_and_anti_joins(spark, registry):
    """INTERSECT must plan as a distinct left-semi join and EXCEPT as
    a distinct left-anti — the set algebra rides the equi-join scale
    path, never sort-based set operators or nested loops."""
    plan = _plan(spark, registry["customer_retention_setops"].fn(spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_pairs_stay_within_cluster(spark, registry):
    """The near-dup pair join must be the cluster-keyed equi self-join
    (SemDeDup's whole point); the only nested-loop join allowed is
    the K-row centroid broadcast."""
    plan = _plan(spark, registry["embeddings_semantic_dedup"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    # the a<b pair join is an equi hash/sort-merge join on cluster
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_gram_keyed_aggs_partial_aggregate_not_window(spark, registry):
    """Skew playbook for the gram-keyed shuffles (round 6): the
    per-gram df/first-seen statistics must be grouped aggregates
    (map-side partial aggregation bounds a viral gram's shuffle
    payload to one partial row per map task) joined back to the gram
    stream — NEVER a gram-partitioned window, which ships and sorts
    every occurrence of the hot gram on one task. Posting lists
    additionally count-filter before collect_list so no collected
    list can exceed the df cap."""
    for name in (
        "docs_dup_span_fraction",
        "docs_ngram_novelty",
        "docs_posting_lists",
    ):
        plan = _plan(spark, registry[name].fn(spark, SF))
        assert "Window" not in plan, name
        assert "partial_count" in plan or "partial_min" in plan, name


def test_asof_join_forward_semantics(spark):
    """Forward as-of: earliest right row with ts >= left.ts; equal ts
    is included (>=); a left row past the last right row gets NULL;
    the whole matched right row carries as one struct (NULLs included,
    never an older/newer row's cell)."""
    from fabric_claims_spark.operators.joins import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10, "q10"), (1, 15, "q15"), (1, 40, "q40")],
        "k int, ts int, probe string",
    )
    right = spark.createDataFrame(
        [(1, 15, "a15", 1.5), (1, 30, None, None)],
        "k int, ts int, name string, score double",
    )
    got = {
        r["probe"]: (r["asof_name"], r["asof_score"])
        for r in asof_join_forward(
            left, right, key="k", ts="ts", right_value_cols=["name", "score"]
        ).collect()
    }
    assert got["q10"] == ("a15", 1.5)   # next at-or-after 10 is ts=15
    assert got["q15"] == ("a15", 1.5)   # equal ts included
    # ts=30 is q40's... no: 30 < 40, nothing at-or-after 40 -> NULL
    assert got["q40"] == (None, None)
    # and a probe between 15 and 30 must take the ts=30 row's NULLs,
    # not fall back to ts=15
    mid = spark.createDataFrame([(1, 20, "q20")], "k int, ts int, probe string")
    got2 = asof_join_forward(
        mid, right, key="k", ts="ts", right_value_cols=["name", "score"]
    ).collect()[0]
    assert (got2["asof_name"], got2["asof_score"]) == (None, None)


def test_round6_queries_have_sane_plans(spark, registry):
    """Round-6 additions: no CartesianProduct anywhere (the only
    nested-loop joins allowed are broadcast scalar/tiny-frame
    attachments); the curation funnel's pair join stays an equi join;
    top-N+Other broadcasts its dimensions."""
    for name in (
        "docs_dedup_cascade",
        "docs_cluster_quality_canonicals",
        "docs_quality_nucleus",
        "events_asof_next_purchase",
        "events_hourly_locf",
        "yoy_gap_ly_null_semantics",
        "region_segment_top3_other",
        "events_cms_user_counts",
    ):
        plan = _plan(spark, registry[name].fn(spark, SF))
        assert "CartesianProduct" not in plan, name
    plan = _plan(spark, registry["region_segment_top3_other"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan  # nation/region dims broadcast


def test_no_registry_query_plans_a_cartesian_product(spark, registry):
    """Engine-wide structural invariant: every one of the registry's
    queries must compile without a CartesianProduct — the one join
    shape that cannot survive a 100x scale-up. Scalar/tiny-frame
    attachments are fine (they plan as BroadcastNestedLoopJoin);
    an unbroadcast cross join is not. Plan-only sweep (no execution),
    so this also smoke-checks that every registered query BUILDS."""
    offenders = []
    for name, spec in registry.items():
        plan = _plan(spark, spec.fn(spark, SF))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == []


def test_rrf_indexed_plan_shape(spark, registry):
    """The served-retrieval RRF must keep the serving plan shape: the
    tiny frames (query terms, block-pair list if any, the query
    vector) broadcast into hash joins — never a shuffled join keyed
    on the query's vocabulary — both ranking cuts compile to
    TakeOrderedAndProject (per-partition heaps), and no
    CartesianProduct anywhere."""
    plan = _plan(spark, registry["docs_hybrid_rrf_indexed"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semdedup_recall_pair_join_is_hash_not_nested_loop(spark, registry):
    """The recall eval's pair enumeration must stay the block-pair
    BroadcastHashJoin — a BroadcastNestedLoopJoin on the id
    inequality is the measured 28-70 s trap (SCALING.md round-7), and
    a pair-level Filter on the cosine would mean the threshold leaked
    out of the aggregate conditions back into a per-pair predicate."""
    plan = _plan(spark, registry["embeddings_semdedup_recall"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
