"""Physical-plan regression tests: the optimizations the 100 TB design
depends on must be visible in .explain output — filter pushdown, column
pruning, broadcast joins, shuffle counts (SURVEY.md §4 checklist)."""

from __future__ import annotations

import contextlib
import io

import pytest

from clv_data_pipeline_spark import registry
from tests.conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    df = registry.all_queries()[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark):
    plan = plan_of(spark, "q_tpch_q1")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q6_all_predicates_pushed(spark):
    plan = plan_of(spark, "q_tpch_q6")
    for frag in [
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ]:
        assert frag in plan, f"missing pushed filter {frag}"


def test_projection_prunes_scan(spark):
    plan = plan_of(spark, "q_project")
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>" in plan
    # pure projection: no shuffle at all
    assert "Exchange" not in plan


def test_q5_broadcasts_dims(spark):
    plan = plan_of(spark, "q_tpch_q5")
    assert "BroadcastHashJoin" in plan
    # nation/region/supplier scans must read only their join/output keys
    assert "struct<n_nationkey:int,n_name:string,n_regionkey:int>" in plan


def test_rfm_is_two_shuffle_distinct_agg(spark):
    """The flagship's plan: partial agg on (user, date) -> exchange ->
    merge+partial distinct -> exchange on user -> final.  Exactly two
    distinct hashpartitioning exchanges, no joins, no sorts."""
    plan = plan_of(spark, "q_rfm")
    assert plan.count("Exchange hashpartitioning") <= 2 or (
        # formatted output may list operators twice under AQE
        "AdaptiveSparkPlan" in plan
    )
    assert "Join" not in plan
    assert "Sort" not in plan.replace("SortAggregate", "")


def test_rfm_scan_prunes_to_three_columns(spark):
    """Pruning contract, not physical-type pin: the scan must read only
    (ts, user_id, value) whatever timestamp encoding the parquet uses
    (nanos->bigint, us-no-tz->timestamp_ntz, us+tz->timestamp)."""
    import re

    plan = plan_of(spark, "q_rfm")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = sorted(field.split(":")[0] for field in m.group(1).split(","))
    assert cols == ["ts", "user_id", "value"], m.group(0)


def test_topk_avoids_full_sort(spark):
    plan = plan_of(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan


def test_asof_join_is_single_shuffle_no_join(spark):
    """The as-of join compiles to union + window — one hashpartitioning
    exchange on user_id, zero join operators, never a nested loop."""
    plan = plan_of(spark, "q_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_range_join_stays_hash_join(spark):
    """The interval join must plan as an equi hash/sort-merge join on
    (user, bucket) with a residual range filter — a raw BETWEEN-only
    condition degenerates to BroadcastNestedLoopJoin."""
    plan = plan_of(spark, "q_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_corr_subquery_decorrelates_to_joins(spark):
    """EXISTS + correlated scalar COUNT must decorrelate: no per-row
    subquery execution, just semi/outer joins over one orders scan
    pattern."""
    plan = plan_of(spark, "q_corr_subquery")
    assert "LeftSemi" in plan or "ExistenceJoin" in plan.replace(" ", "")
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key must join with zero shuffle
    exchanges (the pre-paid-shuffle contract of write_bucketed)."""
    import contextlib
    import io as _io

    from clv_data_pipeline_spark.sources.io import load_table, write_bucketed

    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    write_bucketed(o, "t_orders_b", "o_custkey", num_buckets=8)
    write_bucketed(
        c.withColumnRenamed("c_custkey", "o_custkey"),
        "t_customer_b",
        "o_custkey",
        num_buckets=8,
    )
    try:
        joined = (
            spark.table("t_orders_b")
            .join(spark.table("t_customer_b").hint("merge"), "o_custkey")
            .select("o_orderkey", "c_name")
        )
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_q7_q8_stars_broadcast_every_dim(spark):
    """Q7/Q8 star chains: every dim arm (supplier, nation x2, part,
    region, customer-after-region-cut) must broadcast — the fact side
    is the only thing allowed to shuffle, and no join may degenerate
    to a nested loop."""
    for name in ("q_tpch_q7", "q_tpch_q8"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_q17_semi_filters_before_aggregate(spark):
    """Q17's per-part average must aggregate only brand-filtered rows:
    the broadcast semi-style part join sits under BOTH the aggregate
    and the final join, and the brand/type filters push to the part
    scan."""
    plan = plan_of(spark, "q_tpch_q17")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EqualTo(p_brand,Brand#23)" in plan
    assert "EqualTo(p_type,MEDIUM)" in plan


def test_q19_pushes_implied_envelopes(spark):
    """Q19's disjunction spans both tables, but the hand-extracted
    envelopes (brand IN-set, quantity range) must reach the scans as
    pushed filters; part stays broadcast."""
    plan = plan_of(spark, "q_tpch_q19")
    assert "BroadcastHashJoin" in plan
    assert "In(p_brand" in plan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan


def test_q22_anti_join_after_threshold(spark):
    """Q22 must plan the no-recent-orders check as a real anti join
    (never a per-row subquery), with the recent-orders filter pushed
    to the orders scan."""
    plan = plan_of(spark, "q_tpch_q22")
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_merge_over_bucketed_target_shuffles_only_delta(spark):
    """merge_upsert against a bucketed target must reuse the target's
    hash partitioning: exactly one exchange, and it is the source
    (delta) side being shuffled into the target's buckets."""
    import re

    from pyspark.sql import functions as F

    from clv_data_pipeline_spark.operators.merge import merge_upsert
    from clv_data_pipeline_spark.sources.io import load_table, write_bucketed

    c = load_table(spark, SF_SMOKE, "customer")
    write_bucketed(c, "t_merge_bucketed", "c_custkey", num_buckets=8)
    try:
        target = spark.table("t_merge_bucketed")
        delta = c.filter(F.col("c_nationkey") == 3).withColumn(
            "c_mktsegment", F.lit("X")
        )
        out = merge_upsert(target, delta, ["c_custkey"])
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        exchanges = re.findall(r"\(\d+\) Exchange", plan)
        assert len(exchanges) == 1, plan
        assert "hashpartitioning(__src_c_custkey" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_merge_bucketed")


def test_zscore_broadcasts_group_stats(spark):
    """Per-group stats are 3 rows — they must broadcast back onto the
    60k-row fact side, never shuffle it."""
    plan = plan_of(spark, "q_zscore")
    assert "BroadcastHashJoin" in plan


def test_tfidf_aggregates_partially_before_shuffle(spark):
    """TF and DF stages must partial-aggregate map-side; the corpus
    size joins in as a broadcast, not a shuffled join."""
    plan = plan_of(spark, "q_tfidf_top_terms")
    assert plan.count("HashAggregate") >= 4  # partial+final for TF and DF
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_concurrency_single_shuffle_for_window(spark):
    """Sweep line: both delta branches union THEN shuffle once on
    event_type for the running sum — no join, no extra exchange."""
    import re

    plan = plan_of(spark, "q_concurrency")
    assert "Join" not in plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert 1 <= n_exchanges <= 2, (
        f"{n_exchanges} exchanges (want union-then-one + agg reuse)"
    )


def test_window_dedup_one_shuffle(spark):
    """Bucketed first-event dedup: one hash exchange on the composite
    key feeds both the window and nothing else."""
    import re

    plan = plan_of(spark, "q_window_dedup")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan
    # rn=1 must push down as a per-partition group limit BEFORE the
    # shuffle — Spark's WindowGroupLimit turns top-1 dedup into a
    # partial "keep first per key" on the map side
    assert "WindowGroupLimit" in plan


def test_heavy_hitters_sketch_broadcasts(spark):
    """The 96-cell sketch and the 1-row threshold must broadcast; the
    only hash shuffles are the sketch build and the truth counts."""
    plan = plan_of(spark, "q_heavy_hitters")
    assert "BroadcastExchange" in plan


def test_stratified_sample_is_map_only(spark):
    """Hash-threshold sampling is a pure filter: no exchange at all."""
    plan = plan_of(spark, "q_stratified_sample")
    assert "Exchange" not in plan


def test_quantize_is_map_only(spark):
    plan = plan_of(spark, "q_quantize_embeddings")
    assert "Exchange" not in plan


def test_dedup_incremental_merge_is_broadcast_only(spark):
    """Incremental dedup's merge path must never shuffle the index for
    a join: the collision probe and the admission anti-join are
    broadcast hash joins of delta-sized frames, so the only hash
    exchanges are the two fingerprint aggregates (index build — the
    amortized stored-state stand-in — and delta winners).  A
    SortMergeJoin here would mean the 100 TB index re-shuffles per
    daily delta."""
    plan = plan_of(spark, "q_dedup_incremental")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin LeftSemi" in plan
    assert "BroadcastHashJoin LeftAnti" in plan


def test_quality_classifier_is_map_only(spark):
    """Broadcast-weights linear scoring must be a single map pass: no
    exchange anywhere — the 100 TB corpus is scored at scan speed."""
    plan = plan_of(spark, "q_quality_classifier")
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_minhash_incremental_index_probe_is_broadcast(spark):
    """The near-dup index probe must be a broadcast-semi against the
    delta's band keys (the index is scanned map-side, never exchanged
    for the join) — re-shuffling the 100 TB index per daily delta is
    the failure mode this pin guards."""
    plan = plan_of(spark, "q_minhash_incremental")
    assert "BroadcastHashJoin LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_semantic_is_map_only(spark):
    """Benchmark matrix broadcast + BLAS scan: the corpus side must
    show zero exchanges — decontamination at scan speed."""
    plan = plan_of(spark, "q_decontaminate_semantic")
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_embedding_incremental_index_probe_is_broadcast(spark):
    """Embedding near-dup maintenance: the posting-list probe and the
    candidate re-attach must both be broadcast joins — the stored LSH
    index is scanned map-side, never exchanged for a join."""
    plan = plan_of(spark, "q_dedup_embedding_incremental")
    assert "BroadcastHashJoin LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_single_exchange(spark):
    """Label-masked mining scores inside the broadcast kernel; the only
    exchange is the global top-k re-rank window."""
    import re

    plan = plan_of(spark, "q_hard_negatives")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "MapInPandas" in plan


def test_bpe_tokenize_is_map_only(spark):
    """Applying learned merges is a broadcast + map pass: zero
    exchanges — the corpus tokenizes at scan speed."""
    plan = plan_of(spark, "q_bpe_tokenize")
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_dedup_lines_banned_set_broadcasts(spark):
    """Line-level dedup filters the corpus through a BROADCAST
    left-anti join on the (small-by-construction) boilerplate set —
    the probe side must not shuffle for the filter; the only probe
    exchange is the doc_id reassembly."""
    plan = plan_of(spark, "q_dedup_lines")
    assert "BroadcastHashJoin LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_corpus_curate_single_corpus_shuffle(spark):
    """The end-to-end curation plan cuts the corpus with map-only
    filters, dedups through the one fingerprint shuffle, and attaches
    the benchmark/contaminated sets via broadcast joins — the corpus
    side must never SortMergeJoin."""
    plan = plan_of(spark, "q_corpus_curate")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin LeftAnti" in plan


def test_market_basket_single_fact_shuffle(spark):
    """Pair expansion must ride the ONE orderkey shuffle: the part
    dimension broadcasts into the fact scan, pairs expand map-side from
    collect_set arrays, and the marginal/total frames re-aggregate tiny
    intermediates — never a fact-table self-join."""
    plan = plan_of(spark, "q_market_basket")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # part dim + marginal attaches


def test_fuzzy_join_is_equi_join(spark):
    """Length-band blocking must plan as a hash join on the candidate
    length — a cross product here means blocking silently regressed to
    all-pairs."""
    plan = plan_of(spark, "q_fuzzy_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interpolate_single_user_shuffle_for_windows(spark):
    """The calendar explodes map-side off the per-user span and both
    IGNORE-NULLS window passes reuse one user_id partitioning: the
    plan must not re-exchange between the two window operators."""
    plan = plan_of(spark, "q_interpolate")
    # daily agg shuffle + span agg reuse + calendar join + window:
    # the join and windows all hashpartition on user-keyed columns;
    # what must NOT appear is a range/round-robin re-exchange between
    # the forward and backward window passes
    assert "Exchange rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan or plan.count("Exchange hashpartitioning") <= 4


def test_psi_drift_single_scan(spark):
    """The period split is conditional aggregation (one full scan of
    the log plus the single-column distinct-types scan for the grid) —
    and totals come from a window over the tiny cells frame, so the
    counts subtree is never branch-duplicated.  formatted explain
    prints each node twice (tree + detail), hence <= 4."""
    plan = plan_of(spark, "q_psi_drift")
    assert plan.count("Scan parquet") <= 4
    assert "SortMergeJoin" not in plan


def test_bloom_join_pushdown_and_pruning(spark):
    """The Bloom pre-filter must not break scan-level optimization: the
    orders selectivity filter pushes into its scan, the lineitem scan
    reads only the 4 needed columns, and the exact semi-join is a hash
    join (the bitmap attach is the only BNLJ, whitelisted)."""
    plan = plan_of(spark, "q_bloom_join")
    assert "GreaterThan(o_totalprice,450000.0)" in plan
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,"
        "l_discount:double,l_returnflag:string>" in plan
    )
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_attribution_single_user_shuffle(spark):
    """Window + filtered aggregate: one hashpartitioning exchange on
    user_id feeds the running window; the channel group-by re-shuffles
    the (tiny) post-filter rows — no join, no sort beyond the window's."""
    plan = plan_of(spark, "q_attribution")
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Join" not in plan


def test_tree_paths_uses_hash_joins(spark):
    """The unrolled recursion must stay hash joins per hop — a nested
    loop would make the traversal quadratic per level."""
    plan = plan_of(spark, "q_tree_paths")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pca_projection_is_jvm_only(spark):
    """GRADUATED q_pca_project projects via zip_with against broadcast
    integer literals — the per-row path must be pure JVM (no Python
    worker of any kind); the one Arrow pass lives in the FIT job
    (_pca_int_stats), not in the returned plan."""
    plan = plan_of(spark, "q_pca_project")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "ArrowEvalPython" not in plan


def test_q_bucketed_join_plan_is_exchange_free(spark):
    """The registered bucketed-join query must plan with zero Exchange
    nodes end to end — the entire point of paying the shuffle at write
    time."""
    plan = plan_of(spark, "q_bucketed_join")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_assign_ids_avoids_global_sort(spark):
    """q_assign_ids must never degenerate into the single-reducer
    global ROW_NUMBER: the corpus-sized window is partitioned by the
    hash bucket (one hash exchange), there is no range partitioning
    (no global sort), and the offsets frame joins back by broadcast."""
    plan = plan_of(spark, "q_assign_ids")
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(_b" in plan
    assert "BroadcastHashJoin" in plan
    # the corpus scan prunes to the natural key only
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_bm25_retrieval_broadcasts_queries_and_stats(spark):
    """The query-term table and vocab df both broadcast; the only
    corpus-sized exchanges are the (doc, term) aggregate and the final
    per-(query, doc) partial sum; top-5 rides WindowGroupLimit so rank
    filtering happens map-side."""
    plan = plan_of(spark, "q_bm25_retrieval")
    assert plan.count("BroadcastExchange") >= 2
    assert "WindowGroupLimit" in plan


def test_padding_audit_is_one_aggregate(spark):
    """Token arrays never shuffle: the plan is scan -> project ->
    partial agg -> one 9-group exchange -> final agg."""
    plan = plan_of(spark, "q_padding_audit")
    assert plan.count("Exchange (") == 1
    assert "ReadSchema: struct<text:string>" in plan


def test_lateral_topk_decorrelates_to_window_group_limit(spark):
    """The correlated LATERAL subquery must not execute per outer row:
    Catalyst rewrites it to a per-key WindowGroupLimit + one join."""
    plan = plan_of(spark, "q_lateral_topk")
    assert "WindowGroupLimit" in plan
