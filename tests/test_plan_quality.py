"""Physical-plan quality gates (the 100 TB contract).

Correctness tests prove the answers; these prove the *plans* — filter
pushdown into the parquet scan, column pruning, broadcast joins for
dimensions, rank-limit pushdown for top-K windows, and no Python UDFs in
the relational hot paths. A regression here is a 100×-scale performance
bug even when results stay right.
"""

from __future__ import annotations

import pytest

from bensp_suite_spark import plans as PL
from bensp_suite_spark import queries as Q

from .conftest import SF_CORRECT


def _df(spark, name: str):
    return Q.QUERIES[name](spark, SF_CORRECT)


def _plan(spark, name: str) -> str:
    return PL.executed_plan(_df(spark, name))


def _formatted(spark, name: str) -> str:
    return PL.formatted_plan(_df(spark, name))


def test_range_filter_pushed_to_scan(spark):
    PL.assert_pushed_filter(_df(spark, "p7_range_filter"), "LessThan(l_extendedprice,1500.0)")


def test_projection_pruned_at_scan(spark):
    # o1 selects 3 of 11 lineitem columns; the scan must read only those
    PL.assert_read_schema(
        _df(spark, "o1_ordered_emit"),
        must=["l_orderkey", "l_quantity"],
        must_not=["l_extendedprice", "l_comment"],
    )


def test_dim_join_is_broadcast(spark):
    # the fact side must NOT sort-merge (no full-table exchange for the join)
    PL.assert_broadcast_join(_df(spark, "j8_dim_join_revenue"))


def test_semi_join_is_broadcast_semi(spark):
    plan = _plan(spark, "j7_semi_join")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_topk_window_has_group_limit(spark):
    # Spark's WindowGroupLimit = map-side partial top-K (the per-thread
    # bounded-heap analog); without it every group's full rowset shuffles
    plan = _plan(spark, "o2_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_global_topk_is_take_ordered(spark):
    plan = _plan(spark, "o6_global_topk")
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark):
    # hash aggregate must run partial (map-side combine) then final
    PL.assert_partial_aggregation(_df(spark, "q1_pricing_summary"))


def test_relational_queries_have_no_python_udfs(spark):
    """Every TPC-H-shaped relational query must stay fully JVM-side
    (SURVEY §4: UDFs are reserved for the kernel ops)."""
    relational = [
        "q1_pricing_summary", "j1_first_wins_dedup", "j2_scoped_dedup",
        "j3_canonical_ref", "j7_semi_join", "j7_anti_join",
        "j8_dim_join_revenue", "q3_top_revenue_orders", "o1_ordered_emit",
        "o2_topk_per_group", "o6_global_topk", "a2_histogram",
        "a3_group_stats", "e2_union_distinct", "e_intersect", "e_except",
        "p7_range_filter", "p1_prefix_filter", "a5_windowed_throughput",
        "a6_windowed_latency_by_type",
        # text ops are deliberately JVM-side too
        "text_token_count", "text_bpe_token_count", "text_quality_score", "text_lang_id",
        "text_doc_fingerprint", "dedup_exact_text", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_pairs",
        # grouping-set / window aggs and the expression-only ANN paths
        # (ann_ivf_topk is deliberately NOT here: its cell assignment is a
        # vectorized Arrow pass — see test_ivf_topk_no_corpus_shuffle)
        "agg_rollup", "agg_cube_events", "agg_pivot_status",
        "a5_session_windows", "ann_cosine_topk", "ann_range_search",
        "dedup_embedding_cosine",
        # relational breadth II + curation ops — all JVM-side expressions
        "q13_order_count_distribution", "q18_large_volume_orders",
        "q22_high_balance_inactive", "q10_returned_revenue",
        "q2_min_price_supplier", "text_decontaminate",
        "text_gopher_quality", "text_repetition_ratio",
    ]
    for name in relational:
        PL.assert_no_python_udf(_df(spark, name), what=name)


def test_whole_stage_codegen_on_hot_path(spark):
    # AQE shows codegen spans only in the FINAL plan — execute THIS
    # DataFrame's own queryExecution (a noop write executes a copy)
    df = Q.QUERIES["q1_pricing_summary"](spark, SF_CORRECT)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # AQE final plans mark whole-stage-codegen stages with "*(n)" prefixes
    assert "*(1)" in plan, f"no codegen stage markers in:\n{plan[:800]}"


def test_ivf_topk_no_corpus_shuffle(spark):
    """IVF cell assignment must be a shuffle-free narrow stage (closure-
    captured centroids, vectorized Arrow pass) and the candidate join must
    broadcast the probed queries. A sort-merge join on `cell` (16 distinct
    values) caps parallelism at 16 tasks regardless of cluster size — the
    canonical skew cliff."""
    plan = _plan(spark, "ann_ivf_topk")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the assignment is the vectorized Arrow stage — and the only one
    assert plan.count("ArrowEvalPython") == 2  # corpus assign + query probe
    # exactly two exchanges: broadcast of probed queries + final rank window
    assert plan.count("Exchange") <= 2, plan
    assert "WindowGroupLimit" in plan


def test_embedding_near_dup_is_broadcast(spark):
    # sign-pattern blocking join: blocks table broadcasts, corpus streams
    plan = _plan(spark, "dedup_embedding_cosine")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_grouping_set_aggs_are_partial(spark):
    # rollup/cube/pivot/session-window aggs must all map-side combine
    for name in ("agg_rollup", "agg_cube_events", "agg_pivot_status",
                 "a5_session_windows"):
        plan = _plan(spark, name)
        assert plan.count("HashAggregate") >= 2, name
        assert plan.count("Exchange hashpartitioning") == 1, name


def test_cdc_shuffle_is_metadata_only(spark):
    """The dedup-stats sha1 exchange must not carry chunk payloads (the
    fused stage drops them before the shuffle). Needs >1 input partition
    or the exchange is elided entirely."""
    from bensp_suite_spark.dedup import fixtures, pipeline

    files = fixtures.synthetic_docs(spark, n_files=32, file_bytes=8192, seed=1)
    plan = pipeline.dedup_stats(files)._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.index("Exchange hashpartitioning(sha1")
    # the Project feeding the exchange must exclude payload bytes
    project_line = next(
        l for l in plan[first_exchange:].splitlines() if "Project [" in l
    )
    assert "payload" not in project_line
    # and the full-encode path shuffles payloads exactly once (by design)
    ddp_plan = (
        pipeline.encode(files)._jdf.queryExecution().executedPlan().toString()
    )
    assert ddp_plan.count("Exchange hashpartitioning(sha1") == 1


# ---------------------------------------------------------------------------
# Relational-breadth queries (multi-join, subqueries, windows, percentiles,
# distinct-agg, JSON) — added with their own 100 TB plan contracts.
# ---------------------------------------------------------------------------


def test_q5_join_chain_broadcasts_dims_no_nested_loop(spark):
    # nation⨝region must broadcast; nothing may fall back to a nested loop
    plan = _plan(spark, "q5_regional_revenue")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    PL.assert_no_python_udf(Q.QUERIES["q5_regional_revenue"](spark, SF_CORRECT))


def test_q4_exists_is_semi_hash_join(spark):
    # correlated EXISTS decorrelates to a LeftSemi HASH join; the non-equi
    # shipdate predicate must ride as a residual, not force a nested loop
    plan = _plan(spark, "q4_priority_exists")
    assert "LeftSemi" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    PL.assert_partial_aggregation(Q.QUERIES["q4_priority_exists"](spark, SF_CORRECT))


def test_q17_threshold_agg_is_partial_and_part_broadcasts(spark):
    df = Q.QUERIES["q17_below_avg_quantity"](spark, SF_CORRECT)
    PL.assert_partial_aggregation(df)
    plan = PL.executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_running_totals_single_window_pass(spark):
    # three window functions over one (partition, order) spec must share a
    # single Window node: one exchange + one sort total, or at scale the
    # events table shuffles and sorts three times instead of once
    plan = _plan(spark, "w_running_totals")
    assert plan.count("Window ") + plan.count("Window\n") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") == 1, plan


def test_percentiles_aggregate_partially(spark):
    # exact percentile is an ObjectHashAggregate; it must still run
    # partial (map-side sketch of the sorted buffer) + final
    plan = _plan(spark, "a_exact_percentiles")
    assert plan.count("ObjectHashAggregate") == 2, plan
    assert plan.count("Exchange") == 1, plan


def test_distinct_agg_two_phase(spark):
    # COUNT(DISTINCT) alongside plain aggs: two-exchange two-phase plan
    # (re-key on (group, distinct) then on group), all phases partial
    df = Q.QUERIES["a_distinct_users"](spark, SF_CORRECT)
    PL.assert_partial_aggregation(df)
    assert PL.count_exchanges(df) == 2


def test_json_extract_stays_on_jvm(spark):
    # get_json_object is Jackson on the JVM — no Python stage allowed
    df = Q.QUERIES["json_props_extract"](spark, SF_CORRECT)
    PL.assert_no_python_udf(df)
    PL.assert_partial_aggregation(df)


def test_scale_swap_approx_variants(spark):
    """The 100 TB swap-ins the percentile/distinct docstrings promise:
    approx_percentile (t-digest) and approx_count_distinct (HLL++) run the
    same group-by shapes as single-pass mergeable sketches."""
    from pyspark.sql import functions as F

    from bensp_suite_spark.tables import load_table

    o = load_table(spark, SF_CORRECT, "orders")
    apq = o.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("n_cust"),
    )
    plan = PL.executed_plan(apq)
    assert plan.count("Exchange") == 1  # single pass, no distinct expand
    rows = {r["o_orderpriority"]: r for r in apq.collect()}
    exact = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.count_distinct("o_custkey").alias("n_cust"),
        )
        .collect()
    }
    for k, r in rows.items():
        assert abs(r["p50"] - exact[k]["p50"]) / exact[k]["p50"] < 0.05
        assert abs(r["n_cust"] - exact[k]["n_cust"]) / exact[k]["n_cust"] < 0.05


def test_aqe_splits_skewed_join_partitions(spark):
    """The 100 TB skew story for JOINS: AQE detects a hot key's oversized
    shuffle partition at runtime and splits it across tasks (skew=true in
    the final adaptive plan) — no manual salting needed on the join path
    (salting is reserved for heavy aggregation state, relational.salted_agg).
    Mirrors session.py's skewJoin.enabled=true default."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(100_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
        cold = spark.range(20_000).select(
            (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v")
        )
        dim = spark.range(101).select(F.col("id").alias("k"), F.lit("d").alias("name"))
        j = hot.union(cold).join(dim, "k")
        rows = j.collect()  # executes THIS QueryExecution (adaptive final plan)
        plan = PL.executed_plan(j)
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1, plan[:1500]
        assert len(rows) == 120_000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_reduces_fact_scan(spark):
    """Runtime semi-join reduction: a selective dim predicate injects a
    bloom filter (might_contain) into the FACT side's scan stage, so
    non-matching fact rows die at the scan instead of crossing the join
    shuffle — at 100 TB this is the difference between shuffling the
    whole fact table and shuffling the matching fraction. Needs real file
    scans (not cached relations); the scan-size threshold is floored at
    toy scale only to trigger what a 100 TB scan triggers naturally."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        rows = j.collect()
        plan = PL.executed_plan(j)
        assert "might_contain" in plan, plan[:1500]
        assert rows[0]["count"] > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_rank_family_single_window_pass(spark):
    # all four rank functions share one window spec → one Window node,
    # one exchange, one sort (same contract as w_running_totals)
    plan = _plan(spark, "w_rank_functions")
    assert plan.count("Window ") + plan.count("Window\n") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") == 1, plan


def test_q13_outer_join_hashes_no_nested_loop(spark):
    # residual non-key predicate must ride the hash join, not force a
    # nested loop; the count-of-counts agg partial-aggregates map-side
    plan = _plan(spark, "q13_order_count_distribution")
    assert "NestedLoop" not in plan, plan
    assert "Join LeftOuter" in plan or "LeftOuter" in plan, plan
    PL.assert_partial_aggregation(_df(spark, "q13_order_count_distribution"))


def test_q18_having_set_joins_back_as_broadcast_semi(spark):
    plan = _plan(spark, "q18_large_volume_orders")
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    PL.assert_partial_aggregation(_df(spark, "q18_large_volume_orders"))


def test_q22_not_exists_is_anti_hash_join(spark):
    plan = _plan(spark, "q22_high_balance_inactive")
    # the NOT EXISTS must be a HASH anti join (a nested-loop anti join
    # over the fact would be O(n·m) at scale)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the scalar threshold becomes a 1-row IdentityBroadcast (fine as a
    # nested loop: build side is a single row), never a per-row subquery
    assert "IdentityBroadcastMode" in plan, plan


def test_q10_topn_is_take_ordered_with_pushed_flag(spark):
    df = _df(spark, "q10_returned_revenue")
    plan = PL.executed_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    PL.assert_pushed_filter(df, "EqualTo(l_returnflag,R)")


def test_q2_min_lookup_partial_agg_and_broadcast_dim(spark):
    plan = _plan(spark, "q2_min_price_supplier")
    assert "BroadcastHashJoin" in plan, plan
    PL.assert_partial_aggregation(_df(spark, "q2_min_price_supplier"))


def test_decontaminate_benchmark_side_broadcasts(spark):
    # the training-side gram stream must not shuffle for the overlap
    # join — the benchmark gram set broadcasts (it is MB-scale at 100 TB)
    plan = _plan(spark, "text_decontaminate")
    assert "BroadcastHashJoin" in plan, plan
    PL.assert_no_python_udf(_df(spark, "text_decontaminate"), what="text_decontaminate")


def test_curation_queries_jvm_side_partial_agg(spark):
    for name in ("text_gopher_quality", "text_repetition_ratio"):
        df = _df(spark, name)
        PL.assert_no_python_udf(df, what=name)
        PL.assert_partial_aggregation(df)


def test_quality_checks_row_level_single_scan(spark):
    """All row-level expectations share one scan + one aggregation; only
    the uniqueness check adds a second scan (its key grouping)."""
    plan = _plan(spark, "data_quality_report")
    assert plan.count("Scan parquet") == 2, plan


def test_q6_filters_reach_scan_and_prune_columns(spark):
    """Q6 is pure scan: the date/discount/quantity predicates must push to
    the parquet reader and the projection must prune to the 4 used
    columns — at 100 TB this query's entire cost is post-skip bytes."""
    df = _df(spark, "q6_forecast_revenue")
    PL.assert_pushed_filter(df, "LessThan(l_quantity,24.0)")
    PL.assert_pushed_filter(df, "GreaterThanOrEqual(l_discount,0.02)")
    PL.assert_read_schema(
        df,
        must=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        must_not=["l_orderkey", "l_returnflag", "l_tax"],
    )
    PL.assert_partial_aggregation(df)


def test_q19_disjunction_prunes_both_scans(spark):
    """Q19's OR-of-conjuncts straddles the join; Catalyst must extract the
    single-table factors so BOTH scans prune before the join (part stays a
    broadcast build side)."""
    df = _df(spark, "q19_disjunctive_revenue")
    plan = PL.executed_plan(df)
    assert "BroadcastHashJoin" in plan
    # the extracted lineitem-only factor of the disjunction reaches the scan
    fmt = PL.formatted_plan(df)
    assert "l_quantity" in fmt.split("PushedFilters")[1].splitlines()[0] or (
        "Or(" in fmt
    ), fmt[:500]


def test_new_tpch_shapes_no_python_udfs_and_broadcast_dims(spark):
    """Round-2 TPC-H breadth must hold the same plan discipline: fully
    JVM-side, dimension joins broadcast."""
    names = [
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "q11_value_share", "q12_ship_delay_priority",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_cnt",
        "q19_disjunctive_revenue", "q20_red_part_suppliers",
        "q21_sole_returned_supplier",
        # passage-level dedup family: md5-addressed, expression-only
        "dedup_passages", "dedup_boilerplate_passages",
        "text_bm25_rank", "text_strip_boilerplate",
    ]
    for name in names:
        PL.assert_no_python_udf(_df(spark, name), what=name)
    for name in ["q7_volume_shipping", "q9_product_profit", "q14_promo_revenue"]:
        PL.assert_broadcast_join(_df(spark, name))


def test_round4_queries_plan_quality(spark):
    """Round-4 additions stay JVM-side and scale-shaped: PageRank and the
    salted distinct plan contain no Python UDFs; the salted plan carries
    the two-exchange signature (finer exchange on (key, salt) before the
    merge exchange on key)."""
    for name in ("graph_pagerank_copurchase", "skew_salted_distinct_users",
                 "pack_context_windows", "mixture_downsample"):
        PL.assert_no_python_udf(_df(spark, name), what=name)

    plan = _df(spark, "skew_salted_distinct_users")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 2, plan[:2000]
    assert "_salt" in plan


def test_batch_file_ingest_window_never_carries_content(spark, tmp_path):
    """The batch read_files ingest ranks a paths-only projection: no plan
    may ship file CONTENT through the single unpartitioned window task
    (the round-4 scale-killer). Gate: every Window node's subtree must be
    free of the content column, and the id map must broadcast back."""
    from bensp_suite_spark.sources.binaryfiles import read_files

    d = tmp_path / "files"
    d.mkdir()
    for i in range(4):
        (d / f"f{i}.bin").write_bytes(bytes([i]) * 64)

    df = read_files(spark, str(d))
    df.collect()  # finalize AQE plan
    full = PL.executed_plan(df)

    def indent_of(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-*("))

    lines = full.splitlines()
    win_idxs = [i for i, l in enumerate(lines) if "Window" in l]
    assert win_idxs, f"expected a window ranking the paths-only projection\n{full[:2000]}"
    for wi in win_idxs:
        base = indent_of(lines[wi])
        j = wi + 1
        while j < len(lines) and indent_of(lines[j]) > base:
            assert "content#" not in lines[j], (
                f"window subtree carries content:\n" + "\n".join(lines[wi:j + 1])
            )
            j += 1
    assert "BroadcastHashJoin" in full, full[:2000]

    # semantics unchanged: dense 0..n-1 ids in path order
    rows = sorted((r.file_path, r.file_id) for r in df.collect())
    assert [fid for _p, fid in rows] == list(range(4))


def test_hash_sample_is_pure_scan_filter(spark):
    # deterministic sampling must stay a scan-time filter: no exchange,
    # no aggregate, no join anywhere in the plan
    plan = _plan(spark, "sample_hash_bernoulli")
    assert "Exchange" not in plan
    assert "Join" not in plan and "Aggregate" not in plan


def test_resample_mix_broadcasts_rates_no_sort_merge(spark):
    # the per-stratum rate table is dimension-sized: the membership join
    # must be broadcast, never sort-merge; the only exchanges belong to
    # the (tiny, partially aggregated) count/min rate derivation
    plan = _plan(spark, "sample_resample_mix")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dup_ngram_decision_is_min_max_not_distinct(spark):
    # the >1-distinct-doc decision must stay min/max (map-side
    # combinable), not a count-distinct expansion
    plan = _plan(spark, "dedup_dup_ngram_spans")
    # partial min/max aggregate on the gram hash must exist
    assert "partial_min" in plan and "partial_max" in plan
    assert "count(distinct" not in plan.lower()


def test_kmv_topk_is_take_ordered_not_full_sort(spark):
    # the k-smallest-hash step must plan as TakeOrderedAndProject
    # (per-partition top-k + k-row driver merge), never a global sort
    plan = _plan(spark, "sketch_kmv_distinct")
    assert "TakeOrderedAndProject" in plan


def test_crawl_frontier_plan_quality(spark):
    """The frontier's scale contract in the physical plan: the uncrawled
    candidate set is a LeftAnti join on URL strings, the per-host quota
    compiles to WindowGroupLimit (per-partition top-k — a hot host's
    candidates never become one task's full sort), the host-rank join is
    broadcast, and no Python UDF appears anywhere (extraction +
    canonicalization are pure column expressions)."""
    plan = _plan(spark, "pipeline_crawl_frontier")
    assert "LeftAnti" in plan
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_binary_quant_sign_pack_is_jvm_side(spark):
    """Binary-quantization ANN's sign packing and hamming coarse pass
    must be pure JVM column work (shiftleft fold + bit_count on the
    XOR) — no Python UDF; the query side is the broadcast build side."""
    plan = _plan(spark, "ann_binary_quant_topk")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_sq8_dequantize_is_jvm_side(spark):
    """SQ8 ANN's min/max training aggregate, affine dequantize, and
    asymmetric-distance coarse pass must be pure JVM column work
    (zip_with/aggregate higher-order functions) — no Python UDF; the
    1-row stats frame and the query side are broadcast sides."""
    plan = _plan(spark, "ann_sq8_topk")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_rrf_fusion_adds_no_python(spark):
    """The RRF fusion algebra (union + integer-point agg + window) must
    add NO Python stage of its own: fused over the all-JVM families
    (matryoshka + SQ8 + binary-quant) the whole plan compiles without a
    Python stage. (The declared query fuses IVF too, whose cell
    assignment is a pandas UDF — that stage belongs to IVF, not to the
    fusion.)"""
    from pyspark.sql import functions as F

    from bensp_suite_spark import plans as PL2
    from bensp_suite_spark.operators import similarity as SIM
    from bensp_suite_spark.tables import load_table

    emb = load_table(spark, SF_CORRECT, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    fused = SIM.rrf_fuse(
        [
            SIM.matryoshka_ann_topk(q, emb, k=5, dims=16, refine=4),
            SIM.sq8_ann_topk(q, emb, k=5, dims=64, refine=4),
            SIM.binary_quant_ann_topk(q, emb, k=5, dims=64, refine=4),
        ],
        k=5,
    )
    plan = PL2.executed_plan(fused)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_triangle_count_is_jvm_equijoins(spark):
    """Degree-oriented triangle counting must compile to pure JVM
    equi-joins (SortMergeJoin/BroadcastHashJoin on the wedge and closing
    edges) — no Python stage, no nested-loop join anywhere (the
    cartesian blowup the orientation exists to avoid)."""
    plan = _plan(spark, "graph_triangle_count")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
