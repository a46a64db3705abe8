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
