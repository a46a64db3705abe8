#!/usr/bin/env python
"""Regenerate PLANS.md: the formatted physical plans of headline queries,
with the scale-relevant features called out. Run after plan-affecting
changes; tests/test_plan_quality.py gates the properties, this document
shows them.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"

# query → what to look at in its plan
SHOWCASE = [
    ("q1_pricing_summary",
     "Filter pushed to the parquet scan (`PushedFilters`), partial+final "
     "hash aggregation, whole-stage codegen end to end — the A1/A3 stats "
     "shape."),
    ("q5_regional_revenue",
     "Six-table join chain: the two dimension joins are "
     "`BroadcastHashJoin` (no shuffle of the fact side for them); only "
     "the fact-to-fact joins exchange, and the region filter pruned "
     "before the join via join reordering."),
    ("j1_first_wins_dedup",
     "First-occurrence-wins dedup as a rank window: one hash exchange on "
     "the dedup key, `WindowGroupLimit` keeps per-key state bounded "
     "map-side."),
    ("o6_global_topk",
     "Global top-K is `TakeOrderedAndProject`: every partition keeps K "
     "rows, no full sort ever materializes."),
    ("text_decontaminate",
     "The corpus-side gram stream never shuffles: the benchmark gram set "
     "is the `BroadcastHashJoin` build side; the only exchange is the "
     "per-doc distinct count."),
    ("curation_pipeline",
     "Four curation stages composed in ONE plan — document text is "
     "scanned, never shuffled; the exchanges carry token counts, content "
     "hashes, and doc ids."),
    ("graph_pagerank_copurchase",
     "Iterative PageRank: the checkpointed edge/degree tables feed each "
     "iteration as `Scan ExistingRDD` (no re-derivation of the basket "
     "explode); per iteration one hash join + one aggregation exchange, "
     "all integer arithmetic (bit-exact on any engine)."),
    ("skew_salted_distinct_users",
     "Salted heavy-state aggregation: two exchanges — the FINER one on "
     "(key, salt) first, collect_set partials shrink there, then the "
     "merge exchange on the key alone carries one row per (key, salt)."),
    ("dedup_incremental_bloom_forced",
     "The probe-before-join shape (gate forced off — the gated sibling "
     "auto-skips the probe at this toy history): the k md5 bit positions "
     "are JVM expressions feeding `ArrowEvalPython` (one numpy bitset "
     "gather against the broadcast-constant filter), the definitely-new "
     "branch bypasses the history join entirely, and the exact check is "
     "a duplicate-tolerant `LeftSemi` — the join's stream side is "
     "true-dups + the fpp sliver, never the whole batch."),
    ("pipeline_crawl_frontier",
     "The frontier scheduler's plan: link extraction and both "
     "canonicalizations are scan-stage column work (raw HTML never "
     "shuffles), the PageRank iterations exchange only the host edge "
     "list, the uncrawled anti-join is `LeftAnti` on canonical URL "
     "strings, and the per-host quota compiles to `WindowGroupLimit` — "
     "a hot host's candidates never materialize as one task's sort."),
    ("web_pagerank_links",
     "HTML → frontier ranks in ONE plan: link extraction "
     "(regexp_extract_all + arrays_zip explode) and both "
     "canonicalizations are scan-stage column work; the only exchanges "
     "carry distinct host→host edges and the integer rank iterations — "
     "raw HTML never shuffles."),
    ("ann_ivfpq_topk",
     "IVF-PQ composition: the probed queries are the `BroadcastHashJoin` "
     "build side against the cell-coded corpus (candidates ∝ probed "
     "cells), ADC is one Arrow-batched gather, and the exact rerank "
     "touches only refine·k survivors per query."),
    ("ann_nsw_topk",
     "Sharded-NSW graph ANN: one `FlatMapGroupsInPandas` per shard "
     "builds+searches its graph (memory bounded by shard size, never "
     "corpus size); the nominations re-rank with broadcast JVM cosine — "
     "Python nominates, Catalyst scores."),
    ("graph_triangle_count",
     "Degree-oriented triangle counting: pure equi-joins (no cartesian / "
     "nested-loop anywhere) — the wedge join's fan-out is the ORIENTED "
     "out-degree, O(√m) even on celebrity nodes; the scan is pruned by "
     "the pushed part-cap filter."),
    ("ann_rrf_fusion",
     "Reciprocal-rank fusion of three ANN families: the fusion itself is "
     "union + integer-point agg + window — no Python stage added beyond "
     "the member families' own (the JVM families fuse fully codegen'd)."),
]


def main() -> None:
    from bensp_suite_spark import queries as Q
    from bensp_suite_spark.session import get_spark

    spark = get_spark("gen-plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — headline physical plans (generated)",
        "",
        "Generated by `tools/gen_plans_doc.py` at sf0.01 with 8 shuffle",
        "partitions; `tests/test_plan_quality.py` asserts these properties,",
        "this file shows them. Regenerate after plan-affecting changes.",
        "",
    ]
    # A showcase section is the OPERATOR TREE + the scale-relevant node
    # details, not a full expression dump: queries built from deep
    # higher-order array lambdas (the basket explode) format to thousands
    # of lines of expression text that drown the plan shape. Cap each
    # section; the full plan is always one .explain("formatted") away.
    max_lines = 400
    for name, note in SHOWCASE:
        df = Q.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        ).rstrip()
        plines = plan.split("\n")
        if len(plines) > max_lines:
            plan = "\n".join(
                plines[:max_lines]
                + [f"... [{len(plines) - max_lines} detail lines truncated]"]
            )
        out += [f"## {name}", "", note, "", "```", plan, "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
