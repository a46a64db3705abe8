#!/usr/bin/env python
"""Capture .explain("formatted") for every query the r12 optimization round
touched, writing plans/r12/<query>_<suffix>.txt.

Usage:
    python tools/capture_plans_r12.py --code <repo-to-import> \
        --out <plans-dir> --suffix before|after [--sf-dir DIR] [--only a,b,c]

`--code` lets the same script run against a pre-round checkout (git worktree
of the r10 close) to produce the `_before` plans and against HEAD for
`_after`. Plans are captured at sf0.01: plan SHAPE (exchanges, join
strategy, pushed filters, aggregate expression classes, Python-eval nodes)
is what the round's claims are about and it does not change with SF; the
scale-adaptive knobs that do are recorded in OPTIMIZATION_r12.md with their
formulas. Streaming declared queries execute eagerly on invocation; their
captured plan is the final batch DataFrame the query returns (the
micro-batch sink plans live in the code and bench numbers).
"""

from __future__ import annotations

import argparse
import os
import sys

# Every query the r12 session's commits touched, grouped by change.
TOUCHED = [
    # 1-slice local-DataFrame fixtures (Python-RDD slice walk removed;
    # plan leaves stay Scan ExistingRDD — the change is per-action
    # evaluation cost, not plan shape)
    "multimodal_video_clip_search",
    "multimodal_video_clip_search_reencoded",
    "multimodal_audio_snippet_search",
    "multimodal_audio_dedup",
    "multimodal_video_dedup",
    "null_semantics_join",
    "sample_kcenter_diverse",
    "sample_kcenter_diverse_cells",
    # build-once auto-sized IVF-PQ (training subtree leaves the plan)
    "ann_ivfpq_auto_topk",
    # frozen index-meta memo + upsert internals (probe read-back plans)
    "stream_routed_pq_upsert_probe",
    "stream_ann_routed_pq_topk",
    "ann_nsw_routed_pq_topk",
    # iterative graph loops (lazy checkpoints, key-partitioned edges)
    "graph_connected_components",
    "graph_pagerank_copurchase",
    "dedup_near_dup_resolution",
    # scale-adaptive state-store sizing (returned plans are sink
    # read-backs; the state plan lives in the stream)
    "stream_interval_join",
    "stream_interval_join_outer",
    "stream_session_windows",
    "stream_topk_per_key",
    "stream_per_key_quota",
    "stream_kmv_per_key",
    "stream_cms_cells",
    "stream_passage_dedup",
    "stream_exact_doc_dedup",
    "stream_windowed_metrics",
    # lineage-truncated pooled pins (nested multi-day plans -> LogicalRDD
    # leaves; day3's ~20 MB analyzed tree collapses)
    "pipeline_daily_increment_day3",
    "pipeline_daily_increment_day2",
    "pipeline_daily_increment",
    "pipeline_warc_daily",
    "dedup_incremental_batch",
    "dedup_incremental_bloom_forced",
    "dedup_semantic",
    "dedup_minhash_lsh",
    "layout_bucketed_join",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", required=True, help="repo root to import")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.abspath(args.code))
    from bensp_suite_spark import queries as Q
    from bensp_suite_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("capture-plans-r12", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    wanted = args.only.split(",") if args.only else TOUCHED
    for name in wanted:
        fn = Q.QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not in this checkout's registry")
            continue
        try:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ).rstrip()
        except Exception as exc:  # capture must not die on one query
            plan = f"CAPTURE ERROR: {exc!r}"
            print(f"ERROR {name}: {exc!r}")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan + "\n")
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
