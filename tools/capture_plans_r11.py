#!/usr/bin/env python
"""Capture .explain("formatted") for every query the r11 optimization round
touched, writing plans/r11/<query>_<suffix>.txt.

Usage:
    python tools/capture_plans_r11.py --code <repo-to-import> \
        --out <plans-dir> --suffix before|after [--sf-dir DIR] [--only a,b,c]

`--code` lets the same script run against a pre-round checkout (git worktree
of the r10 close) to produce the `_before` plans and against HEAD for
`_after`. Plans are captured at sf0.01: plan SHAPE (exchanges, join
strategy, pushed filters, aggregate expression classes, Python-eval nodes)
is what the round's claims are about and it does not change with SF; the
scale-adaptive knobs that do are recorded in OPTIMIZATION_r11.md with their
formulas. Streaming declared queries execute eagerly on invocation; their
captured plan is the final batch DataFrame the query returns (the
micro-batch sink plans live in the code and bench numbers).
"""

from __future__ import annotations

import argparse
import os
import sys

# Every query the r11 session's commits touched, grouped by change.
TOUCHED = [
    # integer-unit-sum conversions (decimal agg buffers -> long codegen
    # buffers, value-identical)
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_regional_revenue",
    "q10_returned_revenue",
    "q17_below_avg_quantity",
    "q18_large_volume_orders",
    "q22_high_balance_inactive",
    "a3_group_stats",
    "a_distinct_users",
    "a_price_quantity_corr",
    "agg_rollup",
    "j8_dim_join_revenue",
    "json_variant_agg",
    "mixture_downsample",
    "null_semantics_join",
    "ts_rolling_anomalies",
    # layout family (bucketed-table session cache; unit sums in the probe)
    "layout_partition_pruning",
    "layout_bucketed_join",
    # ANN probe fixed-cost work (wave fast path, memoized prebuilt loads)
    "ann_ivf_prebuilt_topk",
    "ann_ivf_upsert_topk",
    "ann_pq_prebuilt_topk",
    "ann_ivfpq_prebuilt_topk",
    "ann_nsw_prebuilt_topk",
    "ann_nsw_upsert_topk",
    "ann_nsw_routed_prebuilt_topk",
    "ann_nsw_routed_upsert_topk",
    "ann_nsw_routed_spill_prebuilt_topk",
    "ann_nsw_routed_pq_topk",
    # two-stage Gonzalez k-center (new in r11 -> no _before file)
    "sample_kcenter_diverse_cells",
    # r11 session 3: expr-built simhash construction + shared daily_cli
    # signatures + overlapped pins (driver-side cost; plan shape
    # unchanged — the simhash/incremental plans are byte-identical and
    # day3's 20 MB executed plan differs only in operator IDs, committed
    # as a truncated excerpt)
    "dedup_simhash",
    "dedup_incremental_batch",
    "pipeline_daily_increment_day3",
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
    spark = get_spark("capture-plans-r11", shuffle_partitions=8)
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
