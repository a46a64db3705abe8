"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` and
``oracle_sql()`` expose the declared-query registry (see
``bensp_suite_spark/queries.py``) checked against DuckDB at sf0.01.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bensp_suite_spark import queries as Q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _green_last_round() -> dict[str, int]:
    """{query name: LAST round number it verified green} across all prior
    CORRECTNESS files. The driver checks a fixed-size prefix of the
    registration order, so ordering previously-green names by how stale
    their last verification is walks the check window across the whole
    registry — and SELF-CORRECTS: a name that misses a round's window
    (e.g. displaced by forced re-verifies) keeps its older round number
    and sorts to the front next round, so nothing is ever skipped for a
    full cycle (the r6 modulo rotation could skip len(forced) names per
    round — ADVICE r6)."""
    seen: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(p))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(p) as fh:
                d = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(d, dict):
            continue
        for name, res in d.items():
            if (
                isinstance(res, dict)
                and res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
                and res.get("err") is None
            ):
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


# Surfaces whose driver rows are the most informative this round (newly
# added queries / previously rows-only families) — checked ahead of the
# other never-verified names so they cannot fall outside the driver's
# fixed-size check window. Trimmed to empty in r9: every former member is
# green and never-verified names auto-front anyway, so keeping them only
# stole rotation slots from the staleness walk (VERDICT r8 item 6).
_PRIORITY: list[str] = []


# How many previously-green names to pull back into the driver's check
# window each round. Without this, a query verified once would never be
# re-checked by the external driver (a later regression would go unseen);
# with it, the window is priority + never-verified + a staleness-ordered
# slice of the greens, so the whole registry is re-audited every few
# rounds. 70 keeps the ~210-query registry's full external re-audit cycle
# at ~3 rounds even when a round adds ~10-15 new queries (VERDICT r8:
# 30 greens had gone >4 rounds since their last external check at 60).
_REVERIFY_QUOTA = 70

#: previously-green queries whose IMPLEMENTATION changed this round —
#: forced to the head of the re-verify slice so the external driver
#: re-checks them in the same round as the change, regardless of where
#: the rotation happens to be. Clear when the round's changes land green.
_FORCE_REVERIFY = [
    # r11: decimal aggregates re-expressed as exact integer-unit sums in
    # long buffers (hi/lo split, _sum_units) — every converted query
    # re-pins externally in the same round
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
    "ts_rolling_anomalies",
    "json_variant_agg",
    "mixture_downsample",
    "null_semantics_join",
    # r11: wave probes' limit-probe fast path + memoized index loads
    "ann_nsw_routed_spill_prebuilt_topk",
    "ann_ivfpq_prebuilt_topk",
    "ann_nsw_prebuilt_topk",
    "ann_pq_prebuilt_topk",
    "ann_ivf_prebuilt_topk",
    "ann_ivf_upsert_topk",
    "ann_nsw_routed_upsert_topk",
    "ann_nsw_upsert_topk",
    "ann_nsw_routed_prebuilt_topk",
    # r11: merge-sink first-wins rebuilt (narrow agg + read-back winners)
    "stream_incremental_dedup",
    "pipeline_warc_daily",
    # r11: cogroup probe_mode plumbed through the routed-PQ probe; layout
    # pair's bucketed tables now cached per (session, sf_dir)
    "ann_nsw_routed_pq_topk",
    "layout_bucketed_join",
    "layout_partition_pruning",
    # r11 §9: shared per-batch signatures/pairs in the incremental-dedup
    # streams + daily loop (one SimHash pass + one banded join per batch)
    "stream_incremental_dedup_retention",
    "stream_routed_pq_upsert_probe",
    "pipeline_daily_increment",
    "pipeline_daily_increment_day2",
    "pipeline_daily_increment_day3",
    # r11 §10: simhash's 48 bit-sum aggregates + CASE reassembly rebuilt
    # from SQL strings (driver construction cost — values bit-identical,
    # parity-tested); every remaining simhash-embedding query re-pins
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_near_dup_resolution",
    "dedup_incremental_batch",
    "dedup_incremental_bloom_prefilter",
    "dedup_incremental_bloom_forced",
]


def _rotated_names() -> list[str]:
    seen = _green_last_round()
    names = list(Q.QUERIES)
    front = [n for n in _PRIORITY if n in names and n not in seen]
    rest_unseen = [n for n in names if n not in seen and n not in front]
    forced = [n for n in _FORCE_REVERIFY if n in names and n in seen]
    greens = [n for n in names if n in seen and n not in forced]
    # Least-recently-verified first (ties broken by registry order): the
    # next quota greens are exactly the stalest ones, and any name that
    # falls outside a round's window keeps its staleness and wins a slot
    # next round — no modulo cursor to drift (ADVICE r6).
    order = {n: i for i, n in enumerate(names)}
    greens.sort(key=lambda n: (seen[n], order[n]))
    quota = max(_REVERIFY_QUOTA - len(forced), 0)
    resample, rest_green = greens[:quota], greens[quota:]
    return front + rest_unseen + forced + resample + rest_green


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, never-verified
    names first (see _previously_green)."""
    return {n: Q.QUERIES[n] for n in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for non-SQL ops)."""
    return {n: Q.ORACLES[n] for n in _rotated_names() if n in Q.ORACLES}
