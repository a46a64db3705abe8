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
    # r12: lineage-truncated pooled pins (pooled_persist hands out
    # localCheckpoint-backed frames) — every query composing pins
    # re-pins externally in the same round as the change
    "pipeline_daily_increment",
    "pipeline_daily_increment_day2",
    "pipeline_daily_increment_day3",
    "pipeline_warc_daily",
    "dedup_incremental_batch",
    "dedup_incremental_bloom_prefilter",
    "dedup_incremental_bloom_forced",
    "dedup_simhash_pairs",
    "dedup_semantic",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ferret_topk_single_region",
    "ferret_topk_multiregion",
    "cdc_round_trip_check",
    "text_tfidf",
    "stream_incremental_dedup",
    "stream_incremental_dedup_retention",
    # r12: scale-adaptive state-store sizing for the stateful streams
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
    # r12: build-once auto-sized IVF-PQ + frozen index-meta memo +
    # upsert internals (persisted assignment, worker-side corpus guard)
    "ann_ivfpq_auto_topk",
    "ann_nsw_prebuilt_topk",
    "ann_nsw_upsert_topk",
    "ann_nsw_routed_prebuilt_topk",
    "ann_nsw_routed_upsert_topk",
    "ann_nsw_routed_spill_prebuilt_topk",
    "ann_nsw_routed_pq_topk",
    "stream_ann_nsw_topk",
    "stream_ann_routed_pq_topk",
    "stream_routed_pq_upsert_probe",
    # r12: iterative graph loops (lazy checkpoints, key-partitioned edges)
    "graph_connected_components",
    "graph_pagerank_copurchase",
    "dedup_near_dup_resolution",
    # r12: 1-slice local-rows fixtures (multimodal corpora, dim tables,
    # k-center result frames — conversion semantics identical)
    "multimodal_audio_dedup",
    "multimodal_audio_snippet_search",
    "multimodal_video_clip_search",
    "multimodal_video_clip_search_reencoded",
    "multimodal_video_dedup",
    "multimodal_image_search",
    "null_semantics_join",
    "sample_kcenter_diverse",
    "sample_kcenter_diverse_cells",
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
