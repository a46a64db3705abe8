#!/usr/bin/env python
"""One-off A/B: suite-loop timing of the base-table-reading declared
queries WITH vs WITHOUT tables.cache_tables() pre-persisting the inputs
(r11 methodology item 5 — the bench must compute from the parquet inputs,
so the persist was removed; this quantifies what that changes).

Protocol mirrors bench.py's suite loop: noop sink, min-of-3 reps,
fixture-build seconds excluded. Uncached leg runs FIRST (so the cached
leg, not the uncached one, gets any residual warm-up advantage — biases
AGAINST the shipped uncached methodology). Page cache is warmed by one
untimed warm-up rep before each leg.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bensp_suite_spark import queries as Q
from bensp_suite_spark.session import default_parallelism, get_spark
from bensp_suite_spark.tables import _TABLE_CACHE, cache_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def time_leg(spark, names, reps=3):
    times = {}
    # untimed page-cache / codegen warm-up pass
    for name in names:
        Q.FIXTURE_BUILD_SECONDS.pop(name, None)
        Q.QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for _rep in range(reps):
        for name in names:
            Q.FIXTURE_BUILD_SECONDS.pop(name, None)
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0 - Q.FIXTURE_BUILD_SECONDS.pop(name, 0.0)
            times[name] = min(times.get(name, float("inf")), round(sec, 4))
    return times


def main():
    total_bytes = sum(
        os.path.getsize(os.path.join(SF_DIR, f)) for f in os.listdir(SF_DIR)
    )
    cpus = default_parallelism()
    shuffle = max(8, min(4 * cpus, total_bytes // (32 << 20) or 8))
    spark = get_spark("ab-table-cache", shuffle_partitions=int(shuffle))
    spark.sparkContext.setLogLevel("ERROR")

    # the relational / sketch / graph / text declared queries that read the
    # base tables (stream_/pipeline_/multimodal_/ferret_/cdc_ queries build
    # their own synthetic fixtures and never touch the table cache)
    names = sorted(
        n
        for n in Q.QUERIES
        if not n.startswith(
            ("stream_", "pipeline_", "multimodal_", "ferret_", "cdc_", "source_")
        )
    )
    print(f"{len(names)} table-backed queries", file=sys.stderr)

    uncached = time_leg(spark, names)
    cache_tables(spark, SF_DIR)
    cached = time_leg(spark, names)
    for df in list(_TABLE_CACHE.values()):
        df.unpersist()
    _TABLE_CACHE.clear()

    tot_u, tot_c = sum(uncached.values()), sum(cached.values())
    deltas = sorted(
        ((uncached[n] - cached[n], n) for n in names), reverse=True
    )
    print(
        json.dumps(
            {
                "n": len(names),
                "uncached_sec": round(tot_u, 2),
                "cached_sec": round(tot_c, 2),
                "delta_sec": round(tot_u - tot_c, 2),
                "ratio": round(tot_u / tot_c, 3),
                "top10_deltas": [
                    {"q": n, "uncached": uncached[n], "cached": cached[n]}
                    for d, n in deltas[:10]
                ],
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
