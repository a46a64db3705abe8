#!/usr/bin/env python
"""Per-query fixed-cost breakdown for the DuckDB-proportional query set
(guide §1 measure-first): split each oracle-backed query's wall time into
(a) body construction (Python + Catalyst analysis, driver-side) and
(b) noop-write execution (plan optimize + jobs). Warm min-of-2 per half.

Also times the DuckDB oracle side per query (min-of-2) so the ratio's
composition is visible: how much of the gap is construction, how much is
execution, and how each correlates with duck's own per-query time.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from bensp_suite_spark import queries as Q
from bensp_suite_spark.golden_oracles import GOLDEN_ORACLES
from bensp_suite_spark.session import default_parallelism, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    total_bytes = sum(
        os.path.getsize(os.path.join(SF_DIR, f)) for f in os.listdir(SF_DIR)
    )
    cpus = default_parallelism()
    shuffle = max(8, min(4 * cpus, total_bytes // (32 << 20) or 8))
    spark = get_spark("profile-fixed-cost", shuffle_partitions=int(shuffle))
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(
        n
        for n, sql in Q.ORACLES.items()
        if sql is not None
        and not n.startswith(("stream_", "pipeline_"))
        and n not in GOLDEN_ORACLES
    )
    print(f"{len(names)} duckdb-prop queries", file=sys.stderr)

    # JVM warm-up
    Q.QUERIES["p7_range_filter"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    build: dict[str, float] = {}
    run: dict[str, float] = {}
    for _rep in range(3):
        for name in names:
            Q.FIXTURE_BUILD_SECONDS.pop(name, None)
            t0 = time.perf_counter()
            df = Q.QUERIES[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            fix = Q.FIXTURE_BUILD_SECONDS.pop(name, 0.0)
            if _rep:  # warm only
                build[name] = min(build.get(name, 9e9), t1 - t0 - fix)
                run[name] = min(run.get(name, 9e9), t2 - t1)

    duck: dict[str, float] = {}
    from oracle import duckdb_con

    con = duckdb_con(SF_DIR)
    for name in names:
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(Q.ORACLES[name]).df()
            best = min(best, time.perf_counter() - t0)
        duck[name] = best
    con.close()

    tot_b, tot_r, tot_d = sum(build.values()), sum(run.values()), sum(duck.values())
    rows = sorted(names, key=lambda n: -(build[n] + run[n]))
    out = {
        "n": len(names),
        "build_sec": round(tot_b, 2),
        "run_sec": round(tot_r, 2),
        "spark_sec": round(tot_b + tot_r, 2),
        "duck_sec": round(tot_d, 2),
        "ratio": round((tot_b + tot_r) / tot_d, 3),
        "ratio_run_only": round(tot_r / tot_d, 3),
        "top25": [
            {
                "q": n,
                "build": round(build[n], 3),
                "run": round(run[n], 3),
                "duck": round(duck[n], 4),
            }
            for n in rows[:25]
        ],
        # the sub-100ms-duck tail: how much spark spends where duck is ~free
        "small_duck_n": sum(1 for n in names if duck[n] < 0.1),
        "small_duck_spark_sec": round(
            sum(build[n] + run[n] for n in names if duck[n] < 0.1), 2
        ),
        "small_duck_build_sec": round(
            sum(build[n] for n in names if duck[n] < 0.1), 2
        ),
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
