#!/usr/bin/env python
"""Per-job wall-clock profile of one declared query (r11 optimization
round): runs the query once under an event log, then prints every Spark
job's duration + call site, plus the inter-job GAPS — the driver-side
planning/commit/fixed cost that per-job timings hide. Usage:

    python tools/profile_jobs_r11.py stream_incremental_dedup_retention [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = tempfile.mkdtemp(prefix="bensp_evlog_")

    from bensp_suite_spark import queries as Q
    from bensp_suite_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bensp-profile",
        shuffle_partitions=8,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bensp_suite_spark.tables import cache_tables

    cache_tables(spark, sf_dir)

    reps = int(os.environ.get("PROFILE_REPS", "2"))
    for rep in range(reps):  # rep 0 warms JIT/fixtures; last rep is profiled
        Q.FIXTURE_BUILD_SECONDS.pop(name, None)
        t0 = time.perf_counter()
        Q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        total = time.perf_counter() - t0
        build = Q.FIXTURE_BUILD_SECONDS.pop(name, 0.0)
        print(
            f"rep{rep}: total={total:.2f}s build={build:.2f}s "
            f"run={total - build:.2f}s"
        )
        if rep == reps - 2:
            mark_ms = time.time() * 1000  # profile only the last rep
    spark.stop()

    # parse the single event-log file
    evfiles = []
    for root, _dirs, files in os.walk(evdir):
        evfiles += [
            os.path.join(root, f)
            for f in files
            if not f.startswith(".") and "appstatus" not in f
        ]
    jobs: dict[int, dict] = {}
    for evf in evfiles:
        with open(evf) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "start": ev["Submission Time"],
                        "site": props.get(
                            "callSite.short",
                            props.get("spark.job.description", "?"),
                        ),
                    }
                elif et == "SparkListenerJobEnd":
                    j = jobs.get(ev["Job ID"])
                    if j is not None:
                        j["end"] = ev["Completion Time"]

    done = sorted(
        (j for j in jobs.values() if "end" in j), key=lambda j: j["start"]
    )
    if reps >= 2:
        done = [j for j in done if j["start"] >= mark_ms]
    print(f"\n--- {len(done)} jobs (profiled rep) ---")
    prev_end = None
    gap_total = 0.0
    job_total = 0.0
    by_site: dict[str, float] = {}
    for j in done:
        dur = (j["end"] - j["start"]) / 1000
        gap = (j["start"] - prev_end) / 1000 if prev_end is not None else 0.0
        prev_end = max(prev_end or 0, j["end"])
        gap_total += max(gap, 0)
        job_total += dur
        by_site[j["site"]] = by_site.get(j["site"], 0.0) + dur
        print(f"  job {dur:6.2f}s  gap_before {max(gap,0):6.2f}s  {j['site']}")
    print(f"\njob_total={job_total:.2f}s  gap_total={gap_total:.2f}s")
    print("\n--- cumulative by call site ---")
    for site, sec in sorted(by_site.items(), key=lambda kv: -kv[1]):
        print(f"  {sec:6.2f}s  {site}")


if __name__ == "__main__":
    main()
