"""Isolated re-probe of the r7 drift family (VERDICT item 6), per the
established methodology: run the drifted queries standalone at sf0.1
with the bench's session shape, 3 reps, per-query min — no other queries
sharing the session.

r6 -> r7 recorded: stream_incremental_dedup 7.76 -> 9.64 (1.24x),
pipeline_daily_increment 0.71 -> 1.01 (1.42x). Round 8 changes since:
the per-batch bloom read/parse is hoisted out of the stream sink (read
once per run, carried in memory), and the size gate skips the probe
passes at toy history.

Run: SPARK_GRAFT_CPUS=32 python tools/probe_drift_r8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bensp_suite_spark.session import get_spark
from bensp_suite_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = [
    "stream_incremental_dedup",
    "pipeline_daily_increment",
    "pipeline_daily_increment_day2",
    "pipeline_daily_increment_day3",
    "dedup_incremental_bloom_prefilter",
    "dedup_incremental_batch",
]


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bensp-drift-probe", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from bensp_suite_spark.tables import cache_tables

    cache_tables(spark, SF_DIR)
    times = {}
    for rep in range(3):
        for name in NAMES:
            Q.FIXTURE_BUILD_SECONDS.pop(name, None)
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            total = time.perf_counter() - t0
            build = Q.FIXTURE_BUILD_SECONDS.pop(name, 0.0)
            sec = round(total - build, 4)
            if sec < times.get(name, float("inf")):
                times[name] = sec
    for name in NAMES:
        print(f"{name}: {times[name]}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
