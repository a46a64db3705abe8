#!/usr/bin/env python
"""Benchmark harness: run the headline declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with a noop write (full plan execution, no
driver collect bottleneck) — the analog of the reference's throughput.dat
runs (testbed/t1/throughput.sh).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from bensp_suite_spark import queries as Q
    from bensp_suite_spark.session import get_spark

    spark = get_spark("bensp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers so per-query times measure the plan,
    # not first-touch overhead.
    Q.QUERIES["p7_range_filter"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in sorted(Q.QUERIES):
        df = Q.QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
