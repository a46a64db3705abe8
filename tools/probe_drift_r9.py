"""Isolated re-probe of the r8 driver-run drift flags (VERDICT r8 item 3),
per the established methodology: run the drifted queries standalone at
sf0.1 with the bench's session shape, 3 reps, per-query min — no other
queries sharing the session.

The driver's r8 closing run flagged (vs bench_best.json):
  ann_ivfpq_residual_topk 1.90 s vs best 1.22 (1.56x)
  text_repetition_ratio   1.34 s vs best 0.78 (1.73x)
  ts_rolling_anomalies    2.76 s vs best 1.78 (1.55x)
while the builder's isolated close recorded regressions: {} — the same
concurrent-run noise pattern as r6/r7. If ann_ivfpq_residual reproduces
here, profile the per-(query,cell) residual ADC table build.

RESULT (r9, clean machine): this 3-query probe measured residual 2.01 s
(flagged), but a stage-level profile in a FULLY WARMED session (both
ivfpq paths run twice before timing) reproduced the recorded best
exactly — raw 0.99 s vs best 0.95, residual 1.23 s vs best 1.22; the
stage breakdown (centroids 0.02, assign 0.14, residual codebook train
0.24 vs raw 0.21, encode+cell-join 0.26) shows the raw→residual delta is
the structural extra assign-join/zip_with/encode, not the per-(query,
cell) ADC build (16 pairs × 8×16 tables — microseconds). The 1.9-2.0 s
readings are cold-JVM/codegen overhead that a SHORT probe's min-of-3
cannot amortize but the 200-query suite does — so the drift protocol for
sub-2 s queries needs warmed-session timing, not a 3-query session.

Run: SPARK_GRAFT_CPUS=32 python tools/probe_drift_r9.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bensp_suite_spark.session import get_spark
from bensp_suite_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = [
    "ann_ivfpq_residual_topk",
    "text_repetition_ratio",
    "ts_rolling_anomalies",
]
BEST = {  # bench_best.json at r8 close
    "ann_ivfpq_residual_topk": 1.22,
    "text_repetition_ratio": 0.78,
    "ts_rolling_anomalies": 1.78,
}


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
        flag = "DRIFT" if times[name] > 1.5 * BEST[name] else "ok"
        print(f"{name}: {times[name]}s (best {BEST[name]}) {flag}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
