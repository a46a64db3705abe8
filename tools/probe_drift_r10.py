"""Isolated re-probe of the r9 driver-run streaming-dedup anomaly
(VERDICT r9 "What's wrong" #4), per the established r6-r9 methodology:
the driver's r9 closing run recorded extras.streaming_dedup_mbps = 10.26
(24.96 s / 256 MB) against the builder's isolated 43.0 and an r1-r8
history of 37-52 — below the 2× BASELINE bar (20.5) if real. Every other
extra in the same driver run was normal, which matches the documented
concurrent-run noise pattern, so this probe reruns the EXACT bench phase
(same fixture, same session shape, warm run + best-of-2 with fresh
checkpoints) on an otherwise idle machine.

Run: SPARK_GRAFT_CPUS=32 python tools/probe_drift_r10.py

RESULT (r10, clean machine): streaming_dedup_mbps = 34.88 (best-of-2
warm 7.34 s; reps 14.0 → 8.7 → 7.3) — comfortably above the 20.5 bar
and in line with the 37-52 history, so the driver's 10.26 was machine
contention, not a code path. The r9 code is unchanged here except the
state roll-up write layout, which this phase does not exercise
(stream_encode_merge has its own winners-table sink).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bensp_suite_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("probe-drift-r10", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    from bensp_suite_spark.dedup import fixtures as DF
    from bensp_suite_spark.streaming import dedup_stream as DSTR

    stream_mb = 256
    sdir = tempfile.mkdtemp(prefix="bensp_probe_stream_")
    s_src = os.path.join(sdir, "src")
    DF.synthetic_docs(
        spark, n_files=stream_mb, file_bytes=1 << 20, pool_size=64, seed=11
    ).repartition(8).write.mode("overwrite").parquet(s_src)
    stream_sec = None
    reps = []
    for _rep in range(3):
        s_out = os.path.join(sdir, f"out{_rep}")
        s_ckpt = os.path.join(sdir, f"ckpt{_rep}")
        s_stream = (
            spark.readStream.schema("file_id long, content binary")
            .option("maxFilesPerTrigger", 2)
            .parquet(s_src)
        )
        t0 = time.perf_counter()
        DSTR.stream_encode_merge(spark, s_stream, s_out, s_ckpt)
        rep_sec = round(time.perf_counter() - t0, 4)
        reps.append(rep_sec)
        if _rep > 0:
            stream_sec = rep_sec if stream_sec is None else min(stream_sec, rep_sec)
    mbps = round(stream_mb / stream_sec, 2)
    print(
        f"RESULT streaming_dedup_mbps={mbps} (best-of-2 warm {stream_sec}s, "
        f"reps={reps}; 2x bar = 20.5, r1-r8 history 37-52)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
