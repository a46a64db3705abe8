"""r11 profiling: isolated stream_encode_merge throughput at the bench shape.

Replicates bench.py's streaming phase exactly (256 MB, 8 source files,
maxFilesPerTrigger=2 -> 4 batches) and prints per-rep wall + per-batch
trigger durations so the per-trigger fixed cost is visible.
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bensp_suite_spark.session import get_spark  # noqa: E402

spark = get_spark("profile-stream", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
if os.environ.get("PROF_SPLIT_MB"):
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        str(int(os.environ["PROF_SPLIT_MB"]) << 20),
    )

from bensp_suite_spark.dedup import fixtures as DF  # noqa: E402
from bensp_suite_spark.streaming import dedup_stream as DSTR  # noqa: E402

stream_mb = 256
listener = DSTR.ThroughputListener()
handle = listener.attach(spark)
sdir = tempfile.mkdtemp(prefix="bensp_prof_stream_")
s_src = os.path.join(sdir, "src")
DF.synthetic_docs(
    spark, n_files=stream_mb, file_bytes=1 << 20, pool_size=64, seed=11
).repartition(8).write.mode("overwrite").parquet(s_src)

for rep in range(3):
    s_out = os.path.join(sdir, f"out{rep}")
    s_ckpt = os.path.join(sdir, f"ckpt{rep}")
    s_stream = (
        spark.readStream.schema("file_id long, content binary")
        .option("maxFilesPerTrigger", 2)
        .parquet(s_src)
    )
    n0 = len(listener.progress)
    t0 = time.perf_counter()
    DSTR.stream_encode_merge(spark, s_stream, s_out, s_ckpt)
    sec = time.perf_counter() - t0
    batches = [p["duration_ms"] for p in listener.progress[n0:]]
    print(
        f"rep{rep}: {sec:.2f}s  {stream_mb / sec:.1f} MB/s  "
        f"trigger_ms={batches}"
    )

shutil.rmtree(sdir, ignore_errors=True)
spark.streams.removeListener(handle)
spark.stop()
