"""r11: per-stage timing inside one stream_encode_merge batch.

Runs the fused kernel + flag + writes by hand on a 64 MB batch (the bench
trigger size) against a 192 MB-worth winners table — the steady-state
batch shape — and times each stage separately.
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel
from pyspark.sql import functions as F

from bensp_suite_spark.session import get_spark, has_jvm_kernel

spark = get_spark("profile-stream-stages", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

from bensp_suite_spark.dedup import fixtures as DF
from bensp_suite_spark.dedup.pipeline import chunk_hash_compress_jvm

assert has_jvm_kernel(spark)

base = tempfile.mkdtemp(prefix="bensp_prof_stages_")
batch = DF.synthetic_docs(
    spark, n_files=64, file_bytes=1 << 20, pool_size=64, seed=11
).persist(StorageLevel.MEMORY_ONLY)
batch.count()

# steady-state winners table (~48k rows for 192MB of 4KB chunks)
hist = spark.range(48_000).select(
    F.md5(F.col("id").cast("string")).alias("sha1"),
    F.col("id").alias("c_file_id"),
    F.lit(0).alias("c_l1"),
    F.col("id").alias("c_l2"),
    F.lit(0).alias("batch_id"),
)
wdir = os.path.join(base, "winners")
hist.write.mode("overwrite").parquet(os.path.join(wdir, "batch_id=0"))

for rep in range(3):
    t = {}
    t0 = time.perf_counter()
    fused = chunk_hash_compress_jvm(
        batch.repartition(32), compress_type="gzip", with_payload=True
    ).persist()
    n = fused.count()
    t["fused_persist"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    prev = spark.read.parquet(wdir).filter(F.col("batch_id") < 1).drop("batch_id")
    bwin = fused.groupBy("sha1").agg(
        F.min(F.struct("file_id", "l1", "l2")).alias("__w")
    )
    flagged = fused.join(bwin, "sha1").join(prev, on="sha1", how="left")
    is_dup = F.col("c_file_id").isNotNull() | ~(
        F.struct("file_id", "l1", "l2") == F.col("__w")
    )
    out = flagged.select(
        "sha1", "file_id", "l1", "l2", "is_last_l2", "size",
        F.when(is_dup, F.lit(None).cast("binary")).otherwise(F.col("payload")).alias("data"),
        is_dup.alias("is_dup"),
        F.coalesce("c_file_id", F.col("__w.file_id")).alias("canonical_file_id"),
        F.coalesce("c_l1", F.col("__w.l1")).alias("canonical_l1"),
        F.coalesce("c_l2", F.col("__w.l2")).alias("canonical_l2"),
        F.lit(1).alias("batch_id"),
    )
    out.orderBy("file_id", "l1", "l2").write.mode("overwrite").parquet(
        os.path.join(base, f"out{rep}")
    )
    t["flag_sort_write"] = time.perf_counter() - t0

    # same write WITHOUT the global sort, for the sort's cost share
    t0 = time.perf_counter()
    out.write.mode("overwrite").parquet(os.path.join(base, f"out_ns{rep}"))
    t["flag_write_nosort"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    nw = bwin.join(prev, "sha1", "left_anti").select(
        "sha1",
        F.col("__w.file_id").alias("c_file_id"),
        F.col("__w.l1").alias("c_l1"),
        F.col("__w.l2").alias("c_l2"),
        F.lit(1).alias("batch_id"),
    )
    nw.write.mode("overwrite").parquet(os.path.join(base, f"nw{rep}"))
    t["new_winners_write"] = time.perf_counter() - t0
    fused.unpersist()
    print(f"rep{rep} n={n} " + "  ".join(f"{k}={v:.3f}s" for k, v in t.items()))

shutil.rmtree(base, ignore_errors=True)
spark.stop()
