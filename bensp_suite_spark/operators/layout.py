"""Data-layout management: partitioned writes for partition pruning.

The complement of :mod:`bucketing` (which pre-pays JOIN shuffles): Hive-
style directory partitioning pre-pays SCAN selectivity. A 100 TB events
table partitioned by a low-cardinality predicate column (event date,
event_type, language, source) turns every query that filters on that
column into a directory listing — Spark's `PartitionFilters` prune whole
directories before a single row is read, independent of (and earlier
than) parquet row-group min/max skipping.

Rules encoded here that matter at scale:

- Partition columns must be LOW cardinality (≤ ~10⁴ values). A high-
  cardinality partition column (user_id) creates millions of tiny files —
  the small-file problem — and kills the driver's listing phase.
- Each partition's data should land in FEW files: repartition on the
  partition columns first (one shuffle at write time), or every upstream
  task writes one file into every partition directory (tasks × partitions
  files).
- Within a partition, sort by the secondary predicate/range column so
  parquet row-group stats prune *within* the partition too
  (`sortWithinPartitions` — no extra exchange, sort is task-local).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as Hive-partitioned parquet under ``path``.

    One hash exchange on the partition columns co-locates each partition's
    rows into one task (bounded file counts); an optional task-local sort
    lays rows out for row-group skipping on ``sort_cols``."""
    out = df.repartition(*partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back. Partition columns come from the
    directory structure; filters on them become PartitionFilters (pruned
    at planning time, visible in `.explain("formatted")`)."""
    return spark.read.parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory so each file is
    ~``target_file_mb``. Returns (files_before, files_after).

    The operational fix for the small-file problem streaming sinks and
    over-parallel writers create: a 100 TB table written by thousands of
    micro-batches accumulates millions of KB-scale files, and scan cost
    becomes dominated by open/footer overhead and driver listing instead
    of bytes. Compaction is one read + one write: partition count is
    computed from the directory's actual byte size (not row counts, which
    mispredict after compression), an optional task-local sort restores
    row-group skipping, and the rewrite goes through a temp directory so a
    crash mid-compact never leaves the table truncated. Hive-partitioned
    layouts are preserved: partition columns are detected from the
    ``key=value`` directory segments and the rewrite re-issues
    ``partitionBy`` on them, so `PartitionFilters` pruning survives
    compaction. LOCAL-FILESYSTEM ONLY: the swap uses ``os.rename``; on an
    object store use a table format with transactional compaction
    (OPTIMIZE) instead — this is the plain-parquet equivalent with the
    same sizing rule. Re-runnable: stale temp/backup dirs from a crashed
    prior run are recovered (backup restored if the table vanished) or
    cleared at entry."""
    import glob
    import os
    import shutil

    path = path.rstrip("/")
    tmp = path + "._compact_tmp"
    bak = path + "._compact_old"
    # Crash recovery: a failure between the two renames leaves the table
    # only at `bak`; restore it. A stale `bak` next to a live table (crash
    # after swap, before cleanup) or a stale `tmp` (crash mid-write) is
    # dead weight — clear it so the rename below can't collide.
    if os.path.exists(bak) and not os.path.exists(path):
        os.rename(bak, path)
    elif os.path.exists(bak):
        shutil.rmtree(bak)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    data_files = [f for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)]
    files_before = len(data_files)
    total_bytes = sum(os.path.getsize(f) for f in data_files)
    n_out = max(1, round(total_bytes / (target_file_mb << 20)))

    # Detect Hive partitioning from the key=value directory segments so the
    # rewrite preserves it (a flat rewrite would demote partition columns to
    # data columns and silently lose PartitionFilters pruning).
    partition_cols: list[str] = []
    if data_files:
        rel = os.path.relpath(data_files[0], path)
        for seg in rel.split(os.sep)[:-1]:
            if "=" in seg:
                partition_cols.append(seg.split("=", 1)[0])

    df = spark.read.parquet(path)
    if partition_cols:
        # Hash on the partition columns: each task holds whole partitions,
        # so file count stays ~n_out instead of tasks × partitions.
        out = df.repartition(n_out, *partition_cols)
    else:
        out = df.repartition(n_out)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    # atomic-ish swap: replace only after the full rewrite committed
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    files_after = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return files_before, files_after
