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
