"""Bucketed (pre-shuffled) tables for co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides. When one side is reused across many query batches — the corpus LSH
index probed by every similarity query (SURVEY §2.4 J5, the reference
loads its LSH tables once per run, ferret-pthreads.c:884-888), or a
canonical-chunk table joined by every decode — writing it bucketed on the
join keys pays the shuffle ONCE at write time. Every later join reads the
bucket layout from table metadata and runs exchange-free on that side.

This is plain `DataFrameWriter.bucketBy` + `saveAsTable`; bucket-pruned,
AQE-compatible, and identical on a cluster. The tests assert the plan
contract: joining two tables bucketed the same way has ZERO shuffle
exchanges; joining a bucketed table to an unbucketed one shuffles only
the unbucketed side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    *keys: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed on ``keys``.

    ``n_buckets`` should match the reader's expected parallelism at the
    target scale (buckets are the JOIN parallelism unit: each task zips
    one bucket from each side). ``sort=True`` additionally sorts within
    buckets so merge-style reads skip the per-task sort too."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed` on
    the same keys and bucket count — shuffle-free by construction."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
