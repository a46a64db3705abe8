"""Parameter-sweep harness — the testbed/t1..t9 equivalent (SURVEY §5.4).

The reference sweeps chunk window × stage buffers × thread counts with 10
repetitions, writing throughput.dat / execution_time.dat
(testbed/t1/throughput.sh:1-20, time.sh:1-24). Here the same experiment
design runs over the RUNTIME knobs that replace the reference's
sed-and-rebuild parameters (bin/parsec_stream:254-280,420-472):

  -t stage threads      → shuffle partitions
  fr/dd/comp/rr buffers → Arrow maxRecordsPerBatch
  compression type      → gzip/bzip2/none
  input class (l*/h*)   → (n_files, file_bytes, pool_size) of the
                          duplication-controlled generator

Results land in a tidy DataFrame (one row per configuration × repetition)
— the throughput.dat analog, queryable like any other table.
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SweepConfig:
    """One experiment grid (a testbed tN directory analog)."""

    shuffle_partitions: list[int] = field(default_factory=lambda: [8, 32])
    compress_types: list[str] = field(default_factory=lambda: ["gzip", "none"])
    arrow_batches: list[int] = field(default_factory=lambda: [10_000])
    repetitions: int = 3
    n_files: int = 64
    file_bytes: int = 1 << 20
    pool_size: int = 64
    seed: int = 11


def run_dedup_sweep(spark: SparkSession, cfg: SweepConfig) -> DataFrame:
    """Sweep the dedup pipeline; returns the metrics table:
    (shuffle_partitions, compress_type, arrow_batch, rep,
     input_mb, wall_sec, throughput_mbps, n_chunks, dup_ratio)."""
    from ..dedup import fixtures, pipeline

    files = fixtures.synthetic_docs(
        spark,
        n_files=cfg.n_files,
        file_bytes=cfg.file_bytes,
        pool_size=cfg.pool_size,
        seed=cfg.seed,
    ).cache()
    files.count()

    rows = []
    grid = itertools.product(cfg.shuffle_partitions, cfg.compress_types, cfg.arrow_batches)
    for parts, ctype, batch in grid:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        for rep in range(cfg.repetitions):
            t0 = time.perf_counter()
            stat = pipeline.dedup_stats(files, compress_type=ctype).collect()[0]
            wall = time.perf_counter() - t0
            mb = stat.total_input_bytes / (1 << 20)
            rows.append(
                (
                    parts,
                    ctype,
                    batch,
                    rep,
                    round(mb, 2),
                    round(wall, 4),
                    round(mb / wall, 2),
                    stat.n_chunks,
                    float(stat.dup_ratio),
                )
            )
    files.unpersist()
    return spark.createDataFrame(
        rows,
        "shuffle_partitions int, compress_type string, arrow_batch int, rep int, "
        "input_mb double, wall_sec double, throughput_mbps double, n_chunks long, dup_ratio double",
    )


def summarize(metrics: DataFrame) -> DataFrame:
    """Per-configuration mean/max throughput (the plots the testbed scripts
    fed to gnuplot, as a DataFrame)."""
    from pyspark.sql import functions as F

    return (
        metrics.groupBy("shuffle_partitions", "compress_type", "arrow_batch")
        .agg(
            F.round(F.avg("throughput_mbps"), 2).alias("mean_mbps"),
            F.round(F.max("throughput_mbps"), 2).alias("best_mbps"),
            F.round(F.avg("wall_sec"), 3).alias("mean_sec"),
            F.first("n_chunks").alias("n_chunks"),
        )
        .orderBy("compress_type", "shuffle_partitions")
    )
