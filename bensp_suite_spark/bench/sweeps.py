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
    #: duplication-controlled input classes ("<size>:<content>", e.g.
    #: "h1:abc" — bin/parsec_stream's l1-l3/h1-h3/t/f size taxonomy x
    #: create_txt_files.c's RAND/AAR/ABC/FFF/FFR/RFF content classes).
    #: Empty -> one run of the legacy block-pool generator, recorded as
    #: input_class "pool".
    input_classes: list[str] = field(default_factory=list)


def run_dedup_sweep(spark: SparkSession, cfg: SweepConfig) -> DataFrame:
    """Sweep the dedup pipeline; returns the metrics table:
    (input_class, shuffle_partitions, compress_type, arrow_batch, rep,
     input_mb, wall_sec, throughput_mbps, n_chunks, dup_ratio).

    The ``input_class`` axis reproduces the paper's input
    parameterization: duplication-ratio-controlled synthetic inputs
    (size class l1-l3/h1-h3/t/f x content class rand/aar/abc/fff/
    ffr/rff — the create_txt_files.c block scheme), with the measured
    dup_ratio recorded per row so the duplication control is evidence,
    not an assumption."""
    from ..dedup import fixtures, pipeline

    rows = []
    for input_class in (cfg.input_classes or ["pool"]):
        if input_class == "pool":
            files = fixtures.synthetic_docs(
                spark,
                n_files=cfg.n_files,
                file_bytes=cfg.file_bytes,
                pool_size=cfg.pool_size,
                seed=cfg.seed,
            ).cache()
        else:
            files = fixtures.class_files(
                spark, input_class, seed=cfg.seed
            ).cache()
        files.count()
        grid = itertools.product(
            cfg.shuffle_partitions, cfg.compress_types, cfg.arrow_batches
        )
        for parts, ctype, batch in grid:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch)
            )
            for rep in range(cfg.repetitions):
                t0 = time.perf_counter()
                stat = pipeline.dedup_stats(files, compress_type=ctype).collect()[0]
                wall = time.perf_counter() - t0
                mb = stat.total_input_bytes / (1 << 20)
                rows.append(
                    (
                        input_class,
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
    from ..session import local_rows_df as _ldf

    return _ldf(
        spark,
        rows,
        "input_class string, shuffle_partitions int, compress_type string, "
        "arrow_batch int, rep int, input_mb double, wall_sec double, "
        "throughput_mbps double, n_chunks long, dup_ratio double",
    )


def write_dat_files(metrics: DataFrame, out_dir: str) -> tuple[str, str]:
    """Emit the testbed's artifact shapes from a sweep metrics table:
    ``throughput.dat`` (one whitespace-separated line per configuration ×
    repetition, MB/s) and ``execution_time.dat`` (same grid, wall
    seconds) — the files testbed/t1/throughput.sh and time.sh accumulate
    from run logs and feed to gnuplot (testbed/t1/throughput.sh:1-20,
    time.sh:1-24). Column order: threads compress arrow_batch rep value.
    Rows are written driver-side (a sweep grid is dozens of rows — the
    bounded-collect class)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = sorted(
        metrics.collect(),
        key=lambda r: (
            r["input_class"], r["compress_type"], r["shuffle_partitions"],
            r["arrow_batch"], r["rep"],
        ),
    )
    tp = os.path.join(out_dir, "throughput.dat")
    et = os.path.join(out_dir, "execution_time.dat")
    header = "# input_class threads compress arrow_batch rep"
    with open(tp, "w") as f:
        f.write(f"{header} throughput_mbps\n")
        for r in rows:
            f.write(
                f"{r['input_class']} {r['shuffle_partitions']} "
                f"{r['compress_type']} {r['arrow_batch']} {r['rep']} "
                f"{r['throughput_mbps']}\n"
            )
    with open(et, "w") as f:
        f.write(f"{header} wall_sec\n")
        for r in rows:
            f.write(
                f"{r['input_class']} {r['shuffle_partitions']} "
                f"{r['compress_type']} {r['arrow_batch']} {r['rep']} "
                f"{r['wall_sec']}\n"
            )
    return tp, et


def main(argv: list[str] | None = None) -> int:
    """CLI sweep driver — the ``bin/parsec_stream`` sweep-and-emit loop
    (bin/parsec_stream:51-103) as a subprocess entry:

      python -m bensp_suite_spark.bench.sweeps OUT_DIR \\
          [--threads 4,8] [--compress gzip,none] [--arrow-batch 10000] \\
          [--reps 2] [--n-files 16] [--file-bytes 262144] [--pool-size 64] [-v]

    Writes throughput.dat + execution_time.dat (gnuplot shapes) and the
    full tidy metrics table as parquet (``metrics/``) under OUT_DIR."""
    import argparse
    import os
    import sys

    ap = argparse.ArgumentParser(prog="bensp-sweeps", description=main.__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--threads", default="4,8",
                    help="comma list of shuffle-partition counts (the -t axis)")
    ap.add_argument("--compress", default="gzip,none",
                    help="comma list of chunk compress types")
    ap.add_argument("--arrow-batch", default="10000",
                    help="comma list of Arrow maxRecordsPerBatch values "
                         "(the fr/dd/comp/rr buffer axis)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--n-files", type=int, default=16)
    ap.add_argument("--file-bytes", type=int, default=1 << 18)
    ap.add_argument("--pool-size", type=int, default=64)
    ap.add_argument("--input-class", default="",
                    help="comma list of duplication-controlled input classes "
                         "(<size>:<content>, sizes l1-l3/h1-h3/t/f, contents "
                         "rand/aar/abc/fff/ffr/rff; e.g. 'l1:rand,l1:abc'); "
                         "empty = the block-pool generator")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    from ..session import get_spark

    spark = get_spark("bensp-sweeps")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = SweepConfig(
        shuffle_partitions=[int(x) for x in args.threads.split(",") if x],
        compress_types=[x for x in args.compress.split(",") if x],
        arrow_batches=[int(x) for x in args.arrow_batch.split(",") if x],
        repetitions=args.reps,
        n_files=args.n_files,
        file_bytes=args.file_bytes,
        pool_size=args.pool_size,
        input_classes=[x for x in args.input_class.split(",") if x],
    )
    metrics = run_dedup_sweep(spark, cfg)
    metrics.write.mode("overwrite").parquet(os.path.join(args.out_dir, "metrics"))
    tp, et = write_dat_files(metrics, args.out_dir)
    if args.verbose:
        for line in summarize(metrics).collect():
            print(
                f"class={line['input_class']} "
                f"threads={line['shuffle_partitions']} "
                f"compress={line['compress_type']} arrow={line['arrow_batch']} "
                f"mean={line['mean_mbps']} MB/s best={line['best_mbps']} MB/s",
                file=sys.stderr,
            )
    print(f"wrote {tp} and {et}")
    spark.stop()
    return 0


def summarize(metrics: DataFrame) -> DataFrame:
    """Per-configuration mean/max throughput (the plots the testbed scripts
    fed to gnuplot, as a DataFrame)."""
    from pyspark.sql import functions as F

    return (
        metrics.groupBy(
            "input_class", "shuffle_partitions", "compress_type", "arrow_batch"
        )
        .agg(
            F.round(F.avg("throughput_mbps"), 2).alias("mean_mbps"),
            F.round(F.max("throughput_mbps"), 2).alias("best_mbps"),
            F.round(F.avg("wall_sec"), 3).alias("mean_sec"),
            F.first("n_chunks").alias("n_chunks"),
        )
        .orderBy("input_class", "compress_type", "shuffle_partitions")
    )


if __name__ == "__main__":
    import sys

    sys.exit(main())
