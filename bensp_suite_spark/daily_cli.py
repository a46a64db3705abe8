"""CLI for the day-N incremental-dedup loop (pipelines/daily.py) with
PARQUET-persisted signature state — the artifact a real daily pipeline
schedules:

  # day 0: derive the signature tables from the existing corpus (the only
  # raw-history scan the loop ever performs)
  python -m bensp_suite_spark.daily_cli init HISTORY_PARQUET SIG_DIR

  # each day: flag the batch against the state, write flags, APPEND the
  # survivors' signatures (O(batch) rows — history is never rescanned)
  python -m bensp_suite_spark.daily_cli step BATCH_PARQUET SIG_DIR FLAGS_OUT \
      [--max-hamming N] [--no-advance] [-t N] [-v]

SIG_DIR holds two parquet tables: ``hashes`` (distinct normalized content
md5s, one column ``content_hash``) and ``sims`` (per-doc SimHash
fingerprints, one column ``hist_sim``). ``step`` appends exactly the
day's survivors' rows to each — the growth proof: table row counts track
survivors, not history size. Inputs need (doc_id, text).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bensp-daily", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    ini = sub.add_parser("init", help="derive day-0 signature tables")
    ini.add_argument("history", help="historical corpus parquet (doc_id, text)")
    ini.add_argument("sig_dir", help="signature-state output directory")
    ini.add_argument("-t", "--threads", type=int, default=None)
    ini.add_argument("-v", "--verbose", action="store_true")

    st = sub.add_parser("step", help="run one day of the loop")
    st.add_argument("batch", help="the day's new-documents parquet (doc_id, text)")
    st.add_argument("sig_dir", help="signature-state directory (from init)")
    st.add_argument("flags_out", help="output parquet for the day's flags")
    st.add_argument("--max-hamming", type=int, default=3)
    st.add_argument("--no-advance", action="store_true",
                    help="flag only; leave the signature tables untouched")
    st.add_argument("-t", "--threads", type=int, default=None)
    st.add_argument("-v", "--verbose", action="store_true")

    args = ap.parse_args(argv)
    inputs = [args.history] if args.cmd == "init" else [args.batch, args.sig_dir]
    for p in inputs:
        if not os.path.exists(p):
            print(f"error: input not found: {p}", file=sys.stderr)
            return 2

    from pyspark.sql import functions as F

    from .operators.dedup_text import history_signatures, incremental_dedup
    from .session import get_spark

    spark = get_spark("bensp-daily-cli", shuffle_partitions=args.threads)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    hashes_dir = os.path.join(args.sig_dir, "hashes")
    sims_dir = os.path.join(args.sig_dir, "sims")

    if args.cmd == "init":
        hist = spark.read.parquet(args.history)
        h, s = history_signatures(hist)
        h.write.mode("overwrite").parquet(hashes_dir)
        s.write.mode("overwrite").parquet(sims_dir)
        if args.verbose:
            print(
                f"init: {spark.read.parquet(hashes_dir).count()} hashes, "
                f"{spark.read.parquet(sims_dir).count()} fingerprints "
                f"in {time.perf_counter() - t0:.2f}s -> {args.sig_dir}"
            )
        spark.stop()
        return 0

    batch = spark.read.parquet(args.batch)
    sig = (spark.read.parquet(hashes_dir), spark.read.parquet(sims_dir))
    flags = incremental_dedup(batch, max_hamming=args.max_hamming, history_sig=sig)
    flags.write.mode("overwrite").parquet(args.flags_out)
    if not args.no_advance:
        # the O(day) state advance as a literal parquet APPEND: survivors'
        # hashes are absent from the table by construction (they passed
        # the exact check against exactly these rows), so append == the
        # distinct union advance_signatures proves engine-exact in-memory
        survivors = batch.join(
            spark.read.parquet(args.flags_out)
            .filter(F.col("is_kept"))
            .select("doc_id"),
            "doc_id",
            "left_semi",
        )
        day_h, day_s = history_signatures(survivors)
        day_h.write.mode("append").parquet(hashes_dir)
        day_s.write.mode("append").parquet(sims_dir)
    if args.verbose:
        out = spark.read.parquet(args.flags_out)
        n = out.count()
        kept = out.filter("is_kept").count()
        print(
            f"step: {n} docs, {kept} kept, {n - kept} flagged "
            f"({'state advanced' if not args.no_advance else 'no advance'}) "
            f"in {time.perf_counter() - t0:.2f}s -> {args.flags_out}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
