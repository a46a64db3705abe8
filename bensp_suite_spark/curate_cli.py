"""CLI for the composed training-data curation pipeline
(pipelines/curation.py):

  python -m bensp_suite_spark.curate_cli DOCS_PARQUET OUT_PARQUET \
      [--bench-source SRC] [--window-tokens N] [-t N] [-v]

DOCS_PARQUET needs (doc_id, source, text). The output parquet holds the
surviving documents with their packed context-window assignment
(doc_id, source, n_tokens, start_offset, window_id) after quality
filtering, exact dedup, and benchmark decontamination against the
``--bench-source`` slice.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bensp-curate", description=__doc__)
    ap.add_argument("docs", help="input documents parquet (doc_id, source, text)")
    ap.add_argument("output", help="output parquet path")
    ap.add_argument("--bench-source", default="src0",
                    help="source value of the held-out benchmark slice")
    ap.add_argument("--window-tokens", type=int, default=8192)
    ap.add_argument("-t", "--threads", type=int, default=None, help="parallelism")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    if not os.path.exists(args.docs):
        print(f"error: input not found: {args.docs}", file=sys.stderr)
        return 2

    from .pipelines import curation as CUR
    from .session import get_spark

    spark = get_spark("bensp-curate-cli", shuffle_partitions=args.threads)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    docs = spark.read.parquet(args.docs)
    curated = CUR.curate_corpus(
        docs, bench_source=args.bench_source, window_tokens=args.window_tokens
    )
    curated.write.mode("overwrite").parquet(args.output)
    if args.verbose:
        n_in = docs.count()
        n_out = spark.read.parquet(args.output).count()
        print(
            f"curated {n_in} docs -> {n_out} survivors "
            f"({100.0 * n_out / max(n_in, 1):.1f}% kept) "
            f"in {time.perf_counter() - t0:.2f}s -> {args.output}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
