"""CLI for the crawl/web-graph surface (operators/urls.py + graph.py):

  # extract the outbound link graph from raw pages
  python -m bensp_suite_spark.web_cli linkgraph PAGES_PARQUET OUT_PARQUET \
      [-t N] [-v]

  # rank hosts by link mass (crawl-frontier prioritization)
  python -m bensp_suite_spark.web_cli rank LINKS_PARQUET OUT_PARQUET \
      [--iterations N] [-t N] [-v]

  # run the composed curation front end (URL dedup → blocklist+cap →
  # HTML extract → content dedup)
  python -m bensp_suite_spark.web_cli curate PAGES_PARQUET OUT_PARQUET \
      [--max-per-domain N] [--block HOST ...] [-t N] [-v]

  # build the prioritized fetch list: links → host PageRank → uncrawled
  # anti-join → per-host quota (pipelines/web.crawl_frontier)
  python -m bensp_suite_spark.web_cli frontier PAGES_PARQUET OUT_PARQUET \
      [--quota N] [--iterations N] [-t N] [-v]

PAGES_PARQUET needs (doc_id, url, html). ``linkgraph`` emits one row per
absolute http(s) anchor — (doc_id, src, dst, anchor), both endpoints
canonicalized. ``rank`` reads a links parquet (the linkgraph output),
collapses it to distinct host→host edges and writes integer-exact
PageRank scores (host, rank). ``curate`` writes the surviving documents
(doc_id, host, canonical_url, title, text). ``frontier`` writes the
fetch queue (host, url, rank, slot).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bensp-web", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    lg = sub.add_parser("linkgraph", help="extract the outbound link graph")
    lg.add_argument("pages", help="input pages parquet (doc_id, url, html)")
    lg.add_argument("output", help="output links parquet")

    rk = sub.add_parser("rank", help="PageRank hosts from a links parquet")
    rk.add_argument("links", help="links parquet (from linkgraph)")
    rk.add_argument("output", help="output ranks parquet (host, rank)")
    rk.add_argument("--iterations", type=int, default=3)

    cu = sub.add_parser("curate", help="composed web-curation pipeline")
    cu.add_argument("pages", help="input pages parquet (doc_id, url, html)")
    cu.add_argument("output", help="output curated-documents parquet")
    cu.add_argument("--max-per-domain", type=int, default=20)
    cu.add_argument("--block", action="append", default=[],
                    help="blocklisted host (repeatable)")

    fr = sub.add_parser("frontier", help="prioritized uncrawled fetch list")
    fr.add_argument("pages", help="input pages parquet (doc_id, url, html)")
    fr.add_argument("output", help="output frontier parquet (host, url, rank, slot)")
    fr.add_argument("--quota", type=int, default=5,
                    help="max URLs scheduled per host")
    fr.add_argument("--iterations", type=int, default=3)

    for p in (lg, rk, cu, fr):
        p.add_argument("-t", "--threads", type=int, default=None)
        p.add_argument("-v", "--verbose", action="store_true")

    args = ap.parse_args(argv)
    src = args.pages if args.cmd in ("linkgraph", "curate", "frontier") else args.links
    if not os.path.exists(src):
        print(f"error: input not found: {src}", file=sys.stderr)
        return 2

    from pyspark.sql import functions as F

    from .session import get_spark

    spark = get_spark("bensp-web-cli", shuffle_partitions=args.threads)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    if args.cmd == "linkgraph":
        from .operators.urls import extract_links

        pages = spark.read.parquet(args.pages)
        out = extract_links(pages)
        out.write.mode("overwrite").parquet(args.output)
        if args.verbose:
            n = spark.read.parquet(args.output).count()
            print(
                f"linkgraph: {pages.count()} pages -> {n} absolute links "
                f"in {time.perf_counter() - t0:.2f}s -> {args.output}"
            )
    elif args.cmd == "rank":
        from .operators.graph import pagerank_int
        from .operators.urls import url_host

        links = spark.read.parquet(args.links)
        edges = (
            links.select(
                url_host(F.col("src")).alias("src"),
                url_host(F.col("dst")).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        ranks = pagerank_int(edges, iterations=args.iterations).select(
            F.col("node").alias("host"), "rank"
        )
        ranks.write.mode("overwrite").parquet(args.output)
        if args.verbose:
            n = spark.read.parquet(args.output).count()
            print(
                f"rank: {n} hosts scored ({args.iterations} iterations) "
                f"in {time.perf_counter() - t0:.2f}s -> {args.output}"
            )
    elif args.cmd == "curate":
        from .pipelines.web import curate_web_corpus

        pages = spark.read.parquet(args.pages)
        out = curate_web_corpus(
            pages,
            max_per_domain=args.max_per_domain,
            blocklist=args.block or None,
        )
        out.write.mode("overwrite").parquet(args.output)
        if args.verbose:
            n = spark.read.parquet(args.output).count()
            print(
                f"curate: {pages.count()} pages -> {n} documents "
                f"in {time.perf_counter() - t0:.2f}s -> {args.output}"
            )
    else:  # frontier
        from .pipelines.web import crawl_frontier

        pages = spark.read.parquet(args.pages)
        out = crawl_frontier(
            pages, quota_per_host=args.quota, iterations=args.iterations
        )
        out.write.mode("overwrite").parquet(args.output)
        if args.verbose:
            n = spark.read.parquet(args.output).count()
            hosts = spark.read.parquet(args.output).select("host").distinct().count()
            print(
                f"frontier: {n} fetch slots across {hosts} hosts "
                f"(quota {args.quota}) "
                f"in {time.perf_counter() - t0:.2f}s -> {args.output}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
