"""End-to-end web-crawl curation: the composition a crawl-to-corpus
pipeline actually runs, as ONE declarative DataFrame program.

    HTML → text extraction → canonical-URL dedup → domain blocklist +
    per-domain cap → exact content dedup

Each stage exists standalone (text_html_extract / url_canonical_dedup /
url_domain_cap / dedup_exact_text declared queries); this module proves
they COMPOSE — one logical plan end to end, so Catalyst sees the whole
program: the HTML strip is scan-stage column work, URL dedup shuffles
only canonical-URL strings, the domain cap is one host-keyed rank
window over survivors, and the final content dedup hashes only the docs
that made it through everything upstream.

Order matters and is the cheap-first order a 100 TB crawl wants:
URL-level dedup (string work on the url column alone) runs before the
content hash ever touches the extracted text, and the domain cap
bounds how many documents per host pay for content hashing at all.

Every stage is SKEW-SAFE by construction — a crawl is the canonical
skew source (one re-crawled hot URL = millions of rows under one key):
both first-wins stages use the min-reduce + join-back primitive
(``operators/urls.first_wins``, the ``_first_wins_flags_skew_safe``
shape — benched 11.3 s vs 19.9 s on 16M rows with one hot key) instead
of a row_number window, and the domain cap is the two-phase salted rank
(``urls._cap_host_rows``) so a hot host never funnels into one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.text_analysis import extract_html_text, extract_html_title
from ..operators.urls import _cap_host_rows, canonical_url, first_wins, url_host

#: same normalized-content hash as the dedup family
def _content_hash(text: Column) -> Column:
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def curate_web_corpus(
    pages: DataFrame,
    max_per_domain: int = 20,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """(doc_id, url, html) → surviving documents
    (doc_id, host, canonical_url, title, text) after the four stages.
    First-wins everywhere = lowest doc_id; the domain cap selects by
    deterministic content hash (layout-independent)."""
    with_url = pages.withColumn("canonical_url", canonical_url(F.col("url")))
    # stage 1: canonical-URL dedup (first-wins, skew-safe) — no text work
    url_kept = first_wins(with_url, "canonical_url")
    # stage 2: domain blocklist + per-domain cap (hash-ordered, two-phase)
    hosted = url_kept.withColumn("host", url_host(F.col("url")))
    if blocklist:
        hosted = hosted.filter(~F.col("host").isin(*sorted(blocklist)))
    capped = _cap_host_rows(hosted, max_per_domain, "doc_id")
    # stage 3: extract text/title — only survivors pay for it
    extracted = capped.select(
        "doc_id",
        "host",
        "canonical_url",
        extract_html_title(F.col("html")).alias("title"),
        extract_html_text(F.col("html")).alias("text"),
    )
    # stage 4: exact content dedup (first-wins on the normalized hash,
    # skew-safe — the hot-content analog of stage 1)
    return first_wins(extracted, _content_hash(F.col("text")))


def crawl_frontier(
    pages: DataFrame, quota_per_host: int = 5, iterations: int = 3
) -> DataFrame:
    """The frontier SCHEDULER's feed, composed end to end: (doc_id, url,
    html) crawled pages → a prioritized fetch list (host, url, rank,
    slot) of NOT-YET-CRAWLED canonical URLs.

        extract_links → host→host edges → integer PageRank
                      → uncrawled dst anti-join → per-host quota

    Candidates are the distinct canonicalized link targets minus the
    distinct canonicalized sources (what we already hold); each carries
    its destination host's PageRank (0 for hosts with no outbound edges
    yet — never seen as a source), and at most ``quota_per_host`` URLs
    per host survive (politeness: one host can't flood the fetch queue
    no matter how many distinct URLs point at it). ``slot`` is the
    deterministic within-host position (URL order), so a scheduler can
    interleave hosts by (rank desc, slot) without re-sorting.

    Plan shape at 100 TB: extraction is scan-stage column work; the rank
    loop shuffles only the host edge list (tiny — hosts, not pages); the
    anti-join and quota shuffle canonical URL strings only, never HTML.
    The quota's rank-filter window compiles to WindowGroupLimit (per-
    partition top-k before the final per-host pass), so a hot host's
    candidates never materialize as one task's full sort."""
    from ..operators.urls import extract_links

    links = extract_links(pages)
    # referenced three times (edges, crawled set, candidates): pin the
    # extracted edge list once — at scale this is the materialized
    # link-graph table a crawler maintains anyway
    links = links.localCheckpoint(eager=True)
    from ..operators.graph import pagerank_int

    edges = (
        links.select(
            url_host(F.col("src")).alias("src"),
            url_host(F.col("dst")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    ranks = pagerank_int(edges, iterations=iterations)
    crawled = links.select(F.col("src").alias("url")).distinct()
    cand = (
        links.select(F.col("dst").alias("url"))
        .distinct()
        .join(crawled, "url", "left_anti")
        .select("url", url_host(F.col("url")).alias("host"))
    )
    joined = cand.join(
        F.broadcast(ranks.withColumnRenamed("node", "host")), "host", "left"
    ).select(
        "host", "url", F.coalesce(F.col("rank"), F.lit(0)).cast("long").alias("rank")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("url")
    return (
        joined.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= quota_per_host)
        .select("host", "url", "rank", "slot")
    )
