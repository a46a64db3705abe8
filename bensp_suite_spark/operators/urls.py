"""URL canonicalization for crawl-scale dedup.

A web corpus's first dedup axis is the URL, and raw crawl URLs are noisy:
case-varying schemes/hosts, ``www.`` prefixes, default ports, unsorted
query strings, tracking parameters, fragments. Canonicalizing before the
content pass removes the bulk of re-crawl duplicates with string work
alone — no text scan, no shuffle beyond the final first-wins.

The normalization is a PURE column expression (no UDF): regexp extracts
for the URL grammar pieces plus higher-order array functions for the
query-parameter set — both of which DuckDB mirrors operator-for-operator,
so the whole canonicalization is engine-exact and oracle-checkable.

Rules (one deliberate convention each; document, don't debate):
  1. scheme and host lowercased
  2. leading ``www.`` stripped from the host
  3. default ports stripped (``:80`` for http, ``:443`` for https)
  4. trailing slashes stripped from the path; empty path → ``/``
  5. query parameters: empties and tracking params dropped (``utm_*``
     prefix + fbclid/gclid/msclkid/igshid/ref), the rest SORTED — query
     order never distinguishes resources in practice
  6. fragment dropped (never sent to the server)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: exact-name tracking params (dropped with the utm_* prefix family)
TRACKING_RE = "^(fbclid|gclid|msclkid|igshid|ref)="


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL column — a pure expression, no UDF."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://(.*)$", 1)
    authority = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_replace(authority, r"^www\.", "")
    host = F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(
        F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(host)
    )
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # the query lives strictly BEFORE the fragment: strip '#…' first, so a
    # '?' inside a fragment (https://x/p#sec?b=1) is dropped with the
    # fragment (rule 6) instead of resurrected as a query string
    nofrag = F.regexp_extract(u, r"^([^#]*)", 1)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike("^utm_")
            & ~p.rlike(TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def canonical_url_sql(col_sql: str) -> str:
    """DuckDB rendering of :func:`canonical_url` (engine-exact)."""
    u = f"trim({col_sql})"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    rest = f"regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.\\-]*://(.*)$', 1)"
    authority = f"lower(regexp_extract({rest}, '^([^/?#]*)', 1))"
    host = f"regexp_replace({authority}, '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"ELSE {host} END"
    )
    path = f"regexp_replace(regexp_extract({rest}, '^[^/?#]*([^?#]*)', 1), '/+$', '')"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    # pre-fragment query extraction, mirroring canonical_url exactly
    query = f"regexp_extract(regexp_extract({u}, '^([^#]*)', 1), '\\?(.*)$', 1)"
    params = (
        f"list_sort(list_filter(regexp_split_to_array({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '^utm_') "
        f"AND NOT regexp_matches(p, '{TRACKING_RE}')))"
    )
    qs = f"array_to_string({params}, '&')"
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END)"
    )


def url_host(col: Column) -> Column:
    """Lowercased host of a URL: authority with any port and a leading
    ``www.`` stripped — the key for domain-level filtering, quotas and
    per-domain statistics."""
    authority = F.lower(
        F.regexp_extract(F.trim(col), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    )
    return F.regexp_replace(
        F.regexp_replace(authority, r":[0-9]+$", ""), r"^www\.", ""
    )


def url_host_sql(col_sql: str) -> str:
    """DuckDB rendering of :func:`url_host` (engine-exact)."""
    authority = (
        f"lower(regexp_extract(trim({col_sql}), "
        f"'^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1))"
    )
    return (
        f"regexp_replace(regexp_replace({authority}, ':[0-9]+$', ''), "
        f"'^www\\.', '')"
    )


#: phase-1 fan-out of the two-phase domain cap (see ``_cap_host_rows``)
CAP_SALT = 32


def _cap_host_rows(
    df: DataFrame, max_per_domain: int, id_col: str, salt_n: int = CAP_SALT
) -> DataFrame:
    """Two-phase deterministic per-host cap over a frame that already has
    a ``host`` column — the skew-safe form of ``row_number() OVER
    (PARTITION BY host)``.

    A plain host window funnels an entire hot host into ONE task's sort
    to keep ``cap`` rows (a 100M-page link farm = one straggler task;
    window sorts cannot be skew-split). Phase 1 ranks within
    (host, salt) — the hot host spreads across ``salt_n`` tasks, each
    keeping ≤ cap rows — and phase 2 re-ranks the ≤ cap·salt_n survivors
    per host globally. Result-IDENTICAL to the single window: any row in
    the global top-cap (order = (hash_bucket(id), id)) is necessarily in
    the top-cap of its own salt subgroup (pigeonhole), so phase 1 never
    drops a global survivor. The salt is a deterministic hash of the id —
    layout-independent, engine-reproducible."""
    from .sampling import hash_bucket

    order = [hash_bucket(F.col(id_col)), F.col(id_col)]
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_n))
    w1 = Window.partitionBy(F.col("host"), salt).orderBy(*order)
    pruned = (
        df.withColumn("__dom_r1", F.row_number().over(w1))
        .filter(F.col("__dom_r1") <= max_per_domain)
        .drop("__dom_r1")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        pruned.withColumn("__dom_rank", F.row_number().over(w2))
        .filter(F.col("__dom_rank") <= max_per_domain)
        .drop("__dom_rank")
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str,
    max_per_domain: int,
    id_col: str = "doc_id",
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Domain-level crawl hygiene in one pass: drop blocklisted hosts,
    then keep at most ``max_per_domain`` docs per host — selected in
    DETERMINISTIC content-hash order (same membership on any engine,
    layout or cluster; arrival order never decides what survives, the
    property df.limit-per-group can't give). The standard anti-spam cap:
    without it one link-farm domain dominates the corpus.

    Plan shape: the blocklist is a literal isin filter at the scan; the
    cap is the TWO-PHASE salted rank (``_cap_host_rows``) — a hot host
    never funnels into one task; phase 2 sees ≤ cap·salt rows per host."""
    host = url_host(F.col(url_col))
    out = df.withColumn("host", host)
    if blocklist:
        out = out.filter(~F.col("host").isin(*sorted(blocklist)))
    return _cap_host_rows(out, max_per_domain, id_col)


def first_wins(df: DataFrame, key, id_col: str = "doc_id") -> DataFrame:
    """Skew-safe first-wins SELECTION on an arbitrary key column/expression:
    keep exactly the lowest-``id_col`` row per key. min-reduce + join-back
    (the ``dedup/pipeline._first_wins_flags_skew_safe`` shape): the
    aggregate collapses a hot key map-side to one partial per task, and
    the join-back's build side is one row per key — vs the row_number
    window, which ships EVERY occurrence of the hot key to one reducer's
    sort (benched 11.3 s vs 19.9 s on 16M rows with one hot digest).
    Assumes ``id_col`` is unique per row (a doc id), so exactly one row
    survives per key.

    Cost note: ``df`` is referenced twice (winners agg + join-back), so a
    DERIVED key expression evaluates twice — column pruning keeps the agg
    branch to (key, id), but if the key derivation itself is expensive
    (an HTML extraction) that's 2× scan work traded for never funneling a
    hot key into one task's sort. Materialize upstream if the derivation
    dominates.

    NULL-key contract: all NULL keys form ONE group (the lowest-id NULL
    row survives) — matching the ``row_number`` window this replaces,
    where NULL is an ordinary partition value. ``groupBy`` already puts
    NULLs in one group; the join-back uses ``eqNullSafe`` so those rows
    still match their winner instead of being dropped by NULL != NULL."""
    kc = key if isinstance(key, Column) else F.col(key)
    tagged = df.withColumn("__fw_key", kc)
    winners = tagged.groupBy("__fw_key").agg(F.min(id_col).alias("__fw_winner"))
    w = winners.withColumnRenamed("__fw_key", "__fw_wkey")
    return (
        tagged.join(w, tagged["__fw_key"].eqNullSafe(w["__fw_wkey"]))
        .filter(F.col(id_col) == F.col("__fw_winner"))
        .drop("__fw_key", "__fw_wkey", "__fw_winner")
    )


#: anchor tag with a double-quoted href; group 1 = href, group 2 = anchor
#: body. Lazy body + [^>]* attribute runs — RE2-safe (no backtracking
#: blowup), identical semantics in Java regex and DuckDB's RE2.
LINK_RE = r'(?is)<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>'


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """HTML → the page's outbound LINK GRAPH: one row per absolute
    http(s) anchor, as (id_col, src, dst, anchor) with both endpoints
    canonicalized (:func:`canonical_url`) and the anchor text stripped/
    entity-decoded like document text. The crawl-frontier feed: compose
    with ``graph.pagerank_int`` over the (src_host, dst_host) edges to
    prioritize fetches, or join anchors onto documents as retrieval
    signals.

    Conventions (documented, not debated): double-quoted hrefs only (the
    overwhelming real-world case); RELATIVE links are dropped — resolution
    against a base URL is the fetcher's job, and a frontier only schedules
    absolute targets. Entity-decode happens BEFORE canonicalization
    (attribute values HTML-escape '&', so ``?a=1&amp;b=2`` is one query
    string with two params).

    Pure column expressions end to end — two regexp_extract_all passes
    over the html (same pattern, groups 1/2, so the arrays align by
    construction), an arrays_zip explode, and string work. The explode's
    fan-out is the page's link count; nothing shuffles until the caller
    aggregates."""
    from .text_analysis import _HTML_ENTITIES, extract_html_text

    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(LINK_RE), F.lit(1))
    texts = F.regexp_extract_all(F.col(html_col), F.lit(LINK_RE), F.lit(2))
    z = F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("txt")))
    out = df.select(F.col(id_col), F.col(url_col), z.alias("l"))
    href = F.col("l.href")
    for ent, rep in _HTML_ENTITIES:
        href = F.replace(href, F.lit(ent), F.lit(rep))
    return (
        out.filter(F.col("l.href").rlike(r"^(?i)https?://"))
        .select(
            F.col(id_col),
            canonical_url(F.col(url_col)).alias("src"),
            canonical_url(href).alias("dst"),
            extract_html_text(F.col("l.txt")).alias("anchor"),
        )
    )


def extract_links_sql(
    from_sql: str,
    url_sql: str = "url",
    html_sql: str = "html",
    id_sql: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`extract_links` (engine-exact). DuckDB's
    parallel UNNEST zips the two extract_all arrays in lockstep — the
    same alignment-by-shared-pattern as the Spark arrays_zip."""
    from .text_analysis import _HTML_ENTITIES, extract_html_sql

    pat = LINK_RE.replace("'", "''")
    href = "href"
    for ent, rep in _HTML_ENTITIES:
        rep_sql = rep.replace("'", "''")
        href = f"replace({href}, '{ent}', '{rep_sql}')"
    anchor = extract_html_sql("txt")[0]
    return f"""
    SELECT id AS {id_sql},
           {canonical_url_sql('u')} AS src,
           {canonical_url_sql(href)} AS dst,
           {anchor} AS anchor
    FROM (
      SELECT {id_sql} AS id, {url_sql} AS u,
             UNNEST(regexp_extract_all({html_sql}, '{pat}', 1)) AS href,
             UNNEST(regexp_extract_all({html_sql}, '{pat}', 2)) AS txt
      FROM {from_sql}
    )
    WHERE regexp_matches(href, '^(?i)https?://')
    """


def url_dedup(df: DataFrame, url_col: str, id_col: str = "doc_id") -> DataFrame:
    """First-wins dedup on the canonical URL: → every input row with
    (canonical_url, is_dup) — winner = lowest id per canonical form.
    One aggregate on the canonical string (map-side combinable) + one
    equi-join back; the raw URL noise never reaches the shuffle key."""
    withc = df.withColumn("canonical_url", canonical_url(F.col(url_col)))
    winners = withc.groupBy("canonical_url").agg(F.min(id_col).alias("__url_winner"))
    return (
        withc.join(winners, "canonical_url")
        .withColumn("is_dup", F.col(id_col) != F.col("__url_winner"))
        .drop("__url_winner")
    )
