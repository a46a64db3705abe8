"""Relational operator shapes from SURVEY.md §2, Spark-first.

Each function is a parameterized logical-plan builder over DataFrames; the
physical strategy (broadcast vs shuffle join, partial aggregation, codegen)
is Catalyst's job. Reference citations point at the C implementation whose
semantics the op reproduces (all paths relative to /root/reference/).

Scale notes are inline per op — these run on local[32] for tests but are
written for a 1000-executor cluster over ~100 TB:

- first-occurrence dedup partitions by the dedup key (hash exchange), so
  state is distributed, never a driver-side hashtable;
- top-K per group uses a rank window *after* the shuffle on the group key —
  one exchange, map-side partial sort;
- small dimension sides are broadcast explicitly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(names: Sequence[str] | str) -> list[str]:
    return [names] if isinstance(names, str) else list(names)


# ---------------------------------------------------------------------------
# J1/J2 — first-occurrence-wins dedup
# Reference: sub_Deduplicate, apps/dedup/src/encoder.c:666-703 — SHA1-keyed
# hashtable lookup-or-insert; first chunk with a given SHA1 becomes canonical,
# later ones are marked duplicates. J2 (apps/dedup/src/new_dedup.c:278,799-812)
# scopes the dedup domain per input file (extra partition key).
# ---------------------------------------------------------------------------

def first_wins_dedup(
    df: DataFrame,
    keys: Sequence[str] | str,
    order: Sequence[str] | str,
    keep: str = "winner",
) -> DataFrame:
    """First-occurrence-wins dedup: one shuffle on ``keys``.

    keep="winner"  → canonical rows only (hashtable miss → insert path)
    keep="flag"    → all rows + boolean ``is_dup`` column (the routing
                     predicate P4, encoder.c:770-786)
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*[F.col(c) for c in _cols(order)])
    ranked = df.withColumn("__rn", F.row_number().over(w))
    if keep == "winner":
        return ranked.filter(F.col("__rn") == 1).drop("__rn")
    if keep == "flag":
        return ranked.withColumn("is_dup", F.col("__rn") > 1).drop("__rn")
    raise ValueError(f"keep must be 'winner' or 'flag', got {keep!r}")


def canonical_ref_join(
    df: DataFrame,
    keys: Sequence[str] | str,
    order: Sequence[str] | str,
    ref_cols: Sequence[str] | str,
) -> DataFrame:
    """J3 — attach the canonical (first) row's columns to every row.

    Reference: write_chunk_to_file, encoder.c:449-471 — a duplicate chunk
    dereferences its canonical chunk's compressed data. The C code blocks on
    a condvar; in Spark the dataflow barrier is the window itself. Single
    shuffle on ``keys`` (same exchange as the dedup), no join needed:
    ``first(...) OVER (PARTITION BY keys ORDER BY order)`` is cheaper than a
    self-join at 100 TB because it reuses one hash exchange.
    """
    w = (
        Window.partitionBy(*_cols(keys))
        .orderBy(*[F.col(c) for c in _cols(order)])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in _cols(ref_cols):
        out = out.withColumn(f"canonical_{c}", F.first(c).over(w))
    return out


# ---------------------------------------------------------------------------
# J7 — candidate-restricted scan (semi join)
# Reference: raw_query, apps/ferret/src/src/raw.c:158-209 — the rank stage
# scans only the candidate list produced by the cheap LSH probe.
# ---------------------------------------------------------------------------

def semi_join(
    df: DataFrame, candidates: DataFrame, on: Sequence[str] | str, broadcast_candidates: bool = True
) -> DataFrame:
    """LEFT SEMI join; candidate side broadcast when small (the common case —
    candidates ≪ corpus, exactly why the reference prunes before EMD)."""
    right = F.broadcast(candidates) if broadcast_candidates else candidates
    return df.join(right, on=_cols(on), how="left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: Sequence[str] | str) -> DataFrame:
    return df.join(F.broadcast(other), on=_cols(on), how="left_anti")


def dim_join(
    fact: DataFrame, dim: DataFrame, on: Sequence[str] | str, how: str = "inner"
) -> DataFrame:
    """J8 — id → object-name map join (cass_map_id_to_dataobj, map.c:189).
    Dimension side broadcast: no shuffle of the fact table."""
    return fact.join(F.broadcast(dim), on=_cols(on), how=how)


# ---------------------------------------------------------------------------
# O1/O2/O6 — ordering, per-group top-K, limit
# ---------------------------------------------------------------------------

def ordered_emit(df: DataFrame, order: Sequence[str] | str) -> DataFrame:
    """O1 — restore total order before the sink (Reorder stage,
    encoder.c:1345-1496: BST of binheaps over (l1,l2)). In Spark this is a
    range-exchange sort; at scale, a global sort is the *only* shuffle whose
    output partitioning is range — keep it last in the plan."""
    return df.orderBy(*_cols(order))


def topk_per_group(
    df: DataFrame,
    group: Sequence[str] | str,
    order: Column | Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """O2 — bounded top-K per group (TOPK_INSERT_MIN heaps, raw.c:163-204,
    include/cass_topk.h). ``row_number() <= k`` after one hash exchange on
    the group key; Spark's WindowExec is rank-limit-pushdown aware
    (WindowGroupLimit) so partial top-K happens map-side, mirroring the
    reference's per-thread heaps merged at the end."""
    order_cols = [order] if isinstance(order, Column) else list(order)
    w = Window.partitionBy(*_cols(group)).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def global_topk(df: DataFrame, order: Column | Sequence[Column], k: int) -> DataFrame:
    """O6 — global LIMIT K under ORDER BY: Spark plans TakeOrderedAndProject
    (per-partition heaps + driver merge) — no full sort, no full shuffle."""
    order_cols = [order] if isinstance(order, Column) else list(order)
    return df.orderBy(*order_cols).limit(k)


# ---------------------------------------------------------------------------
# A1-A4 — aggregations (dedup statistics)
# Reference: stats_t + merge_stats, encoder.c:144-219 — per-thread partial
# sums merged at the end == Spark's native partial/final hash aggregation.
# ---------------------------------------------------------------------------

def histogram(df: DataFrame, value: Column, bucket_width: float, bucket_col: str = "bucket") -> DataFrame:
    """A2 — fixed-width bucket histogram (CHUNK_SIZE_TO_SLOT,
    encoder.c:133-141: slot = size >> 7). Map-side partial count then one
    exchange on the bucket id; output cardinality == bucket count (tiny)."""
    return (
        df.groupBy(F.floor(value / F.lit(bucket_width)).cast("long").alias(bucket_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# E1-E3 — set operations
# ---------------------------------------------------------------------------

def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """E2 — union of candidate lists then uniq (cass_result_merge_lists,
    apps/ferret/src/src/util.c:248-292)."""
    return a.unionByName(b).distinct()


# ---------------------------------------------------------------------------
# P-series — predicates
# ---------------------------------------------------------------------------

def range_filter(df: DataFrame, value: Column, upper: float) -> DataFrame:
    """P7 — ε-range predicate (dist < query->range, raw.c:212-227). Plain
    comparison so Catalyst pushes it into the parquet scan."""
    return df.filter(value < F.lit(upper))


def prefix_filter(df: DataFrame, name: Column, prefix: str = ".") -> DataFrame:
    """P1 — dotfile filter (new_dedup.c:963-973)."""
    return df.filter(~name.startswith(prefix))


# ---------------------------------------------------------------------------
# Upsert / merge (beyond the reference: mutable-table semantics on
# immutable storage — the batch analog of the streaming canonical state)
# ---------------------------------------------------------------------------

def upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str] | str,
    version: str,
) -> DataFrame:
    """Key-based last-wins merge: rows from ``changes`` replace same-key
    rows in ``base``; higher ``version`` wins, ``changes`` wins ties.

    Copy-on-write MERGE as a pure dataflow: union both sides tagged with a
    precedence bit, keep the top row per key by (version, precedence).
    One hash exchange on the keys; WindowGroupLimit keeps the per-key
    top-1 partial map-side, so the shuffle carries ~1 row per key per
    side, not every historical version. At 100 TB pair this with
    partition pruning (operators/layout.py): read only the partitions the
    change-set touches, merge, write those partitions back.
    """
    ks = _cols(keys)
    tagged = base.withColumn("_prec", F.lit(0)).unionByName(
        changes.withColumn("_prec", F.lit(1))
    )
    w = Window.partitionBy(*ks).orderBy(F.col(version).desc(), F.col("_prec").desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prec")
    )


# ---------------------------------------------------------------------------
# Skew remedies (100 TB): explicit salting for hot group keys
# ---------------------------------------------------------------------------

#: aggregate name -> (phase-1 partial fn, phase-2 merge fn)
_SALTABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "collect_set": (
        F.collect_set,
        lambda c: F.array_distinct(F.flatten(F.collect_list(c))),
    ),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str] | str,
    aggs: Sequence[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt on the group key:
    ``groupBy(keys + salt)`` partials, then ``groupBy(keys)`` merge.

    ``aggs`` is ``[(out_name, agg, col), ...]`` with ``agg`` one of
    ``sum count min max collect_set``.

    When to use: Spark's native partial aggregation already collapses
    skewed SUM/COUNT-style keys map-side, so plain ``groupBy`` is right
    for those. Salting pays off when the aggregation STATE is heavy —
    collect_set/collect_list, exact large distincts — because every
    occurrence of a hot key then ships to one reducer regardless of
    map-side combine. The salt fans a hot key across ``n_salts``
    reducers; the merge exchange carries one pre-shrunk row per
    (key, salt). Results are identical for any commutative-mergeable
    aggregate (tests/test_layout.py::test_salted_agg_*).

    The salt is ``pmod(hash(whole row), n_salts)`` — deterministic per
    row content, uniform, and independent of partitioning."""
    ks = _cols(keys)
    for _, agg, _c in aggs:
        if agg not in _SALTABLE:
            raise KeyError(f"unsaltable aggregate {agg!r}; have {sorted(_SALTABLE)}")
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*ks, "_salt")
        .agg(*[_SALTABLE[agg][0](F.col(c)).alias(f"_p_{name}") for name, agg, c in aggs])
    )
    return partial.groupBy(*ks).agg(
        *[
            _SALTABLE[agg][1](F.col(f"_p_{name}")).alias(name)
            for name, agg, _c in aggs
        ]
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (warehouse delta-maintenance pattern):
# keep a materialized agg table and fold each day's batch into it with
# mergeable partials — the history is NEVER rescanned. sum/count/min/max
# merge exactly; avg derives from (sum, n) after the merge. Exactness
# requires order-independent partials: sum DECIMAL (never raw doubles —
# float re-association would make the merged table drift from a full
# recompute), count/min/max are naturally associative.
# ---------------------------------------------------------------------------

_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def merge_partial_aggs(
    parts: list[DataFrame], keys: list[str], spec: dict[str, str]
) -> DataFrame:
    """Fold partial aggregate tables (same schema: keys + spec columns)
    into one — ``spec`` maps column → 'sum' | 'min' | 'max' ('sum' also
    merges counts). Associativity makes this identical to aggregating
    the union of the underlying raw data, at the cost of one
    dimension-sized exchange instead of a history rescan."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(*keys).agg(
        *[_MERGE_FNS[how](F.col(c)).alias(c) for c, how in spec.items()]
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str],
) -> DataFrame:
    """Snapshot diff — "what changed between yesterday's corpus and
    today's": one FULL OUTER equi-join on the key columns, row status by
    null-side and column-wise null-safe comparison. → (keys…, status)
    with status ∈ {added, removed, changed}; unchanged rows are dropped
    (the usual 99% — the diff result is small even when the snapshots
    are huge, and the join is the only exchange). At 100 TB bucket both
    snapshots by the key for a shuffle-free sort-merge diff; the column
    compares are plain JVM predicates (no hashing, so the DuckDB oracle
    mirrors them with IS DISTINCT FROM exactly)."""
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_oc_{c}") for c in compare],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_nc_{c}") for c in compare],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    changed = None
    for c in compare:
        d = ~F.col(f"_oc_{c}").eqNullSafe(F.col(f"_nc_{c}"))
        changed = d if changed is None else (changed | d)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        j.select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in keys
            ],
            status.alias("status"),
        )
        .filter(F.col("status").isNotNull())
    )
