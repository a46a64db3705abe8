"""Iterative graph analytics, Spark-first.

The reference suite has no graph operator; this module supplies the one
a training-data pipeline keeps reaching for — link-analysis scoring of a
document/product graph (PageRank) — in a form that is EXACT across
engines. Floating-point PageRank is order-sensitive (neighbor sums
re-associate differently under different partitionings), so declared
queries could never value-match an oracle. Instead ranks are fixed-point
integers: scaled longs with floor division, where every operation
(sum, integer div) is associative/exact, making the result bit-identical
on Spark, DuckDB, or a laptop — and incidentally reproducible across
cluster re-runs, which float PageRank is not.

Scale shape per iteration: one hash join (ranks ⋈ edges on src — ranks
is the small-ish side but both are key-partitioned; AQE handles hub
skew) and one aggregation exchange on dst. Lineage is truncated with
localCheckpoint every few rounds like the near-dup connected-components
loop (dedup_text.near_dup_components); iterations are a fixed unrolled
count, the standard practice for rank convergence at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one unit of rank mass = 1e9. Precision: three to ten iterations of
# floor division lose only O(degree) units per node. Overflow bound: the
# hottest intermediate is damping_pct * mass(dst) where a hub's mass is
# bounded by total rank ≈ N·RANK_SCALE, so 85·N·1e9 must stay under
# int64 (9.22e18) → safe to ~1e8 nodes; at 1e12 the wrap point was only
# ~1e5 nodes — Spark (non-ANSI) would wrap silently while the DuckDB
# oracle raised, breaking the bit-identical claim.
RANK_SCALE = 1_000_000_000


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list.

    Nodes are the distinct sources (callers wanting isolated/sink nodes
    included should densify the edge list first; an undirected graph is
    passed as both edge directions, which also guarantees every node has
    out-degree ≥ 1). Per iteration, each node ships ``rank div degree``
    along its out-edges and collects ``base + damping_pct·Σcontrib div
    100`` where ``base = (100 - damping_pct)·RANK_SCALE div 100`` —
    every step in long arithmetic, so any engine computes the identical
    ranks in any summation order.
    """
    # Materialize the edge list and degree table once: every iteration
    # references both, and without truncation each iteration's plan would
    # re-derive them from scratch (for a derived edge list — e.g. the
    # basket explode in graph_pagerank_copurchase — that triples the work
    # at 3 iterations). localCheckpoint pins them in executor storage,
    # same as the connected-components loop.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    base = (100 - damping_pct) * RANK_SCALE // 100
    ranks = deg.select("src", F.lit(RANK_SCALE).cast("long").alias("rank"))
    for i in range(iterations):
        contribs = (
            ranks.join(deg, "src")
            .select("src", F.expr("rank div deg").alias("contrib"))
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = (
            deg.select("src")
            .join(contribs.withColumnRenamed("dst", "src"), "src", "left")
            .select(
                "src",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(mass, 0L)) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("src").alias("node"), "rank")


def pagerank_int_oracle_sql(
    edges_sql: str, iterations: int = 3, damping_pct: int = 85
) -> str:
    """The DuckDB mirror: the same integer recurrence unrolled as chained
    CTEs. HUGEINT sums are cast back to BIGINT before the floor division
    so both engines stay in long arithmetic."""
    base = (100 - damping_pct) * RANK_SCALE // 100
    parts = [
        f"WITH edges AS ({edges_sql})",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src)",
        f"r0 AS (SELECT src, CAST({RANK_SCALE} AS BIGINT) AS rank FROM deg)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
      SELECT d.src,
             CAST({base} + ({damping_pct} * COALESCE(m.mass, 0)) // 100 AS BIGINT) AS rank
      FROM deg d LEFT JOIN (
        SELECT e.dst AS src, CAST(SUM(r.rank // dg.deg) AS BIGINT) AS mass
        FROM {prev} r JOIN deg dg ON r.src = dg.src
        JOIN edges e ON e.src = r.src
        GROUP BY e.dst
      ) m ON d.src = m.src
    )"""
        )
        prev = f"r{i}"
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT src AS node, rank FROM {prev}"
    )
