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
    #
    # Both tables are repartitioned on the iteration join key (src)
    # before their checkpoints: localCheckpoint preserves output
    # partitioning, so every iteration's ranks⋈deg⋈e joins reuse these
    # exchanges instead of re-shuffling both sides per round (guide
    # §2.4; at bench scale AQE broadcasts the small sides, at 100 TB
    # this is one exchange per side for the whole loop). The edge
    # checkpoint is lazy — materializing deg (which reads e) pins both
    # in one blocking job instead of two.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(F.col("src"))
        .localCheckpoint(eager=False)
    )
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
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


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Connected components over an undirected edge list → (node, rep)
    where ``rep`` is the component's minimum node id. Shared kernel with
    the near-dup cluster resolution (``dedup_text.near_dup_components``):
    hash-to-min label propagation with pointer jumping — O(log diameter)
    rounds, each one join + one aggregation, lineage truncated per round.
    Exposed here as the general graph operator (site clusters over the
    host link graph, entity groups over match pairs, …)."""
    from .dedup_text import near_dup_components

    return near_dup_components(edges, a=src, b=dst)


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts → (node, triangles) for every node on at
    least one triangle.

    Degree-ordered orientation (the scalable formulation): canonicalize
    to undirected distinct edges, then orient every edge from its
    lower-(degree, id) endpoint to the higher one. Each triangle has
    exactly one node with two out-edges under this orientation, so the
    wedge join enumerates every triangle once, and the join fan-out per
    node is its ORIENTED out-degree — O(√m) max even for celebrity nodes,
    instead of the raw-degree blowup a naive id-ordered wedge join
    suffers on skewed graphs (the standard MapReduce-era result: Suri &
    Vassilvitskii, WWW'11). Everything is equi-joins + one aggregation —
    no UDF, no driver state; the DuckDB mirror
    (:func:`triangle_count_oracle_sql`) runs the identical algebra."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient each edge from lower-(deg, id) to higher-(deg, id)
    ed = (
        e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("o")
        )
        .select("o.u", "o.v")
    )
    # wedges from the one low-endpoint per triangle; close with the third
    # oriented edge (either direction between v1 and v2 — orientation of
    # the closing edge depends on ITS endpoints' degrees)
    w = (
        ed.alias("e1")
        .join(ed.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    closing = ed.select(
        F.least(F.col("u"), F.col("v")).alias("y"),
        F.greatest(F.col("u"), F.col("v")).alias("z"),
    )
    tri = w.join(closing, ["y", "z"])
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )


def connected_components_oracle_sql(edges_sql: str) -> str:
    """DuckDB mirror: min label reachable over the undirected closure."""
    return f"""
    WITH RECURSIVE raw AS ({edges_sql}),
    edges AS (
      SELECT src AS x, dst AS y FROM raw
      UNION
      SELECT dst AS x, src AS y FROM raw
    ),
    comp(node, rep) AS (
      SELECT x, x FROM edges
      UNION
      SELECT e.x, c.rep FROM comp c JOIN edges e ON e.y = c.node
    )
    SELECT node, MIN(rep) AS rep FROM comp GROUP BY node
    """


def triangle_count_oracle_sql(edges_sql: str) -> str:
    """DuckDB mirror of :func:`triangle_count` — the identical
    degree-ordered orientation algebra."""
    return f"""
    WITH raw AS ({edges_sql}),
    e AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ),
    deg AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
      ) GROUP BY n
    ),
    ed AS (
      SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN e.a ELSE e.b END AS u,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN e.b ELSE e.a END AS v
      FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b
    ),
    w AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM ed e1 JOIN ed e2 ON e1.u = e2.u AND e1.v < e2.v
    ),
    closing AS (SELECT LEAST(u, v) AS y, GREATEST(u, v) AS z FROM ed),
    tri AS (SELECT x, w.y, w.z FROM w JOIN closing ON w.y = closing.y AND w.z = closing.z),
    corners AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM corners GROUP BY node
    """
