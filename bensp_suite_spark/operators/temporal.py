"""Temporal joins the reference (and vanilla Spark SQL) lack as built-ins:
backward as-of join and event-time range join, expressed as single-shuffle
window plans rather than point-in-time theta joins.

A naive as-of join is a non-equi join (``l.ts >= r.ts``) that Spark can only
execute as a broadcast-nested-loop or a per-key cartesian — O(|L|·|R|) per
key, hopeless at 100 TB. The union-tag formulation below is the scalable
alternative: one hash shuffle on the ``by`` keys, one sort per partition,
then a linear ``last(..., ignorenulls)`` running-window scan. Cost is
O((|L|+|R|) log(|L|+|R|)) per key group and the plan is a single exchange —
the same shape Flink's temporal join and kdb's ``aj`` use.

Skew note (100 TB): a hot ``by`` key concentrates its whole timeline in one
task. The window is a running frame (no whole-partition buffering), so the
scan streams; if one key's timeline alone exceeds a task's input share,
pre-split by time range (coarse date bucket added to ``by``) and stitch the
bucket boundaries with a per-bucket seed row — the standard segmented-scan
trick. Not needed at test scale; documented so the 1000-executor deployment
knows the knob.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_IS_R = "__asof_is_right"
_PL = "__asof_payload"
_MATCH = "__asof_match"


def ts_micros(c: Column) -> Column:
    """Epoch micros for TIMESTAMP or TIMESTAMP_NTZ (``unix_micros`` alone
    rejects NTZ). The NTZ→LTZ cast reads the value in session time — our
    sessions pin UTC (session.align_session) so it is the identity, and
    timestamp *differences* are tz-shift-invariant regardless."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: Sequence[str] | str,
    strict: bool = False,
    tolerance_micros: int | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: each left row picks the right row with the
    greatest ``right_on`` timestamp ≤ (``<`` when ``strict``) its own
    ``left_on``, within the same ``by`` group; unmatched left rows keep
    nulls.

    ``right``'s non-key columns (including ``right_on``) must not collide
    with ``left``'s — rename before calling; they come back as top-level
    columns. Ties among equal right timestamps resolve deterministically to
    the struct-max payload (``right_on`` leads the payload struct, so order
    the remaining columns with a unique id first).

    ``tolerance_micros`` bounds the lookback: matches older than the
    tolerance are nulled out (kdb ``wj`` / pandas ``merge_asof`` tolerance
    semantics), left rows still emitted.

    Plan: union-tag both sides, one exchange on ``by``, per-partition sort
    on (ts, side, payload), running ``last(payload, ignorenulls=True)`` —
    no join node at all. See module docstring for the scale rationale.
    """
    by = [by] if isinstance(by, str) else list(by)
    overlap = (set(right.columns) - set(by)) & set(left.columns)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")

    r_cols = [right_on] + [c for c in right.columns if c not in by and c != right_on]
    payload = F.struct(*[F.col(c) for c in r_cols])
    r2 = right.select(
        *by,
        F.col(right_on).alias(_TS),
        F.lit(1).alias(_IS_R),
        payload.alias(_PL),
    )
    l2 = left.withColumn(_TS, F.col(left_on)).withColumn(_IS_R, F.lit(0))
    u = l2.unionByName(r2, allowMissingColumns=True)

    # Inclusive: right rows sort before left at equal ts (visible to the
    # frame); strict: after (invisible). Payload-asc tiebreak makes `last`
    # pick the struct-max among equal-ts right rows.
    side_order = F.col(_IS_R).desc() if not strict else F.col(_IS_R).asc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(_TS).asc(), side_order, F.col(_PL).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_MATCH, F.last(_PL, ignorenulls=True).over(w)).filter(
        F.col(_IS_R) == 0
    )

    match_col: Column = F.col(_MATCH)
    if tolerance_micros is not None:
        in_tol = (
            ts_micros(F.col(_TS)) - ts_micros(F.col(_MATCH).getField(right_on))
        ) <= F.lit(tolerance_micros)
        match_col = F.when(in_tol, F.col(_MATCH))

    out = matched.withColumn(_MATCH, match_col)
    for c in r_cols:
        out = out.withColumn(c, F.col(_MATCH).getField(c))
    return out.drop(_TS, _IS_R, _PL, _MATCH)


def range_join_interval(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: Sequence[str] | str,
    bucket_micros: int = 3_600_000_000,
) -> DataFrame:
    """Event-time range join: pair each point with every interval (same
    ``by`` group) whose [start, end] contains it — inner join semantics.

    The scalable plan: quantize both sides to coarse time buckets (a point
    lives in exactly one; intervals explode to every bucket they overlap),
    equi-join on (by, bucket) so the containment predicate only runs within
    a bucket, then apply the exact range filter. Shuffle is ∝ rows ×
    buckets-per-interval instead of a per-key cartesian; choose
    ``bucket_micros`` ≈ median interval length so the explode factor stays
    ~2. (Databricks' range-join bin optimization, rebuilt from public
    primitives.)
    """
    by = [by] if isinstance(by, str) else list(by)
    b = F.lit(bucket_micros)
    p2 = points.withColumn("__rb", F.floor(ts_micros(F.col(point_ts)) / b))
    i2 = intervals.withColumn(
        "__rb",
        F.explode(
            F.sequence(
                F.floor(ts_micros(F.col(start_ts)) / b),
                F.floor(ts_micros(F.col(end_ts)) / b),
            )
        ),
    )
    # each point lives in exactly one bucket, so no pair can match twice
    joined = p2.join(i2, on=by + ["__rb"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("__rb")


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    within_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """N-step funnel: per user, how many of ``steps`` completed in order,
    each step within ``within_seconds`` of the previous one.

    Semantics: GREEDY FIRST-OCCURRENCE chaining — step 1 anchors at the
    user's earliest step-1 event; step k+1 is the earliest step-(k+1)
    event strictly after step k and within the window of it. Greedy is
    deterministic and identical across engines (the oracle states it as
    nested correlated MINs); it is not maximal matching — a user who
    fails the greedy chain but would succeed anchored at a later step-1
    event counts as not converted, exactly like the nested-MIN SQL.

    Scale shape: ONE exchange on the user key. Events collect into a
    per-user time-sorted array (sort_array on (ts, type) structs — no
    window sort) and a single JVM ``aggregate`` fold walks the timeline
    carrying (next_step_idx, last_ts); no per-step self-joins, no Python.
    A user's whole (filtered) timeline must fit a task — filter to the
    funnel's event types first (done here), which bounds the array to the
    steps' event counts, and segment pathological users by date bucket if
    one user alone exceeds a task (same knob as the as-of join above)."""
    n = len(steps)
    step_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        step_idx[F.col(type_col)].alias("step"),
    )
    timeline = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts_us", "step"))).alias("tl")
    )
    within_us = within_seconds * 1_000_000
    init = F.struct(
        F.lit(0).cast("int").alias("next_step"),
        F.lit(None).cast("long").alias("last_ts"),
    )
    fold = F.aggregate(
        "tl",
        init,
        lambda acc, e: F.when(
            (e["step"] == acc["next_step"])
            & (
                (acc["next_step"] == 0)
                | (
                    (e["ts_us"] > acc["last_ts"])
                    & (e["ts_us"] <= acc["last_ts"] + F.lit(within_us))
                )
            ),
            F.struct(
                (acc["next_step"] + 1).cast("int").alias("next_step"),
                e["ts_us"].cast("long").alias("last_ts"),
            ),
        ).otherwise(acc),
    )
    return timeline.select(
        "user_id",
        fold["next_step"].alias("steps_completed"),
        (fold["next_step"] >= n).alias("completed"),
    )
