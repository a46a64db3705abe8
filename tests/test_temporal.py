"""As-of join and range join: crafted-data semantics + plan-shape checks."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bensp_suite_spark.operators import temporal as T


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _left(spark):
    return _mk(
        spark,
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (1, 11, _ts("2024-01-01 12:00:00")),
            (2, 12, _ts("2024-01-01 09:00:00")),
        ],
        ["uid", "lid", "lts"],
    )


def _right(spark):
    return _mk(
        spark,
        [
            # two candidates for lid=10; 101 is the newer
            (1, 100, _ts("2024-01-01 08:00:00"), 1.0),
            (1, 101, _ts("2024-01-01 09:30:00"), 2.0),
            # exact tie with lid=11's timestamp — inclusive matches, strict not
            (1, 102, _ts("2024-01-01 12:00:00"), 3.0),
            # uid=2 has only a LATER right row: never matches backward
            (2, 103, _ts("2024-01-01 09:30:00"), 4.0),
        ],
        ["uid", "rid", "rts", "rval"],
    )


def _collect(df):
    return {r["lid"]: (r["rid"], r["rval"]) for r in df.collect()}


def test_asof_backward_inclusive(spark):
    out = T.asof_join(_left(spark), _right(spark), "lts", "rts", by="uid")
    got = _collect(out)
    assert got[10] == (101, 2.0)  # newest of the two priors
    assert got[11] == (102, 3.0)  # equal-ts right row visible when inclusive
    assert got[12] == (None, None)  # only later rows exist → no match


def test_asof_strict_excludes_equal_ts(spark):
    out = T.asof_join(_left(spark), _right(spark), "lts", "rts", by="uid", strict=True)
    assert _collect(out)[11] == (101, 2.0)


def test_asof_equal_ts_tiebreak_is_max_id(spark):
    right = _right(spark).union(
        _mk(spark, [(1, 99, _ts("2024-01-01 09:30:00"), 9.0)], ["uid", "rid", "rts", "rval"])
    )
    out = T.asof_join(_left(spark), right, "lts", "rts", by="uid")
    # two right rows at 09:30 — the struct-max (higher rid) wins, deterministically
    assert _collect(out)[10] == (101, 2.0)


def test_asof_tolerance_nulls_stale_matches(spark):
    out = T.asof_join(
        _left(spark),
        _right(spark),
        "lts",
        "rts",
        by="uid",
        tolerance_micros=60 * 60 * 1_000_000,  # 1 hour
    )
    got = _collect(out)
    assert got[10] == (101, 2.0)  # 30 min old → kept
    assert got[11] == (102, 3.0)  # 0 old → kept
    assert got[12] == (None, None)
    # shrink tolerance below 30 min → lid=10's match is nulled, row kept
    tight = T.asof_join(
        _left(spark), _right(spark), "lts", "rts", by="uid", tolerance_micros=60_000_000
    )
    got = _collect(tight)
    assert got[10] == (None, None) and got[11] == (102, 3.0)


def test_asof_rejects_column_collision(spark):
    import pytest

    bad = _right(spark).withColumnRenamed("rid", "lid")
    with pytest.raises(ValueError, match="collide"):
        T.asof_join(_left(spark), bad, "lts", "rts", by="uid")


def test_asof_plan_has_no_join_node(spark):
    out = T.asof_join(_left(spark), _right(spark), "lts", "rts", by="uid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, never a join operator
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle on `by`


def test_range_join_brackets_and_boundaries(spark):
    points = _mk(
        spark,
        [
            (1, 1, _ts("2024-01-01 10:00:00")),  # inside
            (1, 2, _ts("2024-01-01 09:00:00")),  # == start boundary
            (1, 3, _ts("2024-01-01 11:00:00")),  # == end boundary
            (1, 4, _ts("2024-01-01 11:00:01")),  # just outside
            (2, 5, _ts("2024-01-01 10:00:00")),  # wrong key group
        ],
        ["uid", "pid", "pts"],
    )
    # 2-hour interval with a 30-min bucket → explodes to 5 buckets
    intervals = _mk(
        spark,
        [(1, 7, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"))],
        ["uid", "iid", "ival_start", "ival_end"],
    )
    out = T.range_join_interval(
        points, intervals, "pts", "ival_start", "ival_end", by="uid",
        bucket_micros=30 * 60 * 1_000_000,
    )
    assert sorted(r["pid"] for r in out.collect()) == [1, 2, 3]
    # matched pairs are unique even though the interval spans many buckets
    assert out.count() == out.select("pid", "iid").distinct().count()


def test_range_join_no_nested_loop(spark):
    points = _mk(spark, [(1, 1, _ts("2024-01-01 10:00:00"))], ["uid", "pid", "pts"])
    intervals = _mk(
        spark,
        [(1, 7, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"))],
        ["uid", "iid", "ival_start", "ival_end"],
    )
    plan = T.range_join_interval(
        points, intervals, "pts", "ival_start", "ival_end", by="uid"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_join_against_pandas_merge_asof(spark):
    """Cross-check the operator against pandas' reference implementation on
    a bigger random timeline (public semantics oracle)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    n_l, n_r = 400, 600
    lp = pd.DataFrame(
        {
            "uid": rng.randint(0, 5, n_l),
            "lid": np.arange(n_l),
            "lts": pd.to_datetime(rng.randint(0, 10**6, n_l) * 10**6, unit="us"),
        }
    )
    rp = pd.DataFrame(
        {
            "uid": rng.randint(0, 5, n_r),
            "rid": np.arange(n_r),
            "rts": pd.to_datetime(rng.randint(0, 10**6, n_r) * 10**6, unit="us"),
        }
    )
    # merge_asof needs unique (uid, rts) on the right to be deterministic;
    # the random micros grid above makes duplicates vanishingly unlikely —
    # drop them anyway for a well-defined expectation
    rp = rp.drop_duplicates(subset=["uid", "rts"])
    expected = pd.merge_asof(
        lp.sort_values("lts"), rp.sort_values("rts"),
        left_on="lts", right_on="rts", by="uid", direction="backward",
    ).sort_values("lid")
    out = (
        T.asof_join(
            spark.createDataFrame(lp), spark.createDataFrame(rp), "lts", "rts", by="uid"
        )
        .orderBy("lid")
        .toPandas()
    )
    exp_rid = expected["rid"].astype("float64").reset_index(drop=True)
    got_rid = out["rid"].astype("float64").reset_index(drop=True)
    pd.testing.assert_series_equal(exp_rid, got_rid, check_names=False)


def test_funnel_greedy_semantics(spark):
    """Greedy first-occurrence chaining edge cases: anchors at earliest
    step-1, strict after + inclusive window bound, out-of-order events
    skipped, a missed greedy chain does NOT re-anchor."""
    from bensp_suite_spark.operators.temporal import funnel

    t0 = "2024-01-01 00:00:00"
    rows = [
        # u1: A@0, B@+30m, C@+60m → 3 steps
        (1, "A", "2024-01-01 00:00:00"),
        (1, "B", "2024-01-01 00:30:00"),
        (1, "C", "2024-01-01 01:00:00"),
        # u2: B before A, then A; no B after → 1 step
        (2, "B", "2024-01-01 00:00:00"),
        (2, "A", "2024-01-01 00:10:00"),
        # u3: A@0, B exactly at +window (inclusive) → 2 steps
        (3, "A", t0),
        (3, "B", "2024-01-01 01:00:00"),
        # u4: A@0 (anchor), B@+2h (beyond window from FIRST A), A@+1h30
        #     — greedy stays anchored at first A: 1 step, no re-anchor
        (4, "A", t0),
        (4, "A", "2024-01-01 01:30:00"),
        (4, "B", "2024-01-01 02:00:00"),
        # u5: only C → 0 steps
        (5, "C", t0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts string").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        r.user_id: (r.steps_completed, r.completed)
        for r in funnel(ev, ["A", "B", "C"], within_seconds=3600).collect()
    }
    assert got == {1: (3, True), 2: (1, False), 3: (2, False), 4: (1, False), 5: (0, False)}
