"""Physical-plan gates — the 100 TB contract as an inspectable API.

The reference has no optimizer; every physical choice is hard-coded
(SURVEY §4). On Spark the physical plan is *derived*, so scale regressions
(a filter that stopped pushing down, a dimension join that fell back to
sort-merge, a Python UDF creeping into a hot path) can happen silently
while answers stay right. These helpers turn `.explain` into assertions:
tests/test_plan_quality.py gates the declared-query suite with them, and a
deployment can run :func:`gate_report` against its own DataFrames before
submitting a 100 TB job.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


class PlanGateError(AssertionError):
    """A physical-plan property the engine relies on did not hold."""


def executed_plan(df: DataFrame) -> str:
    """Physical plan string (post-AQE tree if the query already ran)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`df.explain("formatted")` output as a string (scan detail:
    PushedFilters / ReadSchema live here)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle/broadcast exchange operators in the plan. Every
    unneeded exchange is a full-data network pass at scale."""
    return executed_plan(df).count("Exchange")


def assert_no_python_udf(df: DataFrame, what: str = "plan") -> None:
    plan = executed_plan(df)
    if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
        raise PlanGateError(f"{what}: Python UDF in a hot path\n{plan[:2000]}")


def assert_broadcast_join(df: DataFrame, what: str = "plan") -> None:
    """The small side must broadcast — a sort-merge join here means the
    fact table shuffles for a dimension lookup."""
    plan = executed_plan(df)
    if "BroadcastHashJoin" not in plan:
        raise PlanGateError(f"{what}: no broadcast join\n{plan[:2000]}")
    if "SortMergeJoin" in plan:
        raise PlanGateError(f"{what}: sort-merge join present\n{plan[:2000]}")


def assert_pushed_filter(df: DataFrame, fragment: str, what: str = "plan") -> None:
    """``fragment`` must appear in the scan's PushedFilters (whitespace-
    insensitive) — i.e. the predicate reaches the parquet reader."""
    plan = formatted_plan(df).replace(" ", "")
    if "PushedFilters" not in plan or fragment.replace(" ", "") not in plan:
        raise PlanGateError(f"{what}: filter {fragment!r} not pushed to scan")


def assert_read_schema(
    df: DataFrame, must: list[str], must_not: list[str], what: str = "plan"
) -> None:
    """Column pruning: the scan's ReadSchema must contain ``must`` and none
    of ``must_not``."""
    plan = formatted_plan(df)
    start = plan.index("ReadSchema")
    schema = plan[start : plan.index("\n", start)]
    missing = [c for c in must if c not in schema]
    extra = [c for c in must_not if c in schema]
    if missing or extra:
        raise PlanGateError(
            f"{what}: scan reads wrong columns (missing={missing}, unpruned={extra}): {schema}"
        )


def assert_partial_aggregation(df: DataFrame, what: str = "plan") -> None:
    """Aggregations must run map-side partial + final (the reference's
    per-thread stats merge, encoder.c:198-219, done by the engine)."""
    if executed_plan(df).count("HashAggregate") < 2:
        raise PlanGateError(f"{what}: no partial aggregation")


def gate_report(df: DataFrame) -> dict:
    """Non-raising summary of the plan properties worth reviewing before a
    large run. Keys: exchanges, python_udf_stages, broadcast_joins,
    sort_merge_joins, window_group_limit, codegen_stages."""
    plan = executed_plan(df)
    return {
        "exchanges": plan.count("Exchange"),
        "python_udf_stages": plan.count("ArrowEvalPython") + plan.count("BatchEvalPython"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "window_group_limit": plan.count("WindowGroupLimit"),
        "codegen_stages": plan.count("WholeStageCodegen"),
    }
