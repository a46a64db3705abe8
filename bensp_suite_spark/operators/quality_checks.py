"""Declarative data-quality expectations over a DataFrame — the
dbt-test / Delta-Live-Tables-expectations analog for this engine: a
training-data build asserts its tables (keys unique, columns complete,
values in range, freshness) BEFORE shipping a corpus, and wants all checks
in ONE pass over the data.

Every expectation compiles to a conditional aggregate over the same scan,
so N checks cost one job with one (partial+final) aggregation — no
per-check actions, no recomputed scans. The report is itself a DataFrame:
(check, violations, total, passed), queryable/joinable like any table.

Uniqueness is the exception — it needs a per-key grouping, so it runs as
one additional aggregation on the key (still a single extra exchange, and
only when a uniqueness check is requested).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    # a boolean Column: True where the row VIOLATES the expectation
    violation: Column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"in_range({col},{lo},{hi})",
        F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def matches(col: str, pattern: str, name: str | None = None) -> Check:
    return Check(name or f"matches({col})", ~F.col(col).rlike(pattern))


def accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_values({col})", ~F.col(col).isin(values) | F.col(col).isNull()
    )


def expression(name: str, violation_expr: Column) -> Check:
    """Escape hatch: any boolean expression marking violating rows."""
    return Check(name, violation_expr)


def run_checks(
    df: DataFrame, checks: list[Check], unique_keys: list[list[str]] | None = None
) -> DataFrame:
    """Evaluate all expectations; returns the report DataFrame
    (check, violations, total, passed), one row per check.

    Row-level checks share ONE aggregation over one scan. Each
    ``unique_keys`` entry adds a duplicate-key check (rows beyond the
    first per key count as violations) costing one exchange on that key."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(checks):
        aggs.append(
            F.sum(F.when(c.violation, 1).otherwise(0)).cast("long").alias(f"__v{i}")
        )
    row = df.agg(*aggs)
    # ONE aggregate row exploded into one report row per check — N union
    # branches over the agg would re-run the scan N times (verified in the
    # physical plan), the explode keeps it to a single scan/job.
    report = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c.name).alias("check"),
                        F.col(f"__v{i}").alias("violations"),
                        F.col("__total").cast("long").alias("total"),
                        (F.col(f"__v{i}") == 0).alias("passed"),
                    )
                    for i, c in enumerate(checks)
                ]
            )
        ).alias("r")
    ).select("r.*")
    reports = [report]
    for keys in unique_keys or []:
        dup = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        reports.append(
            dup.agg(
                F.lit(f"unique({','.join(keys)})").alias("check"),
                F.sum(F.col("n") - 1).cast("long").alias("violations"),
                F.sum("n").cast("long").alias("total"),
                (F.sum(F.col("n") - 1) == 0).alias("passed"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
