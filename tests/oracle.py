"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, sorts columns by name,
sorts rows, and compares values — exact for ints/strings/timestamps,
bit-exact for floats (our queries are engineered so decimal-exact
aggregation makes Spark and DuckDB produce identical doubles).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    con = duckdb_con(sf_dir)
    expected = con.execute(oracle_sql).df()
    actual = spark_df.toPandas()

    if sorted(actual.columns) != sorted(expected.columns):
        return False, f"columns differ: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    if len(actual) != len(expected):
        return False, f"row count differs: spark={len(actual)} oracle={len(expected)}"

    a, e = _normalize(actual), _normalize(expected)
    for c in a.columns:
        # The driver's value hash is dtype-sensitive: a Spark int64 column
        # whose oracle comes back float64 (e.g. DuckDB SUM(BIGINT) →
        # HUGEINT → pandas float) hashes differently even when every value
        # is numerically equal. Mirror that strictness here so the local
        # check catches it before the driver does (round-3 failures
        # pack_context_windows / curation_pipeline were exactly this).
        a_num = pd.api.types.is_integer_dtype(a[c]) or pd.api.types.is_float_dtype(a[c])
        e_num = pd.api.types.is_integer_dtype(e[c]) or pd.api.types.is_float_dtype(e[c])
        if a_num and e_num and (
            pd.api.types.is_integer_dtype(a[c]) != pd.api.types.is_integer_dtype(e[c])
        ):
            return False, (
                f"col {c}: dtype class differs: spark={actual[c].dtype} "
                f"oracle={expected[c].dtype} (int-vs-float; CAST the oracle "
                f"side — DuckDB SUM(BIGINT) returns HUGEINT→float64)"
            )
        av, ev = a[c].values, e[c].values
        if pd.api.types.is_float_dtype(a[c]):
            for i, (x, y) in enumerate(zip(av, ev)):
                xn, yn = (isinstance(x, float) and math.isnan(x)), (
                    isinstance(y, float) and math.isnan(y)
                )
                if xn and yn:
                    continue
                if x != y:
                    return False, f"col {c} row {i}: spark={x!r} oracle={y!r} (float mismatch)"
        else:
            neq = av != ev
            try:
                # both-null (NaT/None) counts as equal — != is True for
                # NaT vs NaT but the driver hashes two NULLs identically
                both_na = pd.isna(a[c]).values & pd.isna(e[c]).values
                neq = neq & ~both_na
            except Exception:
                pass
            try:
                bad = neq.any()
            except Exception:
                bad = any(bool(v) for v in neq)
            if bad:
                i = int(pd.Series(neq).idxmax())
                return False, f"col {c} row {i}: spark={av[i]!r} oracle={ev[i]!r}"
    return True, f"ok ({len(a)} rows)"
