"""t2 correctness: every declared query vs the DuckDB oracle at sf0.01.

This mirrors the driver's CORRECTNESS check (row count + columns + values)
so oracle drift is caught locally before the round gate runs.
"""

from __future__ import annotations

import pytest

from bensp_suite_spark import queries as Q

from .conftest import SF_CORRECT, SF_SMOKE
from .oracle import compare

ORACLE_QUERIES = sorted(Q.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    df = Q.QUERIES[name](spark, SF_CORRECT)
    ok, msg = compare(df, Q.ORACLES[name], SF_CORRECT)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_smoke_sf0001(spark, name):
    """t1 smoke: every registered query runs at sf0.001 and has a schema."""
    df = Q.QUERIES[name](spark, SF_SMOKE)
    assert df.columns
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10
