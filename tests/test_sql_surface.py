"""The drop-in SQL surface: register_views + spark.sql run the same ANSI
queries DuckDB runs, value-identical. This is the 'a reference user can
switch' contract at the SQL level — the declared-query layer proves the
DataFrame API; this proves plain SQL text against the same schema."""

from __future__ import annotations

import pytest

from bensp_suite_spark.tables import register_views

from .conftest import SF_CORRECT
from .oracle import compare

# ANSI-compatible query texts: each runs verbatim on BOTH engines
PORTABLE_SQL = {
    "group_agg": """
        SELECT l_returnflag, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 3) AS sum_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    "join_topk": """
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "window_rank": """
        SELECT c_custkey, c_acctbal FROM (
          SELECT c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer
        ) t WHERE rn <= 3
    """,
    "exists_subquery": """
        SELECT COUNT(*) AS n FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 100000)
    """,
    "set_ops": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "case_agg": """
        SELECT n_name,
               CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
}


@pytest.mark.parametrize("name", sorted(PORTABLE_SQL))
def test_sql_text_matches_duckdb(spark, name):
    # the SAME text is both the Spark query and its own DuckDB oracle
    register_views(spark, SF_CORRECT)
    sql = PORTABLE_SQL[name]
    ok, msg = compare(spark.sql(sql), sql, SF_CORRECT)
    assert ok, f"{name}: {msg}"
