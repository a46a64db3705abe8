"""Bucketed-table co-location: the write-once-shuffle-once contract.

A join of two tables bucketed on the join keys with equal bucket counts
must have NO shuffle exchange; against an unbucketed side, only that side
exchanges. These are plan assertions — at 100 TB a silent regression here
re-shuffles the corpus index on every query batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bensp_suite_spark.operators import bucketing as B

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", None)
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    od = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_totalprice"
    )
    B.write_bucketed(li, "li_bkt", 8, "l_orderkey")
    B.write_bucketed(od, "od_bkt", 8, "l_orderkey")
    yield li, od
    for t in ("li_bkt", "od_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    joined = B.co_located_join(spark, "li_bkt", "od_bkt", on=["l_orderkey"])
    # disable broadcast so the bucket layout (not size) is what avoids the
    # shuffle — at scale neither fact side fits a broadcast anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_half_bucketed_join_shuffles_one_side(spark, bucketed_tables):
    li, od = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bkt").join(od, on=["l_orderkey"])
        plan = _executed(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    li, od = bucketed_tables
    plain = li.join(od, on=["l_orderkey"]).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    bkt = B.co_located_join(spark, "li_bkt", "od_bkt", on=["l_orderkey"]).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    assert plain.collect() == bkt.collect()


def test_bucketed_lsh_index_probe_join_shuffles_only_queries(spark):
    """The SCALING.md billion-vector pattern: the corpus LSH index written
    bucketed on (table, bucket) joins probe batches with the index side
    exchange-free — only the (much smaller) query side shuffles."""
    from bensp_suite_spark.operators import bucketing as B
    from bensp_suite_spark.operators import similarity as SIM
    from bensp_suite_spark.tables import load_table

    emb = load_table(spark, SF_CORRECT, "embeddings")
    dim = len(emb.first()["embedding"])
    idx = SIM.lsh_index(
        emb.select("vec_id", "embedding"), "embedding", dim, n_planes=8, n_tables=4
    ).select("vec_id", "table", "bucket")
    B.write_bucketed(idx, "lsh_idx_bkt", 8, "table", "bucket")
    try:
        probes = SIM.lsh_index(
            emb.filter("vec_id < 16").select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            "embedding", dim, n_planes=8, n_tables=4,
        ).select("query_id", "table", "bucket")
        with_bkt = spark.table("lsh_idx_bkt")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = with_bkt.join(probes, on=["table", "bucket"]).select(
                "query_id", "vec_id"
            )
            joined.collect()
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # count only the executed plan — AQE's toString appends the Initial
        # Plan section, which would double-count the probe exchange
        final = plan.split("== Initial Plan ==")[0]
        # exactly one hash exchange — the probe side; the bucketed index
        # reads its layout from table metadata
        assert final.count("Exchange hashpartitioning") == 1, final
        assert "Bucketed: true" in final
    finally:
        spark.sql("DROP TABLE IF EXISTS lsh_idx_bkt")
