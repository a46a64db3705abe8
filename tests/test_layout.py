"""Data-layout management: partitioned writes, partition pruning, and the
copy-on-write upsert that builds on them (operators/layout.py, relational
upsert). The plan contract: a filter on the partition column must become a
PartitionFilter (directory pruning at planning time), never a row filter.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bensp_suite_spark import plans as PL
from bensp_suite_spark.operators import layout as L
from bensp_suite_spark.operators import relational as R
from bensp_suite_spark.tables import load_table

from .conftest import SF_CORRECT


def test_partitioned_write_prunes_directories(spark, tmpdir):
    ev = load_table(spark, SF_CORRECT, "events")
    path = os.path.join(tmpdir, "events_by_type")
    L.write_partitioned(ev, path, ["event_type"], sort_cols=["ts"])

    back = L.read_partitioned(spark, path)
    clicks = back.filter(F.col("event_type") == "click")

    plan = PL.formatted_plan(clicks)
    start = plan.index("PartitionFilters")
    pf_line = plan[start : plan.index("\n", start)]
    assert "event_type" in pf_line and "click" in pf_line
    # pruning is planning-time: the scan must list only the one directory
    files = clicks.select(F.input_file_name()).distinct().collect()
    assert all("event_type=click" in r[0] for r in files)
    # correctness: same rows as filtering the unpartitioned table
    assert clicks.count() == ev.filter(F.col("event_type") == "click").count()


def test_partitioned_write_bounds_file_counts(spark, tmpdir):
    # repartition-before-write: each partition value lands in exactly one
    # file, regardless of upstream parallelism (the small-file guard)
    ev = load_table(spark, SF_CORRECT, "events").repartition(16)
    path = os.path.join(tmpdir, "events_files")
    L.write_partitioned(ev, path, ["event_type"])
    for d in os.listdir(path):
        if d.startswith("event_type="):
            parquets = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
            assert len(parquets) == 1, (d, parquets)


def test_upsert_last_wins_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, version int"
    )
    changes = spark.createDataFrame(
        [(2, "B", 2), (4, "d", 2), (3, "c2", 1)], "k int, v string, version int"
    )
    got = {r.k: (r.v, r.version) for r in R.upsert(base, changes, "k", "version").collect()}
    # update wins on higher version, insert lands, tie goes to changes
    assert got == {1: ("a", 1), 2: ("B", 2), 3: ("c2", 1), 4: ("d", 2)}


def test_upsert_plan_has_group_limit(spark):
    # the per-key top-1 must push a WindowGroupLimit (map-side partial
    # top-K) so the merge shuffle carries candidates, not history
    o = load_table(spark, SF_CORRECT, "orders").withColumn("version", F.lit(1))
    ch = o.limit(100).withColumn("version", F.lit(2))
    merged = R.upsert(o, ch, "o_orderkey", "version")
    plan = PL.executed_plan(merged)
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SF_CORRECT, "events")
    salted = R.salted_agg(
        ev,
        "event_type",
        [
            ("n", "count", "event_id"),
            ("max_v", "max", "value"),
            ("users", "collect_set", "user_id"),
        ],
        n_salts=8,
    ).select("event_type", "n", "max_v", F.array_sort("users").alias("users"))
    plain = ev.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.max("value").alias("max_v"),
        F.array_sort(F.collect_set("user_id")).alias("users"),
    )
    got = {r.event_type: (r.n, r.max_v, r.users) for r in salted.collect()}
    want = {r.event_type: (r.n, r.max_v, r.users) for r in plain.collect()}
    assert got == want


def test_salted_agg_two_exchanges_finer_first(spark):
    # phase 1 keys on (key, salt) — a hot key spreads over n_salts
    # reducers; phase 2 merges one shrunk row per (key, salt)
    ev = load_table(spark, SF_CORRECT, "events")
    df = R.salted_agg(ev, "event_type", [("n", "count", "event_id")], n_salts=8)
    plan = PL.executed_plan(df)
    assert plan.count("Exchange hashpartitioning") == 2
    assert "_salt" in plan.split("Exchange hashpartitioning")[1]


def test_compact_small_files_preserves_rows_and_reduces_files(spark, tmp_path):
    """Many tiny files → few right-sized files, content identical."""
    import glob as _glob

    from bensp_suite_spark.operators import layout as L

    path = str(tmp_path / "frag")
    df = spark.range(0, 20000).selectExpr("id", "id % 7 AS k", "CAST(id AS STRING) AS s")
    df.repartition(64).write.mode("overwrite").parquet(path)  # 64 tiny files
    before, after = L.compact_small_files(spark, path, target_file_mb=128, sort_cols=["id"])
    assert before == 64
    assert after < 8  # tiny table compacts to ~1 file at a 128 MB target
    got = spark.read.parquet(path)
    assert got.count() == 20000
    assert got.selectExpr("sum(id) AS t").collect()[0].t == sum(range(20000))
    assert len(_glob.glob(path + "/*.parquet")) == after


def test_compact_preserves_hive_partitioning(spark, tmp_path):
    """Compacting a Hive-partitioned layout must re-emit the key=value
    directories (a flat rewrite would demote partition columns to data
    columns and silently lose PartitionFilters pruning)."""
    import glob as _glob
    import os as _os

    from bensp_suite_spark.operators import layout as L
    from bensp_suite_spark.plans.inspect import executed_plan

    path = str(tmp_path / "part")
    df = spark.range(0, 5000).selectExpr("id", "id % 4 AS bucket")
    L.write_partitioned(df, path, ["bucket"])
    # fragment each partition
    spark.read.parquet(path).repartition(16).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(path + "_frag")
    before, after = L.compact_small_files(spark, path + "_frag", target_file_mb=128)
    assert after < before
    # partition dirs survived
    subdirs = {
        e for e in _os.listdir(path + "_frag") if e.startswith("bucket=")
    }
    assert subdirs == {f"bucket={i}" for i in range(4)}
    got = spark.read.parquet(path + "_frag")
    assert got.count() == 5000
    assert set(got.columns) == {"id", "bucket"}
    # pruning still works post-compaction
    plan = executed_plan(got.filter(F.col("bucket") == 2))
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_compact_recovers_from_crashed_prior_run(spark, tmp_path):
    """Stale ._compact_tmp/_old from a crashed run must not break (or be
    mistaken for) the next compaction; a crash between the two renames
    (table only at backup) is restored at entry."""
    import os as _os
    import shutil as _shutil

    from bensp_suite_spark.operators import layout as L

    path = str(tmp_path / "t")
    df = spark.range(0, 1000).selectExpr("id")
    df.repartition(8).write.mode("overwrite").parquet(path)

    # stale tmp from a crash mid-write + stale old from a crash post-swap
    _os.makedirs(path + "._compact_tmp")
    spark.range(0, 5).write.mode("overwrite").parquet(path + "._compact_old")
    before, after = L.compact_small_files(spark, path, target_file_mb=128)
    assert spark.read.parquet(path).count() == 1000
    assert not _os.path.exists(path + "._compact_tmp")
    assert not _os.path.exists(path + "._compact_old")

    # crash between renames: table vanished, only backup remains
    _shutil.move(path, path + "._compact_old")
    before, after = L.compact_small_files(spark, path, target_file_mb=128)
    assert spark.read.parquet(path).count() == 1000
    assert not _os.path.exists(path + "._compact_old")


def test_zorder_layout_tightens_file_stats(spark, tmp_path):
    """write_zordered must produce files whose parquet min/max envelopes
    are tight in BOTH dimensions: for a 2-D range probe, fewer files
    overlap the probe box than under a hash (unclustered) layout — the
    data-skipping property OPTIMIZE ZORDER BY exists for. Also checks the
    layout is lossless (same row multiset back)."""
    import glob as _glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from bensp_suite_spark.operators import layout as L

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        ((F.col("id") * 2654435761) % 128).alias("y"),
    )
    zpath, hpath = str(tmp_path / "z"), str(tmp_path / "h")
    ranges = L.write_zordered(df, zpath, ["x", "y"], n_files=16)
    assert ranges == [(0, 127), (0, 127)]
    df.repartition(16).write.mode("overwrite").parquet(hpath)

    def overlapping_files(path, probe):
        (x0, x1), (y0, y1) = probe
        hits = total = 0
        for f in _glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins = {"x": None, "y": None}
            maxs = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                for c in range(md.num_columns):
                    col = md.row_group(rg).column(c)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        lo, hi = col.statistics.min, col.statistics.max
                        mins[name] = lo if mins[name] is None else min(mins[name], lo)
                        maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
            total += 1
            if not (maxs["x"] < x0 or mins["x"] > x1 or maxs["y"] < y0 or mins["y"] > y1):
                hits += 1
        return hits, total

    probe = ((0, 31), (0, 31))  # one quadrant-of-a-quadrant box
    z_hits, z_total = overlapping_files(zpath, probe)
    h_hits, h_total = overlapping_files(hpath, probe)
    assert h_hits == h_total  # hash layout: every file overlaps everything
    assert z_hits < z_total / 2, (z_hits, z_total)  # z-order actually prunes

    back = spark.read.parquet(zpath)
    assert back.count() == n
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b


def test_zorder_key_wide_span_matches_sql_oracle(spark):
    """zorder_key must stay bit-exact vs the DuckDB SQL mirror even when
    (hi-lo)*(2^bits-1) exceeds 2^53 — e.g. epoch-microsecond timestamp
    spans. The pre-shift in _span_shift keeps the floor division within
    the double-exact bound on both engines (ADVICE r3: the old double
    division could silently round wrong past span ~1.4e11 at bits=16)."""
    import duckdb
    from pyspark.sql import functions as F

    from bensp_suite_spark.operators import layout as L

    lo, hi = 1_700_000_000_000_000, 1_760_000_000_000_000  # ~2 years in µs
    span = hi - lo
    assert span * ((1 << 16) - 1) >= 1 << 53  # the regime the guard exists for
    n = 4096
    df = spark.range(n).select(
        (F.lit(lo) + (F.col("id") * F.lit(span // n + 7919)) % F.lit(span + 1)).alias("ts_us"),
        (F.col("id") % 1000).alias("v"),
    )
    key = L.zorder_key([F.col("ts_us"), F.col("v")], [(lo, hi), (0, 999)], bits=16)
    got = {
        r["ts_us"]: r["k"]
        for r in df.withColumn("k", key).select("ts_us", "k").collect()
    }
    sql_key = L.zorder_key_sql(["ts_us", "v"], [(lo, hi), (0, 999)], bits=16)
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = {
        int(ts): int(k)
        for ts, k in con.execute(f"SELECT ts_us, {sql_key} AS k FROM t").fetchall()
    }
    assert got == exp


def test_write_with_bloom_carries_filters_and_round_trips(spark, tmp_path):
    """Bloom-filter writes: the footer carries a filter for exactly the
    configured columns (proven via parquet-mr metadata, not inferred from
    file sizes), values round-trip identically, and point lookups on the
    filtered column stay correct."""
    import glob

    df = spark.range(20000).selectExpr(
        "id", "md5(cast(id as string)) AS content_hash", "id % 7 AS grp"
    )
    with_dir = str(tmp_path / "with_bloom")
    plain_dir = str(tmp_path / "plain")
    L.write_with_bloom(df, with_dir, ["content_hash"], ndv=20000)
    df.write.mode("overwrite").parquet(plain_dir)

    part = sorted(glob.glob(f"{with_dir}/part-*.parquet"))[0]
    offs = L.bloom_filter_offsets(spark, part)
    assert offs["content_hash"] > 0          # filter present
    assert offs["id"] == -1 and offs["grp"] == -1  # only where asked
    plain_part = sorted(glob.glob(f"{plain_dir}/part-*.parquet"))[0]
    assert all(v == -1 for v in L.bloom_filter_offsets(spark, plain_part).values())

    back = spark.read.parquet(with_dir)
    assert back.count() == 20000
    probe = df.filter("id = 12345").collect()[0]["content_hash"]
    got = back.filter(F.col("content_hash") == probe).collect()
    assert len(got) == 1 and got[0]["id"] == 12345
    # full value parity with the plain write
    assert back.exceptAll(spark.read.parquet(plain_dir)).count() == 0


def test_load_table_memoizes_lazy_handle_without_persisting(spark):
    """r11: load_table memoizes the LAZY DataFrame per (session, sf_dir,
    table) — one reader construction per session (the DuckDB CREATE VIEW
    analog), but nothing materialized: the handle must carry no storage
    level, so every action still computes from the parquet inputs."""
    from pyspark import StorageLevel

    a = load_table(spark, SF_CORRECT, "orders")
    b = load_table(spark, SF_CORRECT, "orders")
    assert a is b  # memo hit: same lazy handle, no re-construction
    assert a.storageLevel == StorageLevel.NONE  # lazy, never persisted
    # distinct keys stay distinct handles
    c = load_table(spark, SF_CORRECT, "lineitem")
    assert c is not a
