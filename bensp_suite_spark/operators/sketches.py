"""Mergeable cardinality sketches with engine-exact oracles.

KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every value into a
uniform space, keep the k smallest distinct hashes; with t = the k-th
smallest, distinct-count ≈ (k−1)·SPACE/t. The sketch is a bounded set —
mergeable by unioning and re-taking the k smallest — which is what makes
it the 100 TB shape: each partition contributes k values (map-side
combinable), the merge is driver-trivial, and no full distinct shuffle
ever happens. Spark's own approx_count_distinct (HLL++) is the production
default; KMV is the variant whose estimate is a pure deterministic
function of the data, so the SQL oracle reproduces it bit-for-bit — the
property HLL's engine-private hashing can't give a cross-engine check.

The hash is the same md5-derived 32-bit bucket as operators/sampling.py
(DuckDB: ``CAST(('0x' || substr(md5(v),1,8)) AS BIGINT)``) — engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import BUCKET_SPACE, hash_bucket, hash_bucket_sql


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """→ one row (n_hashes, kth_min, distinct_est): the KMV estimate of
    ``count(DISTINCT col)``. When fewer than k distinct hashes exist the
    sketch holds the whole distinct set and the estimate is exact.

    Plan shape: distinct on the 32-bit hash (map-side combinable), then a
    global sort-limit k — Spark plans per-partition top-k + a k-row driver
    merge (TakeOrderedAndProject), never a full sort."""
    sk = (
        df.select(hash_bucket(F.col(col)).alias("h"))
        # NULL keys hash to NULL; a NULL would survive distinct(), occupy a
        # sketch slot (count counts it, max ignores it) and sort first in
        # Spark ASC but last in DuckDB — drop it before it enters the sketch.
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return sk.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("h").alias("kth_min"),
    ).select(
        "n_hashes",
        "kth_min",
        F.round(
            F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
                F.lit(float(k - 1))
                * F.lit(BUCKET_SPACE)
                / F.col("kth_min").cast("double")
            ),
            3,
        ).alias("distinct_est"),
    )


def kmv_distinct_oracle_sql(
    col_sql: str, from_sql: str, k: int = 256
) -> str:
    """DuckDB mirror of :func:`kmv_distinct` (identical arithmetic order)."""
    return f"""
    WITH hashed AS (
      SELECT {hash_bucket_sql(col_sql)} AS h
      FROM {from_sql}
    ), sk AS (
      SELECT DISTINCT h FROM hashed WHERE h IS NOT NULL
      ORDER BY h LIMIT {k}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes,
           MAX(h) AS kth_min,
           ROUND(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE {float(k - 1)!r} * {BUCKET_SPACE!r} / CAST(MAX(h) AS DOUBLE)
                 END, 3) AS distinct_est
    FROM sk
    """


def kmv_merge(sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two raw KMV hash sets (columns ``h``): union-distinct, keep
    the k smallest. sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly —
    the property that lets per-day / per-partition sketches roll up
    without rescanning history."""
    return sketch_a.union(sketch_b).distinct().orderBy("h").limit(k)


def kmv_hashes(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The raw k-smallest distinct hash set (column ``h``) — the mergeable
    form of the sketch, for :func:`kmv_merge`."""
    return (
        df.select(hash_bucket(F.col(col)).alias("h"))
        .filter(F.col("h").isNotNull())  # NULL keys never enter the sketch
        .distinct()
        .orderBy("h")
        .limit(k)
    )
