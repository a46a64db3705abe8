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

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints via fn globals
from pyspark.sql import Column, DataFrame
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
        # NULL keys hash to NULL; a NULL would survive distinct(), occupy a
        # sketch slot (count counts it, max ignores it) and sort first in
        # Spark ASC but last in DuckDB — drop it before it enters the
        # sketch. Filter the INPUT column, not the derived hash: h is NULL
        # iff the key is NULL, and a predicate on the derived expression
        # makes the scan evaluate md5 twice per row (measured +60% on the
        # lineitem-sized sketch — the one drift flag of round 6).
        df.filter(F.col(col).isNotNull())
        .select(hash_bucket(F.col(col)).alias("h"))
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
    WITH sk AS (
      SELECT DISTINCT {hash_bucket_sql(col_sql)} AS h
      FROM {from_sql} WHERE {col_sql} IS NOT NULL
      ORDER BY h LIMIT {k}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes,
           MAX(h) AS kth_min,
           ROUND(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE {float(k - 1)!r} * {BUCKET_SPACE!r} / CAST(MAX(h) AS DOUBLE)
                 END, 3) AS distinct_est
    FROM sk
    """


def _bloom_pos(col: Column, i: int, m: int) -> Column:
    """Deterministic bit position i for a value: md5-derived 32-bit bucket
    of ``value#i`` mod m — the same engine-exact derivation family as
    hash_bucket, so DuckDB reproduces every position bit-for-bit."""
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"#{i}"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % m


def _bloom_pos_sql(col_sql: str, i: int, m: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({col_sql} AS VARCHAR) || '#{i}'), 1, 8)) "
        f"AS BIGINT) % {m}"
    )


def bloom_bits(df: DataFrame, col: str, m: int = 1 << 20, k: int = 4) -> DataFrame:
    """Bloom-filter membership sketch as a DISTINCT bit-position table
    (column ``bit``): k md5-derived positions per value over an m-bit
    space. Mergeable by union-distinct (the property KMV shares); bounded
    at m rows no matter the corpus.

    The 100 TB use: a pre-filter in front of the exact anti-join of
    incremental dedup — a new document whose k bits are not ALL present
    cannot be in history (zero false negatives), so only the ~fpp
    fraction of genuinely-new docs plus the true dups ever reach the
    expensive join. Size by the standard rule m ≈ -n·ln(fpp)/ln(2)²,
    k ≈ (m/n)·ln(2). This positions-table form is the engine-exact
    teaching/oracle shape; in production pack the positions into a
    bitset broadcast (or use Spark's built-in ``df.stat.bloomFilter``,
    whose private hashing has no cross-engine oracle)."""
    positions = F.explode(
        F.array(*[_bloom_pos(F.col(col), i, m) for i in range(k)])
    ).alias("bit")
    return (
        df.select(positions)
        .filter(F.col("bit").isNotNull())  # NULL keys never set bits
        .distinct()
    )


def bloom_maybe_contains(
    df: DataFrame, col: str, bits: DataFrame, m: int = 1 << 20, k: int = 4
) -> DataFrame:
    """→ ``df`` + boolean ``bloom_maybe``: true iff ALL k of the value's
    bit positions are present in ``bits`` (built with the same m and k).
    False ⇒ definitely not in the sketched set; true ⇒ present or a
    false positive at the configured fpp.

    Plan shape: k broadcast left joins against the (distinct) bit table —
    each row matches at most one bit row per join, so there is NO fanout,
    no per-row grouping, and duplicate input rows pass through untouched;
    the membership test is the AND of the k null-checks. The joins carry
    only the bit longs — never the document payload."""
    out = df
    hit_cols = []
    for i in range(k):
        b = bits.select(F.col("bit").alias(f"__bloom_b{i}"))
        out = (
            out.join(
                F.broadcast(b),
                _bloom_pos(F.col(col), i, m) == F.col(f"__bloom_b{i}"),
                "left",
            )
            .withColumn(f"__bloom_hit{i}", F.col(f"__bloom_b{i}").isNotNull())
            .drop(f"__bloom_b{i}")
        )
        hit_cols.append(f"__bloom_hit{i}")
    maybe = hit_cols[0]
    expr = F.col(maybe)
    for c in hit_cols[1:]:
        expr = expr & F.col(c)
    return out.withColumn("bloom_maybe", expr).drop(*hit_cols)


def bloom_pack(bits: DataFrame, m: int) -> bytes:
    """Pack the bit-position table into a dense m-bit bitset (m/8 bytes)
    — the PRODUCTION shape of the sketch: a 2³⁰-bit filter is 128 MB, a
    broadcastable constant, so the membership test becomes a scan-local
    vectorized pass with ZERO joins. The collect here is bounded by m
    rows (it's an index-build step, not a per-query one) — same class of
    guarded driver collect as the PQ codebooks."""
    arr = np.zeros(m, dtype=np.uint8)
    pos = np.fromiter(
        (r["bit"] for r in bits.collect()), dtype=np.int64
    )
    if len(pos):
        arr[pos] = 1
    return np.packbits(arr).tobytes()


def bloom_fill_ratio_packed(packed: bytes, m: int) -> float:
    """Fraction of set bits in a packed bitset — the health signal for a
    long-lived prefilter: fill near 1 means the bloom has saturated into
    a no-op scan tax (still correct — false positives resolve in the
    exact join — just useless) and should be re-sized at the next
    rebuild (``dedup_text.sized_bloom_m``)."""
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)
    x = int(lut[np.frombuffer(packed, dtype=np.uint8)].sum(dtype=np.int64))
    return x / m


def bloom_cardinality_packed(packed: bytes, m: int, k: int) -> float:
    """Estimated number of distinct keys inserted into a packed bitset —
    the standard fill-ratio inversion n ≈ -(m/k)·ln(1 − X/m) with X = set
    bits. A driver-local numpy popcount (microseconds even at 2³⁰ bits),
    so a loop can make SIZE-AWARE decisions (e.g. skip the probe below
    the gate where the exact join is broadcast-cheap anyway) from the
    bloom alone — no extra state reads, replay-safe because the bitset
    itself is OR-advanced idempotently. Returns +inf on a saturated
    bitset (every bit set ⇒ the estimate diverges; treat as 'huge')."""
    import math

    # per-byte popcount LUT — O(bytes) with no 8× unpacked intermediate
    # (a 2³⁰-bit filter is 128 MB; unpackbits would materialize 1 GB)
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)
    x = int(lut[np.frombuffer(packed, dtype=np.uint8)].sum(dtype=np.int64))
    if x >= m:
        return float("inf")
    return -(m / k) * math.log1p(-x / m)


def bloom_merge_packed(*packed: bytes) -> bytes:
    """Union of packed bitsets (same m): bitwise OR — the property that
    lets a daily loop ADVANCE its history bloom by OR-ing in each day's
    survivor bits instead of repacking the whole bit table. OR is
    idempotent, so a replayed advance is byte-identical (the same
    exactly-once-friendly shape as the signature-table appends)."""
    out = np.frombuffer(packed[0], dtype=np.uint8).copy()
    for p in packed[1:]:
        out |= np.frombuffer(p, dtype=np.uint8)
    return out.tobytes()


def bloom_maybe_contains_packed(
    df: DataFrame, col: str, packed: bytes, m: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Join-free membership test against a packed bitset. The k bit
    positions are computed JVM-SIDE with the identical :func:`_bloom_pos`
    column expressions the join form uses (they ride the scan's projection
    — no Python hashing anywhere), and an Arrow-batched pandas UDF does
    one numpy bitset gather over the whole position batch:
    ``bitset[pos >> 3] >> (7 - (pos & 7))`` on (rows × k) arrays, AND
    across k — zero per-row Python work. Same contract as
    :func:`bloom_maybe_contains` (NULL key → False); use this form when
    the bit table rides to executors as a broadcast constant instead of a
    join side (a 2³⁰-bit filter is a 128 MB closure constant)."""
    from pyspark.sql.types import BooleanType

    bitset = np.frombuffer(packed, dtype=np.uint8)

    @F.pandas_udf(BooleanType())
    def _gather(pos: pd.Series) -> pd.Series:
        out = np.zeros(len(pos), dtype=bool)
        valid = pos.notna().to_numpy()
        if valid.any():
            p = np.stack(pos[valid].to_numpy()).astype(np.int64)  # (n, k)
            bits = (bitset[p >> 3] >> (7 - (p & 7))) & 1
            out[valid] = bits.all(axis=1)
        return pd.Series(out)

    positions = F.when(
        F.col(col).isNotNull(),
        F.array(*[_bloom_pos(F.col(col), i, m) for i in range(k)]),
    )
    return df.withColumn("bloom_maybe", _gather(positions))


def bloom_oracle_sql(
    hist_col_sql: str,
    hist_from_sql: str,
    cand_key_sql: str,
    cand_val_sql: str,
    cand_from_sql: str,
    m: int = 1 << 20,
    k: int = 4,
) -> str:
    """DuckDB mirror: → (key, bloom_maybe) per candidate row."""
    hist_pos = " UNION ".join(
        f"SELECT DISTINCT {_bloom_pos_sql(hist_col_sql, i, m)} AS bit FROM {hist_from_sql}"
        for i in range(k)
    )
    cand_pos = " UNION ALL ".join(
        f"SELECT {cand_key_sql} AS key, {_bloom_pos_sql(cand_val_sql, i, m)} AS bit "
        f"FROM {cand_from_sql}"
        for i in range(k)
    )
    return f"""
    WITH bits AS ({hist_pos}),
    cpos AS ({cand_pos}),
    hits AS (
      SELECT c.key, COUNT(*) AS n FROM cpos c JOIN bits b USING (bit)
      GROUP BY c.key
    )
    SELECT key, COALESCE(n, 0) = {k} AS bloom_maybe
    FROM (SELECT DISTINCT key FROM cpos) all_keys LEFT JOIN hits USING (key)
    """


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): d hash rows × w counter
# columns; est(v) = min over rows of counter[i][h_i(v)]. One-sided error
# (never an undercount; overcount ≤ 2N/w with prob 1-(1/2)^d), mergeable by
# CELL-WISE SUM — the heavy-hitter structure whose state is a fixed d×w
# grid no matter the corpus, which is what a 100 TB token-frequency pass
# wants (exact counts need a full token shuffle; the sketch is one
# map-side-combinable aggregate into ≤ d·w cells). Same deterministic
# md5 position family as the Bloom/KMV operators → engine-exact oracle.
# ---------------------------------------------------------------------------


def cms_build(df: DataFrame, col: str, w: int = 1024, d: int = 4) -> DataFrame:
    """→ the sketch as (row, col, cnt) cells (≤ d·w rows; absent cell =
    0). One explode (d rows per value) + one grid-keyed aggregate."""
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"), _bloom_pos(F.col(col), i, w).alias("col")
                )
                for i in range(d)
            ]
        )
    ).alias("c")
    return (
        df.filter(F.col(col).isNotNull())
        .select(cell)
        .groupBy("c.row", "c.col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    df: DataFrame, col: str, cms: DataFrame, w: int = 1024, d: int = 4
) -> DataFrame:
    """→ ``df`` + ``cms_est``: min over the d probed cells (missing cell
    = 0). d fanout-free broadcast joins against the ≤ d·w-cell grid —
    the same join-free-per-row shape as the Bloom test."""
    out = df
    cnt_cols = []
    for i in range(d):
        c = cms.filter(F.col("row") == i).select(
            F.col("col").alias(f"__cms_c{i}"), F.col("cnt").alias(f"__cms_n{i}")
        )
        out = out.join(
            F.broadcast(c),
            _bloom_pos(F.col(col), i, w) == F.col(f"__cms_c{i}"),
            "left",
        ).drop(f"__cms_c{i}")
        cnt_cols.append(f"__cms_n{i}")
    est = F.least(*[F.coalesce(F.col(c), F.lit(0)) for c in cnt_cols])
    return out.withColumn("cms_est", est).drop(*cnt_cols)


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """sketch(A ∪ B) == cell-wise sum of sketch(A), sketch(B) — exact, the
    property that lets per-day / per-partition sketches roll up."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_oracle_sql(
    val_sql: str, from_sql: str, probe_key_sql: str, probe_val_sql: str,
    probe_from_sql: str, w: int = 1024, d: int = 4,
) -> str:
    """DuckDB mirror: → (key, cms_est) per probe row."""
    cells = " UNION ALL ".join(
        f"SELECT {i} AS row, {_bloom_pos_sql(val_sql, i, w)} AS col "
        f"FROM {from_sql} WHERE {val_sql} IS NOT NULL"
        for i in range(d)
    )
    probes = " UNION ALL ".join(
        f"SELECT {probe_key_sql} AS key, {i} AS row, "
        f"{_bloom_pos_sql(probe_val_sql, i, w)} AS col FROM {probe_from_sql}"
        for i in range(d)
    )
    return f"""
    WITH cms AS (
      SELECT row, col, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({cells}) GROUP BY row, col
    ),
    probes AS ({probes}),
    looked AS (
      SELECT p.key, p.row, COALESCE(c.cnt, 0) AS cnt
      FROM probes p LEFT JOIN cms c USING (row, col)
    )
    SELECT key, MIN(cnt) AS cms_est FROM looked GROUP BY key
    """


def _kmv_est(sk: DataFrame, name: str, k: int) -> DataFrame:
    """One-row frame: the KMV distinct estimate of a raw hash sketch
    (unrounded double — callers round at output)."""
    return sk.agg(
        F.count(F.lit(1)).alias("__n"), F.max("h").alias("__kth")
    ).select(
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(BUCKET_SPACE) / F.col("__kth").cast("double")
        )
        .alias(name)
    )


def kmv_jaccard(
    a: DataFrame, b: DataFrame, col_a: str, col_b: str, k: int = 256
) -> DataFrame:
    """Cross-corpus OVERLAP estimation from two bounded sketches — the
    "how much of crawl B have we already got in corpus A" question at
    100 TB, answered without ever joining the corpora: sketch each side
    (k hashes), merge (union-distinct, keep k smallest — exact by the
    KMV merge property), and apply inclusion-exclusion on the three
    distinct estimates. → one row (est_a, est_b, est_union, jaccard_est).

    State is 3k longs no matter the corpus sizes; the two sketch builds
    are the only data scans and are map-side combinable. Deterministic
    md5 hashing makes every number engine-exact in DuckDB — the same
    property-over-HLL tradeoff as kmv_distinct."""
    sa = kmv_hashes(a, col_a, k)
    sb = kmv_hashes(b, col_b, k)
    su = kmv_merge(sa, sb, k)
    ea = _kmv_est(sa, "__ea", k)
    eb = _kmv_est(sb, "__eb", k)
    eu = _kmv_est(su, "__eu", k)
    j = F.greatest(
        F.col("__ea") + F.col("__eb") - F.col("__eu"), F.lit(0.0)
    ) / F.col("__eu")
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            F.round("__ea", 3).alias("est_a"),
            F.round("__eb", 3).alias("est_b"),
            F.round("__eu", 3).alias("est_union"),
            F.round(j, 3).alias("jaccard_est"),
        )
    )


def kmv_jaccard_oracle_sql(
    col_a_sql: str, from_a_sql: str, col_b_sql: str, from_b_sql: str, k: int = 256
) -> str:
    """DuckDB mirror of :func:`kmv_jaccard` (identical arithmetic order)."""

    def sk(col_sql: str, from_sql: str) -> str:
        return (
            f"SELECT DISTINCT {hash_bucket_sql(col_sql)} AS h FROM {from_sql} "
            f"WHERE {col_sql} IS NOT NULL ORDER BY h LIMIT {k}"
        )

    est = (
        f"CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE) "
        f"ELSE {float(k - 1)!r} * {BUCKET_SPACE!r} / CAST(MAX(h) AS DOUBLE) END"
    )
    return f"""
    WITH ska AS ({sk(col_a_sql, from_a_sql)}),
    skb AS ({sk(col_b_sql, from_b_sql)}),
    sku AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
            ORDER BY h LIMIT {k}),
    ea AS (SELECT {est} AS e FROM ska),
    eb AS (SELECT {est} AS e FROM skb),
    eu AS (SELECT {est} AS e FROM sku)
    SELECT ROUND(ea.e, 3) AS est_a, ROUND(eb.e, 3) AS est_b,
           ROUND(eu.e, 3) AS est_union,
           ROUND(GREATEST(ea.e + eb.e - eu.e, 0.0) / eu.e, 3) AS jaccard_est
    FROM ea, eb, eu
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
        df.filter(F.col(col).isNotNull())  # NULL keys never enter the sketch
        .select(hash_bucket(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
