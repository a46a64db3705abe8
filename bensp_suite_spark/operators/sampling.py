"""Deterministic hash-based sampling for training-data curation.

A 100 TB pipeline can't use ``df.sample()`` for corpus construction: its
membership depends on partition layout and seed plumbing, so a re-run (or a
different cluster size) yields a different corpus. These operators derive
membership from a *content key* — ``bucket(key) < rate · 2³²`` with an
md5-derived uniform bucket — so the sample is a pure function of the data:
reproducible across runs, engines, partitionings and cluster sizes, and
embarrassingly parallel (a scan-time filter, no shuffle, fully pushed into
the row scan).

``resample_to_mix`` implements domain remixing (the Pile / Dolma-style
"source mixing weights" step): given integer relative weights per stratum,
it downsamples every stratum by a deterministic rate so the surviving
corpus matches the target mix exactly at the largest size achievable
WITHOUT upsampling — keep_rate_s = w_s·K/n_s with K = min_s(n_s/w_s).
One count aggregate over the stratum column (map-side combinable) plus the
scan-time filter; nothing else shuffles.

Engine-exact by construction: the bucket is the first 8 md5 hex chars of
the key rendered as decimal (the same derivation DuckDB expresses as
``CAST(('0x' || substr(md5(k),1,8)) AS BIGINT)``), and the rate arithmetic
is plain IEEE-double with a fixed operation order, so the SQL oracles
reproduce membership bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space: first 8 md5 hex chars → uniform on [0, 2^32)
BUCKET_SPACE = float(1 << 32)


def hash_bucket(key: Column) -> Column:
    """Uniform deterministic bucket on [0, 2^32) from any key column."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")


def hash_bucket_sql(key_sql: str) -> str:
    """The DuckDB rendering of :func:`hash_bucket` (engine-exact)."""
    return f"CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 8)) AS BIGINT)"


def hash_sample(df: DataFrame, rate: float, key: str = "doc_id") -> DataFrame:
    """Bernoulli-style sample with deterministic content-keyed membership.

    Scan-time filter — no shuffle, no state, layout-independent. The same
    (key, rate) admits the same rows on any engine or cluster, which is
    what makes downstream training corpora reproducible.
    """
    return df.filter(hash_bucket(F.col(key)) < F.lit(rate * BUCKET_SPACE))


def stratified_sample(
    df: DataFrame, rates: dict[str, float], strat_col: str, key: str = "doc_id"
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps rows with
    bucket(key) < rates[s]·2³². Strata absent from ``rates`` are dropped.
    Still a pure scan-time filter (the rate map is a literal expression)."""
    rate_expr = F.create_map(
        *[x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(r))]
    )[F.col(strat_col)]
    return df.filter(
        rate_expr.isNotNull()
        & (hash_bucket(F.col(key)).cast("double") < rate_expr * F.lit(BUCKET_SPACE))
    )


def mix_rates(
    df: DataFrame, weights: dict[str, int], strat_col: str
) -> DataFrame:
    """→ (stratum, n_offered, keep_rate) for the largest exact-mix
    downsample: K = min_s(n_s / w_s) surviving rows per weight unit,
    keep_rate_s = w_s·K / n_s ≤ 1. Integer weights keep the arithmetic
    engine-exact (one double division, one min, one multiply, one divide
    — fixed order). One count aggregate; the result is dimension-sized."""
    w_expr = F.create_map(
        *[x for s, w in sorted(weights.items()) for x in (F.lit(s), F.lit(w))]
    )[F.col(strat_col)]
    counts = (
        df.select(F.col(strat_col).alias("stratum"), w_expr.alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("stratum", "w")
        .agg(F.count(F.lit(1)).alias("n_offered"))
    )
    k = counts.agg(
        F.min(F.col("n_offered").cast("double") / F.col("w")).alias("k")
    )
    return counts.crossJoin(F.broadcast(k)).select(
        "stratum",
        "n_offered",
        (F.col("w") * F.col("k") / F.col("n_offered").cast("double")).alias(
            "keep_rate"
        ),
    )


def resample_to_mix(
    df: DataFrame, weights: dict[str, int], strat_col: str, key: str = "doc_id"
) -> DataFrame:
    """Downsample ``df`` so strata match the target integer-weight mix at
    the largest achievable size without upsampling. The per-stratum rate
    table is dimension-sized → broadcast join; membership is the same
    deterministic content-keyed filter as :func:`hash_sample`."""
    # prefix the rate frame's columns so an input df that already has a
    # column named stratum / n_offered / keep_rate can't make the join-back
    # select ambiguous (or silently pick the wrong side)
    rates = mix_rates(df, weights, strat_col).select(
        F.col("stratum").alias("__mix_stratum"),
        F.col("keep_rate").alias("__mix_keep_rate"),
    )
    return (
        df.join(
            F.broadcast(rates),
            df[strat_col] == rates["__mix_stratum"],
        )
        .filter(
            hash_bucket(F.col(key)).cast("double")
            < F.col("__mix_keep_rate") * F.lit(BUCKET_SPACE)
        )
        .select(*df.columns)
    )


def assign_split(
    df: DataFrame,
    fractions: dict[str, float],
    content_col: str = "text",
) -> DataFrame:
    """Leakage-aware train/val/test assignment: the split key is the
    NORMALIZED CONTENT hash, not the row id, so byte-duplicate documents
    land in the same split by construction — the train/test contamination
    class that id-keyed splits silently admit. (For near-duplicate-level
    guarantees, key on the cluster canonical id from near-dup resolution
    instead of the raw content hash — same mechanism, stronger key.)

    ``fractions`` maps split name → fraction (must sum to ≤ 1; any
    remainder is unassigned and dropped). Assignment is a pure scan-time
    expression — zero shuffle, reproducible on any engine/layout."""
    # explicit whitespace class: Java-regex \s includes \x0B but RE2's does
    # not, so spelling the class out keeps Spark and the DuckDB mirror
    # hashing vertical-tab texts identically (engine-exact assignment)
    norm = F.md5(
        F.lower(F.regexp_replace(F.trim(F.col(content_col)), "[ \\t\\n\\x0B\\f\\r]+", " "))
    )
    bucket = F.conv(F.substring(norm, 1, 8), 16, 10).cast("long").cast("double")
    expr: Column = F.lit(None).cast("string")
    hi = 0.0
    # deterministic band order: sorted by name so the SQL mirror matches
    for name, frac in sorted(fractions.items()):
        lo, hi = hi, hi + frac
        band = (bucket >= F.lit(lo * BUCKET_SPACE)) & (bucket < F.lit(hi * BUCKET_SPACE))
        expr = F.when(band, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr).filter(F.col("split").isNotNull())


def assign_split_sql(fractions: dict[str, float], content_col: str = "text") -> str:
    """DuckDB CASE-expression mirror of :func:`assign_split` (selects the
    ``split`` column; compose into a wrapping query)."""
    # same explicit whitespace class as assign_split (RE2's \s lacks \x0B)
    norm = f"md5(lower(regexp_replace(trim({content_col}), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))"
    bucket = f"CAST(CAST(('0x' || substr({norm}, 1, 8)) AS BIGINT) AS DOUBLE)"
    cases = []
    hi = 0.0
    for name, frac in sorted(fractions.items()):
        lo, hi = hi, hi + frac
        cases.append(
            f"WHEN {bucket} >= {lo * BUCKET_SPACE!r} AND {bucket} < {hi * BUCKET_SPACE!r} "
            f"THEN '{name}'"
        )
    return "CASE " + " ".join(cases) + " ELSE NULL END"
