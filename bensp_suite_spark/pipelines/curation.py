"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, as ONE declarative DataFrame program.

    quality filter → exact dedup → benchmark decontamination → packing

Each stage exists standalone (text_gopher_quality / dedup_exact_text /
text_decontaminate / pack_context_windows declared queries); this module
proves they COMPOSE — one logical plan end to end, so Catalyst sees the
whole program: the token explosion for quality stats and the gram
explosion for decontamination both prune to only surviving docs, and the
final packing window runs over the already-filtered stream.

Scale shape (the point of composing declaratively instead of
materializing between stages): the document TEXT never shuffles — it is
scanned once per consuming stage and reduced in place. What does shuffle:
(doc, token, count) partial-aggregated pairs for quality stats, 16-byte
content hashes for dedup, and doc_id keys for the survivor joins;
decontamination's corpus side shuffles nothing (benchmark grams
broadcast), and packing is one source-partitioned window over the
surviving (doc_id, n_tokens) metadata. No intermediate writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# quality-rule thresholds (shared with the text_gopher_quality query)
MIN_WORDS = 30
MIN_UNIQUE_RATIO = 0.5
MAX_TOP_TOKEN_FRAC = 0.15
NGRAM_N = 4
WINDOW_TOKENS = 8192


def _tokens(col: F.Column = None) -> F.Column:
    c = F.col("text") if col is None else col
    return F.split(F.regexp_replace(F.trim(c), r"\s+", " "), " ")


def quality_keep(docs: DataFrame) -> DataFrame:
    """doc_id rows passing the Gopher-style keep rule, with n_tokens."""
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    per_token = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_token.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        (F.count(F.lit(1)).cast("double") / F.sum("cnt")).alias("unique_ratio"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top_token_frac"),
    )
    return stats.filter(
        (F.col("n_tokens") >= MIN_WORDS)
        & (F.col("unique_ratio") >= MIN_UNIQUE_RATIO)
        & (F.col("top_token_frac") <= MAX_TOP_TOKEN_FRAC)
    ).select("doc_id", "n_tokens")


def dedup_winners(docs: DataFrame) -> DataFrame:
    """doc_id rows that are the first occurrence of their normalized hash."""
    t = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    hashed = docs.select("doc_id", F.md5(t).alias("content_hash"))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )


def contaminated(docs: DataFrame, bench_source: str, n: int = NGRAM_N) -> DataFrame:
    """doc_id rows (outside the benchmark slice) sharing any n-gram with it."""
    w = _tokens()
    grams = (
        docs.select("doc_id", "source", w.alias("w"))
        .filter(F.size("w") >= n)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - n),
                    lambda i: F.array_join(F.slice("w", i + 1, n), " "),
                )
            ).alias("gram"),
        )
    )
    bench = grams.filter(F.col("source") == bench_source).select("gram").distinct()
    return (
        grams.filter(F.col("source") != bench_source)
        .join(F.broadcast(bench), "gram")
        .select("doc_id")
        .distinct()
    )


def curate_corpus(
    docs: DataFrame, bench_source: str = "src0", window_tokens: int = WINDOW_TOKENS
) -> DataFrame:
    """The composed pipeline. Returns surviving docs with their packed
    context-window assignment: (doc_id, source, n_tokens, start_offset,
    window_id). Benchmark-slice docs are excluded from the output (they
    are eval data, not training data)."""
    kept = quality_keep(docs)
    winners = dedup_winners(docs)
    dirty = contaminated(docs, bench_source)
    survivors = (
        docs.select("doc_id", "source")
        .filter(F.col("source") != bench_source)
        .join(kept, "doc_id")
        .join(winners, "doc_id", "left_semi")
        .join(dirty, "doc_id", "left_anti")
    )
    win = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = survivors.withColumn(
        "start_offset", F.sum("n_tokens").over(win) - F.col("n_tokens")
    )
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / window_tokens).cast("bigint").alias("window_id"),
    )
