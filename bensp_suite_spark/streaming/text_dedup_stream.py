"""Streaming document dedup — the LLM-data generalization of the streaming
chunk dedup (T8): documents arrive as a stream, first occurrence of each
normalized content hash wins, duplicates are dropped across micro-batches.

`dropDuplicates` on a streaming DataFrame is exactly the reference's
unbounded fingerprint hashtable (encoder.c:1520) as managed keyed state:
partitioned on the digest, RocksDB-backed at scale, checkpoint-durable
(the same recovery semantics tests/test_streaming.py proves for chunks).
Without a watermark the state is unbounded — correct for dedup, where a
duplicate must be caught no matter how late it arrives."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hashed_docs(docs: DataFrame, normalized: bool = True) -> DataFrame:
    """(doc_id, content_hash) with the same normalization as the batch
    exact_dedup (operators/dedup_text.py) — works on batch or streaming
    DataFrames."""
    t = F.col("text")
    if normalized:
        t = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    return docs.select("doc_id", F.md5(t).alias("content_hash"))


def stream_exact_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Run the streaming first-wins document dedup to a parquet sink
    (availableNow: drains whatever is in the source, T5)."""
    winners = hashed_docs(docs_stream).dropDuplicates(["content_hash"])
    (
        winners.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
