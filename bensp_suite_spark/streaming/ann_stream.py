"""Streaming similarity search over embedding columns: query vectors
arrive on a stream and rank against a static corpus — the generic
(non-ferret) version of streaming vector search, for the ANN family in
operators/similarity.py.

Pattern: static side loaded once (corpus + its LSH index, S8); each
micro-batch runs the batch ANN path via ``foreachBatch`` (stream-static
join + per-batch top-K — window ranks are not allowed in streaming append
mode, so the rank runs inside the batch function, which is exactly the
reference's per-query rank stage granularity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _write_batch(df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Idempotent micro-batch sink: each batch owns the partition
    directory ``out_dir/batch_id=<id>`` and OVERWRITES it, so a
    micro-batch retried after a sink-side failure replaces its own
    half-written output instead of appending duplicates (plain
    mode("append") would double rows on retry and break the
    "drained result equals the batch golden verbatim" contract).
    Readers see batch_id as a discovered partition column — drop it."""
    df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")


def read_sink(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read a `_write_batch` sink back without the batch_id partition
    column (arrival batching is an execution detail, not a result)."""
    return spark.read.parquet(out_dir).drop("batch_id")


def stream_ann_topk(
    spark: SparkSession,
    query_stream: DataFrame,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    mode: str = "bruteforce",
    await_termination: bool = True,
):
    """Rank each arriving query vector against ``corpus``; append
    (query_id, neighbor_id, rank, cosine) to a parquet sink. ``mode``:
    "bruteforce" (exact) or "lsh" (bucketed candidates)."""
    from ..operators import similarity as SIM

    fn = SIM.cosine_topk_bruteforce if mode == "bruteforce" else SIM.lsh_ann_topk

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _write_batch(fn(batch_df, corpus, k=k), out_dir, batch_id)

    q = (
        query_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_snippet_match(
    spark: SparkSession,
    snippet_stream: DataFrame,
    corpus_landmarks: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 1,
    min_votes: int = 2,
    await_termination: bool = True,
):
    """Query-by-audio-snippet over a STREAM of snippets against a static
    landmark index (multimodal/audio_landmarks.snippet_match per
    micro-batch — the live "what is playing" service shape): landmark
    extraction is stateless per snippet, the hash join + offset vote +
    top-k need only that snippet's landmarks, so per-batch results are
    exact regardless of trigger sizing. Appends
    (query_id, media_id, offset_frames, votes, rank) to a parquet sink."""
    from ..multimodal.audio_landmarks import snippet_match

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _write_batch(
            snippet_match(batch_df, corpus_landmarks, k=k, min_votes=min_votes),
            out_dir,
            batch_id,
        )

    q = (
        snippet_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_routed_pq_topk(
    spark: SparkSession,
    query_stream: DataFrame,
    corpus: DataFrame,
    index,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    n_probe: int = 2,
    ef_search: int = 32,
    await_termination: bool = True,
):
    """Streaming probe of a PREBUILT PQ-compressed routed index
    (graph_ann.load_nsw_routed_pq_index) — the live-query shape of the
    DiskANN rung: each micro-batch routes its query vectors to n_probe
    cells, ADC-beams the code-only shards, and exact-reranks from the
    static raw corpus; per-batch results are exact regardless of trigger
    sizing, so the drained set equals the batch probe."""
    from ..operators.graph_ann import nsw_routed_pq_ann_topk

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _write_batch(
            nsw_routed_pq_ann_topk(
                batch_df, corpus, index, k=k, n_probe=n_probe,
                ef_search=ef_search,
            ),
            out_dir,
            batch_id,
        )

    q = (
        query_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_nsw_topk(
    spark: SparkSession,
    query_stream: DataFrame,
    corpus: DataFrame,
    index,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    ef_search: int = 16,
    await_termination: bool = True,
):
    """Streaming graph-ANN probe: query vectors arrive on a stream and
    beam-search a PREBUILT sharded-NSW index (graph_ann.load_nsw_index)
    per micro-batch — the build was paid offline, each batch pays only
    the beams + the exact re-rank, so the drained result set equals the
    batch probe regardless of trigger sizing."""
    from ..operators.graph_ann import nsw_ann_topk

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _write_batch(
            nsw_ann_topk(batch_df, corpus, k=k, ef_search=ef_search, index=index),
            out_dir,
            batch_id,
        )

    q = (
        query_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
