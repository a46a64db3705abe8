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
        fn(batch_df, corpus, k=k).write.mode("append").parquet(out_dir)

    q = (
        query_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
