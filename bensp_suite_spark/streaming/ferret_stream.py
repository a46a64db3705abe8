"""Streaming ferret: a continuous stream of query images ranked against a
static corpus (the reference's actual operating mode — images flow through
load→seg→extract→vec→rank→out thread stages, ferret-pthreads.c:894-948).

Spark mapping: the corpus (and its LSH index) is the STATIC side, loaded
once; query images arrive on a stream (binaryFile or parquet readStream
with maxFilesPerTrigger = the load-stage queue depth T1); each micro-batch
runs the batch query path via ``foreachBatch`` — stream-static joins with a
per-batch top-K, the standard Spark pattern for "probe a fixed index with
a stream".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ferret.pipeline import ferret_topk


def stream_similarity_search(
    spark: SparkSession,
    query_stream: DataFrame,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    top_k: int = 10,
    dim: int = 14,
    mode: str = "exhaustive",
    await_termination: bool = True,
):
    """query_stream: streaming DataFrame of vecsets (image_id, name,
    regions) — e.g. images_to_vecsets over a binaryFile readStream.
    Results append to ``out_dir`` parquet with the micro-batch id."""
    from pyspark.sql import functions as F

    corpus = corpus.cache()  # static side: scan once, reuse per trigger

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        result = ferret_topk(batch_df, corpus, top_k=top_k, dim=dim, mode=mode)
        (
            result.withColumn("batch_id", F.lit(batch_id))
            .orderBy("q_image_id", "rank")  # T6 ordered emission
            .write.mode("append")
            .parquet(out_dir)
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
