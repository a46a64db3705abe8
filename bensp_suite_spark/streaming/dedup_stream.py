"""Streaming dedup pipeline (SURVEY §7 phase 2).

Reference semantics → Spark Structured Streaming:

- bounded queues + backpressure (T1, queue.c:84-112) → micro-batch triggers
  with ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``;
- the unbounded SHA1 hashtable (T8, encoder.c:1520) → keyed state in
  ``applyInPandasWithState`` partitioned on the digest (RocksDB-backed at
  scale: set ``spark.sql.streaming.stateStore.providerClass`` to the
  RocksDB provider so 100 TB of fingerprints never lives on the heap);
- first-wins + canonical reference across micro-batches (J1+J3): the state
  stores the canonical chunk identity per digest, so a duplicate arriving
  three batches later still resolves its reference — the hard part flagged
  in SURVEY §7;
- ordered emission (T6/O1): ``foreachBatch`` sorts each batch by
  (file_id, l1, l2) before appending; batch ids are monotonic so the
  (batch_id, l1, l2) order is total for a file-ordered source;
- termination (T5, queue_terminate) → ``Trigger.AvailableNow``.

Parameter mapping from ``bin/parsec_stream`` knobs (no sed/rebuild —
runtime conf only):

  chunk window (NWINDOW sed, parsec_stream:254-269) → rabin.NWINDOW const
  fr/dd/comp/rr buffer sizes (:428-472) → arrow maxRecordsPerBatch
  -t stage threads (:350)               → spark.sql.shuffle.partitions
  queue sizes                           → maxFilesPerTrigger
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..dedup.pipeline import chunk_files

DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("c_file_id", LongType()),
        StructField("c_l1", LongType()),
        StructField("c_l2", LongType()),
    ]
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("sha1", StringType()),
        StructField("file_id", LongType()),
        StructField("l1", LongType()),
        StructField("l2", LongType()),
        StructField("is_last_l2", BooleanType()),
        StructField("size", LongType()),
        StructField("data", BinaryType()),
        StructField("is_dup", BooleanType()),
        StructField("canonical_file_id", LongType()),
        StructField("canonical_l1", LongType()),
        StructField("canonical_l2", LongType()),
    ]
)


def _dedup_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """First-wins dedup with canonical reference, keyed on sha1.

    The reference's hashtable_search-or-insert (encoder.c:666-703) with the
    per-bucket mutex replaced by shuffle partitioning: all chunks with one
    digest land in this group, in any order WITHIN a batch — so rows are
    sorted by (file_id, l1, l2) to keep the winner deterministic; across
    batches, the state's canonical entry wins (arrival order, exactly like
    the C pipeline)."""
    sha = key[0]
    if state.exists:
        c_file, c_l1, c_l2 = state.get
        have_canonical = True
    else:
        have_canonical = False
        c_file = c_l1 = c_l2 = None
    for pdf in pdfs:
        pdf = pdf.sort_values(["file_id", "l1", "l2"]).reset_index(drop=True)
        is_dup = []
        canon = []
        for _i, row in pdf.iterrows():
            if not have_canonical:
                c_file, c_l1, c_l2 = int(row.file_id), int(row.l1), int(row.l2)
                have_canonical = True
                is_dup.append(False)
            else:
                is_dup.append(True)
            canon.append((c_file, c_l1, c_l2))
        out = pdf[["file_id", "l1", "l2", "is_last_l2", "size", "data"]].copy()
        out.insert(0, "sha1", sha)
        out["is_dup"] = is_dup
        out["canonical_file_id"] = [c[0] for c in canon]
        out["canonical_l1"] = [c[1] for c in canon]
        out["canonical_l2"] = [c[2] for c in canon]
        yield out
    state.update((c_file, c_l1, c_l2))


def streaming_deduplicate(chunks: DataFrame) -> DataFrame:
    """Apply cross-batch first-wins dedup state to a streaming chunk frame."""
    from ..session import ensure_worker_imports as _ewi

    _ewi(chunks.sparkSession)
    hashed = chunks.withColumn("sha1", F.sha1(F.col("data")))
    return hashed.groupBy("sha1").applyInPandasWithState(
        _dedup_state_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_encode(
    spark: SparkSession,
    files_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    await_termination: bool = True,
):
    """Run the streaming encode: chunk → stateful dedup → ordered append.

    ``files_stream`` is a streaming DataFrame with (file_id, content) — e.g.
    a parquet readStream with maxFilesPerTrigger, or binaryFile readStream
    mapped to this schema.
    """
    chunks = chunk_files(files_stream)
    flagged = streaming_deduplicate(chunks).observe(
        # T9/A8 — per-trigger counters (the cnt_enqueue/cnt_dequeue and
        # per-item tracing surface, ferret-pthreads.c:325-326,
        # new_dedup.c:1382-1418): observed metrics land in each
        # StreamingQueryProgress for the listener to collect.
        "dedup_metrics",
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup"),
        F.sum("size").alias("bytes"),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # T6/O1: intra-batch total order restore before the sink, with the
        # micro-batch id carried so (batch_id, file_id, l1, l2) is a total
        # order across the run.
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .orderBy("file_id", "l1", "l2")
            .write.mode("append")
            .parquet(out_dir)
        )

    q = (
        flagged.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def windowed_event_metrics(
    events_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """A5/A6 streaming variant: event-time tumbling-window throughput with
    a watermark for late data (T7 — the capability the reference lacks;
    its windows are processing-time only, new_dedup.c:1480-1496)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


class ThroughputListener:
    """StreamingQueryListener capturing per-trigger rows/s — the
    throughput.dat analog (S9, new_dedup.c:142-242). Collected rows land in
    a plain list; tests/bench turn them into a metrics DataFrame."""

    def __init__(self) -> None:
        self.progress: list[dict[str, Any]] = []

    def attach(self, spark: SparkSession):
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                entry = {
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "input_rows_per_second": p.inputRowsPerSecond,
                    "processed_rows_per_second": p.processedRowsPerSecond,
                    "duration_ms": p.durationMs.get("triggerExecution"),
                }
                try:
                    entry["observed"] = dict(p.observedMetrics.get("dedup_metrics").asDict())
                except Exception:
                    entry["observed"] = None
                outer.progress.append(entry)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        listener = _L()
        spark.streams.addListener(listener)
        return listener
