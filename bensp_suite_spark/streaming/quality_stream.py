"""Continuous data-quality monitoring: the expectations engine
(operators/quality_checks) applied per micro-batch — the DLT-expectations
analog for streams.

Each trigger evaluates every row-level check in one pass over the batch
(same single-aggregation compilation as batch mode) and appends one report
row per check, stamped with the batch id and evaluated at ingestion time —
the quality time series a corpus build monitors/alerts on. Uniqueness is
deliberately absent here: per-key uniqueness across an unbounded stream is
the dedup problem (stream_exact_dedup's state), not a per-batch assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality_checks import Check, run_checks


def stream_quality_reports(
    spark: SparkSession,
    stream: DataFrame,
    checks: list[Check],
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the stream (availableNow), appending per-batch check reports:
    (batch_id, check, violations, total, passed)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            run_checks(batch_df, checks)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
