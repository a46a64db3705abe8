"""Streaming incremental document dedup — the daily loop at micro-batch
cadence.

Each micro-batch of (doc_id, text) flags against the CURRENT signature
state (distinct normalized content hashes + SimHash fingerprints — the
same tables ``pipelines/daily.py`` and ``daily_cli`` maintain daily),
then appends its survivors' signatures. This is the merge-sink shape of
``dedup_stream.stream_encode_merge`` applied to document dedup: state is
plain partitioned parquet (readable, compactable, shared with the batch
jobs), one directory per committed batch.

Exactly-once: every batch writes its flags and its signature partitions
to ``…/batch_id=N`` directories (self-overwriting on retry), reads ONLY
``batch_id < N`` state partitions, and writes a commit marker LAST — a
replayed batch recomputes against the identical state prefix and
overwrites its own output, so replays are byte-identical and its own
half-appended signatures are never visible to itself.

Cross-batch semantics are the daily loop's: a batch-N doc that exactly
matches a batch-M (M < N) SURVIVOR flags exact_dup — first arrival wins
across the whole stream, exactly as if the batches were days.
"""

from __future__ import annotations

import posixpath as _pp

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup_text import history_signatures, incremental_dedup

#: partition value for the caller-seeded day-0 signatures
SEED_BATCH_ID = -1


def seed_signatures(history: DataFrame, sig_dir: str) -> None:
    """Write the day-0 signature state (the stream's only raw-history
    scan) as the ``batch_id=-1`` partitions the stream builds on. An
    empty history frame seeds an empty-but-schema'd state."""
    h, s = history_signatures(history)
    h.write.mode("overwrite").parquet(
        _pp.join(sig_dir, "hashes", f"batch_id={SEED_BATCH_ID}")
    )
    s.write.mode("overwrite").parquet(
        _pp.join(sig_dir, "sims", f"batch_id={SEED_BATCH_ID}")
    )


def stream_incremental_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    sig_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
) -> None:
    """Run the stream to completion (availableNow): flags land under
    ``out_dir/batch_id=N``; the signature state under ``sig_dir`` ends
    equal to what sequential :func:`pipelines.daily.daily_step` calls over
    the same batches would produce. ``seed_signatures`` must have run
    first (the probe below fails loudly otherwise — silently starting
    from empty state would mark historical duplicates as kept)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def _hpath(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    def _fs(p: str):
        return _hpath(p).getFileSystem(hconf)

    hashes_dir = _pp.join(sig_dir, "hashes")
    sims_dir = _pp.join(sig_dir, "sims")
    commits_dir = _pp.join(checkpoint_dir, "incr_commits")
    _fs(commits_dir).mkdirs(_hpath(commits_dir))
    seed = _pp.join(hashes_dir, f"batch_id={SEED_BATCH_ID}")
    if not _fs(seed).exists(_hpath(seed)):
        raise ValueError(
            f"no seeded signature state at {sig_dir} — call seed_signatures "
            "first (an unseeded stream would silently keep historical dups)"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = _pp.join(commits_dir, str(batch_id))
        if _fs(marker).exists(_hpath(marker)):
            return
        hist_h = (
            spark.read.parquet(hashes_dir)
            .filter(F.col("batch_id") < batch_id)
            .drop("batch_id")
        )
        hist_s = (
            spark.read.parquet(sims_dir)
            .filter(F.col("batch_id") < batch_id)
            .drop("batch_id")
        )
        batch_df = batch_df.persist()
        try:
            flags = incremental_dedup(
                batch_df, max_hamming=max_hamming, history_sig=(hist_h, hist_s)
            ).persist()
            try:
                flags.write.mode("overwrite").parquet(
                    _pp.join(out_dir, f"batch_id={batch_id}")
                )
                survivors = batch_df.join(
                    flags.filter(F.col("is_kept")).select("doc_id"),
                    "doc_id",
                    "left_semi",
                )
                day_h, day_s = history_signatures(survivors)
                day_h.write.mode("overwrite").parquet(
                    _pp.join(hashes_dir, f"batch_id={batch_id}")
                )
                day_s.write.mode("overwrite").parquet(
                    _pp.join(sims_dir, f"batch_id={batch_id}")
                )
            finally:
                flags.unpersist()
        finally:
            batch_df.unpersist()
        mout = _fs(marker).create(_hpath(marker), True)
        try:
            mout.write(bytearray(b"committed"))
        finally:
            mout.close()

    q = (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
