"""Deterministic dedup-pipeline inputs (FIXTURES.md §2).

Two generators:

- ``docs_from_documents``: derives per-file binary content from the
  driver's ``documents`` table (deterministic, sf-scaled) — used by the
  declared query so the correctness input is driver data, not ours.
- ``synthetic_docs``: block-pool generator mirroring the reference's
  duplication-controlled text inputs (tools/create_txt_files.c:37-56):
  each file concatenates blocks drawn from a small seeded pool, so the
  expected duplicate-chunk ratio is controllable.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

FILES_SCHEMA = StructType(
    [StructField("file_id", LongType()), StructField("content", BinaryType())]
)


# One persisted fixture per (session, sf_dir, size): the three cdc_* declared
# queries all start from the same 80 MB generated input — sharing one
# materialization instead of three is worth ~2-3 s each in any run that
# executes the family (bench, driver correctness pass).
_FIXTURE_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def docs_from_documents(spark: SparkSession, sf_dir: str, target_bytes: int = 16384) -> DataFrame:
    """One binary file per document row: the text tiled to ~target_bytes.

    Tiling creates genuine intra/inter-file duplicate chunks (documents
    share vocabulary), exercising the dedup path on driver-owned data.
    Cached + persisted per (session, sf_dir): deterministic content, so
    reuse is safe.
    """
    key = (spark.sparkContext.applicationId, sf_dir, target_bytes)
    cached = _FIXTURE_CACHE.get(key)
    if cached is not None:
        return cached
    from ..session import ensure_worker_imports as _ewi

    _ewi(spark)
    from ..tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("file_id"), "text"
    )
    # The documents table is often a single parquet file → 1 input split, and
    # mapInPandas preserves partitioning — without an explicit spread the whole
    # tile+chunk+hash pipeline would run on ONE core. Shuffling the tiny text
    # rows is ~free; the generated binary content is what's expensive.
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = []
            for text in pdf["text"]:
                blob = (text + " ").encode("utf-8")
                reps = max(1, -(-target_bytes // max(1, len(blob))))
                contents.append((blob * reps)[:target_bytes])
            yield pd.DataFrame({"file_id": pdf["file_id"], "content": contents})

    out = docs.mapInPandas(gen, FILES_SCHEMA).persist()
    out.count()
    _FIXTURE_CACHE[key] = out
    return out


@lru_cache(maxsize=4)
def _block_pool(seed: int, pool_size: int, block_min: int, block_max: int) -> list[bytes]:
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, size=int(rng.integers(block_min, block_max + 1)), dtype=np.uint8).tobytes()
        for _ in range(pool_size)
    ]


def synthetic_docs(
    spark: SparkSession,
    n_files: int = 64,
    file_bytes: int = 65536,
    pool_size: int = 48,
    seed: int = 42,
    block_min: int = 2048,
    block_max: int = 8192,
) -> DataFrame:
    """Distributed generation: pool built once per executor (cached),
    per-file RNG seeded by (seed, file_id) — pure function of its args."""
    from ..session import ensure_worker_imports as _ewi

    _ewi(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pool = _block_pool(seed, pool_size, block_min, block_max)
        for pdf in batches:
            contents = []
            for fid in pdf["id"]:
                rng = np.random.default_rng((seed << 20) ^ int(fid))
                parts: list[bytes] = []
                total = 0
                while total < file_bytes:
                    # zipf-ish reuse: low-index blocks picked far more often
                    idx = min(int(rng.zipf(1.3)) - 1, pool_size - 1)
                    parts.append(pool[idx])
                    total += len(pool[idx])
                contents.append(b"".join(parts)[:file_bytes])
            yield pd.DataFrame({"file_id": pdf["id"], "content": contents})

    return spark.range(n_files).repartition(max(1, n_files // 8)).mapInPandas(gen, FILES_SCHEMA)
