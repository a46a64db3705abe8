"""File-system ingestion (S1/S2/S3, SURVEY §2.1).

Reference behaviors → Spark ``binaryFile`` source options:

- single-file scan with 128 MB read buffers (Fragment, encoder.c:1035-1207)
  → one DataFrame row per file; Spark handles buffering. NOTE: like the
  reference's per-buffer anchoring, our chunker treats each file as one
  in-memory buffer — files larger than executor memory should be pre-split
  (the reference has the same practical bound via MAXBUF);
- directory scan skipping dotfiles (new_dedup.c:925-1107, filters 963-973)
  → ``pathGlobFilter`` + an explicit name predicate (P1);
- recursive image directory walk (scan_dir, ferret-pthreads.c:330-433)
  → ``recursiveFileLookup=true``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_files(
    spark: SparkSession,
    path: str,
    recursive: bool = True,
    glob: str | None = None,
    skip_dotfiles: bool = True,
    streaming: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """→ (file_id, file_name, length, content). file_id is a dense rank over
    the path (deterministic for a fixed listing), mirroring the reference's
    per-file idx_file (dedupdef.h:178)."""
    reader = spark.readStream if streaming else spark.read
    reader = reader.format("binaryFile").option("recursiveFileLookup", str(recursive).lower())
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if streaming and max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(path)
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    if skip_dotfiles:
        df = df.filter(~name.startswith("."))  # P1, new_dedup.c:963-973
    out = df.select(
        F.col("path").alias("file_path"),
        name.alias("file_name"),
        F.col("length"),
        F.col("content"),
    )
    if streaming:
        # streams can't window-rank; derive a stable id from the path hash
        return out.withColumn("file_id", F.xxhash64("file_path"))
    from pyspark.sql import Window

    w = Window.orderBy("file_path")
    return out.withColumn("file_id", F.row_number().over(w).cast("long") - 1)


def write_files(df: DataFrame, out_dir: str) -> None:
    """Materialize (file_name, content) rows back to individual files —
    the decoder's output surface (decoder.c writes the reconstructed file).
    Driver-side loop is fine here: this is a verification sink, not a data
    path (the data path is the parquet ddp table)."""
    os.makedirs(out_dir, exist_ok=True)
    for row in df.select("file_name", "content").toLocalIterator():
        with open(os.path.join(out_dir, row.file_name), "wb") as fh:
            fh.write(bytes(row.content))
