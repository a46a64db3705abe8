#!/usr/bin/env python
"""Five-minute tour: the engine's main surfaces on tiny synthetic data.

Run from the repo root (or with the repo on PYTHONPATH):

    python examples/quickstart.py

Covers: CDC dedup encode/stats/decode round trip, text dedup + curation,
deterministic sampling/splitting, ANN top-k, and a KMV sketch — each the
same call a 100 TB deployment makes, minus the cluster.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from bensp_suite_spark.session import get_spark

    spark = get_spark("quickstart", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bensp_quickstart_")

    # --- 1. CDC dedup: encode → stats → byte-exact decode ---------------
    from bensp_suite_spark.dedup import fixtures as DF
    from bensp_suite_spark.dedup import pipeline as DP

    files = DF.synthetic_docs(spark, n_files=8, file_bytes=1 << 16, pool_size=4, seed=1)
    stats = DP.dedup_stats(files, compress_type="gzip").collect()[0]
    print(f"[dedup] {stats['n_chunks']} chunks, {stats['n_dup']} duplicate, "
          f"dedup ratio "
          f"{stats['total_input_bytes'] / max(stats['total_dedup_bytes'], 1):.2f}x")
    encoded = DP.encode(files, compress_type="gzip")
    decoded = DP.decode(encoded)
    orig = {r["file_id"]: bytes(r["content"]) for r in files.collect()}
    back = {r["file_id"]: bytes(r["content"]) for r in decoded.collect()}
    assert orig == back, "decode must be byte-exact"
    print("[dedup] encode -> decode round trip: byte-exact")

    # --- 2. Text dedup + leakage-aware split -----------------------------
    from bensp_suite_spark.operators import dedup_text as DT
    from bensp_suite_spark.operators import sampling as SMP

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 6}") for i in range(60)],
        "doc_id long, text string",
    )
    kept = DT.exact_dedup(docs)
    print(f"[text] exact dedup: {docs.count()} docs -> {kept.count()} unique")
    split = SMP.assign_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    print("[split] leak-free split counts:",
          {r["split"]: r["n"] for r in
           split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()})

    # --- 3. ANN: brute-force cosine top-k over embeddings ----------------
    import numpy as np

    from bensp_suite_spark.operators import similarity as SIM

    rng = np.random.default_rng(0)
    emb = spark.createDataFrame(
        [(i, rng.standard_normal(16).astype(float).tolist()) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    topk = SIM.cosine_topk_bruteforce(emb.filter(F.col("vec_id") < 2), emb, k=3)
    print("[ann] top-3 neighbors for 2 queries:", topk.count(), "rows")

    # --- 4. KMV distinct sketch ------------------------------------------
    from bensp_suite_spark.operators import sketches as SK

    est = SK.kmv_distinct(docs, "text", k=16).collect()[0]
    print(f"[sketch] distinct texts ~= {est['distinct_est']} (exact: 6)")

    spark.stop()
    print("quickstart complete:", work)


if __name__ == "__main__":
    main()
