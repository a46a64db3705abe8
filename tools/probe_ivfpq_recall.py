"""One-off calibration probe for the IVF-PQ recall floor (round 8).

Measures recall@10 at the auto-sized defaults (n_centroids=256,
refine=max(8, 2*n_probe)) and a refine sweep on the bench's 100k x 64d
gaussian fixture, plus the raw-vs-residual comparison on a CLUSTERED
mixture fixture (where residual encoding can actually win — residuals of
structureless gaussians are still gaussian, the r7 verdict's point).

Run: python tools/probe_ivfpq_recall.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as apd
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from bensp_suite_spark.session import get_spark
from bensp_suite_spark.operators import similarity as SIM

N, D, NQ, K = 100_000, 64, 100, 10


def gauss(batches):
    for pdf in batches:
        import numpy as np
        vecs = [np.random.default_rng(int(i)).standard_normal(D).tolist()
                for i in pdf["id"]]
        yield apd.DataFrame({"vec_id": pdf["id"], "embedding": vecs})


def clustered(batches):
    # 64-center gaussian mixture: center = 5*N(0,1) seeded by cluster id,
    # point = center + N(0,1) — coarse structure dominates, the regime
    # where residual encoding buys recall
    for pdf in batches:
        import numpy as np
        vecs = []
        for i in pdf["id"]:
            c = int(i) % 64
            center = 5.0 * np.random.default_rng(100_000 + c).standard_normal(D)
            noise = np.random.default_rng(int(i)).standard_normal(D)
            vecs.append((center + noise).tolist())
        yield apd.DataFrame({"vec_id": pdf["id"], "embedding": vecs})


def recall(spark, emb, q, brute, run):
    n_exact = brute.count()
    hits = (run().select("query_id", "neighbor_id")
            .join(brute, ["query_id", "neighbor_id"]).count())
    return round(hits / n_exact, 4)


def main():
    spark = get_spark(shuffle_partitions=32)
    for label, gen in (("gaussian", gauss), ("clustered", clustered)):
        emb = (spark.range(N).repartition(32)
               .mapInPandas(gen, "vec_id long, embedding array<double>")
               .persist(StorageLevel.MEMORY_ONLY))
        emb.count()
        q = emb.filter(F.col("vec_id") < NQ)
        brute = SIM.cosine_topk_bruteforce(q, emb, k=K).select(
            "query_id", "neighbor_id").persist()
        brute.count()
        auto_cells, auto_probe = SIM.ivf_defaults(N)
        cent = SIM.ivf_centroids(emb, auto_cells)
        assign = SIM.ivf_assign(
            emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").alias("cv")),
            cent, 1, "neighbor_id", "cv").persist(StorageLevel.MEMORY_ONLY)
        assign.count()
        books = SIM.pq_codebooks(emb, n_centroids=256)
        coded = (SIM.pq_encode(emb, books)
                 .join(assign.select("neighbor_id", "cell"), "neighbor_id")
                 .persist(StorageLevel.MEMORY_ONLY))
        coded.count()
        print(f"== {label}: auto ({auto_cells}, {auto_probe}), "
              f"auto refine={max(8, 2*auto_probe)}")
        for refine in (None, 16, 32, 64, 96):
            t0 = time.perf_counter()
            r = recall(spark, emb, q, brute,
                       lambda: SIM.ivfpq_ann_topk(
                           q, emb, k=K, n_probe=auto_probe, refine=refine,
                           index=(cent, books, coded)))
            print(f"  raw refine={refine}: recall@10={r} "
                  f"({time.perf_counter()-t0:.1f}s)", flush=True)
        if label == "clustered":
            for refine in (None, 32):
                t0 = time.perf_counter()
                r = recall(spark, emb, q, brute,
                           lambda: SIM.ivfpq_ann_topk(
                               q, emb, k=K, n_cells=auto_cells,
                               n_probe=auto_probe, n_centroids=256,
                               refine=refine, residual=True))
                print(f"  residual refine={refine}: recall@10={r} "
                      f"({time.perf_counter()-t0:.1f}s)", flush=True)
        coded.unpersist(); assign.unpersist(); brute.unpersist(); emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
