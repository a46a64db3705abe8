"""Ferret query pipeline, Spark-first (reference:
apps/ferret/src/benchmark/ferret-pthreads.c t_vec → t_rank → t_out,
lines 561-762).

Plan shape (== SURVEY §3.3's Spark lifecycle):

  queries → posexplode(regions) → per-region candidate probe
      (exhaustive squared-L2 top-2K, or E2LSH bucket join J5)
  → map region vec → parent image, merge + distinct (J6/E1/E2)
  → semi-join corpus on candidate image ids (J7)
  → applyInPandas exact-EMD rerank (K11)
  → top-K window, sorted (O2/O3) → name join (J8)

Scale: the probe is an equi-join on bucket keys (shuffle ∝ collisions);
candidates per query are bounded (2K per region, reference
ferret-pthreads.c:590); EMD touches only the candidate set — the same
cheap-filter / expensive-rerank split the reference hard-codes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .emd import emd, pairwise_l2

# E2LSH defaults mirroring the reference index recipe
# (-L 12 -M 17 -w 4.0708 -H 19697, LSH.c:43-50 / mkdb:30; probe -L 8 -T 20,
# ferret-pthreads.c:261). M is lower than the reference's 17 because the
# synthetic fixture corpus is far smaller than corel — fewer concatenated
# projections keep bucket occupancy comparable.
LSH_M = 6
LSH_L = 8
LSH_W = 4.0708
LSH_H = 19697  # second-level hash-table size (mkdb:30 -H; LSH.c:129-141)
LSH_T = 20  # score-ordered probes per table (ferret-pthreads.c:261 -T)
LSH_SEED = 20240813


def explode_regions(vecsets: DataFrame, prefix: str) -> DataFrame:
    return vecsets.select(
        F.col("image_id").alias(f"{prefix}_image_id"),
        F.posexplode("regions").alias("region_idx", "region"),
    ).select(
        f"{prefix}_image_id",
        "region_idx",
        F.col("region.weight").alias("weight"),
        F.col("region.features").alias("features"),
    )


def _sql2(a, b):
    # squared L2 as a sequential JVM fold (dist_L2_float, cass_dist.c:45-58)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )


def candidates_exhaustive(
    query_regions: DataFrame, corpus_regions: DataFrame, per_region_k: int
) -> DataFrame:
    """Per query region: exact squared-L2 top-(per_region_k) corpus regions
    (the raw-table full scan path, raw.c:195-204), then parent-image merge."""
    q = query_regions.select(
        F.col("q_image_id"), F.col("region_idx"), F.col("features").cast("array<double>").alias("qf")
    )
    c = corpus_regions.select(
        F.col("c_image_id"), F.col("features").cast("array<double>").alias("cf")
    )
    pairs = c.crossJoin(F.broadcast(q))
    d = _sql2(F.col("qf"), F.col("cf"))
    w = Window.partitionBy("q_image_id", "region_idx").orderBy(F.col("dist"), F.col("c_image_id"))
    ranked = pairs.select("q_image_id", "region_idx", "c_image_id", d.alias("dist")).withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.filter(F.col("rn") <= per_region_k)
        .select("q_image_id", "c_image_id")
        .distinct()
    )


def _e2lsh_params(dim: int, m: int, tables: int, w: float):
    """Shared E2LSH parameter draw: projection matrix α, offsets β, and the
    per-table second-level mixing integers r_j (LSH.c:43-50 random init)."""
    rng = np.random.default_rng(LSH_SEED)
    alphas = rng.standard_normal((dim, m * tables))
    betas = rng.uniform(0, w, size=m * tables)
    rnd = rng.integers(1, 1 << 32, size=(tables, m), dtype=np.uint64).astype(np.uint32)
    return alphas, betas, rnd


def _second_level(Hu: np.ndarray, rnd: np.ndarray) -> np.ndarray:
    """Bucket id per (row, table): (Σ_j r_j·h_j) in wrapping uint32
    arithmetic, then mod H — the reference's ohash bucket address
    (LSH_hash2, LSH.c:129-141). Hu: (n, tables, m) uint32."""
    with np.errstate(over="ignore"):
        s = (Hu * rnd[None, :, :]).sum(axis=2, dtype=np.uint32)
    return (s % np.uint32(LSH_H)).astype(np.int64)


def _probe_atom_sets(scores: np.ndarray, t_probes: int) -> list[list[int]]:
    """Score-ordered perturbation sets (O4) — multi-probe LSH (Lv et al.,
    VLDB'07; reference perturb.c:52-122 heap enumeration). ``scores`` holds
    2M atom costs: atom 2j   = move h_j down (cost frac_j²),
                   atom 2j+1 = move h_j up   (cost (W−frac_j)²).
    Returns up to ``t_probes`` atom-index sets, ascending total cost,
    never perturbing the same hash function twice in one set."""
    import heapq

    order = np.argsort(scores, kind="stable")
    n = len(order)
    out: list[list[int]] = []
    # heap entries: (total cost, ranks tuple); ranks index into `order`
    heap: list[tuple[float, tuple[int, ...]]] = [(float(scores[order[0]]), (0,))]
    while heap and len(out) < t_probes:
        cost, ranks = heapq.heappop(heap)
        atoms = [int(order[r]) for r in ranks]
        if len({a >> 1 for a in atoms}) == len(atoms):  # one move per h_j
            out.append(atoms)
        mx = ranks[-1]
        if mx + 1 < n:
            nxt = float(scores[order[mx + 1]])
            heapq.heappush(heap, (cost + nxt, ranks + (mx + 1,)))  # expand
            heapq.heappush(
                heap, (cost - float(scores[order[mx]]) + nxt, ranks[:-1] + (mx + 1,))
            )  # shift
    return out


def _e2lsh_keys_udf(
    dim: int,
    m: int = LSH_M,
    tables: int = LSH_L,
    w: float = LSH_W,
    t_probes: int = 0,
):
    """Vectorized E2LSH bucket keys — the K12 kernel as a pandas UDF.

    h_j = floor((α_j·v + β_j)/W) per function (LSH_hash_score,
    LSH_query.c:109-145), then the second-level uint32 mix down to an
    H-sized bucket id (LSH.c:129-141); emitted key = table·H + bucket.
    One BLAS matmul per Arrow batch.

    t_probes=0 → index side (one key per table). t_probes>0 → query side:
    base key plus up to T score-ordered perturbation probes per table,
    each probe key derived incrementally as base ± r_j in wrapping uint32
    (LSH_hash2_perturb, LSH_query.c:158-180)."""
    alphas, betas, rnd = _e2lsh_params(dim, m, tables, w)

    @F.pandas_udf(ArrayType(LongType()))
    def keys(features: pd.Series) -> pd.Series:
        V = np.vstack([np.asarray(f, dtype=np.float64) for f in features])
        S = V @ alphas + betas
        Hf = np.floor(S / w)
        Hu = Hf.astype(np.int64).astype(np.uint32).reshape(len(V), tables, m)
        base = _second_level(Hu, rnd)  # (n, tables) int64 bucket ids
        with np.errstate(over="ignore"):
            base_sum = (Hu * rnd[None, :, :]).sum(axis=2, dtype=np.uint32)
        offs = (np.arange(tables, dtype=np.int64) * LSH_H)[None, :]
        if not t_probes:
            return pd.Series(list(base + offs))
        frac = (S - Hf * w).reshape(len(V), tables, m)
        down = frac**2  # cost of h_j − 1 (distance to lower boundary)
        up = (w - frac) ** 2  # cost of h_j + 1
        out = []
        for i in range(len(V)):
            row_keys = list(base[i] + offs[0])
            for t in range(tables):
                scores = np.empty(2 * m)
                scores[0::2] = down[i, t]
                scores[1::2] = up[i, t]
                for atoms in _probe_atom_sets(scores, t_probes):
                    adj = np.uint32(0)
                    with np.errstate(over="ignore"):
                        for a in atoms:
                            r = rnd[t, a >> 1]
                            adj = adj + r if a & 1 else adj - r
                        h = np.uint32(base_sum[i, t] + adj) % np.uint32(LSH_H)
                    row_keys.append(t * LSH_H + int(h))
            out.append(np.array(row_keys, dtype=np.int64))
        return pd.Series(out)

    return keys


def candidates_lsh(
    query_regions: DataFrame,
    corpus_regions: DataFrame,
    dim: int,
    m: int = LSH_M,
    tables: int = LSH_L,
    w: float = LSH_W,
    t_probes: int = LSH_T,
) -> DataFrame:
    """J5 — LSH bucket-probe join: corpus index rows (one H-bucket key per
    table) vs query probes (base bucket + T score-ordered perturbations per
    table, O4); equi-join on the key, distinct parent images."""
    from ..session import ensure_worker_imports as _ewi

    _ewi(query_regions.sparkSession)
    c = corpus_regions.select(
        "c_image_id",
        F.explode(_e2lsh_keys_udf(dim, m, tables, w)(F.col("features"))).alias("key"),
    )
    q = query_regions.select(
        "q_image_id",
        F.explode(
            _e2lsh_keys_udf(dim, m, tables, w, t_probes=t_probes)(F.col("features"))
        ).alias("key"),
    ).dropDuplicates(["q_image_id", "key"])  # probes may collide on a bucket
    return q.join(c, on="key").select("q_image_id", "c_image_id").distinct()


RANK_SCHEMA = StructType(
    [
        StructField("q_image_id", LongType()),
        StructField("c_image_id", LongType()),
        StructField("emd", DoubleType()),
    ]
)


def emd_rerank(candidates: DataFrame, queries: DataFrame, corpus: DataFrame) -> DataFrame:
    """J7 + K11: candidate-restricted exact-EMD scoring. Query vecsets are
    broadcast (few, small); corpus vecsets semi-join to candidates so only
    candidate rows ever reach Python."""
    from ..session import ensure_worker_imports as _ewi

    _ewi(candidates.sparkSession)
    q = queries.select(
        F.col("image_id").alias("q_image_id"), F.col("regions").alias("q_regions")
    )
    c = corpus.select(
        F.col("image_id").alias("c_image_id"), F.col("regions").alias("c_regions")
    )
    joined = candidates.join(F.broadcast(q), "q_image_id").join(c, "c_image_id")
    # Pin rank-stage parallelism (the reference's RANK thread-pool
    # replication, T3). AQE sizes the upstream candidate exchange by BYTES,
    # and a candidate set is only a few MB — it happily coalesces to one
    # partition, serializing a stage whose real cost is per-row CPU (the
    # O(r^3) transportation simplex), a 10x+ slowdown at bench scale. An
    # explicit numPartitions is exempt from AQE coalescing.
    joined = joined.repartition(joined.sparkSession.sparkContext.defaultParallelism)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dists = []
            for qr, cr in zip(pdf["q_regions"], pdf["c_regions"]):
                w1 = np.array([r["weight"] for r in qr], dtype=np.float64)
                f1 = np.vstack([np.asarray(r["features"], dtype=np.float64) for r in qr])
                w2 = np.array([r["weight"] for r in cr], dtype=np.float64)
                f2 = np.vstack([np.asarray(r["features"], dtype=np.float64) for r in cr])
                dists.append(emd(w1, w2, pairwise_l2(f1, f2)))
            yield pd.DataFrame(
                {
                    "q_image_id": pdf["q_image_id"],
                    "c_image_id": pdf["c_image_id"],
                    "emd": dists,
                }
            )

    return joined.mapInPandas(score, RANK_SCHEMA)


def ferret_topk(
    queries: DataFrame,
    corpus: DataFrame,
    top_k: int = 10,
    dim: int = 14,
    mode: str = "exhaustive",
    per_region_k: int | None = None,
    lsh_m: int = LSH_M,
    lsh_tables: int = LSH_L,
    lsh_w: float = LSH_W,
) -> DataFrame:
    """End-to-end ferret query: returns (q_image_id, rank, name, emd) —
    the obj:dist output lines of t_out (S7, ferret-pthreads.c:752-762).

    mode="exhaustive" → exact (golden-test config); mode="lsh" → E2LSH
    probe (recall checked statistically, FIXTURES.md §3). per_region_k
    defaults to 2*top_k, the reference's query.topk = 2*top_K
    (ferret-pthreads.c:590)."""
    per_region_k = per_region_k or 2 * top_k
    qr = explode_regions(queries, "q")
    cr = explode_regions(corpus, "c")
    if mode == "exhaustive":
        cand = candidates_exhaustive(qr, cr, per_region_k)
    elif mode == "lsh":
        cand = candidates_lsh(qr, cr, dim, lsh_m, lsh_tables, lsh_w)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    scored = emd_rerank(cand, queries, corpus)
    w = Window.partitionBy("q_image_id").orderBy(
        F.round(F.col("emd"), 6), F.col("c_image_id")
    )
    names = corpus.select(F.col("image_id").alias("c_image_id"), "name")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .join(F.broadcast(names), "c_image_id")  # J8 id→name map join
        .select(
            "q_image_id", "rank", "name", F.round(F.col("emd"), 6).alias("emd")
        )
    )


def write_results(topk: DataFrame, out_path: str) -> None:
    """S7 — similarity-result sink: one ``name:dist\\t...`` line per query
    image, the t_out output format (ferret-pthreads.c:752-762). Text-file
    golden-output surface; the DataFrame itself stays the canonical result."""
    lines = (
        topk.groupBy("q_image_id")
        .agg(F.sort_array(F.collect_list(F.struct("rank", "name", "emd"))).alias("rs"))
        .select(
            F.concat_ws(
                "\t",
                F.col("q_image_id").cast("string"),
                F.array_join(
                    F.transform(F.col("rs"), lambda r: F.concat_ws(":", r["name"], r["emd"])),
                    "\t",
                ),
            ).alias("value")
        )
        .orderBy("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(out_path)
