"""Sharded NSW (navigable-small-world) graph ANN.

The one ANN family the engine was missing: proximity-GRAPH search —
what HNSW-era vector databases (FAISS ``IndexHNSW``, Milvus, Vespa,
pgvector) use as their default index. Graphs answer a query in
O(ef·log n) distance evaluations without any quantization loss, at the
price of a build step and a memory-resident adjacency.

Spark realization (how every distributed vector store shards HNSW):

- the corpus is hash-sharded (``vec_id % n_shards`` here — synthetic
  ids are already uniform; production would use ``pmod(xxhash64(id))``);
- each shard builds an INDEPENDENT in-memory NSW graph inside ONE
  ``applyInPandas`` group — the graph never crosses executor
  boundaries, so shard size (corpus/n_shards) is the only memory
  knob, and build parallelism is free (one task per shard);
- every query beam-searches every shard (queries are broadcast into
  the UDF closure — bounded by the family's QUERY_BATCH_LIMIT wave
  loop) and the per-shard top-ef candidates are unioned;
- the FINAL ranking is exact JVM-side cosine over the candidate
  union (same `_dot`/`_norm` column math + rounded-cosine + id
  tiebreaks as every other family member) — the Python graph only
  nominates candidates, it never scores the output.

At 10¹¹ vectors: S = corpus/shard_budget shards, each an independent
~1 GB graph; queries fan out to all shards (or compose with IVF
routing to probe a subset), per-shard search cost is O(ef·log n_shard)
REGARDLESS of corpus size, and throughput scales linearly with
executors. The build is embarrassingly parallel, incremental (a new
shard per ingest batch), and crash-safe (rebuild one shard, not the
index).

Reference analog: the suite's CASS/ferret engine answers the same
"top-k nearest" question with LSH probing (`reference
src/cass/lsh*.c`); the NSW graph is the modern (Malkov et al. 2014 /
HNSW 2016) answer to the identical query shape.

DETERMINISM SPEC — mirrored verbatim by the independent numpy
reference in ``tools/golden_reference.py::ann_nsw_topk`` (the golden
oracle pins its output, so the two implementations must stay in
lock-step; change one, change both):

- unit vectors: ``v / np.linalg.norm(v)`` in float64;
- graph distance: ``-float(np.dot(a_unit, b_unit))`` (smaller=nearer);
- shard(vec_id) = vec_id % n_shards; within a shard, nodes take
  positions 0..n-1 in ASCENDING vec_id order; insert order = position
  order; the entry point is position 0;
- insert(i): beam-search V[i] with ef_build over the graph of
  positions < i; connect i to the min(m, |W|) nearest results (by
  (dist, pos)); edges are undirected; any endpoint whose degree
  exceeds 2·m keeps its 2·m nearest neighbors (by (dist, pos));
- adjacency lists are ALWAYS kept sorted ascending by position and
  traversed in that order (heap ties are impossible — (dist, pos)
  keys are unique — but admission to a full result set depends on
  traversal order, so the order is pinned);
- beam_search(q, ef): best-first with a candidate min-heap keyed
  (dist, pos) and a bounded result set W holding the ef smallest
  (dist, pos); expansion stops when the nearest open candidate is
  farther than the worst of a full W (lexicographic on (dist, pos)).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import QUERY_BATCH_LIMIT, _dot, _norm

__all__ = [
    "nsw_build",
    "nsw_beam_search",
    "nsw_beam_search_adc",
    "nsw_ann_topk",
    "nsw_routed_ann_topk",
    "nsw_routed_pq_ann_topk",
    "build_nsw_index",
    "save_nsw_index",
    "load_nsw_index",
    "upsert_nsw_index",
    "save_nsw_routed_index",
    "load_nsw_routed_index",
    "upsert_nsw_routed_index",
    "save_nsw_routed_pq_index",
    "load_nsw_routed_pq_index",
    "upsert_nsw_routed_pq_index",
]


def nsw_beam_search(
    V: np.ndarray,
    nbrs: list[list[int]],
    qv: np.ndarray,
    ef: int,
) -> list[tuple[float, int]]:
    """Deterministic best-first beam search over a built NSW graph.

    ``V`` is the (n, d) unit-vector matrix, ``nbrs`` the adjacency
    (sorted ascending), ``qv`` the unit query. Returns the ≤ef nearest
    (dist, pos) pairs sorted ascending by (dist, pos). See the module
    docstring for the exact admission/termination rules — this function
    IS the spec the golden reference mirrors.
    """
    d0 = -float(np.dot(V[0], qv))
    visited = {0}
    cand: list[tuple[float, int]] = [(d0, 0)]
    # W as a max-heap over (dist, pos): entries are (-dist, -pos), so
    # w[0] is exactly the lexicographic worst — well-defined even when
    # two distances tie bit-for-bit (duplicate vectors in the corpus).
    w: list[tuple[float, int]] = [(-d0, 0)]
    while cand:
        d_c, c = heapq.heappop(cand)
        d_worst, p_worst = -w[0][0], -w[0][1]
        if len(w) >= ef and (d_c, c) > (d_worst, p_worst):
            break
        for nb in nbrs[c]:
            if nb in visited:
                continue
            visited.add(nb)
            d_nb = -float(np.dot(V[nb], qv))
            if len(w) < ef:
                heapq.heappush(w, (-d_nb, -nb))
                heapq.heappush(cand, (d_nb, nb))
            else:
                d_worst, p_worst = -w[0][0], -w[0][1]
                if (d_nb, nb) < (d_worst, p_worst):
                    heapq.heapreplace(w, (-d_nb, -nb))
                    heapq.heappush(cand, (d_nb, nb))
    return sorted((-nd, -np_) for nd, np_ in w)


def nsw_beam_search_adc(
    codes: np.ndarray,
    nbrs: list[list[int]],
    table: np.ndarray,
    ef: int,
) -> list[tuple[float, int]]:
    """:func:`nsw_beam_search` with ADC distances — the DiskANN search
    model: node distance is the PQ approximation
    ``-Σ_s table[s, codes[node, s]]`` (``table`` is the query's (S, C)
    inner-product table against the codebooks), so the beam touches only
    8-byte codes instead of raw vectors. Traversal/admission/termination
    rules are IDENTICAL to the raw beam (this function is part of the
    determinism spec the golden reference mirrors); the raw vectors are
    only needed afterwards, by the exact re-rank of the survivors."""
    srange = np.arange(table.shape[0])

    def d(p: int) -> float:
        return -float(table[srange, codes[p]].sum())

    d0 = d(0)
    visited = {0}
    cand: list[tuple[float, int]] = [(d0, 0)]
    w: list[tuple[float, int]] = [(-d0, 0)]
    while cand:
        d_c, c = heapq.heappop(cand)
        d_worst, p_worst = -w[0][0], -w[0][1]
        if len(w) >= ef and (d_c, c) > (d_worst, p_worst):
            break
        for nb in nbrs[c]:
            if nb in visited:
                continue
            visited.add(nb)
            d_nb = d(nb)
            if len(w) < ef:
                heapq.heappush(w, (-d_nb, -nb))
                heapq.heappush(cand, (d_nb, nb))
            else:
                d_worst, p_worst = -w[0][0], -w[0][1]
                if (d_nb, nb) < (d_worst, p_worst):
                    heapq.heapreplace(w, (-d_nb, -nb))
                    heapq.heappush(cand, (d_nb, nb))
    return sorted((-nd, -np_) for nd, np_ in w)


def nsw_build(V: np.ndarray, m: int = 8, ef_build: int = 24) -> list[list[int]]:
    """Build the deterministic NSW adjacency for unit-vector matrix V.

    Insert positions in order; each new node links to its m nearest
    beam results; undirected edges; degree capped at 2·m by keeping the
    nearest. Adjacency lists are returned (and maintained) sorted
    ascending — traversal order is part of the determinism spec.
    """
    n = len(V)
    m_max = 2 * m
    nbrs: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        res = nsw_beam_search(V, nbrs, V[i], ef_build)
        chosen = [p for _, p in res[: min(m, len(res))]]
        for p in chosen:
            nbrs[i].append(p)
            nbrs[p].append(i)
            if len(nbrs[p]) > m_max:
                ds = sorted((-float(np.dot(V[p], V[x])), x) for x in nbrs[p])
                nbrs[p] = sorted(x for _, x in ds[:m_max])
            else:
                nbrs[p].sort()
        nbrs[i].sort()
    return nbrs


def _shard_candidates(
    qids: np.ndarray, qmat: np.ndarray, m: int, ef_build: int, ef_search: int
):
    """Make the applyInPandas shard worker: build the shard's NSW graph,
    beam-search every query, emit (query_id, neighbor_id) nominations."""

    def worker(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
        if len(V) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": []})
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        nbrs = nsw_build(V, m=m, ef_build=ef_build)
        out_q, out_n = [], []
        for qi in range(len(qids)):
            res = nsw_beam_search(V, nbrs, qmat[qi], ef_search)
            for _, p in res:
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[p]))
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
            }
        )

    return worker


def _exact_rerank(cand: DataFrame, q_sel: DataFrame, c_sel: DataFrame, k: int) -> DataFrame:
    """The family tail: exact JVM rounded-cosine over the nomination
    union, top-k by (cos desc, id) — Python nominates, Catalyst scores."""
    cos = F.round(
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6
    )
    scored = (
        cand.filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(q_sel), "query_id")
        .join(c_sel.select("neighbor_id", "cv"), "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


_CAND_SCHEMA = "query_id long, neighbor_id long"


def _empty_cand() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": pd.Series([], dtype="int64"),
            "neighbor_id": pd.Series([], dtype="int64"),
        }
    )


def _routed_probe_cogroup(
    q_sel: DataFrame,
    qassign: DataFrame,
    src: DataFrame,
    prebuilt: bool,
    m: int,
    ef_build: int,
    ef_search: int,
) -> DataFrame:
    """Fully-distributed routed probe (zero driver staging): queries
    shuffle to their probe cells, and each (cell-queries, cell-graph)
    pair runs inside ONE ``cogroup().applyInPandas`` worker — the
    same per-row normalization and per-query beam as the wave path, so
    nominations are bit-identical; only the transport differs."""

    def worker(qpdf: pd.DataFrame, gpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or gpdf.empty:
            return _empty_cand()
        qpdf = qpdf.sort_values("query_id").reset_index(drop=True)
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        qmat = np.array([np.asarray(v, dtype=np.float64) for v in qpdf["qv"]])
        qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        if prebuilt:
            gpdf = gpdf.sort_values("pos").reset_index(drop=True)
            ids = gpdf["vec_id"].to_numpy(dtype=np.int64)
            V = np.array([np.asarray(v, dtype=np.float64) for v in gpdf["cv"]])
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            nbrs = [list(map(int, x)) for x in gpdf["nbrs"]]
        else:
            gpdf = gpdf.sort_values("neighbor_id").reset_index(drop=True)
            ids = gpdf["neighbor_id"].to_numpy(dtype=np.int64)
            V = np.array([np.asarray(v, dtype=np.float64) for v in gpdf["cv"]])
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            nbrs = nsw_build(V, m=m, ef_build=ef_build)
        out_q, out_n = [], []
        for qi in range(len(qids)):
            for _, p in nsw_beam_search(V, nbrs, qmat[qi], ef_search):
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[p]))
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
            }
        )

    q_cells = qassign.join(q_sel, "query_id").select("cell", "query_id", "qv")
    return (
        q_cells.groupBy("cell")
        .cogroup(src.groupBy("shard"))
        .applyInPandas(worker, _CAND_SCHEMA)
    )


def _routed_pq_probe_cogroup(
    q_sel: DataFrame,
    qassign: DataFrame,
    graph_df: DataFrame,
    books: np.ndarray,
    ef_search: int,
) -> DataFrame:
    """ADC twin of :func:`_routed_probe_cogroup`: per-query ADC tables
    are computed inside the worker from the closure's codebooks — same
    elementwise-mul + sum as the wave path, row-independent, so tables
    (and beams) are bit-identical."""
    S, C, ds = books.shape

    def worker(qpdf: pd.DataFrame, gpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or gpdf.empty:
            return _empty_cand()
        qpdf = qpdf.sort_values("query_id").reset_index(drop=True)
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        qmat = np.array([np.asarray(v, dtype=np.float64) for v in qpdf["qv"]])
        qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        qsub = qmat.reshape(qmat.shape[0], S, ds)
        tables = (books[None, :, :, :] * qsub[:, :, None, :]).sum(-1)
        gpdf = gpdf.sort_values("pos").reset_index(drop=True)
        ids = gpdf["vec_id"].to_numpy(dtype=np.int64)
        codes = np.array([np.asarray(c, dtype=np.int64) for c in gpdf["codes"]])
        nbrs = [list(map(int, x)) for x in gpdf["nbrs"]]
        out_q, out_n = [], []
        for qi in range(len(qids)):
            for _, p in nsw_beam_search_adc(codes, nbrs, tables[qi], ef_search):
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[p]))
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
            }
        )

    q_cells = qassign.join(q_sel, "query_id").select("cell", "query_id", "qv")
    return (
        q_cells.groupBy("cell")
        .cogroup(graph_df.groupBy("shard"))
        .applyInPandas(worker, _CAND_SCHEMA)
    )


def nsw_routed_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    ef_build: int = 24,
    ef_search: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, DataFrame, dict] | None = None,
    spill_eps: float = 0.0,
    probe_mode: str = "waves",
) -> DataFrame:
    """IVF-ROUTED sharded NSW — the candidate cut composed with the
    graph cut: shards are the coarse quantizer's cells (deterministic
    lowest-id centroids, the IVF family's assignment — identical
    fold-order math), and each query beam-searches ONLY its ``n_probe``
    nearest cells' graphs instead of every shard. At 10¹¹ vectors this
    is the production topology: S = corpus/shard_budget cell-shards,
    per-query work = n_probe beams — independent of S — so adding
    corpus adds shards without adding per-query cost (the plain
    ``nsw_ann_topk`` fan-out grows with S; this one doesn't). Recall is
    bounded by cell recall exactly like IVF, recovered with n_probe —
    or, at a FIXED probe budget, with ``spill_eps`` (SPANN closure
    assignment, ``similarity.ivf_assign_spill``): boundary vectors join
    every cell within (1+eps) of their nearest, so cell-boundary
    neighbors stop costing recall for the price of a bounded state
    blow-up (the spill factor — measured by the bench each round).
    Same contract as the family: graphs nominate, exact JVM cosine
    scores; golden-pinned by the independent numpy mirror. A prebuilt
    ``index`` carries its own spill factor in meta (the graphs were
    built over the spilled membership); ``spill_eps`` here only affects
    the inline build.

    ``probe_mode``: ``"waves"`` stages query batches on the driver in
    bounded hash chunks (the family's documented contract — fine while
    queries ≪ corpus); ``"cogroup"`` is the FULLY-DISTRIBUTED probe —
    queries shuffle to their probe cells and each (cell-queries,
    cell-graph) pair beams inside one ``cogroup().applyInPandas``
    worker, zero ``collect()`` anywhere in the probe path, so millions
    of streamed queries never serialize through the driver. Nomination
    sets are bit-identical (same per-row normalization, same per-query
    beam): tests pin parity."""
    from .similarity import ivf_assign, ivf_assign_spill, ivf_centroids

    q_sel = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c_sel = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    if index is not None:
        # prebuilt routed index (save_nsw_routed_index): centroids route
        # the queries, per-cell graphs were built at save time
        cent, graph_df, _params = index
        sharded = None
        spilled = float(_params.get("spill_eps", 0.0)) > 0.0
    else:
        cent = ivf_centroids(corpus, n_cells, id_col, vec_col)
        if spill_eps > 0.0:
            cassign = ivf_assign_spill(
                c_sel, cent, spill_eps, "neighbor_id", "cv"
            ).select("neighbor_id", "cell")
        else:
            cassign = ivf_assign(c_sel, cent, 1, "neighbor_id", "cv").select(
                "neighbor_id", "cell"
            )
        sharded = c_sel.join(cassign, "neighbor_id").withColumnRenamed(
            "cell", "shard"
        )
        spilled = spill_eps > 0.0
    qassign = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        cent,
        n_probe,
        "query_id",
        "qv",
    ).select("query_id", "cell")

    if probe_mode == "cogroup":
        src = graph_df if index is not None else sharded
        cand = _routed_probe_cogroup(
            q_sel, qassign, src,
            prebuilt=index is not None, m=m, ef_build=ef_build,
            ef_search=ef_search,
        )
        if spilled:
            cand = cand.distinct()
        return _exact_rerank(cand, q_sel, c_sel, k)

    # limit-probe instead of a count job: the common queries ≪ corpus
    # call collects its single wave directly (one driver job instead of
    # count + collect — measured ~0.2 s per declared-query call)
    q_head = q_sel.limit(QUERY_BATCH_LIMIT + 1).collect()
    if len(q_head) <= QUERY_BATCH_LIMIT:
        n_chunks = 1
    else:
        n_q = q_sel.count()
        n_chunks = max(1, -(-n_q // QUERY_BATCH_LIMIT))
    chunk_expr = F.pmod(F.xxhash64(F.col("query_id")), F.lit(n_chunks))
    cand_parts = []
    for ci in range(n_chunks):
        qc = q_sel if n_chunks == 1 else q_sel.filter(chunk_expr == ci)
        rows = q_head if n_chunks == 1 else qc.collect()
        if not rows:
            continue
        rows.sort(key=lambda r: r["query_id"])
        qids = np.array([r["query_id"] for r in rows], dtype=np.int64)
        qmat = np.array([r["qv"] for r in rows], dtype=np.float64)
        qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        qidx = {int(q): i for i, q in enumerate(qids)}
        qa = qassign if n_chunks == 1 else qassign.filter(chunk_expr == ci)
        probes: dict[int, list[int]] = {}
        for r in qa.collect():
            probes.setdefault(int(r["cell"]), []).append(qidx[int(r["query_id"])])

        def make_worker(probes=probes, qids=qids, qmat=qmat, prebuilt=(index is not None)):
            def worker(pdf: pd.DataFrame) -> pd.DataFrame:
                cell = int(pdf["shard"].iloc[0])
                probing = sorted(probes.get(cell, []))
                if not probing:
                    return pd.DataFrame(
                        {
                            "query_id": pd.Series([], dtype="int64"),
                            "neighbor_id": pd.Series([], dtype="int64"),
                        }
                    )
                if prebuilt:
                    pdf = pdf.sort_values("pos").reset_index(drop=True)
                    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                    V = np.array(
                        [np.asarray(v, dtype=np.float64) for v in pdf["cv"]]
                    )
                    V = V / np.linalg.norm(V, axis=1, keepdims=True)
                    nbrs = [list(map(int, x)) for x in pdf["nbrs"]]
                else:
                    pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
                    ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
                    V = np.array(
                        [np.asarray(v, dtype=np.float64) for v in pdf["cv"]]
                    )
                    V = V / np.linalg.norm(V, axis=1, keepdims=True)
                    nbrs = nsw_build(V, m=m, ef_build=ef_build)
                out_q, out_n = [], []
                for qi in probing:
                    for _, p in nsw_beam_search(V, nbrs, qmat[qi], ef_search):
                        out_q.append(int(qids[qi]))
                        out_n.append(int(ids[p]))
                return pd.DataFrame(
                    {
                        "query_id": pd.Series(out_q, dtype="int64"),
                        "neighbor_id": pd.Series(out_n, dtype="int64"),
                    }
                )

            return worker

        src = graph_df if index is not None else sharded
        cand_parts.append(
            src.groupBy("shard").applyInPandas(
                make_worker(), "query_id long, neighbor_id long"
            )
        )
    cand = cand_parts[0]
    for extra in cand_parts[1:]:
        cand = cand.unionByName(extra)
    if spilled:
        # closure assignment puts boundary vectors in several probed
        # cells — collapse duplicate nominations before the rank window
        # (a duplicate surviving to row_number would occupy two ranks)
        cand = cand.distinct()
    return _exact_rerank(cand, q_sel, c_sel, k)


def build_nsw_index(
    corpus: DataFrame,
    n_shards: int = 4,
    m: int = 8,
    ef_build: int = 24,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Materialize the per-shard NSW adjacency as a DataFrame:
    (shard, pos, vec_id, cv, nbrs) where ``pos`` is the node's insertion
    position (ascending vec_id within the shard — the determinism spec)
    and ``nbrs`` holds shard-local neighbor positions. One
    ``applyInPandas`` group per shard, exactly the inline build's
    worker, so probing a saved index is bit-identical to the inline
    path."""

    def worker(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
        if len(V) == 0:
            return pd.DataFrame(
                {"shard": [], "pos": [], "vec_id": [], "cv": [], "nbrs": []}
            )
        U = V / np.linalg.norm(V, axis=1, keepdims=True)
        nbrs = nsw_build(U, m=m, ef_build=ef_build)
        return pd.DataFrame(
            {
                "shard": pdf["shard"].astype("int64"),
                "pos": pd.Series(range(len(V)), dtype="int64"),
                "vec_id": pdf["neighbor_id"].astype("int64"),
                "cv": pdf["cv"],
                "nbrs": [list(map(int, x)) for x in nbrs],
            }
        )

    c_sel = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("shard", F.col("neighbor_id") % F.lit(n_shards))
    return c_sel.groupBy("shard").applyInPandas(
        worker,
        "shard long, pos long, vec_id long, cv array<double>, nbrs array<long>",
    )


def save_nsw_routed_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 8,
    m: int = 8,
    ef_build: int = 24,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spill_eps: float = 0.0,
) -> None:
    """Build + persist the IVF-ROUTED NSW index: the coarse centroids
    (for query routing at probe time) plus one NSW graph per CELL, as
    shard-partitioned parquet — the mkdb-offline frame for
    :func:`nsw_routed_ann_topk`. Probing a saved routed index is
    bit-identical to the inline routed build (same deterministic cell
    assignment, same per-cell insertion order). ``spill_eps`` builds the
    cell graphs over the SPANN closure assignment (boundary vectors join
    every cell within (1+eps) of their nearest) and is persisted in the
    meta so the probe knows to collapse duplicate nominations."""
    from .similarity import ivf_assign, ivf_assign_spill, ivf_centroids

    cent = ivf_centroids(corpus, n_cells, id_col, vec_col)
    c_sel = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    assign = (
        ivf_assign_spill(c_sel, cent, spill_eps, "neighbor_id", "cv")
        if spill_eps > 0.0
        else ivf_assign(c_sel, cent, 1, "neighbor_id", "cv")
    )
    sharded = (
        c_sel.join(
            assign.select("neighbor_id", "cell"),
            "neighbor_id",
        ).withColumnRenamed("cell", "shard")
    )

    def worker(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
        U = V / np.linalg.norm(V, axis=1, keepdims=True)
        nbrs = nsw_build(U, m=m, ef_build=ef_build)
        return pd.DataFrame(
            {
                "shard": pdf["shard"].astype("int64"),
                "pos": pd.Series(range(len(V)), dtype="int64"),
                "vec_id": pdf["neighbor_id"].astype("int64"),
                "cv": pdf["cv"],
                "nbrs": [list(map(int, x)) for x in nbrs],
            }
        )

    idx = sharded.groupBy("shard").applyInPandas(
        worker,
        "shard long, pos long, vec_id long, cv array<double>, nbrs array<long>",
    )
    idx.write.mode("overwrite").partitionBy("shard").parquet(path + "/graph")
    cent.coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    spark = corpus.sparkSession
    from ..session import local_rows_df as _ldf

    _ldf(
        spark,
        [(int(n_cells), int(m), int(ef_build), float(spill_eps))],
        "n_cells int, m int, ef_build int, spill_eps double",
    ).write.mode("overwrite").parquet(path + "/meta")


def load_nsw_routed_index(spark, path: str) -> tuple[DataFrame, DataFrame, dict]:
    """→ (centroids, graph, params) for ``nsw_routed_ann_topk(index=…)``.
    Centroids/params are frozen post-save and memoized per (session,
    path, meta mtime); the graph read stays fresh (see _frozen_memo)."""

    def _load_frozen():
        meta = spark.read.parquet(path + "/meta").collect()[0]
        row = meta.asDict()
        return (
            spark.read.parquet(path + "/centroids"),
            {
                "n_cells": int(row["n_cells"]),
                "m": int(row["m"]),
                "ef_build": int(row["ef_build"]),
                # pre-r9 indexes have no spill column — they were built
                # with the plain nearest-cell assignment
                "spill_eps": float(row.get("spill_eps", 0.0) or 0.0),
            },
        )

    cent, params = _frozen_memo(spark, path, _load_frozen)
    return (cent, spark.read.parquet(path + "/graph"), params)


def _unit_pq_codebooks(
    corpus: DataFrame,
    n_subspaces: int,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    train_sample: int = 2048,
) -> np.ndarray:
    """PQ codebooks trained on UNIT-normalized vectors — the coding space
    of the graph beams (NSW distances are dots of unit vectors, so the
    ADC approximation must quantize the same space). Normalization
    happens DRIVER-SIDE in numpy (``np.linalg.norm``) so the codebooks,
    the per-cell encode and the independent golden mirror share one IEEE
    op sequence end to end. Bounded driver sample, same contract as
    ``similarity.pq_codebooks``."""
    from .similarity import _pq_lloyd

    rows = (
        corpus.filter(F.col(id_col) < train_sample)
        .orderBy(id_col)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return _pq_lloyd(mat, n_subspaces, n_centroids, 8)


def save_nsw_routed_pq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 8,
    m: int = 8,
    ef_build: int = 24,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spill_eps: float = 0.0,
) -> None:
    """Build + persist the PQ-COMPRESSED routed NSW index — the DiskANN
    composition (Subramanya et al. 2019): the graph is built OFFLINE at
    full precision (build quality costs nothing at probe time), but the
    persisted cell shards store each node as (8-byte PQ codes, adjacency)
    instead of raw float64 vectors — at 10¹¹ vectors the vector payload,
    not the adjacency, dominates shard memory, and the codes cut it ~64×
    (64 dims × 8 B → S bytes). Probes beam with ADC over the codes and
    exact-rerank survivors from the RAW corpus table (which lives in the
    lake anyway), so compression costs candidate QUALITY only — recall is
    recovered by ef_search, never wrong answers. Codebooks train on unit
    vectors (the beams' coding space) and persist beside the graph;
    ``spill_eps`` composes the SPANN closure assignment."""
    from .similarity import ivf_assign, ivf_assign_spill, ivf_centroids

    cent = ivf_centroids(corpus, n_cells, id_col, vec_col)
    books = _unit_pq_codebooks(corpus, n_subspaces, n_centroids, id_col, vec_col)
    c_sel = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    assign = (
        ivf_assign_spill(c_sel, cent, spill_eps, "neighbor_id", "cv")
        if spill_eps > 0.0
        else ivf_assign(c_sel, cent, 1, "neighbor_id", "cv")
    )
    sharded = c_sel.join(
        assign.select("neighbor_id", "cell"), "neighbor_id"
    ).withColumnRenamed("cell", "shard")
    S, C, ds = books.shape

    def worker(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
        U = V / np.linalg.norm(V, axis=1, keepdims=True)
        nbrs = nsw_build(U, m=m, ef_build=ef_build)  # full-precision build
        sub = U.reshape(U.shape[0], S, ds)
        d2 = ((sub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1)
        codes = d2.argmin(-1)  # (n, S); ties -> lowest centroid id
        return pd.DataFrame(
            {
                "shard": pdf["shard"].astype("int64"),
                "pos": pd.Series(range(len(U)), dtype="int64"),
                "vec_id": pdf["neighbor_id"].astype("int64"),
                "codes": [list(map(int, c)) for c in codes],
                "nbrs": [list(map(int, x)) for x in nbrs],
            }
        )

    idx = sharded.groupBy("shard").applyInPandas(
        worker,
        "shard long, pos long, vec_id long, codes array<int>, nbrs array<long>",
    )
    idx.write.mode("overwrite").partitionBy("shard").parquet(path + "/graph")
    cent.coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    spark = corpus.sparkSession
    from ..session import local_rows_df as _ldf

    _ldf(
        spark,
        [
            (int(s), int(c), books[s, c].tolist())
            for s in range(S)
            for c in range(C)
        ],
        "s int, c int, vec array<double>",
    ).write.mode("overwrite").parquet(path + "/books")
    _ldf(
        spark,
        [(int(n_cells), int(m), int(ef_build), int(S), int(C), float(spill_eps))],
        "n_cells int, m int, ef_build int, n_subspaces int, "
        "n_centroids int, spill_eps double",
    ).write.mode("overwrite").parquet(path + "/meta")


#: (applicationId, path, meta_stamp) → the FROZEN parts of a saved index
#: (meta params, codebooks ndarray, centroid DataFrame handle). Every
#: save_* writes its meta file LAST, and upserts rewrite only graph shard
#: partitions — so for a given meta mtime these parts are immutable and
#: their per-load collects (2 driver jobs each) are pure fixed cost in a
#: per-batch maintenance loop. The GRAPH read is never memoized: callers
#: must see post-upsert shards (the stream query's documented contract).
_FROZEN_META_CACHE: dict = {}


def _meta_stamp(path: str):
    """Newest mtime_ns among the meta part files, or None off local FS
    (no memoization there — fresh loads keep the old behavior)."""
    import glob as _g
    import os as _os

    try:
        return max(
            _os.stat(p).st_mtime_ns
            for p in _g.glob(_os.path.join(path, "meta", "part-*.parquet"))
        )
    except (ValueError, OSError):
        return None


def _frozen_memo(spark, path: str, loader):
    """Memoize ``loader()``'s frozen-part tuple per (session, path, meta
    mtime); a re-save rewrites meta (last) and invalidates the key."""
    stamp = _meta_stamp(path)
    if stamp is None:
        return loader()
    key = (spark.sparkContext.applicationId, path, stamp)
    got = _FROZEN_META_CACHE.get(key)
    if got is None:
        # evict stale stamps of the same (session, path)
        for k in [
            k for k in _FROZEN_META_CACHE if k[0] == key[0] and k[1] == path
        ]:
            del _FROZEN_META_CACHE[k]
        got = loader()
        _FROZEN_META_CACHE[key] = got
    return got


def load_nsw_routed_pq_index(
    spark, path: str
) -> tuple[DataFrame, DataFrame, np.ndarray, dict]:
    """→ (centroids, graph, codebooks, params) for
    ``nsw_routed_pq_ann_topk``. The codebook fetch is bounded (S·C
    rows). Meta/books/centroids are frozen post-save (upserts rewrite
    only graph shards), so their collects are memoized per (session,
    path, meta mtime); the graph read is always fresh."""

    def _load_frozen():
        meta = spark.read.parquet(path + "/meta").collect()[0].asDict()
        S, C = int(meta["n_subspaces"]), int(meta["n_centroids"])
        brows = spark.read.parquet(path + "/books").collect()
        books = np.zeros((S, C, len(brows[0]["vec"])), dtype=np.float64)
        for r in brows:
            books[int(r["s"]), int(r["c"])] = np.asarray(
                r["vec"], dtype=np.float64
            )
        return (
            spark.read.parquet(path + "/centroids"),
            books,
            {
                "n_cells": int(meta["n_cells"]),
                "m": int(meta["m"]),
                "ef_build": int(meta["ef_build"]),
                "spill_eps": float(meta.get("spill_eps", 0.0) or 0.0),
            },
        )

    cent, books, params = _frozen_memo(spark, path, _load_frozen)
    return (cent, spark.read.parquet(path + "/graph"), books, params)


def nsw_routed_pq_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    index: tuple[DataFrame, DataFrame, np.ndarray, dict],
    k: int = 5,
    n_probe: int = 2,
    ef_search: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_mode: str = "waves",
) -> DataFrame:
    """Probe a :func:`save_nsw_routed_pq_index` index: queries route to
    their ``n_probe`` nearest cells (the routed family's assignment),
    each probed cell beams with ADC over its nodes' PQ CODES
    (:func:`nsw_beam_search_adc` — the shard holds no raw vectors), and
    the nomination union exact-reranks against the raw corpus table.
    Per-query cost: n_probe beams over 8-byte codes + refine-sized exact
    cosine — the memory-bound rung of the routed ladder. Wave-chunked
    above QUERY_BATCH_LIMIT like the whole family; ``probe_mode=
    "cogroup"`` runs the fully-distributed probe instead (zero driver
    collect — see nsw_routed_ann_topk)."""
    from .similarity import ivf_assign

    cent, graph_df, books, params = index
    spilled = params.get("spill_eps", 0.0) > 0.0
    S, C, ds = books.shape
    q_sel = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c_sel = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    qassign = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        cent,
        n_probe,
        "query_id",
        "qv",
    ).select("query_id", "cell")
    if probe_mode == "cogroup":
        cand = _routed_pq_probe_cogroup(
            q_sel, qassign, graph_df, books, ef_search
        )
        if spilled:
            cand = cand.distinct()
        return _exact_rerank(cand, q_sel, c_sel, k)
    # limit-probe instead of a count job: the common queries ≪ corpus
    # call collects its single wave directly (one driver job instead of
    # count + collect — measured ~0.2 s per declared-query call)
    q_head = q_sel.limit(QUERY_BATCH_LIMIT + 1).collect()
    if len(q_head) <= QUERY_BATCH_LIMIT:
        n_chunks = 1
    else:
        n_q = q_sel.count()
        n_chunks = max(1, -(-n_q // QUERY_BATCH_LIMIT))
    chunk_expr = F.pmod(F.xxhash64(F.col("query_id")), F.lit(n_chunks))
    cand_parts = []
    for ci in range(n_chunks):
        qc = q_sel if n_chunks == 1 else q_sel.filter(chunk_expr == ci)
        rows = q_head if n_chunks == 1 else qc.collect()
        if not rows:
            continue
        rows.sort(key=lambda r: r["query_id"])
        qids = np.array([r["query_id"] for r in rows], dtype=np.int64)
        qmat = np.array([r["qv"] for r in rows], dtype=np.float64)
        qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        # per-query ADC tables against the unit-space codebooks:
        # tab[q, s, c] = dot(q_s, books[s, c]) — elementwise-mul + sum,
        # the exact op the golden mirror uses
        qsub = qmat.reshape(qmat.shape[0], S, ds)
        tables = (books[None, :, :, :] * qsub[:, :, None, :]).sum(-1)
        qidx = {int(q): i for i, q in enumerate(qids)}
        qa = qassign if n_chunks == 1 else qassign.filter(chunk_expr == ci)
        probes: dict[int, list[int]] = {}
        for r in qa.collect():
            probes.setdefault(int(r["cell"]), []).append(qidx[int(r["query_id"])])

        def make_worker(probes=probes, qids=qids, tables=tables):
            def worker(pdf: pd.DataFrame) -> pd.DataFrame:
                cell = int(pdf["shard"].iloc[0])
                probing = sorted(probes.get(cell, []))
                if not probing:
                    return pd.DataFrame(
                        {
                            "query_id": pd.Series([], dtype="int64"),
                            "neighbor_id": pd.Series([], dtype="int64"),
                        }
                    )
                pdf = pdf.sort_values("pos").reset_index(drop=True)
                ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                codes = np.array(
                    [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
                )
                nbrs = [list(map(int, x)) for x in pdf["nbrs"]]
                out_q, out_n = [], []
                for qi in probing:
                    for _, p in nsw_beam_search_adc(
                        codes, nbrs, tables[qi], ef_search
                    ):
                        out_q.append(int(qids[qi]))
                        out_n.append(int(ids[p]))
                return pd.DataFrame(
                    {
                        "query_id": pd.Series(out_q, dtype="int64"),
                        "neighbor_id": pd.Series(out_n, dtype="int64"),
                    }
                )

            return worker

        cand_parts.append(
            graph_df.groupBy("shard").applyInPandas(
                make_worker(), "query_id long, neighbor_id long"
            )
        )
    if not cand_parts:
        from ..session import local_rows_df as _ldf

        return _ldf(
            queries.sparkSession,
            [],
            "query_id long, neighbor_id long, rank int, cosine double",
        )
    cand = cand_parts[0]
    for extra in cand_parts[1:]:
        cand = cand.unionByName(extra)
    if spilled:
        cand = cand.distinct()
    return _exact_rerank(cand, q_sel, c_sel, k)


def save_nsw_index(
    corpus: DataFrame,
    path: str,
    n_shards: int = 4,
    m: int = 8,
    ef_build: int = 24,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build + persist the sharded NSW graph (parquet partitioned by
    shard, parameters alongside) — the mkdb-offline frame every other
    index family here has: the build is paid once, probes pay only the
    beam search. Rebuilding one shard after a lost ingest batch rewrites
    one partition, never the index."""
    idx = build_nsw_index(corpus, n_shards, m, ef_build, id_col, vec_col)
    idx.write.mode("overwrite").partitionBy("shard").parquet(path + "/graph")
    spark = corpus.sparkSession
    from ..session import local_rows_df as _ldf

    _ldf(
        spark,
        [(int(n_shards), int(m), int(ef_build))],
        "n_shards int, m int, ef_build int",
    ).write.mode("overwrite").parquet(path + "/meta")


def load_nsw_index(spark, path: str) -> tuple[DataFrame, dict]:
    """→ (graph DataFrame, params) for ``nsw_ann_topk(index=…)``. The
    params collect is memoized per (session, path, meta mtime) — meta is
    frozen post-save; the graph read stays fresh (see _frozen_memo)."""

    def _load_frozen():
        meta = spark.read.parquet(path + "/meta").collect()[0]
        return (
            {
                "n_shards": int(meta["n_shards"]),
                "m": int(meta["m"]),
                "ef_build": int(meta["ef_build"]),
            },
        )

    (params,) = _frozen_memo(spark, path, _load_frozen)
    return (spark.read.parquet(path + "/graph"), params)


def upsert_nsw_index(
    new: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a saved NSW index by CONTINUING each
    shard's deterministic insertion sequence (new nodes take positions
    after the existing ones, ascending id; the degree-cap prune may
    rewire existing nodes, so touched shard partitions are rewritten).

    Append-only id discipline ⇒ exact rebuild equivalence: if every new
    id is greater than every indexed id, the continued insertion order
    IS the full rebuild's order, so the upserted graph is bit-identical
    to ``save_nsw_index`` over the union (tested). Interleaved ids still
    yield a valid NSW graph — insertion order is part of the graph's
    identity, as in every incremental HNSW deployment — but not the
    rebuild's; keep ingest batches id-monotone if you need replayable
    parity."""
    spark = new.sparkSession
    graph, params = load_nsw_index(spark, path)
    n_shards, m, ef_build = params["n_shards"], params["m"], params["ef_build"]
    add = new.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("shard", F.col("vec_id") % F.lit(n_shards))
    touched = [r["shard"] for r in add.select("shard").distinct().collect()]
    if not touched:
        return
    old = graph.filter(F.col("shard").isin(touched)).select(
        "shard", "pos", "vec_id", "cv", "nbrs"
    )
    merged = old.unionByName(
        add.select(
            "shard",
            F.lit(None).cast("long").alias("pos"),
            "vec_id",
            "cv",
            F.lit(None).cast("array<long>").alias("nbrs"),
        )
    )

    def worker(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, _U, cvs, nbrs = _continue_insertion(pdf, m, ef_build)
        return pd.DataFrame(
            {
                "shard": np.full(len(ids), int(pdf["shard"].iloc[0]), dtype=np.int64),
                "pos": np.arange(len(ids), dtype=np.int64),
                "vec_id": ids,
                "cv": cvs,
                "nbrs": nbrs,
            }
        )

    rebuilt = merged.groupBy("shard").applyInPandas(
        worker,
        "shard long, pos long, vec_id long, cv array<double>, nbrs array<long>",
    )
    _overwrite_touched_shards(spark, rebuilt, path + "/graph")


def _overwrite_touched_shards(spark, df: DataFrame, graph_path: str) -> None:
    """The upsert family's write protocol: materialize (the plan reads
    the same path it overwrites), then dynamic-partition-overwrite ONLY
    the touched shard partitions, restoring the caller's prior conf."""
    df = df.localCheckpoint(eager=True)
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy("shard").parquet(graph_path)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)


def _continue_insertion(pdf: pd.DataFrame, m: int, ef_build: int):
    """Shared continue-the-sequence kernel for the upsert family: rows
    with a pos are the existing graph (sorted by pos), null-pos rows are
    fresh (sorted ascending vec_id, appended after). → (ids, U, nbrs).
    A previously-empty shard seeds exactly like nsw_build (first node
    gets no edges — the r9 self-loop fix)."""
    has_pos = pdf[pdf["pos"].notna()].sort_values("pos")
    fresh = pdf[pdf["pos"].isna()].sort_values("vec_id")
    ordered = pd.concat([has_pos, fresh])
    V = np.array([np.asarray(v, dtype=np.float64) for v in ordered["cv"]])
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    nbrs = [list(map(int, x)) for x in has_pos["nbrs"]]
    n_old = len(nbrs)
    nbrs += [[] for _ in range(len(fresh))]
    m_max = 2 * m
    for i in range(max(n_old, 1), len(U)):
        res = nsw_beam_search(U, nbrs, U[i], ef_build)
        chosen = [p for _, p in res[: min(m, len(res))]]
        for p in chosen:
            nbrs[i].append(p)
            nbrs[p].append(i)
            if len(nbrs[p]) > m_max:
                ds = sorted((-float(np.dot(U[p], U[x])), x) for x in nbrs[p])
                nbrs[p] = sorted(x for _, x in ds[:m_max])
            else:
                nbrs[p].sort()
        nbrs[i].sort()
    ids = ordered["vec_id"].to_numpy(dtype=np.int64)
    return ids, U, list(ordered["cv"]), nbrs


def upsert_nsw_routed_index(
    new: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a saved ROUTED index: assignment against the
    PERSISTED centroids (spill-aware — the index's own spill_eps rides
    its meta), then each touched cell CONTINUES its deterministic
    insertion sequence; only touched cell partitions rewrite.

    Rebuild equivalence: ``ivf_centroids`` is the deterministic
    lowest-id rule, so if every new id is GREATER than every indexed id a
    full ``save_nsw_routed_index`` over the union picks the SAME
    centroids, the same cell membership, and the same per-cell insertion
    order — the upserted index is bit-identical to the rebuild (tested).
    Interleaved ids still yield a valid index against the frozen
    centroids; keep ingest id-monotone for replayable parity.

    REPLAY-IDEMPOTENT: (shard, vec_id) pairs already present are dropped
    before insertion, so retrying the same upsert (a crashed streaming
    batch, a double-scheduled job) converges to the once-applied index
    instead of duplicating nodes — the contract the streaming
    index-maintenance loop relies on."""
    from .similarity import ivf_assign, ivf_assign_spill

    spark = new.sparkSession
    cent, graph, params = load_nsw_routed_index(spark, path)
    m, ef_build = params["m"], params["ef_build"]
    eps = params.get("spill_eps", 0.0)
    n_sel = new.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    assign = (
        ivf_assign_spill(n_sel, cent, eps, "vec_id", "cv")
        if eps > 0.0
        else ivf_assign(n_sel, cent, 1, "vec_id", "cv")
    )
    add = n_sel.join(assign.select("vec_id", "cell"), "vec_id").withColumnRenamed(
        "cell", "shard"
    )
    # REPLAY-IDEMPOTENT: drop (shard, vec_id) pairs the graph already
    # holds — assignment is deterministic against frozen centroids, so a
    # retried upsert (a crashed streaming batch, a double-scheduled job)
    # re-derives the same pairs and every already-written shard drops out
    # of `touched` instead of receiving duplicate nodes; a second full
    # replay is a no-op. Fresh ingest is unaffected (nothing matches).
    # Persisted: feeds both the touched-shard collect and the rebuild
    # plan — one assignment-UDF pass instead of one per action.
    add = add.join(
        graph.select("shard", "vec_id"), ["shard", "vec_id"], "left_anti"
    ).persist()
    try:
        touched = [r["shard"] for r in add.select("shard").distinct().collect()]
        if not touched:
            return
        old = graph.filter(F.col("shard").isin(touched)).select(
            "shard", "pos", "vec_id", "cv", "nbrs"
        )
        merged = old.unionByName(
            add.select(
                "shard",
                F.lit(None).cast("long").alias("pos"),
                "vec_id",
                "cv",
                F.lit(None).cast("array<long>").alias("nbrs"),
            )
        )

        def worker(pdf: pd.DataFrame) -> pd.DataFrame:
            ids, _U, cvs, nbrs = _continue_insertion(pdf, m, ef_build)
            return pd.DataFrame(
                {
                    "shard": np.full(
                        len(ids), int(pdf["shard"].iloc[0]), dtype=np.int64
                    ),
                    "pos": np.arange(len(ids), dtype=np.int64),
                    "vec_id": ids,
                    "cv": cvs,
                    "nbrs": nbrs,
                }
            )

        rebuilt = merged.groupBy("shard").applyInPandas(
            worker,
            "shard long, pos long, vec_id long, cv array<double>, nbrs array<long>",
        )
        _overwrite_touched_shards(spark, rebuilt, path + "/graph")
    finally:
        add.unpersist()


def upsert_nsw_routed_pq_index(
    new: DataFrame,
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a saved routed-PQ index — DiskANN-style
    maintenance: the shards hold only codes + adjacency, so the touched
    cells' RAW vectors are recovered from ``corpus`` (the lake-resident
    table the exact re-rank already reads; it must contain the indexed
    vectors), insertion continues at FULL precision, and every node
    re-encodes against the FROZEN persisted codebooks (deterministic
    encode ⇒ old nodes' codes are reproduced bit-for-bit; new codes use
    the frozen books — the add-vs-retrain contract of ``upsert_pq_index``:
    codes stay cell-independent and valid, retraining is an explicit
    rebuild). With id-monotone ingest above the codebook train-sample
    window the upserted index equals a full rebuild over the union
    bit-for-bit (same centroids, same train slice, same insertion order —
    tested); below it, rebuild would retrain the books, which is exactly
    the retrain decision this function refuses to make silently.
    Replay-idempotent like :func:`upsert_nsw_routed_index` — retried
    upserts drop their already-indexed (shard, vec_id) pairs."""
    from .similarity import ivf_assign, ivf_assign_spill

    spark = new.sparkSession
    cent, graph, books, params = load_nsw_routed_pq_index(spark, path)
    m, ef_build = params["m"], params["ef_build"]
    eps = params.get("spill_eps", 0.0)
    S, C, ds = books.shape
    n_sel = new.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    assign = (
        ivf_assign_spill(n_sel, cent, eps, "vec_id", "cv")
        if eps > 0.0
        else ivf_assign(n_sel, cent, 1, "vec_id", "cv")
    )
    add = n_sel.join(assign.select("vec_id", "cell"), "vec_id").withColumnRenamed(
        "cell", "shard"
    )
    # replay-idempotent, same argument as upsert_nsw_routed_index: a
    # retried batch's already-written (shard, vec_id) pairs drop out.
    # Persisted: the anti-joined assignment feeds BOTH the bounded
    # touched-shard collect and the rebuild plan — without the pin the
    # per-row assignment UDF pass runs once per action (r11 verdict
    # item: batch the shard-touch discovery instead of re-deriving it).
    add = add.join(
        graph.select("shard", "vec_id"), ["shard", "vec_id"], "left_anti"
    ).persist()
    try:
        touched = [r["shard"] for r in add.select("shard").distinct().collect()]
        if not touched:
            return
        raw = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        old_g = graph.filter(F.col("shard").isin(touched)).select(
            "shard", "pos", "vec_id", "nbrs"
        )
        # fail LOUDLY if the corpus is missing any indexed vector: an
        # inner join would silently drop those nodes, _continue_insertion
        # would renumber positions, and surviving nbrs arrays would point
        # at the old positions — a quietly corrupted graph (r9 ADVICE).
        # The check rides the rebuild pass itself (LEFT join; a null cv on
        # an indexed row raises inside the worker, before any shard
        # write) instead of paying a separate per-batch anti-join job.
        old = old_g.join(raw, "vec_id", "left").select(
            "shard", "pos", "vec_id", "cv", "nbrs"
        )
        merged = old.unionByName(
            add.select(
                "shard",
                F.lit(None).cast("long").alias("pos"),
                "vec_id",
                "cv",
                F.lit(None).cast("array<long>").alias("nbrs"),
            )
        )

        def worker(pdf: pd.DataFrame) -> pd.DataFrame:
            missing = sorted(
                int(v)
                for v in pdf.loc[
                    pdf["pos"].notna() & pdf["cv"].isna(), "vec_id"
                ].head(5)
            )
            if missing:
                raise ValueError(
                    f"corpus is missing raw vectors for indexed vec_ids "
                    f"{missing} (touched shards must recover EVERY indexed "
                    "node's full-precision vector to continue insertion; "
                    "pass the same lake table the index was built from)"
                )
            ids, U, _cvs, nbrs = _continue_insertion(pdf, m, ef_build)
            sub = U.reshape(U.shape[0], S, ds)
            d2 = ((sub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1)
            codes = d2.argmin(-1)
            return pd.DataFrame(
                {
                    "shard": np.full(
                        len(ids), int(pdf["shard"].iloc[0]), dtype=np.int64
                    ),
                    "pos": np.arange(len(ids), dtype=np.int64),
                    "vec_id": ids,
                    "codes": [list(map(int, c)) for c in codes],
                    "nbrs": nbrs,
                }
            )

        rebuilt = merged.groupBy("shard").applyInPandas(
            worker,
            "shard long, pos long, vec_id long, codes array<int>, nbrs array<long>",
        )
        try:
            _overwrite_touched_shards(spark, rebuilt, path + "/graph")
        except Exception as exc:
            # surface the worker-side guard as the API's documented
            # ValueError (the raise happens during the pre-write
            # materialization, so no shard partition was rewritten)
            msg = str(exc)
            tag = "corpus is missing raw vectors"
            if tag in msg:
                raise ValueError(msg[msg.index(tag):].split("\n")[0]) from exc
            raise
    finally:
        add.unpersist()


def _shard_index_search(qids: np.ndarray, qmat: np.ndarray, ef_search: int):
    """Search worker over PREBUILT graph rows (pos/cv/nbrs) — identical
    beam to the inline path; the graph build was paid at save time."""

    def worker(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
        if len(V) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": []})
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        nbrs = [list(map(int, x)) for x in pdf["nbrs"]]
        out_q, out_n = [], []
        for qi in range(len(qids)):
            res = nsw_beam_search(V, nbrs, qmat[qi], ef_search)
            for _, p in res:
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[p]))
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
            }
        )

    return worker


def nsw_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_shards: int = 4,
    m: int = 8,
    ef_build: int = 24,
    ef_search: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, dict] | None = None,
) -> DataFrame:
    """Sharded-NSW graph ANN top-k (see module docstring for the spec
    and the 100 TB sharding story).

    The Python graph only NOMINATES candidates (≤ n_shards·ef_search
    per query); the returned ranking is exact JVM-side cosine over the
    nomination union with the family's rounded-cosine + id tiebreaks —
    so recall is the only approximation, never the scores. Query
    batches above QUERY_BATCH_LIMIT run in hash-chunked waves.
    ``index=(graph_df, params)`` from :func:`load_nsw_index` skips the
    per-call graph build (the mkdb-offline frame) — probing a saved
    index is bit-identical to the inline path over the same corpus.
    """
    q_sel = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c_sel = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("shard", F.col("neighbor_id") % F.lit(n_shards))

    # limit-probe instead of a count job: the common queries ≪ corpus
    # call collects its single wave directly (one driver job instead of
    # count + collect — measured ~0.2 s per declared-query call)
    q_head = q_sel.limit(QUERY_BATCH_LIMIT + 1).collect()
    if len(q_head) <= QUERY_BATCH_LIMIT:
        n_chunks = 1
    else:
        n_q = q_sel.count()
        n_chunks = max(1, -(-n_q // QUERY_BATCH_LIMIT))
    chunk_expr = F.pmod(F.xxhash64(F.col("query_id")), F.lit(n_chunks))
    cand_parts = []
    for ci in range(n_chunks):
        qc = q_sel if n_chunks == 1 else q_sel.filter(chunk_expr == ci)
        rows = q_head if n_chunks == 1 else qc.collect()
        if not rows:
            continue
        rows.sort(key=lambda r: r["query_id"])
        qids = np.array([r["query_id"] for r in rows], dtype=np.int64)
        qmat = np.array([r["qv"] for r in rows], dtype=np.float64)
        qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        if index is not None:
            graph_df, _params = index
            cand_parts.append(
                graph_df.groupBy("shard").applyInPandas(
                    _shard_index_search(qids, qmat, ef_search),
                    "query_id long, neighbor_id long",
                )
            )
        else:
            cand_parts.append(
                c_sel.groupBy("shard").applyInPandas(
                    _shard_candidates(qids, qmat, m, ef_build, ef_search),
                    "query_id long, neighbor_id long",
                )
            )
    cand = cand_parts[0]
    for extra in cand_parts[1:]:
        cand = cand.unionByName(extra)

    cos = F.round(
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6
    )
    scored = (
        cand.filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(q_sel), "query_id")
        .join(c_sel.select("neighbor_id", "cv"), "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
