"""Independent (non-Spark) reference implementations for the golden queries.

Every query pinned by ``tools/gen_golden_oracles.py`` is recomputed here
WITHOUT executing any Spark plan: inputs are read with DuckDB/pyarrow and
the results are produced by scalar/numpy code. Where the repo already has
a pure-numpy kernel that is itself independently validated (exact EMD via
closed-form trials in tests/test_ferret.py, the SRM/extract image kernels
validated byte-exact against scalar transcriptions in
tests/test_multimodal.py), that kernel is reused; everything that the
SPARK side distributes — chunk boundary scans, first-wins dedup windows,
bucket joins, ADC scans, rank windows, record aggregation — is
re-implemented here from the written spec (reference C file:line cited at
each site), so a pin produced by this module verifies the distributed
plan against an independent computation rather than against itself.

The Rabin scan in particular deliberately does NOT share rabin.py's
derivation: contribution tables here are built forward from the absorb
recurrence definition (rabin.c:72-100) per window position, while
rabin.py derives them by downward recurrence and scans via uint16 pair
tables. Identical outputs from the two constructions is the point.

Used by gen_golden_oracles.py (pin source) and
tests/test_declared_queries.py::test_golden_reference_matches_pins
(drift guard). Imports of bensp_suite_spark touch only numpy kernels —
no SparkSession is ever created on this path.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib
from decimal import ROUND_HALF_UP, Decimal
from functools import lru_cache

import duckdb
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# --------------------------------------------------------------------------
# shared numeric semantics
# --------------------------------------------------------------------------

_U32 = 0xFFFFFFFF
_U64 = 0xFFFFFFFFFFFFFFFF


def spark_round(x: float, d: int) -> float:
    """Spark's ROUND on DoubleType: BigDecimal.valueOf(double) — i.e. the
    shortest decimal representation (== Python repr) — then HALF_UP."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP)
    )


def fold_dot(a: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Sequential left fold Σ a_i·B_{·,i} in index order — the exact IEEE
    op sequence of F.aggregate(zip_with(a, b, *), 0.0, +) (similarity._dot)."""
    acc = np.zeros(B.shape[0], dtype=np.float64)
    for i in range(len(a)):
        acc += a[i] * B[:, i]
    return acc


def fold_sql2(a: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Sequential squared-L2 fold (dist_L2_float, cass_dist.c:45-58)."""
    acc = np.zeros(B.shape[0], dtype=np.float64)
    for i in range(len(a)):
        d = a[i] - B[:, i]
        acc += d * d
    return acc


def cosine_rounded(q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """round(dot/(|q||c|), 6) with fold-order dots, Spark ROUND semantics."""
    num = fold_dot(q, C)
    qn = float(np.sqrt(fold_dot(q, q.reshape(1, -1))[0]))
    cn = np.sqrt(np.array([fold_dot(C[i], C[i].reshape(1, -1))[0] for i in range(len(C))]))
    raw = num / (qn * cn)
    return np.array([spark_round(v, 6) for v in raw])


def hamming64(a: int, b: int) -> int:
    return bin(((a & _U64) ^ (b & _U64))).count("1")


def _brute_hamming_pairs(hashes: list[tuple[int, int]], max_hamming: int):
    """All (id_a < id_b, hamming ≤ max) pairs — the exact result contract of
    similarity.banded_hamming_pairs at max_hamming ≤ n_bands−1 (pigeonhole:
    every such pair shares at least one untouched band, so the banded join
    surfaces it; the exact bit_count refine drops everything farther)."""
    out = []
    for i in range(len(hashes)):
        ida, ha = hashes[i]
        for j in range(i + 1, len(hashes)):
            idb, hb = hashes[j]
            a, b = (ida, idb) if ida < idb else (idb, ida)
            d = hamming64(ha, hb)
            if d <= max_hamming:
                out.append((a, b, d))
    return sorted(out)


# --------------------------------------------------------------------------
# input tables (DuckDB scan — no Spark)
# --------------------------------------------------------------------------

def _documents(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def _embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    # stored as FLOAT[] — float32 values; cast to double is exact
    V = np.array([np.asarray(r[1], dtype=np.float32) for r in rows]).astype(np.float64)
    return ids, V


# --------------------------------------------------------------------------
# Rabin CDC — independent construction (rabin.c:15,72-100; rabin.h:7-11)
# --------------------------------------------------------------------------

IRR_POLY = 0x45C2B6A1
NWINDOW = 32
RABIN_MASK = 0xFFF
ANCHOR_JUMP = 2 * 1024 * 1024


def _fpreduce_ref(x: int) -> int:
    for _ in range(32):
        x = ((x << 1) ^ IRR_POLY) & _U32 if (x >> 31) else (x << 1) & _U32
    return x


@lru_cache(maxsize=1)
def _wintab_forward() -> np.ndarray:
    """(32, 256) u32 contribution tables built FORWARD from the definition:
    T[j][b] = absorb b at offset j then absorb 31−j zero bytes, where
    absorb(h, c) = (((h << 8) | c) & u32) ^ tab[h >> 24]."""
    tab = [_fpreduce_ref(i) for i in range(256)]

    def absorb(h: int, c: int) -> int:
        x = h >> 24
        return (((h << 8) | c) & _U32) ^ tab[x]

    T = np.zeros((NWINDOW, 256), dtype=np.uint32)
    for j in range(NWINDOW):
        for b in range(256):
            h = absorb(0, b)
            for _ in range(NWINDOW - 1 - j):
                h = absorb(h, 0)
            T[j, b] = h
    return T


def match_positions_ref(arr: np.ndarray) -> np.ndarray:
    """Positions i (NWINDOW ≤ i ≤ n) where hash(arr[i-32:i]) & 0xfff == 0."""
    T = _wintab_forward()
    n = int(arr.shape[0])
    if n < NWINDOW:
        return np.zeros(0, dtype=np.int64)
    m = n - NWINDOW + 1
    H = np.zeros(m, dtype=np.uint32)
    for j in range(NWINDOW):
        H ^= T[j][arr[j : j + m]]
    return np.flatnonzero((H & RABIN_MASK) == 0).astype(np.int64) + NWINDOW


def chunk_offsets_ref(data: bytes) -> list[tuple[int, int, int, int, bool]]:
    """Fragment (encoder.c:1140-1192) + FragmentRefine (encoder.c:885-958)
    greedy scans, re-implemented over the forward-table match positions."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = int(arr.shape[0])
    if n == 0:
        return [(0, 0, 0, 0, True)]
    matches = list(match_positions_ref(arr))

    def first_match_at_least(lo: int) -> int | None:
        import bisect

        i = bisect.bisect_left(matches, lo)
        return matches[i] if i < len(matches) else None

    anchors = [0]
    cur = 0
    while n - cur > ANCHOR_JUMP:
        nxt = first_match_at_least(cur + ANCHOR_JUMP + NWINDOW)
        if nxt is None or nxt >= n:
            break
        cur = nxt
        anchors.append(cur)
    anchors.append(n)

    out = []
    for l1 in range(len(anchors) - 1):
        cs, ce = anchors[l1], anchors[l1 + 1]
        bounds = [cs]
        cur = cs
        while True:
            nxt = first_match_at_least(cur + NWINDOW)
            if nxt is None or nxt >= ce:
                break
            cur = nxt
            bounds.append(cur)
        bounds.append(ce)
        last = len(bounds) - 2
        for l2 in range(len(bounds) - 1):
            out.append((l1, l2, bounds[l2], bounds[l2 + 1], l2 == last))
    return out


def _doc_fixture_contents(sf_dir: str, target_bytes: int = 16384):
    """dedup.fixtures.docs_from_documents content rule: utf-8 text + ' ',
    tiled to target_bytes and truncated."""
    out = []
    for doc_id, text in _documents(sf_dir):
        blob = (text + " ").encode("utf-8")
        reps = max(1, -(-target_bytes // max(1, len(blob))))
        out.append((int(doc_id), (blob * reps)[:target_bytes]))
    return out


def _fused_chunks(files: list[tuple[int, bytes]]):
    """(file_id, sha1, size, c_len) per chunk — c_len only for the chunk's
    first FILE-LOCAL occurrence (gzip level 1), else 0, mirroring the fused
    stage contract (dedup/pipeline.chunk_hash_compress)."""
    rows = []
    for fid, content in files:
        local_seen: set[str] = set()
        for _l1, _l2, s, e, _last in chunk_offsets_ref(content):
            piece = content[s:e]
            digest = hashlib.sha1(piece).hexdigest()
            if digest in local_seen:
                c_len = 0
            else:
                local_seen.add(digest)
                c_len = len(zlib.compress(piece, 1))
            rows.append((fid, digest, e - s, c_len))
    return rows


def cdc_dedup_stats(sf_dir: str):
    chunks = _fused_chunks(_doc_fixture_contents(sf_dir))
    per: dict[str, list[int]] = {}
    for _fid, sha, size, c_len in chunks:
        rec = per.setdefault(sha, [0, 0, 0])
        rec[0] += 1
        rec[1] = max(rec[1], size)
        rec[2] = max(rec[2], c_len)
    n = sum(r[0] for r in per.values())
    n_dup = sum(r[0] - 1 for r in per.values())
    total_input = sum(r[1] * r[0] for r in per.values())
    total_dedup = sum(r[1] for r in per.values())
    total_comp = sum(r[2] for r in per.values())
    cols = [
        ("n_chunks", "BIGINT"),
        ("n_dup", "BIGINT"),
        ("total_input_bytes", "BIGINT"),
        ("total_dedup_bytes", "BIGINT"),
        ("total_compressed_bytes", "BIGINT"),
        ("mean_chunk_b", "DOUBLE"),
        ("dup_ratio", "DOUBLE"),
    ]
    row = (
        n,
        n_dup,
        total_input,
        total_dedup,
        total_comp,
        spark_round(total_input / n, 2),
        spark_round(n_dup / n, 6),
    )
    return cols, [row]


def cdc_chunk_histogram(sf_dir: str):
    hist: dict[int, int] = {}
    for fid, content in _doc_fixture_contents(sf_dir):
        for _l1, _l2, s, e, _last in chunk_offsets_ref(content):
            slot = min((e - s) // 128, 255)
            hist[slot] = hist.get(slot, 0) + 1
    cols = [("slot", "BIGINT"), ("cnt", "BIGINT")]
    return cols, sorted(hist.items())


def cdc_round_trip_check(sf_dir: str):
    """decode(encode(files)) must reproduce every file byte-for-byte
    (decoder.c verification path) — the independent expectation is
    n_match == n_files, computed from the input cardinality alone."""
    n = len(_documents(sf_dir))
    return [("n_files", "BIGINT"), ("n_match", "BIGINT")], [(n, n)]


def cdc_ddp_datasource_scan(sf_dir: str):
    """Per-(archive, rtype) aggregation of the serialized .ddp record
    stream (format: sources/ddp.py; reference util.c:65-74,
    encoder.c:396-411): FINGERPRINT records carry sha1 (payload NULL on
    scan), COMPRESS records carry the gzip payload (sha1 NULL)."""
    docs = [(int(d), t.encode("utf-8")) for d, t in _documents(sf_dir) if d < 24]
    files = list(docs) + [(fid + 999, content) for fid, content in docs if fid < 9]
    rows = []
    for g in range(3):
        group = sorted((f for f in files if f[0] % 3 == g), key=lambda x: x[0])
        seen: set[str] = set()
        agg: dict[int, list] = {}  # rtype -> [n, payload_bytes|None, digests]
        for _fid, content in group:
            for _l1, _l2, s, e, _last in chunk_offsets_ref(content):
                piece = content[s:e]
                digest = hashlib.sha1(piece).hexdigest()
                if digest in seen:
                    rec = agg.setdefault(0, [0, None, set()])
                    rec[0] += 1
                    rec[2].add(digest)
                else:
                    seen.add(digest)
                    rec = agg.setdefault(1, [0, 0, set()])
                    rec[0] += 1
                    rec[1] += len(zlib.compress(piece, 1))
        for rtype, (cnt, pbytes, digests) in sorted(agg.items()):
            rows.append((f"a{g}.ddp", rtype, cnt, pbytes, len(digests)))
    cols = [
        ("archive", "VARCHAR"),
        ("rtype", "INTEGER"),
        ("n_records", "BIGINT"),
        ("payload_bytes", "BIGINT"),
        ("n_digests", "BIGINT"),
    ]
    return cols, rows


# --------------------------------------------------------------------------
# ANN goldens (similarity.py constants: ANN_SEED=77, hyperplane per-table
# seed stride 7919 — the spec the Spark UDFs and this module both draw from)
# --------------------------------------------------------------------------

ANN_SEED = 77


def _hyperplanes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    cols = []
    for t in range(n_tables):
        rng = np.random.default_rng(ANN_SEED + 7919 * t)
        cols.append(rng.standard_normal((n_planes, dim)).T)
    return np.hstack(cols)


def _topk_rows(query_id: int, cand_ids: np.ndarray, cand_cos: np.ndarray, k: int):
    order = sorted(range(len(cand_ids)), key=lambda i: (-cand_cos[i], cand_ids[i]))
    return [
        (int(query_id), int(cand_ids[i]), rank + 1, float(cand_cos[i]))
        for rank, i in enumerate(order[:k])
    ]


ANN_COLS = [
    ("query_id", "BIGINT"),
    ("neighbor_id", "BIGINT"),
    ("rank", "INTEGER"),
    ("cosine", "DOUBLE"),
]


def ann_lsh_topk(sf_dir: str, k: int = 5, dim: int = 64, n_planes: int = 6,
                 n_tables: int = 8, n_probes: int = 6):
    ids, V = _embeddings(sf_dir)
    H = _hyperplanes(dim, n_planes, n_tables)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    bits = (V @ H) > 0
    buckets = bits.reshape(len(V), n_tables, n_planes) @ weights  # (n, T)
    # corpus bucket index: (table, bucket) -> ids
    index: dict[tuple[int, int], list[int]] = {}
    for row, vid in enumerate(ids):
        for t in range(n_tables):
            index.setdefault((t, int(buckets[row, t])), []).append(int(vid))
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    rows = []
    for qrow, qid in enumerate(ids):
        if qid >= 8:
            continue
        cand: set[int] = set()
        for t in range(n_tables):
            base = int(buckets[qrow, t])
            probes = [base] + [base ^ (1 << i) for i in range(min(n_probes - 1, n_planes))]
            for b in probes:
                cand.update(index.get((t, b), ()))
        cand.discard(int(qid))
        cids = np.array(sorted(cand), dtype=np.int64)
        C = V[[id_to_row[c] for c in cids]]
        rows += _topk_rows(qid, cids, cosine_rounded(V[qrow], C), k)
    return ANN_COLS, rows


def ann_pq_topk(sf_dir: str, k: int = 5, n_subspaces: int = 8, n_centroids: int = 16,
                refine: int = 10, train_iters: int = 8, train_sample: int = 2048):
    ids, V = _embeddings(sf_dir)
    mat = V[ids < train_sample]  # ids sorted ascending already
    d = mat.shape[1]
    ds = d // n_subspaces
    sub = mat.reshape(mat.shape[0], n_subspaces, ds)
    books = sub[:n_centroids].transpose(1, 0, 2).copy()
    for _ in range(train_iters):
        for s_i in range(n_subspaces):
            x = sub[:, s_i, :]
            d2 = ((x[:, None, :] - books[s_i][None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c_i in range(n_centroids):
                members = x[assign == c_i]
                if len(members):
                    books[s_i, c_i] = members.mean(0)
    allsub = V.reshape(V.shape[0], n_subspaces, ds)
    codes = ((allsub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1).argmin(-1)
    m = refine * k
    srange = np.arange(n_subspaces)
    rows = []
    for qrow, qid in enumerate(ids):
        if qid >= 8:
            continue
        qsub = V[qrow].reshape(n_subspaces, ds)
        qtab = ((qsub[:, None, :] - books) ** 2).sum(-1)  # (S, C)
        ad = qtab[srange[None, :], codes].sum(1)  # (N,)
        mask = ids != qid
        idx = np.nonzero(mask)[0]
        top = idx[np.lexsort((ids[idx], ad[idx]))[:m]]
        cids = ids[top]
        order = np.argsort(cids, kind="stable")
        cids = cids[order]
        C = V[top][order]
        rows += _topk_rows(qid, cids, cosine_rounded(V[qrow], C), k)
    return ANN_COLS, rows


def ann_ivfpq_topk(sf_dir: str, k: int = 5, n_cells: int = 16, n_probe: int = 2,
                   n_subspaces: int = 8, n_centroids: int = 16, refine: int = 4,
                   train_iters: int = 8, train_sample: int = 2048):
    """IVF-PQ composition: coarse-cell probe restricts the ADC scan
    (similarity.ivfpq_ann_topk). Distances accumulate dimension-at-a-time
    like ivf_assign's fold (sequential — numpy sum over ≤128 elements is
    sequential too, so .sum(-1) is the identical IEEE sequence here)."""
    ids, V = _embeddings(sf_dir)
    cent = V[ids < n_cells]  # ids sorted ascending → cell c = vector id c
    # corpus cell assignment: squared L2, tie → lowest cell (argsort stable
    # over cells-ascending columns == argmin-first-occurrence)
    cd2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(-1)  # (N, cells)
    cell_of = cd2.argmin(1)
    # PQ codebooks + codes — identical derivation to ann_pq_topk
    mat = V[ids < train_sample]
    d = mat.shape[1]
    ds = d // n_subspaces
    sub = mat.reshape(mat.shape[0], n_subspaces, ds)
    books = sub[:n_centroids].transpose(1, 0, 2).copy()
    for _ in range(train_iters):
        for s_i in range(n_subspaces):
            x = sub[:, s_i, :]
            d2 = ((x[:, None, :] - books[s_i][None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c_i in range(n_centroids):
                members = x[assign == c_i]
                if len(members):
                    books[s_i, c_i] = members.mean(0)
    allsub = V.reshape(V.shape[0], n_subspaces, ds)
    codes = ((allsub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1).argmin(-1)
    m = refine * k
    srange = np.arange(n_subspaces)
    rows = []
    for qrow, qid in enumerate(ids):
        if qid >= 8:
            continue
        qd2 = ((V[qrow][None, :] - cent) ** 2).sum(-1)
        probed = np.argsort(qd2, kind="stable")[:n_probe]  # tie → lowest cell
        mask = np.isin(cell_of, probed) & (ids != qid)
        idx = np.nonzero(mask)[0]
        qsub = V[qrow].reshape(n_subspaces, ds)
        qtab = ((qsub[:, None, :] - books) ** 2).sum(-1)  # (S, C)
        ad = qtab[srange[None, :], codes[idx]].sum(1)
        top = idx[np.lexsort((ids[idx], ad))[:m]]
        cids = ids[top]
        order = np.argsort(cids, kind="stable")
        cids = cids[order]
        C = V[top][order]
        rows += _topk_rows(qid, cids, cosine_rounded(V[qrow], C), k)
    return ANN_COLS, rows


def ann_ivfpq_residual_topk(sf_dir: str, k: int = 5, n_cells: int = 16,
                            n_probe: int = 2, n_subspaces: int = 8,
                            n_centroids: int = 16, refine: int = 4,
                            train_iters: int = 8, train_sample: int = 2048):
    """IVF-PQ with RESIDUAL codes (FAISS IndexIVFPQ's encoding):
    codebooks train on (vector − cell centroid), the ADC table is per
    (query, probed cell). Mirrors similarity.ivfpq_ann_topk(residual=True)."""
    ids, V = _embeddings(sf_dir)
    cent = V[ids < n_cells]
    cd2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    cell_of = cd2.argmin(1)
    # residual codebooks from the train sample's residuals
    mat = V[ids < train_sample]
    md2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    mres = mat - cent[md2.argmin(1)]
    d = mat.shape[1]
    ds = d // n_subspaces
    sub = mres.reshape(mres.shape[0], n_subspaces, ds)
    books = sub[:n_centroids].transpose(1, 0, 2).copy()
    for _ in range(train_iters):
        for s_i in range(n_subspaces):
            x = sub[:, s_i, :]
            d2 = ((x[:, None, :] - books[s_i][None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c_i in range(n_centroids):
                members = x[assign == c_i]
                if len(members):
                    books[s_i, c_i] = members.mean(0)
    vres = V - cent[cell_of]
    allsub = vres.reshape(V.shape[0], n_subspaces, ds)
    codes = ((allsub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1).argmin(-1)
    m = refine * k
    srange = np.arange(n_subspaces)
    rows = []
    for qrow, qid in enumerate(ids):
        if qid >= 8:
            continue
        qd2 = ((V[qrow][None, :] - cent) ** 2).sum(-1)
        probed = np.argsort(qd2, kind="stable")[:n_probe]
        cand_ad, cand_idx = [], []
        for cell in probed:
            qres = (V[qrow] - cent[cell]).reshape(n_subspaces, ds)
            qtab = ((qres[:, None, :] - books) ** 2).sum(-1)
            mask = (cell_of == cell) & (ids != qid)
            idx = np.nonzero(mask)[0]
            cand_idx.append(idx)
            cand_ad.append(qtab[srange[None, :], codes[idx]].sum(1))
        idx = np.concatenate(cand_idx)
        ad = np.concatenate(cand_ad)
        top = idx[np.lexsort((ids[idx], ad))[:m]]
        cids = ids[top]
        order = np.argsort(cids, kind="stable")
        cids = cids[order]
        C = V[top][order]
        rows += _topk_rows(qid, cids, cosine_rounded(V[qrow], C), k)
    return ANN_COLS, rows


# --------------------------------------------------------------------------
# ferret goldens — exhaustive candidates + exact EMD (kernel reused from
# ferret/emd.py: pure numpy, independently validated against closed-form
# transport solutions in tests/test_ferret.py)
# --------------------------------------------------------------------------

FERRET_COLS = [
    ("q_image_id", "BIGINT"),
    ("rank", "INTEGER"),
    ("name", "VARCHAR"),
    ("emd", "DOUBLE"),
]


def _ferret_exhaustive(images: list[tuple[int, str, list[tuple[float, np.ndarray]]]],
                       query_ids: list[int], top_k: int):
    """(image_id, name, [(weight_f32, features_f32[dim])...]) → ferret
    top-k rows, mirroring candidates_exhaustive (per query REGION top
    2·top_k corpus regions by fold-squared-L2 with (dist, c_image_id)
    order, union, distinct) then exact-EMD rerank and the
    (round(emd,6), c_image_id) rank window."""
    from bensp_suite_spark.ferret.emd import emd, pairwise_l2

    per_region_k = 2 * top_k
    # exploded corpus regions
    c_img, c_feat = [], []
    for iid, _nm, regions in images:
        for _w, f in regions:
            c_img.append(iid)
            c_feat.append(np.asarray(f, dtype=np.float64))
    c_img = np.array(c_img, dtype=np.int64)
    C = np.vstack(c_feat)
    by_id = {iid: (nm, regions) for iid, nm, regions in images}

    rows = []
    for qid in query_ids:
        _qnm, qregions = by_id[qid]
        cand: set[int] = set()
        for _w, qf in qregions:
            dist = fold_sql2(np.asarray(qf, dtype=np.float64), C)
            order = sorted(range(len(dist)), key=lambda i: (dist[i], c_img[i]))
            cand.update(int(c_img[i]) for i in order[:per_region_k])
        w1 = np.array([w for w, _f in qregions], dtype=np.float64)
        f1 = np.vstack([np.asarray(f, dtype=np.float64) for _w, f in qregions])
        scored = []
        for cid in sorted(cand):
            cnm, cregions = by_id[cid]
            w2 = np.array([w for w, _f in cregions], dtype=np.float64)
            f2 = np.vstack([np.asarray(f, dtype=np.float64) for _w, f in cregions])
            scored.append((spark_round(emd(w1, w2, pairwise_l2(f1, f2)), 6), cid, cnm))
        scored.sort(key=lambda t: (t[0], t[1]))
        for rank, (e, _cid, cnm) in enumerate(scored[:top_k]):
            rows.append((int(qid), rank + 1, cnm, e))
    return rows


def ferret_topk_multiregion(sf_dir: str, regions_per_image: int = 4, top_k: int = 5):
    ids, V = _embeddings(sf_dir)
    Vf32 = V.astype(np.float32)
    w = np.float32(1.0 / regions_per_image)
    images = []
    for iid in sorted(set(int(v) // regions_per_image for v in ids)):
        members = np.nonzero(ids // regions_per_image == iid)[0]
        regions = [(float(w), Vf32[r]) for r in sorted(members, key=lambda r: ids[r])]
        images.append((iid, f"img_{iid:05d}.jpg", regions))
    qids = [iid for iid, _n, _r in images if iid < 4]
    return FERRET_COLS, _ferret_exhaustive(images, qids, top_k)


# --------------------------------------------------------------------------
# multimodal goldens — image/audio/video kernels reused (numpy, validated
# byte-exact vs scalar transcriptions in tests/test_multimodal.py); the
# fixture generation and every distributed step re-derived here
# --------------------------------------------------------------------------

def _synthetic_images(n: int = 12, size: int = 32, seed: int = 31):
    """multimodal.images.synthetic_images generation rule."""
    out = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        img = np.full((size, size, 3), rng.integers(0, 80, 3), dtype=np.uint8)
        for _ in range(int(rng.integers(1, 4))):
            x0, y0 = rng.integers(0, size // 2, 2)
            dx, dy = rng.integers(size // 4, size // 2, 2)
            img[x0 : x0 + dx, y0 : y0 + dy] = rng.integers(100, 255, 3)
        out.append((i, f"img_{i:05d}.raw", img))
    return out


def _textured_images(n: int = 12, size: int = 32, seed: int = 17,
                     dup_of: dict[int, int] | None = None):
    """multimodal.images.synthetic_textured_images generation rule."""
    out, imgs = [], []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        img = rng.integers(0, 200, (size, size, 3)).astype(np.uint8)
        imgs.append(img)
        out.append((i, img))
    for new_id, src in (dup_of or {}).items():
        dup = np.clip(imgs[src].astype(np.int32) + 10, 0, 255).astype(np.uint8)
        out.append((new_id, dup))
    return out


def _image_vecsets(images):
    from bensp_suite_spark.multimodal.images import (
        extract_features,
        rgb_to_hsv,
        srm_segment,
    )

    out = []
    for iid, name, rgb in images:
        hsv = rgb_to_hsv(rgb)
        mask, nrgn = srm_segment(rgb)
        regions = [
            (float(np.float32(wgt)), np.asarray(feats, dtype=np.float32))
            for wgt, feats in extract_features(hsv, mask, nrgn)
        ]
        out.append((iid, name, regions))
    return out


def multimodal_image_search(sf_dir: str):
    vecsets = _image_vecsets(_synthetic_images())
    qids = [iid for iid, _n, _r in vecsets]
    return FERRET_COLS, _ferret_exhaustive(vecsets, qids, top_k=3)


def multimodal_image_search_png(sf_dir: str):
    """CODEC-INDEPENDENT pin for the PNG-ingest variant: vecsets computed
    straight from the source pixel arrays (never touching the PNG codec),
    names carrying the .png fixture naming. The Spark query must decode
    its PNG-encoded copies back to these exact pixels to match."""
    images = [
        (iid, f"img_{iid:05d}.png", arr) for iid, _name, arr in _synthetic_images()
    ]
    vecsets = _image_vecsets(images)
    qids = [iid for iid, _n, _r in vecsets]
    return FERRET_COLS, _ferret_exhaustive(vecsets, qids, top_k=3)


def multimodal_image_search_jpeg(sf_dir: str):
    """Pin for the JPEG-ingest variant. JPEG is lossy, so unlike the PNG
    pin this rides through the codec: encode the source pixels and
    decode them back with the pure numpy codec (NO Spark anywhere), then
    compute vecsets. This independently verifies the distributed ingest
    plumbing (schema, batching, decode routing, ferret join); the codec's
    own fidelity is unit-tested in tests/test_multimodal.py."""
    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    images = [
        (
            iid,
            f"img_{iid:05d}.jpg",
            decode_jpeg(encode_jpeg(arr, quality=90, subsample=True,
                                    restart_interval=2)),
        )
        for iid, _name, arr in _synthetic_images()
    ]
    vecsets = _image_vecsets(images)
    qids = [iid for iid, _n, _r in vecsets]
    return FERRET_COLS, _ferret_exhaustive(vecsets, qids, top_k=3)


def multimodal_image_stats(sf_dir: str):
    rows = []
    for iid, _name, regions in _image_vecsets(_synthetic_images()):
        acc = 0.0  # sequential fold of float32 weights cast to double
        for w, _f in regions:
            acc += w
        rows.append((iid, len(regions), spark_round(acc, 4)))
    cols = [("image_id", "BIGINT"), ("n_regions", "INTEGER"), ("weight_sum", "DOUBLE")]
    return cols, rows


HAMMING_COLS = [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INTEGER")]
DUP_OF = {100: 0, 101: 1, 102: 2, 103: 3}


def multimodal_image_dedup(sf_dir: str):
    from bensp_suite_spark.multimodal.images import dhash_kernel

    hashes = [(iid, dhash_kernel(img)) for iid, img in _textured_images(dup_of=DUP_OF)]
    return HAMMING_COLS, _brute_hamming_pairs(hashes, 3)


def multimodal_image_phash_dedup(sf_dir: str):
    from bensp_suite_spark.multimodal.images import phash_kernel

    hashes = [(iid, phash_kernel(img)) for iid, img in _textured_images(dup_of=DUP_OF)]
    return HAMMING_COLS, _brute_hamming_pairs(hashes, 3)


def multimodal_audio_dedup(sf_dir: str):
    """queries.multimodal_audio_dedup fixture rule (seeds 90+i, half-gain
    copies of the first three) + envelope fingerprint kernel."""
    from bensp_suite_spark.multimodal.audio_video import (
        audio_fingerprint_kernel,
        decode_audio,
        encode_pcm_s16le,
    )

    hashes, sigs = [], []
    for i in range(8):
        rng = np.random.default_rng(90 + i)
        env = rng.uniform(0.1, 1.0, 65).repeat(130)[:8192]
        sig = (rng.uniform(-1, 1, 8192) * env * 12000).astype(np.int16)
        sigs.append(sig)
        decoded = decode_audio(encode_pcm_s16le(sig), "pcm-s16le")
        hashes.append((i, audio_fingerprint_kernel(decoded)))
    for i in range(3):
        decoded = decode_audio(encode_pcm_s16le(sigs[i] // 2), "pcm-s16le")
        hashes.append((100 + i, audio_fingerprint_kernel(decoded)))
    return HAMMING_COLS, _brute_hamming_pairs(hashes, 3)


def multimodal_audio_dedup_wav(sf_dir: str):
    """CODEC-INDEPENDENT pin for the WAV-ingest variant: fingerprints
    computed straight from the raw int16 samples (never touching the WAV
    container). The Spark query must decode its RIFF/WAVE payloads back
    to these exact sample values to match."""
    from bensp_suite_spark.multimodal.audio_video import audio_fingerprint_kernel

    hashes, sigs = [], []
    for i in range(8):
        rng = np.random.default_rng(90 + i)
        env = rng.uniform(0.1, 1.0, 65).repeat(130)[:8192]
        sig = (rng.uniform(-1, 1, 8192) * env * 12000).astype(np.int16)
        sigs.append(sig)
        hashes.append((i, audio_fingerprint_kernel(sig)))
    for i in range(3):
        hashes.append((100 + i, audio_fingerprint_kernel(sigs[i] // 2)))
    return HAMMING_COLS, _brute_hamming_pairs(hashes, 3)


def multimodal_audio_dedup_flac(sf_dir: str):
    """CODEC-INDEPENDENT pin for the FLAC-ingest variant: fingerprints
    computed straight from the raw int16 samples (never touching the FLAC
    bitstream). FLAC is lossless, so the Spark query's pure-Python decode
    must reproduce these exact sample values to match."""
    from bensp_suite_spark.multimodal.audio_video import audio_fingerprint_kernel

    hashes, sigs = [], []
    for i in range(8):
        rng = np.random.default_rng(90 + i)
        env = rng.uniform(0.1, 1.0, 65).repeat(130)[:8192]
        sig = (rng.uniform(-1, 1, 8192) * env * 12000).astype(np.int16)
        sigs.append(sig)
        hashes.append((i, audio_fingerprint_kernel(sig)))
    for i in range(3):
        hashes.append((100 + i, audio_fingerprint_kernel(sigs[i] // 2)))
    return HAMMING_COLS, _brute_hamming_pairs(hashes, 3)


def multimodal_audio_snippet_search(sf_dir: str, k: int = 1, min_votes: int = 2):
    """queries.multimodal_audio_snippet_search fixture rule (seeds 140+i,
    three offset cuts + one half-gain cut) + landmark kernel, with the
    hash-join/offset-vote/top-k mirrored in pure Python dicts."""
    from bensp_suite_spark.multimodal.audio_landmarks import landmark_kernel
    from bensp_suite_spark.multimodal.audio_video import (
        decode_audio,
        encode_pcm_s16le,
    )

    tracks = []
    for i in range(8):
        rng = np.random.default_rng(140 + i)
        env = rng.uniform(0.1, 1.0, 129).repeat(256)[:32768]
        sig = (rng.uniform(-1, 1, 32768) * env * 12000).astype(np.int16)
        tracks.append(sig)
    index: dict[int, list[tuple[int, int]]] = {}
    for mid, sig in enumerate(tracks):
        decoded = decode_audio(encode_pcm_s16le(sig), "pcm-s16le")
        for h, t in landmark_kernel(decoded):
            index.setdefault(h, []).append((mid, t))
    snips = [
        (0, tracks[0][2560:10752]),
        (1, tracks[1][5120:13312]),
        (2, tracks[2][10240:18432]),
        (3, (tracks[0][4096:12288] // 2).astype(np.int16)),
    ]
    rows = []
    for qid, s in snips:
        decoded = decode_audio(encode_pcm_s16le(s), "pcm-s16le")
        votes: dict[tuple[int, int], int] = {}
        for h, qt in landmark_kernel(decoded):
            for mid, t in index.get(h, ()):
                key = (mid, t - qt)
                votes[key] = votes.get(key, 0) + 1
        ranked = sorted(
            ((v, mid, off) for (mid, off), v in votes.items() if v >= min_votes),
            key=lambda x: (-x[0], x[1], x[2]),
        )[:k]
        for r, (v, mid, off) in enumerate(ranked):
            rows.append((qid, mid, off, v, r + 1))
    cols = [
        ("query_id", "BIGINT"),
        ("media_id", "BIGINT"),
        ("offset_frames", "BIGINT"),
        ("votes", "BIGINT"),
        ("rank", "INTEGER"),
    ]
    return cols, rows


def multimodal_video_clip_search(sf_dir: str, k: int = 1, min_votes: int = 2):
    """queries.multimodal_video_clip_search fixture rule (seeds 210+i,
    three 8-frame cuts) + dHash kernel, the hash-join/offset-vote/top-k
    mirrored in pure Python dicts."""
    from bensp_suite_spark.multimodal.audio_video import (
        decode_video,
        encode_raw_video,
    )
    from bensp_suite_spark.multimodal.images import dhash_kernel

    vids = []
    for i in range(4):
        rng = np.random.default_rng(210 + i)
        vids.append(rng.integers(0, 200, (24, 24, 24, 3)).astype(np.uint8))
    index: dict[int, list[tuple[int, int]]] = {}
    for mid, frames in enumerate(vids):
        decoded = decode_video(encode_raw_video(frames), "raw-frames")
        for idx in range(decoded.shape[0]):
            index.setdefault(dhash_kernel(decoded[idx]), []).append((mid, idx))
    cuts = [(0, 1, 7), (1, 3, 0), (2, 0, 16)]
    rows = []
    for qid, v, o in cuts:
        decoded = decode_video(encode_raw_video(vids[v][o : o + 8]), "raw-frames")
        votes: dict[tuple[int, int], int] = {}
        for qidx in range(decoded.shape[0]):
            for mid, idx in index.get(dhash_kernel(decoded[qidx]), ()):
                key = (mid, idx - qidx)
                votes[key] = votes.get(key, 0) + 1
        ranked = sorted(
            ((n, mid, off) for (mid, off), n in votes.items() if n >= min_votes),
            key=lambda x: (-x[0], x[1], x[2]),
        )[:k]
        for r, (n, mid, off) in enumerate(ranked):
            rows.append((qid, mid, off, n, r + 1))
    cols = [
        ("query_id", "BIGINT"),
        ("media_id", "BIGINT"),
        ("offset_frames", "BIGINT"),
        ("votes", "BIGINT"),
        ("rank", "INTEGER"),
    ]
    return cols, rows


def multimodal_video_clip_search_reencoded(
    sf_dir: str, k: int = 1, min_votes: int = 2, max_hamming: int = 3
):
    """queries.multimodal_video_clip_search_reencoded fixture rule (seeds
    210+i corpus; cuts perturbed with seed-500+q sparse ±20 noise on 30%
    of pixels) + the brute-force hamming≤h vote: the banded join's
    pigeonhole recall is perfect at ≤h, so the Spark plan must equal
    this exhaustive scan exactly."""
    from bensp_suite_spark.multimodal.audio_video import (
        decode_video,
        encode_raw_video,
    )
    from bensp_suite_spark.multimodal.images import dhash_kernel

    vids = []
    for i in range(4):
        rng = np.random.default_rng(210 + i)
        vids.append(rng.integers(0, 200, (24, 24, 24, 3)).astype(np.uint8))
    index: list[tuple[int, int, int]] = []  # (hash, media_id, frame_idx)
    for mid, frames in enumerate(vids):
        decoded = decode_video(encode_raw_video(frames), "raw-frames")
        for idx in range(decoded.shape[0]):
            index.append((dhash_kernel(decoded[idx]), mid, idx))
    cuts = [(0, 1, 7), (1, 3, 0), (2, 0, 16)]
    rows = []
    for qid, v, o in cuts:
        cut = vids[v][o : o + 8].astype(np.int32)
        nr = np.random.default_rng(500 + qid)
        mask = nr.random(cut.shape) < 0.3
        noise = nr.integers(-20, 21, cut.shape) * mask
        pert = np.clip(cut + noise, 0, 255).astype(np.uint8)
        decoded = decode_video(encode_raw_video(pert), "raw-frames")
        votes: dict[tuple[int, int], int] = {}
        for qidx in range(decoded.shape[0]):
            qh = dhash_kernel(decoded[qidx])
            for h, mid, idx in index:
                # dhash_kernel returns SIGNED two's-complement ints (the
                # Spark LongType convention); mask the XOR to 64 bits or
                # bin() of a negative miscounts
                if bin((h ^ qh) & 0xFFFFFFFFFFFFFFFF).count("1") <= max_hamming:
                    key = (mid, idx - qidx)
                    votes[key] = votes.get(key, 0) + 1
        ranked = sorted(
            ((n, mid, off) for (mid, off), n in votes.items() if n >= min_votes),
            key=lambda x: (-x[0], x[1], x[2]),
        )[:k]
        for r, (n, mid, off) in enumerate(ranked):
            rows.append((qid, mid, off, n, r + 1))
    cols = [
        ("query_id", "BIGINT"),
        ("media_id", "BIGINT"),
        ("offset_frames", "BIGINT"),
        ("votes", "BIGINT"),
        ("rank", "INTEGER"),
    ]
    return cols, rows


def multimodal_video_dedup(sf_dir: str, every_n: int = 5, min_matching_frames: int = 3):
    """queries.multimodal_video_dedup fixture rule (seeds 70+i, +10
    brightness re-renders) + frame-sampled dHash pair evidence."""
    from bensp_suite_spark.multimodal.images import dhash_kernel

    frames_by_vid = {}
    vids = []
    for i in range(5):
        rng = np.random.default_rng(70 + i)
        frames = rng.integers(0, 200, (20, 24, 24, 3)).astype(np.uint8)
        vids.append(frames)
        frames_by_vid[i] = frames
    for i in range(2):
        frames_by_vid[100 + i] = np.clip(vids[i].astype(np.int32) + 10, 0, 255).astype(np.uint8)

    return _video_pair_rows(frames_by_vid, every_n, min_matching_frames)


def _video_pair_rows(frames_by_vid, every_n, min_matching_frames, frame_fn=None):
    """Shared frame-sampled dHash pair counting (frame_fn: optional
    per-frame transform, e.g. a JPEG round-trip for lossy containers)."""
    from bensp_suite_spark.multimodal.images import dhash_kernel

    fid_hashes = []
    for mid, frames in sorted(frames_by_vid.items()):
        for idx in range(0, frames.shape[0], every_n):
            f = frames[idx] if frame_fn is None else frame_fn(frames[idx])
            fid_hashes.append((mid * 1_000_000 + idx, dhash_kernel(f)))
    pairs = _brute_hamming_pairs(fid_hashes, 3)
    counts: dict[tuple[int, int], set] = {}
    for fa, fb, _d in pairs:
        va, vb = fa // 1_000_000, fb // 1_000_000
        if va == vb:
            continue
        key = (min(va, vb), max(va, vb))
        counts.setdefault(key, set()).add((fa, fb))
    rows = [
        (va, vb, len(ev))
        for (va, vb), ev in sorted(counts.items())
        if len(ev) >= min_matching_frames
    ]
    cols = [("vid_a", "BIGINT"), ("vid_b", "BIGINT"), ("n_matching_frames", "BIGINT")]
    return cols, rows


def multimodal_video_dedup_mp4(sf_dir: str):
    """Pin for the MJPEG-in-MP4 ingest variant. The container layer is
    lossless around the JPEG samples, so (like the image-search JPEG pin)
    this rides through the codec: dHashes of the JPEG round-trip of each
    sampled frame, NO Spark and NO container code anywhere — the Spark
    side must demux the ISO BMFF sample tables back to the exact encoded
    bytes to match. Re-encoded exact-copy videos (ids 100+) pair at
    hamming 0 because the pure encoder is deterministic."""
    from bensp_suite_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    frames_by_vid = {}
    vids = []
    for i in range(5):
        rng = np.random.default_rng(170 + i)
        frames = rng.integers(0, 200, (20, 24, 24, 3)).astype(np.uint8)
        vids.append(frames)
        frames_by_vid[i] = frames
    for i in range(2):
        frames_by_vid[100 + i] = vids[i]  # exact copies, independently re-encoded

    def jpeg_rt(frame):
        return decode_jpeg(encode_jpeg(frame, quality=90, subsample=True))

    return _video_pair_rows(frames_by_vid, 5, 3, frame_fn=jpeg_rt)


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def multimodal_video_dedup_avi(sf_dir: str):
    """CODEC-INDEPENDENT pin for the AVI-ingest variant: frame dHashes
    computed straight from the source frame arrays (never touching the
    RIFF container). The Spark query must un-flip/un-pad/reorder its DIB
    frames back to these exact pixels to match."""
    cols, rows = multimodal_video_dedup(sf_dir)
    return cols, rows


def ann_ivfpq_auto_topk(sf_dir: str):
    """IVF-PQ at the r8 PRODUCTION defaults, auto-sized for the sf0.01
    500-vector corpus: ivf_defaults(500) = (22, 8), 8-bit codebooks
    (n_centroids=256), refine = max(8, 2·n_probe) = 16 — pins the whole
    auto-sizing chain, not just the quantizer (mirrors
    similarity.ivfpq_ann_topk with n_cells=None/n_probe=None/refine=None)."""
    return ann_ivfpq_topk(
        sf_dir, k=5, n_cells=22, n_probe=8, n_centroids=256, refine=16
    )


def _pq_lloyd_ref(mat: np.ndarray, S: int, C: int, iters: int) -> np.ndarray:
    """Mirror of similarity._pq_lloyd (init = first C rows' subvectors,
    argmin ties -> lowest id, empty clusters keep their centroid)."""
    ds = mat.shape[1] // S
    sub = mat.reshape(mat.shape[0], S, ds)
    books = sub[:C].transpose(1, 0, 2).copy()
    for _ in range(iters):
        for s_i in range(S):
            x = sub[:, s_i, :]
            d2 = ((x[:, None, :] - books[s_i][None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c_i in range(C):
                members = x[assign == c_i]
                if len(members):
                    books[s_i, c_i] = members.mean(0)
    return books


def _rotate_rows_ref(mat: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Mirror of similarity._rotate_rows — one (1×D)·(D×D) gemv per row,
    pinned op shape (see that docstring for why batched gemm is unsafe)."""
    return np.array([row @ R for row in mat], dtype=np.float64)


def _opq_rotation_ref(X: np.ndarray, S: int, C: int, train_iters: int,
                      opq_iters: int) -> np.ndarray:
    """Mirror of similarity.opq_rotation (OPQ-P eigen-allocation init +
    OPQ-NP alternation; keep in lock-step with that function)."""
    d = X.shape[1]
    ds = d // S
    cov = X.T @ X / len(X)
    lam, E = np.linalg.eigh(cov)
    order = np.argsort(-lam, kind="stable")
    lam, E = lam[order], E[:, order]
    buckets = [[] for _ in range(S)]
    sums = np.zeros(S)
    for j in range(d):
        s = min(
            (s for s in range(S) if len(buckets[s]) < ds),
            key=lambda s: (sums[s], s),
        )
        buckets[s].append(j)
        sums[s] += np.log(max(float(lam[j]), 1e-12))
    R = E[:, [j for b in buckets for j in b]]
    for _ in range(opq_iters):
        Xr = _rotate_rows_ref(X, R)
        books = _pq_lloyd_ref(Xr, S, C, train_iters)
        sub = Xr.reshape(Xr.shape[0], S, ds)
        d2 = ((sub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1)
        assign = d2.argmin(-1)
        xhat = np.stack(
            [books[s][assign[:, s]] for s in range(S)], axis=1
        ).reshape(X.shape[0], d)
        U, _s, Vt = np.linalg.svd(X.T @ xhat)
        R = U @ Vt
    return R


def ann_opq_topk(sf_dir: str, k: int = 5, n_subspaces: int = 8, n_centroids: int = 16,
                 refine: int = 10, train_iters: int = 8, train_sample: int = 2048,
                 opq_iters: int = 8):
    """OPQ ANN: PQ's ADC scan in the LEARNED-ROTATION space (codes and
    query tables rotated, exact raw-space cosine re-rank) — mirror of
    similarity.pq_ann_topk(rotation=opq_rotation(...))."""
    ids, V = _embeddings(sf_dir)
    X = V[ids < train_sample]
    R = _opq_rotation_ref(X, n_subspaces, n_centroids, train_iters, opq_iters)
    Xr = _rotate_rows_ref(X, R)
    books = _pq_lloyd_ref(Xr, n_subspaces, n_centroids, train_iters)
    ds = V.shape[1] // n_subspaces
    Vr = _rotate_rows_ref(V, R)
    allsub = Vr.reshape(Vr.shape[0], n_subspaces, ds)
    codes = ((allsub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1).argmin(-1)
    m = refine * k
    srange = np.arange(n_subspaces)
    rows = []
    for qrow, qid in enumerate(ids):
        if qid >= 8:
            continue
        qsub = Vr[qrow].reshape(n_subspaces, ds)
        qtab = ((qsub[:, None, :] - books) ** 2).sum(-1)  # (S, C)
        ad = qtab[srange[None, :], codes].sum(1)  # (N,)
        mask = ids != qid
        idx = np.nonzero(mask)[0]
        top = idx[np.lexsort((ids[idx], ad[idx]))[:m]]
        cids = ids[top]
        order = np.argsort(cids, kind="stable")
        cids = cids[order]
        C = V[top][order]
        rows += _topk_rows(qid, cids, cosine_rounded(V[qrow], C), k)
    return ANN_COLS, rows


def ann_pca_topk(sf_dir: str, k: int = 5, dims: int = 16, refine: int = 4,
                 train_sample: int = 2048):
    """PCA dimension-cut ANN: mirror of similarity.pca_ann_topk —
    top-dims eigenvectors of the uncentered second moment (bounded
    sample), row-wise projection, projected-cosine coarse cut, exact
    raw-space re-rank."""
    ids, V = _embeddings(sf_dir)
    X = V[ids < train_sample]
    cov = X.T @ X / len(X)
    lam, E = np.linalg.eigh(cov)
    order = np.argsort(-lam, kind="stable")
    comps = E[:, order[:dims]].copy()
    P = _rotate_rows_ref(V, comps)  # (N, dims) row-wise pinned gemv
    m = refine * k
    rows = []
    for qrow, qid in enumerate(ids):
        if qid >= 8:
            continue
        mask = ids != qid
        idx = np.nonzero(mask)[0]
        coarse = cosine_rounded(P[qrow], P[idx])
        top = idx[np.lexsort((ids[idx], -coarse))[:m]]
        cids = ids[top]
        order2 = np.argsort(cids, kind="stable")
        cids = cids[order2]
        C = V[top][order2]
        rows += _topk_rows(qid, cids, cosine_rounded(V[qrow], C), k)
    return ANN_COLS, rows


def text_bpe_trained_tokenize(sf_dir: str, n_merges: int = 40,
                              train_sample: int = 256):
    """Mirror of queries.text_bpe_trained_tokenize over the shared
    pure-Python BPE kernels (bpe_train's merge loop re-run here from the
    DuckDB scan; apply via the same greedy ranked loop)."""
    from bensp_suite_spark.operators.text_analysis import (
        _bpe_words,
        bpe_apply_word,
    )

    docs = _documents(sf_dir)
    freqs: dict[tuple[str, ...], int] = {}
    for did, text in docs:
        if did < train_sample:
            for w in _bpe_words(text or ""):
                freqs[w] = freqs.get(w, 0) + 1
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, n in freqs.items():
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        for w, n in freqs.items():
            out = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            merged[nw] = merged.get(nw, 0) + n
        freqs = merged
    ranks = {p: i for i, p in enumerate(merges)}
    rows = []
    for did, text in docs:
        t = text or ""
        words = _bpe_words(t)
        rows.append(
            (
                did,
                len(t),
                len(words),
                sum(len(bpe_apply_word(w, ranks)) for w in words),
            )
        )
    cols = [
        ("doc_id", "BIGINT"),
        ("n_chars", "BIGINT"),
        ("n_words", "BIGINT"),
        ("n_bpe_tokens", "BIGINT"),
    ]
    return cols, rows


def text_ngram_lm_score(sf_dir: str, train_max_id: int = 256):
    """Mirror of queries.text_ngram_lm_score: pure-Python bigram LM
    (lowercased whitespace words, add-one smoothing), per-term
    spark_round(ln·1e6, 0) micro-units, exact integer sums."""
    import math
    import re

    def words(t: str) -> list[str]:
        t = re.sub(r"\s+", " ", (t or "").strip().lower())
        return [w for w in t.split(" ")] if t else []

    docs = _documents(sf_dir)
    c_bg: dict[tuple[str, str], int] = {}
    c_uni: dict[str, int] = {}
    vocab: set[str] = set()
    for did, text in docs:
        if did >= train_max_id:
            continue
        ws = words(text)
        if len(ws) < 2:
            continue
        for i in range(len(ws) - 1):
            p, c = ws[i], ws[i + 1]
            c_bg[(p, c)] = c_bg.get((p, c), 0) + 1
            c_uni[p] = c_uni.get(p, 0) + 1
            vocab.add(p)
            vocab.add(c)
    V = len(vocab)
    rows = []
    for did, text in docs:
        ws = words(text)
        if len(ws) < 2:
            continue
        n = 0
        total = 0
        for i in range(len(ws) - 1):
            p, c = ws[i], ws[i + 1]
            lp = math.log(
                (c_bg.get((p, c), 0) + 1.0) / (c_uni.get(p, 0) + float(V))
            )
            total += int(spark_round(lp * 1_000_000.0, 0))
            n += 1
        rows.append((did, n, total))
    cols = [
        ("doc_id", "BIGINT"),
        ("n_bigrams", "BIGINT"),
        ("sum_logp_micro", "BIGINT"),
    ]
    return cols, rows


def sample_kcenter_diverse(sf_dir: str, k: int = 10):
    """Mirror of similarity.kcenter_sample (Gonzalez greedy k-center):
    seed = lowest vec_id; each round picks argmax of min-d2-to-centers
    (dimension-at-a-time fold order, ties → lowest id); d2_far np.round
    6dp like the operator's driver-side rounding."""
    ids, V = _embeddings(sf_dir)
    order = np.argsort(ids, kind="stable")
    ids, V = ids[order], V[order]
    sel = [0]
    rows = [(0, int(ids[0]), 0.0)]
    for r in range(1, k):
        cmat = V[sel]
        acc = np.zeros((V.shape[0], cmat.shape[0]), dtype=np.float64)
        for i in range(cmat.shape[1]):
            d = V[:, i, None] - cmat[None, :, i]
            acc += d * d
        d2 = acc.min(axis=1)
        # argmax with ties → lowest id: ids ascending + argmax returns
        # the FIRST max under a stable scan
        pick = int(np.argmax(d2))
        sel.append(pick)
        rows.append((r, int(ids[pick]), float(np.round(d2[pick], 6))))
    cols = [
        ("sel_order", "INTEGER"),
        ("vec_id", "BIGINT"),
        ("d2_far", "DOUBLE"),
    ]
    return cols, rows


def sample_kcenter_diverse_cells(sf_dir: str, k: int = 10, n_cells: int = 16):
    """Mirror of similarity.kcenter_sample_cells (two-stage composable-
    coreset Gonzalez): deterministic cells = the n_cells lowest-id
    vectors; nearest-cell assignment with the ivf_assign fold order and
    (d2, cell) tiebreak; per-cell greedy k-center (seed = lowest id,
    farthest-first, lowest-id ties); exact greedy over the pooled
    representatives. Same rounding as the operator."""
    ids, V = _embeddings(sf_dir)
    order = np.argsort(ids, kind="stable")
    ids, V = ids[order], V[order]
    cell_mask = ids < n_cells
    cmat = V[cell_mask]
    cells = ids[cell_mask]
    acc = np.zeros((V.shape[0], cmat.shape[0]), dtype=np.float64)
    for i in range(cmat.shape[1]):
        d = V[:, i, None] - cmat[None, :, i]
        acc += d * d
    # cells ascending + stable argsort ⇒ (d2, cell) tiebreak
    assign = cells[np.argsort(acc, axis=1, kind="stable")[:, 0]]

    def greedy(sub_ids: np.ndarray, sub_v: np.ndarray, take: int):
        sel = [0]
        d2 = np.zeros(len(sub_ids), dtype=np.float64)
        for i in range(sub_v.shape[1]):
            d = sub_v[:, i] - sub_v[0, i]
            d2 += d * d
        picked = [(0, int(sub_ids[0]), 0.0)]
        for r in range(1, min(take, len(sub_ids))):
            j = int(np.argmax(d2))
            sel.append(j)
            picked.append((r, int(sub_ids[j]), float(np.round(d2[j], 6))))
            nd2 = np.zeros(len(sub_ids), dtype=np.float64)
            for i in range(sub_v.shape[1]):
                d = sub_v[:, i] - sub_v[j, i]
                nd2 += d * d
            d2 = np.minimum(d2, nd2)
        return sel, picked

    rep_ids, rep_vs = [], []
    for c in sorted(set(assign.tolist())):
        m = assign == c
        sub_ids, sub_v = ids[m], V[m]
        sel, _ = greedy(sub_ids, sub_v, k)
        rep_ids.extend(int(sub_ids[j]) for j in sel)
        rep_vs.extend(sub_v[j] for j in sel)
    rep_ids = np.array(rep_ids, dtype=np.int64)
    rep_vs = np.array(rep_vs, dtype=np.float64)
    order = np.argsort(rep_ids, kind="stable")
    _, rows = greedy(rep_ids[order], rep_vs[order], k)
    cols = [
        ("sel_order", "INTEGER"),
        ("vec_id", "BIGINT"),
        ("d2_far", "DOUBLE"),
    ]
    return cols, rows


def text_nb_quality_classifier(sf_dir: str):
    """Mirror of queries.text_nb_quality_classifier: pure-Python
    naive-Bayes — token counts per class over the same lowercased
    whitespace tokenization, per-token LLR spark_round(·1e6, 0), unseen
    constant and prior via the driver-side int(round(...)) expressions
    the operator uses, exact integer sums."""
    import math
    import re

    def words(t: str) -> list[str]:
        t = re.sub(r"\s+", " ", (t or "").strip().lower())
        return [w for w in t.split(" ") if w] if t else []

    def rev(t: str) -> str:
        t = re.sub(r"\s+", " ", (t or "").strip().lower())
        return " ".join(w[::-1] for w in t.split(" ")) if t else ""

    docs = _documents(sf_dir)
    by_id = dict(docs)
    c_pos: dict[str, int] = {}
    c_neg: dict[str, int] = {}
    n_docs_pos = n_docs_neg = 0
    for did, text in docs:
        if did < 200:
            n_docs_pos += 1
            for w in words(text):
                c_pos[w] = c_pos.get(w, 0) + 1
        elif did < 400:
            n_docs_neg += 1
            for w in words(rev(text)):
                c_neg[w] = c_neg.get(w, 0) + 1
    vocab = set(c_pos) | set(c_neg)
    V = len(vocab)
    n_pos = sum(c_pos.values())
    n_neg = sum(c_neg.values())
    llr = {
        w: int(
            spark_round(
                (
                    math.log((c_pos.get(w, 0) + 1.0) / float(n_pos + V))
                    - math.log((c_neg.get(w, 0) + 1.0) / float(n_neg + V))
                )
                * 1_000_000.0,
                0,
            )
        )
        for w in vocab
    }
    unseen = int(
        round(
            (math.log(1.0 / (n_pos + V)) - math.log(1.0 / (n_neg + V)))
            * 1_000_000
        )
    )
    d = n_docs_pos + n_docs_neg
    prior = int(
        round(
            (math.log(n_docs_pos / d) - math.log(n_docs_neg / d)) * 1_000_000
        )
    )
    AUG = 1_000_000
    held = [
        (did, by_id[did]) for did in sorted(by_id) if 400 <= did < 460
    ] + [
        (did + AUG, rev(by_id[did])) for did in sorted(by_id) if 400 <= did < 460
    ]
    rows = []
    for did, text in held:
        ws = words(text)
        # token-less docs score the prior alone (operator's join-back)
        score = prior + sum(llr.get(w, unseen) for w in ws)
        rows.append((did, len(ws), score, score > 0))
    cols = [
        ("doc_id", "BIGINT"),
        ("n_tokens", "BIGINT"),
        ("score_micro", "BIGINT"),
        ("predicted_hq", "BOOLEAN"),
    ]
    return cols, rows


def curation_dsir_select(sf_dir: str, n_buckets: int = 10_000, k: int = 30):
    """Mirror of queries.curation_dsir_select: DSIR importance
    resampling recomputed in pure python — hashed unigram+bigram bucket
    counts (md5-prefix % n_buckets, the repo's cross-engine hash
    family), add-one-smoothed per-bucket log-ratio spark_round(·1e6, 0),
    exact integer per-doc sums, deterministic top-k by (weight desc,
    id). Target = documents < 200; pool = held-out 400..460 real texts
    + token-reversed noise twins at +1e6 ids; q fits on the pool
    itself (the paper's estimator)."""
    import hashlib
    import math
    import re

    def words(t: str) -> list[str]:
        t = re.sub(r"\s+", " ", (t or "").strip().lower())
        return [w for w in t.split(" ") if w] if t else []

    def rev(t: str) -> str:
        t = re.sub(r"\s+", " ", (t or "").strip().lower())
        return " ".join(w[::-1] for w in t.split(" ")) if t else ""

    def grams(t: str) -> list[str]:
        ws = words(t)
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    docs = _documents(sf_dir)
    by_id = dict(docs)
    AUG = 1_000_000
    target = [text for did, text in docs if did < 200]
    pool = [
        (did, by_id[did]) for did in sorted(by_id) if 400 <= did < 460
    ] + [
        (did + AUG, rev(by_id[did])) for did in sorted(by_id) if 400 <= did < 460
    ]
    c_t: dict[int, int] = {}
    for t in target:
        for g in grams(t):
            b = bucket(g)
            c_t[b] = c_t.get(b, 0) + 1
    c_r: dict[int, int] = {}
    for _, t in pool:
        for g in grams(t):
            b = bucket(g)
            c_r[b] = c_r.get(b, 0) + 1
    n_t = sum(c_t.values())
    n_r = sum(c_r.values())
    lr = {
        b: int(
            spark_round(
                (
                    math.log((c_t.get(b, 0) + 1.0) / float(n_t + n_buckets))
                    - math.log((c_r.get(b, 0) + 1.0) / float(n_r + n_buckets))
                )
                * 1_000_000.0,
                0,
            )
        )
        for b in set(c_t) | set(c_r)
    }
    unseen = int(
        round(
            (
                math.log(1.0 / (n_t + n_buckets))
                - math.log(1.0 / (n_r + n_buckets))
            )
            * 1_000_000
        )
    )
    scored = []
    for did, t in pool:
        gs = grams(t)
        lw = sum(lr.get(bucket(g), unseen) for g in gs)
        scored.append((did, len(gs), lw))
    order = sorted(scored, key=lambda r: (-r[2], r[0]))
    topk = {r[0] for r in order[:k]}
    rows = [
        (did, n, lw, did in topk) for did, n, lw in sorted(scored)
    ]
    cols = [
        ("doc_id", "BIGINT"),
        ("n_grams", "BIGINT"),
        ("logweight_micro", "BIGINT"),
        ("selected", "BOOLEAN"),
    ]
    return cols, rows


def corpus_token_drift(sf_dir: str, top: int = 20):
    """Mirror of queries.corpus_token_drift: pure-Python token counts
    over the two snapshot halves (new half plants ' driftword' on every
    5th doc), add-one-smoothed per-token KL contribution in nano units
    (spark_round(x·1e9, 0)), top-20 by (kl desc, token)."""
    import math
    import re

    def words(t: str) -> list[str]:
        t = re.sub(r"\s+", " ", (t or "").strip().lower())
        return [w for w in t.split(" ") if w] if t else []

    docs = _documents(sf_dir)
    c_old: dict[str, int] = {}
    c_new: dict[str, int] = {}
    for did, text in docs:
        if did < 250:
            for w in words(text):
                c_old[w] = c_old.get(w, 0) + 1
        else:
            t = text or ""
            if did % 5 == 0:
                t = t + " driftword"
            for w in words(t):
                c_new[w] = c_new.get(w, 0) + 1
    vocab = sorted(set(c_old) | set(c_new))
    V = len(vocab)
    t_old = sum(c_old.values())
    t_new = sum(c_new.values())
    rows = []
    for tok in vocab:
        co, cn2 = c_old.get(tok, 0), c_new.get(tok, 0)
        p_new = (cn2 + 1.0) / (t_new + V)
        p_old = (co + 1.0) / (t_old + V)
        kl = int(spark_round(p_new * math.log(p_new / p_old) * 1e9, 0))
        rows.append((tok, co, cn2, kl))
    rows.sort(key=lambda r: (-r[3], r[0]))
    out = [(t, co, cn2, kl, i + 1) for i, (t, co, cn2, kl) in enumerate(rows[:top])]
    cols = [
        ("token", "VARCHAR"),
        ("c_old", "BIGINT"),
        ("c_new", "BIGINT"),
        ("kl_nano", "BIGINT"),
        ("drift_rank", "INTEGER"),
    ]
    return cols, out


def _nsw_beam_ref(V, nbrs, qv, ef):
    """Mirror of bensp_suite_spark.operators.graph_ann.nsw_beam_search —
    the determinism spec lives in that module's docstring; keep the two
    in lock-step."""
    import heapq

    d0 = -float(np.dot(V[0], qv))
    visited = {0}
    cand = [(d0, 0)]
    w = [(-d0, 0)]
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


def _nsw_build_ref(V, m, ef_build):
    """Mirror of graph_ann.nsw_build (see its docstring for the spec)."""
    n = len(V)
    m_max = 2 * m
    nbrs = [[] for _ in range(n)]
    for i in range(1, n):
        res = _nsw_beam_ref(V, nbrs, V[i], ef_build)
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


def ann_nsw_routed_topk(sf_dir: str, k: int = 5, n_cells: int = 8,
                        n_probe: int = 2, m: int = 8, ef_build: int = 24,
                        ef_search: int = 16):
    """IVF-routed NSW: shards = coarse cells (lowest-id centroids,
    ann_ivfpq_topk's assignment math), queries beam only their n_probe
    nearest cells' graphs — mirror of graph_ann.nsw_routed_ann_topk."""
    ids, V = _embeddings(sf_dir)
    cent = V[ids < n_cells]
    cd2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    cell_of = cd2.argmin(1)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    qmask = ids < 8
    qids = ids[qmask]
    Q = U[qmask]
    # per-cell graphs over ascending-id members
    shards: dict[int, tuple[np.ndarray, np.ndarray, list]] = {}
    for cell in range(n_cells):
        sids = ids[cell_of == cell]
        if len(sids) == 0:
            continue
        Vs = U[[id_to_row[int(v)] for v in sids]]
        shards[cell] = (sids, Vs, _nsw_build_ref(Vs, m, ef_build))
    rows = []
    for qi, qid in enumerate(qids):
        qrow = id_to_row[int(qid)]
        qd2 = ((V[qrow][None, :] - cent) ** 2).sum(-1)
        probed = np.argsort(qd2, kind="stable")[:n_probe]
        cset: set[int] = set()
        for cell in probed:
            if int(cell) not in shards:
                continue
            sids, Vs, nbrs = shards[int(cell)]
            for _, p in _nsw_beam_ref(Vs, nbrs, Q[qi], ef_search):
                cset.add(int(sids[p]))
        cset.discard(int(qid))
        cids = np.array(sorted(cset), dtype=np.int64)
        C = V[[id_to_row[int(c)] for c in cids]]
        rows += _topk_rows(qid, cids, cosine_rounded(V[qrow], C), k)
    return ANN_COLS, rows


def ann_nsw_routed_spill_topk(sf_dir: str, k: int = 5, n_cells: int = 8,
                              n_probe: int = 2, m: int = 8, ef_build: int = 24,
                              ef_search: int = 16, spill_eps: float = 0.25):
    """IVF-routed NSW with SPANN closure assignment: a corpus vector
    joins every cell whose squared distance is within (1+eps)² of its
    nearest (mirror of similarity.ivf_assign_spill), so boundary
    neighbors appear in all the probed cells. Queries route exactly as
    the unspilled mirror; the candidate set dedups by construction."""
    ids, V = _embeddings(sf_dir)
    cent = V[ids < n_cells]
    cd2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    keep = cd2 <= (1.0 + spill_eps) ** 2 * cd2.min(axis=1, keepdims=True)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    qmask = ids < 8
    qids = ids[qmask]
    Q = U[qmask]
    shards: dict[int, tuple[np.ndarray, np.ndarray, list]] = {}
    for cell in range(n_cells):
        sids = ids[keep[:, cell]]
        if len(sids) == 0:
            continue
        sids = np.sort(sids)
        Vs = U[[id_to_row[int(v)] for v in sids]]
        shards[cell] = (sids, Vs, _nsw_build_ref(Vs, m, ef_build))
    rows = []
    for qi, qid in enumerate(qids):
        qrow = id_to_row[int(qid)]
        qd2 = ((V[qrow][None, :] - cent) ** 2).sum(-1)
        probed = np.argsort(qd2, kind="stable")[:n_probe]
        cset: set[int] = set()
        for cell in probed:
            if int(cell) not in shards:
                continue
            sids, Vs, nbrs = shards[int(cell)]
            for _, p in _nsw_beam_ref(Vs, nbrs, Q[qi], ef_search):
                cset.add(int(sids[p]))
        cset.discard(int(qid))
        cids = np.array(sorted(cset), dtype=np.int64)
        C = V[[id_to_row[int(c)] for c in cids]]
        rows += _topk_rows(qid, cids, cosine_rounded(V[qrow], C), k)
    return ANN_COLS, rows


def _nsw_beam_adc_ref(codes, nbrs, table, ef):
    """Mirror of graph_ann.nsw_beam_search_adc — the raw beam with PQ
    ADC distances (-Σ_s table[s, codes[node, s]])."""
    import heapq

    srange = np.arange(table.shape[0])

    def d(p):
        return -float(table[srange, codes[p]].sum())

    d0 = d(0)
    visited = {0}
    cand = [(d0, 0)]
    w = [(-d0, 0)]
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


def ann_nsw_routed_pq_topk(sf_dir: str, k: int = 5, n_cells: int = 8,
                           n_probe: int = 2, m: int = 8, ef_build: int = 24,
                           ef_search: int = 32, n_subspaces: int = 8,
                           n_centroids: int = 256, train_sample: int = 2048):
    """DiskANN-style PQ-compressed routed NSW: full-precision graph
    build, ADC beams over unit-space PQ codes, exact rounded-cosine
    re-rank from raw vectors — mirror of graph_ann.nsw_routed_pq_ann_topk
    + save_nsw_routed_pq_index."""
    ids, V = _embeddings(sf_dir)
    cent = V[ids < n_cells]
    cd2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    cell_of = cd2.argmin(1)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    # codebooks on unit vectors, ids < train_sample ascending (the
    # _unit_pq_codebooks contract)
    train_ids = np.sort(ids[ids < train_sample])
    T = V[[id_to_row[int(v)] for v in train_ids]]
    T = T / np.linalg.norm(T, axis=1, keepdims=True)
    books = _pq_lloyd_ref(T, n_subspaces, n_centroids, 8)
    S, C, ds = books.shape
    qmask = ids < 8
    qids = ids[qmask]
    Q = U[qmask]
    shards = {}
    for cell in range(n_cells):
        sids = np.sort(ids[cell_of == cell])
        if len(sids) == 0:
            continue
        Us = U[[id_to_row[int(v)] for v in sids]]
        sub = Us.reshape(Us.shape[0], S, ds)
        d2 = ((sub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1)
        codes = d2.argmin(-1)
        shards[cell] = (sids, codes, _nsw_build_ref(Us, m, ef_build))
    rows = []
    qsub = Q.reshape(Q.shape[0], S, ds)
    tables = (books[None, :, :, :] * qsub[:, :, None, :]).sum(-1)
    for qi, qid in enumerate(qids):
        qrow = id_to_row[int(qid)]
        qd2 = ((V[qrow][None, :] - cent) ** 2).sum(-1)
        probed = np.argsort(qd2, kind="stable")[:n_probe]
        cset: set[int] = set()
        for cell in probed:
            if int(cell) not in shards:
                continue
            sids, codes, nbrs = shards[int(cell)]
            for _, p in _nsw_beam_adc_ref(codes, nbrs, tables[qi], ef_search):
                cset.add(int(sids[p]))
        cset.discard(int(qid))
        cids = np.array(sorted(cset), dtype=np.int64)
        Cm = V[[id_to_row[int(c)] for c in cids]]
        rows += _topk_rows(qid, cids, cosine_rounded(V[qrow], Cm), k)
    return ANN_COLS, rows


def _simhash_ref(text: str, bits: int = 48) -> int:
    """Mirror of dedup_text.simhash for one document: tf-weighted ±1
    votes of 32-bit md5 token hashes, bit set iff the vote is positive."""
    import hashlib
    import re
    from collections import Counter

    toks = [w for w in re.split(r"\s+", text.strip()) if w]
    votes = [0] * bits
    for tok, tf in Counter(toks).items():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        for i in range(bits):
            votes[i] += tf if (h >> i) & 1 else -tf
    return sum(1 << i for i in range(bits) if votes[i] > 0)


#: stream_routed_pq_upsert_probe fixture constants, shared verbatim by
#: the declared query (queries.py) and this mirror — both sides derive
#: the texts independently from the same md5 recipe
SRUP_HIST_N = 20       # seed history docs (ids 0..19, tag "uh")
SRUP_BASE_MAX = 400    # base index = embeddings with vec_id < 400
SRUP_DUPS = 5          # planted duplicate docs per batch


def _srup_text(tag: str, i: int) -> str:
    import hashlib

    return " ".join(
        hashlib.md5(f"{tag}-{i}-{j}".encode()).hexdigest() for j in (1, 2, 3)
    )


def _srup_batches() -> list[list[tuple[int, str]]]:
    """The two day-batches: ids 400..449 and 450..499; the first 5 docs
    of batch 0 copy HISTORY texts (exact dups → rejected, never
    indexed), the first 5 of batch 1 copy batch-0 SURVIVOR texts."""
    b0 = [
        (400 + i, _srup_text("uh", i) if i < SRUP_DUPS else _srup_text("ud", 400 + i))
        for i in range(50)
    ]
    b1 = [
        (450 + i, _srup_text("ud", 405 + i) if i < SRUP_DUPS else _srup_text("ud", 450 + i))
        for i in range(50)
    ]
    return [b0, b1]


def stream_routed_pq_upsert_probe(sf_dir: str, k: int = 5, n_cells: int = 8,
                                  n_probe: int = 2, m: int = 8,
                                  ef_build: int = 24, ef_search: int = 32,
                                  n_subspaces: int = 8, n_centroids: int = 256,
                                  max_hamming: int = 3):
    """Mirror of queries.stream_routed_pq_upsert_probe — the crawl →
    dedup → index-maintain → search loop recomputed end to end without
    Spark: per-day survivor flags from first principles (hashlib md5
    exact check + pure-python tf-weighted SimHash near check, hamming ≤
    3 against the advancing history state), survivors' embeddings
    continue the FROZEN-codebook routed-PQ index (same centroids, same
    base-trained books, per-cell insertion in ascending id order — the
    upsert contract), and each day's probe ADC-beams the evolved index
    and exact-reranks raw cosines. A drift anywhere — dedup flags, state
    advance, upsert insertion order, codebook freeze, ADC math — flips
    the pin."""
    import hashlib

    ids, V = _embeddings(sf_dir)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    base_ids = np.sort(ids[ids < SRUP_BASE_MAX])
    cent = V[ids < n_cells]
    cell_of = {
        int(v): int(((V[id_to_row[int(v)]][None, :] - cent) ** 2).sum(-1).argmin())
        for v in ids
    }
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    # frozen codebooks: trained ONCE on the base corpus (ids < 400, all
    # under the 2048 train window), exactly save_nsw_routed_pq_index's
    # slice — upserted days re-encode against these, never retrain
    T = U[[id_to_row[int(v)] for v in base_ids]]
    books = _pq_lloyd_ref(T, n_subspaces, n_centroids, 8)
    S, C, ds = books.shape
    qmask = ids < 8
    qids = ids[qmask]
    Q = U[qmask]
    qsub = Q.reshape(Q.shape[0], S, ds)
    tables = (books[None, :, :, :] * qsub[:, :, None, :]).sum(-1)

    # dedup state: history = 20 seed docs; flags per batch against the
    # state EXCLUDING the batch (incremental_dedup semantics), survivors
    # advance it
    hist_hashes = {
        hashlib.md5(_srup_text("uh", i).encode()).hexdigest()
        for i in range(SRUP_HIST_N)
    }
    hist_sims = [_srup_text("uh", i) for i in range(SRUP_HIST_N)]
    hist_sims = [_simhash_ref(t) for t in hist_sims]

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    members = set(int(v) for v in base_ids)
    rows = []
    for day, batch in enumerate(_srup_batches()):
        surv = []
        new_hashes, new_sims = [], []
        for did, text in batch:
            h = hashlib.md5(text.encode()).hexdigest()
            s = _simhash_ref(text)
            exact = h in hist_hashes
            near = any(hamming(s, hs) <= max_hamming for hs in hist_sims)
            if not exact and not near:
                surv.append(did)
                new_hashes.append(h)
                new_sims.append(s)
        hist_hashes |= set(new_hashes)
        hist_sims += new_sims
        members |= set(surv)
        # index after this day's upsert: per-cell graphs over ascending
        # member ids (continued insertion == full build at monotone ids),
        # codes from the frozen books
        shards = {}
        for cell in range(n_cells):
            sids = np.array(
                sorted(v for v in members if cell_of[v] == cell), dtype=np.int64
            )
            if len(sids) == 0:
                continue
            Us = U[[id_to_row[int(v)] for v in sids]]
            sub = Us.reshape(Us.shape[0], S, ds)
            d2 = ((sub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1)
            codes = d2.argmin(-1)
            shards[cell] = (sids, codes, _nsw_build_ref(Us, m, ef_build))
        for qi, qid in enumerate(qids):
            qrow = id_to_row[int(qid)]
            qd2 = ((V[qrow][None, :] - cent) ** 2).sum(-1)
            probed = np.argsort(qd2, kind="stable")[:n_probe]
            cset: set[int] = set()
            for cell in probed:
                if int(cell) not in shards:
                    continue
                sids, codes, nbrs = shards[int(cell)]
                for _, p in _nsw_beam_adc_ref(codes, nbrs, tables[qi], ef_search):
                    cset.add(int(sids[p]))
            cset.discard(int(qid))
            cids = np.array(sorted(cset), dtype=np.int64)
            Cm = V[[id_to_row[int(c)] for c in cids]]
            rows += [
                (day,) + r
                for r in _topk_rows(qid, cids, cosine_rounded(V[qrow], Cm), k)
            ]
    return [("day", "BIGINT")] + ANN_COLS, rows


def ann_nsw_topk(sf_dir: str, k: int = 5, n_shards: int = 4, m: int = 8,
                 ef_build: int = 24, ef_search: int = 16):
    """Sharded-NSW graph ANN: per-shard deterministic NSW build + beam
    nomination, exact rounded-cosine re-rank of the nomination union
    (graph_ann.nsw_ann_topk's contract: Python nominates, cosine ranks)."""
    ids, V = _embeddings(sf_dir)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    qmask = ids < 8
    qids = ids[qmask]
    Q = U[qmask]
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    # shard = vec_id % n_shards; positions in ascending vec_id order
    cand: dict[int, set[int]] = {int(q): set() for q in qids}
    for s in range(n_shards):
        sids = np.array([int(v) for v in ids if v % n_shards == s], dtype=np.int64)
        if len(sids) == 0:
            continue
        Vs = U[[id_to_row[int(v)] for v in sids]]
        nbrs = _nsw_build_ref(Vs, m, ef_build)
        for qi, qid in enumerate(qids):
            for _, p in _nsw_beam_ref(Vs, nbrs, Q[qi], ef_search):
                cand[int(qid)].add(int(sids[p]))
    rows = []
    for qid in qids:
        cset = cand[int(qid)]
        cset.discard(int(qid))
        cids = np.array(sorted(cset), dtype=np.int64)
        C = V[[id_to_row[int(c)] for c in cids]]
        rows += _topk_rows(qid, cids, cosine_rounded(V[id_to_row[int(qid)]], C), k)
    return ANN_COLS, rows


REFERENCE_FNS = {
    "cdc_dedup_stats": cdc_dedup_stats,
    "cdc_chunk_histogram": cdc_chunk_histogram,
    "cdc_round_trip_check": cdc_round_trip_check,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_ivfpq_residual_topk": ann_ivfpq_residual_topk,
    "ann_ivfpq_auto_topk": ann_ivfpq_auto_topk,
    "ann_nsw_topk": ann_nsw_topk,
    "ann_nsw_routed_topk": ann_nsw_routed_topk,
    "ann_nsw_routed_spill_topk": ann_nsw_routed_spill_topk,
    "ann_nsw_routed_pq_topk": ann_nsw_routed_pq_topk,
    "stream_routed_pq_upsert_probe": stream_routed_pq_upsert_probe,
    "text_bpe_trained_tokenize": text_bpe_trained_tokenize,
    "text_ngram_lm_score": text_ngram_lm_score,
    "text_nb_quality_classifier": text_nb_quality_classifier,
    "curation_dsir_select": curation_dsir_select,
    "sample_kcenter_diverse": sample_kcenter_diverse,
    "sample_kcenter_diverse_cells": sample_kcenter_diverse_cells,
    "corpus_token_drift": corpus_token_drift,
    "ann_opq_topk": ann_opq_topk,
    "ann_pca_topk": ann_pca_topk,
    "ferret_topk_multiregion": ferret_topk_multiregion,
    "multimodal_image_search": multimodal_image_search,
    "multimodal_image_search_png": multimodal_image_search_png,
    "multimodal_image_search_jpeg": multimodal_image_search_jpeg,
    "multimodal_image_stats": multimodal_image_stats,
    "multimodal_image_dedup": multimodal_image_dedup,
    "multimodal_audio_dedup": multimodal_audio_dedup,
    "multimodal_audio_dedup_wav": multimodal_audio_dedup_wav,
    "multimodal_audio_dedup_flac": multimodal_audio_dedup_flac,
    "multimodal_audio_snippet_search": multimodal_audio_snippet_search,
    "multimodal_video_clip_search": multimodal_video_clip_search,
    "multimodal_video_clip_search_reencoded": multimodal_video_clip_search_reencoded,
    "multimodal_video_dedup": multimodal_video_dedup,
    "multimodal_video_dedup_avi": multimodal_video_dedup_avi,
    "multimodal_video_dedup_mp4": multimodal_video_dedup_mp4,
    "cdc_ddp_datasource_scan": cdc_ddp_datasource_scan,
    "multimodal_image_phash_dedup": multimodal_image_phash_dedup,
}


def compute(name: str, sf_dir: str):
    """→ (cols: [(name, duck_type)], rows: [tuple]) for a golden query."""
    return REFERENCE_FNS[name](sf_dir)
