"""Property-based tests (hypothesis) — SURVEY §5 notes the reference has no
randomized testing; we add it for the kernels where bit-exactness claims
live."""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bensp_suite_spark.dedup import rabin
from bensp_suite_spark.dedup.pipeline import reference_encode_py
from bensp_suite_spark.ferret.emd import emd, pairwise_l2


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=20_000))
def test_rabin_vectorized_equals_scalar(data):
    arr = np.frombuffer(data, np.uint8)
    vec = rabin.fine_boundaries(rabin.match_positions(arr), 0, len(data))
    out, s = [], 0
    while True:
        off = rabin.rabinseg_scalar(data, s)
        if s + off >= len(data):
            break
        s += off
        out.append(s)
    assert vec == out


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=30_000))
def test_chunk_offsets_partition_the_buffer(data):
    offs = rabin.chunk_offsets(data)
    assert offs[0][2] == 0 and offs[-1][3] == len(data)
    assert all(a[3] == b[2] for a, b in zip(offs, offs[1:]))
    # reassembly identity (the decoder invariant, without Spark)
    assert b"".join(data[s:e] for (_, _, s, e, _) in offs) == data


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=5_000), min_size=1, max_size=5),
)
def test_reference_encoder_dup_flags_consistent(contents):
    files = {i: c for i, c in enumerate(contents)}
    stream = reference_encode_py(files)
    seen = {}
    for fid, l1, l2, _last, sha, dup in stream:
        if sha in seen:
            assert dup, "second occurrence must be a duplicate"
        else:
            assert not dup, "first occurrence must be canonical"
            seen[sha] = (fid, l1, l2)
        # digest really is the sha1 of the chunk bytes
    for fid, content in files.items():
        for l1, l2, s, e, _last in rabin.chunk_offsets(content):
            assert hashlib.sha1(content[s:e]).hexdigest() in seen


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.integers(0, 10_000),
)
def test_emd_metric_properties(n, m, seed):
    rng = np.random.default_rng(seed)
    f1, f2 = rng.random((n, 3)), rng.random((m, 3))
    w1 = rng.random(n) + 0.01
    w2 = rng.random(m) + 0.01
    w1 /= w1.sum()
    w2 /= w2.sum()
    # true-metric ground distance for the metric properties
    D12 = np.sqrt(pairwise_l2(f1, f2))
    d = emd(w1, w2, D12)
    assert d >= -1e-12
    # symmetry
    assert abs(d - emd(w2, w1, D12.T)) < 1e-9
    # identity on identical signatures
    assert emd(w1, w1, np.sqrt(pairwise_l2(f1, f1))) < 1e-9
    # lower bound: EMD >= distance between barycenters (for metric D via
    # convexity this holds for L2 ground distance)
    bary = np.linalg.norm((w1[:, None] * f1).sum(0) - (w2[:, None] * f2).sum(0))
    assert d >= bary - 1e-8


@given(
    h=st.integers(min_value=0, max_value=2**64 - 1),
    flip_bits=st.lists(st.integers(min_value=0, max_value=63), min_size=0, max_size=3, unique=True),
)
@settings(max_examples=200, deadline=None)
def test_dhash_banding_recall_guarantee(h, flip_bits):
    """Pigeonhole contract of image_near_dup_pairs: any pair within
    hamming distance 3 of a 64-bit hash agrees on at least one of the
    four 16-bit bands (so the band join cannot miss it)."""
    h2 = h
    for b in flip_bits:
        h2 ^= 1 << b
    bands_a = [(h >> (16 * i)) & 0xFFFF for i in range(4)]
    bands_b = [(h2 >> (16 * i)) & 0xFFFF for i in range(4)]
    assert any(a == b for a, b in zip(bands_a, bands_b))


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
    window=st.integers(min_value=8, max_value=4096),
)
@settings(max_examples=100, deadline=None)
def test_packing_offsets_gapless_and_windows_monotone(tokens, window):
    """The packing rule (running sum − own length) yields gapless offsets
    and non-decreasing window ids for any token-count sequence."""
    offset = 0
    prev_win = 0
    for n in tokens:
        win = offset // window
        assert win >= prev_win
        extra = (offset + n - 1) // window - win
        assert extra >= 0
        prev_win = win
        offset += n
    assert offset == sum(tokens)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=8),
)
def test_png_roundtrip_property(w, h, seed, filters):
    """encode_png→decode_png is the identity for ANY image shape, pixel
    content and per-row filter assignment (all five RFC 2083 filters)."""
    from bensp_suite_spark.multimodal.images import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img, row_filters=filters)), img)


@settings(max_examples=30, deadline=None)
@given(
    recs=st.lists(
        st.one_of(
            st.binary(min_size=1, max_size=200),        # compress payload
            st.binary(min_size=20, max_size=20).map(lambda b: ("fp", b)),
        ),
        min_size=0,
        max_size=30,
    ),
    cut=st.integers(0, 100),
)
def test_ddp_incremental_parser_roundtrip_property(recs, cut):
    """Property: any serialized record stream parses back identically
    through the incremental file-object parser, and truncating the
    archive mid-record raises instead of yielding garbage."""
    import io
    import struct as _st

    from bensp_suite_spark.sources import ddp as D

    out = [_st.pack("<i", D.CHECKBIT), _st.pack("<B", 0)]
    expected = []
    for seq, r in enumerate(recs):
        if isinstance(r, tuple):
            payload, rtype = r[1], D.TYPE_FINGERPRINT
            expected.append((seq, rtype, payload.hex(), None))
        else:
            payload, rtype = r, D.TYPE_COMPRESS
            expected.append((seq, rtype, None, payload))
        out.append(_st.pack("<BQ", rtype, len(payload)))
        out.append(payload)
    blob = b"".join(out)
    it = D.iter_ddp_records_from(io.BytesIO(blob))
    assert next(it) == ("__header__", "gzip")
    assert list(it) == expected
    # truncation mid-record must raise, never silently succeed
    if len(blob) > 5 and recs:
        trunc = blob[: 5 + (cut % (len(blob) - 5))]
        it2 = D.iter_ddp_records_from(io.BytesIO(trunc))
        next(it2)
        try:
            got = list(it2)
        except ValueError:
            pass  # expected for mid-record cuts
        else:
            # a cut exactly on a record boundary is a legal shorter stream
            assert got == expected[: len(got)]


@settings(max_examples=20, deadline=None)
@given(data=st.binary(min_size=0, max_size=65536))
def test_reference_chunker_matches_pipeline_chunker(data):
    """Cross-implementation guard for the golden-oracle independence
    chain: the forward-derived reference chunker
    (tools/golden_reference.chunk_offsets_ref) and the pipeline's
    pair-table chunker (dedup/rabin.chunk_offsets) must produce the
    identical (l1, l2, start, end, is_last) stream on arbitrary bytes."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from golden_reference import chunk_offsets_ref

    assert chunk_offsets_ref(data) == rabin.chunk_offsets(data)


def test_pagerank_int_matches_scalar_reference_and_is_layout_independent(spark):
    """pagerank_int must equal a scalar pure-Python run of the same
    integer recurrence bit-for-bit, under any partitioning of the edge
    list — the property float PageRank cannot have (neighbor-sum
    re-association) and the reason the operator is fixed-point."""
    import numpy as np

    from bensp_suite_spark.operators.graph import RANK_SCALE, pagerank_int

    rng = np.random.default_rng(42)
    n_nodes, n_edges = 60, 400
    raw = {(int(a), int(b))
           for a, b in rng.integers(0, n_nodes, (n_edges, 2)) if a != b}
    # undirected: both directions so every node with an edge has out-deg ≥ 1
    edges = sorted(raw | {(b, a) for a, b in raw})

    # scalar reference
    from collections import defaultdict
    deg = defaultdict(int)
    for a, _b in edges:
        deg[a] += 1
    ranks = {a: RANK_SCALE for a in deg}
    base = 15 * RANK_SCALE // 100
    for _ in range(3):
        mass = defaultdict(int)
        for a, b in edges:
            mass[b] += ranks[a] // deg[a]
        ranks = {a: base + (85 * mass[a]) // 100 for a in deg}

    df = spark.createDataFrame(edges, "src long, dst long")
    for variant in (df.repartition(7), df.coalesce(1), df.repartition(13, "dst")):
        got = {r["node"]: r["rank"]
               for r in pagerank_int(variant, iterations=3).collect()}
        assert got == ranks


def test_triangle_count_matches_brute_enumeration(spark):
    """Degree-oriented triangle counting must equal the O(n³) brute
    enumeration on a random graph (including nodes on zero triangles
    being absent), and be invariant to edge direction/duplication in the
    input."""
    import itertools

    from bensp_suite_spark.operators.graph import triangle_count

    rng = np.random.default_rng(5)
    n = 40
    edges = [(int(a), int(b)) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.15]
    # brute: count triangles per node
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = {}
    for x, y, z in itertools.combinations(range(n), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                expect[v] = expect.get(v, 0) + 1
    # feed edges messy: both directions + dups must not change the result
    messy = edges + [(b, a) for a, b in edges] + edges[:7]
    df = spark.createDataFrame(messy, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == expect


def test_connected_components_known_partition(spark):
    """connected_components labels every node with its component's min id
    on a graph with known components (two chains + a singleton pair)."""
    from bensp_suite_spark.operators.graph import connected_components

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rep"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
