"""Bit-exactness of the vectorized Rabin CDC kernel vs the scalar recurrence
(the transcription of rabin.c:72-100 semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from bensp_suite_spark.dedup import rabin


def _scalar_splits(data: bytes) -> list[int]:
    out, s, n = [], 0, len(data)
    while True:
        off = rabin.rabinseg_scalar(data, s)
        if s + off >= n:
            return out
        s += off
        out.append(s)


@pytest.mark.parametrize("seed,size", [(0, 1000), (1, 50_000), (2, 200_000), (3, 31), (4, 32), (5, 33)])
def test_fine_boundaries_match_scalar(seed, size):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
    arr = np.frombuffer(data, np.uint8)
    vec = rabin.fine_boundaries(rabin.match_positions(arr), 0, len(data))
    assert vec == _scalar_splits(data)


def test_low_entropy_input():
    # long runs of identical bytes — worst case for CDC (few/no matches)
    data = b"a" * 100_000 + bytes(range(256)) * 200 + b"\x00" * 50_000
    arr = np.frombuffer(data, np.uint8)
    assert rabin.fine_boundaries(rabin.match_positions(arr), 0, len(data)) == _scalar_splits(data)


def test_chunk_offsets_cover_exactly():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=300_000, dtype=np.uint8).tobytes()
    offs = rabin.chunk_offsets(data)
    assert offs[0][2] == 0 and offs[-1][3] == len(data)
    assert all(a[3] == b[2] for a, b in zip(offs, offs[1:]))
    # l2 numbering restarts per l1; exactly one is_last per l1
    by_l1: dict[int, list] = {}
    for l1, l2, s, e, last in offs:
        by_l1.setdefault(l1, []).append((l2, last))
    for chunks in by_l1.values():
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        assert [c[1] for c in chunks].count(True) == 1 and chunks[-1][1]


def test_window_hash_matches_rolled():
    # full-hash path consistent with the low-12-bit match scan
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=10_000, dtype=np.uint8)
    H = rabin.window_hashes(arr)
    m = rabin.match_positions(arr)
    assert np.array_equal(np.flatnonzero((H & rabin.RABIN_MASK) == 0) + rabin.NWINDOW, m)


def test_tiny_and_empty():
    assert rabin.chunk_offsets(b"") == [(0, 0, 0, 0, True)]
    assert rabin.chunk_offsets(b"xyz") == [(0, 0, 0, 3, True)]
