"""Rabin content-defined chunking kernel — bit-exact with the reference.

Reference semantics (apps/dedup/src/rabin.c:72-100, rabin.h:7-11):
irreducible poly 0x45c2b6a1 (rabin.c:15), window NWINDOW=32, split mask
0xfff; ``rabinseg(p, n)`` returns the smallest i >= 32 such that the
fingerprint of the 32-byte window ``p[i-32:i]`` has its low 12 bits all
zero, else n. The coarse pass (Fragment, encoder.c:1140-1192) only accepts
splits >= ANCHOR_JUMP (2 MiB) into the remaining buffer; the fine pass
(FragmentRefine, encoder.c:885-958) splits repeatedly and numbers chunks
(l1, l2) with an ``is_last_l2`` marker.

Spark-first design: the fingerprint is GF(2)-linear, so the hash of every
window is an XOR of 32 per-position byte-contribution tables. That turns
per-byte C recursion into 32 vectorized numpy gathers over the whole
buffer, and both passes become greedy scans over one precomputed
match-position array — identical split points, no Python-per-byte loop.
Only the low 12 bits participate in the split test, so the match scan uses
uint16 contribution tables (half the memory traffic of full u32 hashes).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

IRR_POLY = 0x45C2B6A1  # rabin.c:15
NWINDOW = 32  # rabin.h:8
RABIN_MASK = 0xFFF  # rabin.h:10
ANCHOR_JUMP = 2 * 1024 * 1024  # dedupdef.h:264

_U32 = 0xFFFFFFFF


def _fpreduce(x: int) -> int:
    # GF(2) reduction of x * 2^32 mod the irreducible poly (rabin.c:28-39).
    for _ in range(32):
        x = ((x << 1) ^ IRR_POLY) & _U32 if (x >> 31) else (x << 1) & _U32
    return x


@lru_cache(maxsize=1)
def _tables() -> tuple[np.ndarray, np.ndarray]:
    """(32, 256) u32 contribution tables T and their low-12-bit u16 view.

    T[j][b] = contribution of byte value b at window offset j (j=0 oldest)
    to the window fingerprint: absorb(0, b) = b, then 31-j zero-byte
    absorbs, where absorb(h, 0) = (h << 8) ^ tab[h >> 24]. T[0] equals the
    reference's rabinwintab (rabin.c:51-68), T[31][b] = b.
    """
    tab = np.array([_fpreduce(i) for i in range(256)], dtype=np.uint64)
    T = np.zeros((NWINDOW, 256), dtype=np.uint64)
    T[NWINDOW - 1] = np.arange(256, dtype=np.uint64)
    for j in range(NWINDOW - 2, -1, -1):
        h = T[j + 1]
        T[j] = ((h << np.uint64(8)) & np.uint64(_U32)) ^ tab[(h >> np.uint64(24)).astype(np.int64)]
    T32 = T.astype(np.uint32)
    Tlow = (T32 & RABIN_MASK).astype(np.uint16)
    return T32, Tlow


@lru_cache(maxsize=1)
def _pair_tables() -> np.ndarray:
    """(16, 65536) u16 pair tables for the fast match scan.

    P[j][b1 << 8 | b0] = Tlow[2j][b0] ^ Tlow[2j+1][b1] — index is the
    LITTLE-ENDIAN uint16 view of two adjacent bytes, so a raw
    ``data.view(uint16)`` slice is a ready-made gather index (no per-window
    index arithmetic). 2 MiB total, L2-resident.
    """
    _, Tlow = _tables()
    P = np.zeros((NWINDOW // 2, 65536), dtype=np.uint16)
    for j in range(NWINDOW // 2):
        P[j] = (Tlow[2 * j][None, :] ^ Tlow[2 * j + 1][:, None]).reshape(-1)
    return P


def window_hashes(data: np.ndarray) -> np.ndarray:
    """Full u32 fingerprint of every 32-byte window; H[k] covers data[k:k+32].
    (Used by tests; the split scan uses match_positions.)"""
    T32, _ = _tables()
    n = data.shape[0]
    if n < NWINDOW:
        return np.zeros(0, dtype=np.uint32)
    m = n - NWINDOW + 1
    H = np.zeros(m, dtype=np.uint32)
    for j in range(NWINDOW):
        H ^= T32[j][data[j : j + m]]
    return H


def match_positions(data: np.ndarray, block: int = 1 << 18) -> np.ndarray:
    """Sorted absolute positions i (NWINDOW <= i <= n) where the window
    data[i-32:i] satisfies the split test (hash & 0xfff == 0).

    Fast path: window starts are split by parity so adjacent byte pairs are
    plain ``uint16`` views of the buffer; each block converts the pair view
    to ``intp`` ONCE, then the 16 pair-table gathers index *slices* of that
    one array (numpy would otherwise re-cast the index per gather). Blocked
    so accumulators + indices stay cache-resident. ~47 MB/s/core vs ~8 for
    the naive 32-gather scan; bit-identical output (tests compare both
    against the scalar recurrence).
    """
    n = int(data.shape[0])
    if n < NWINDOW:
        return np.zeros(0, dtype=np.int64)
    P = _pair_tables()
    npair = NWINDOW // 2
    m = n - NWINDOW + 1
    even = data[: (n // 2) * 2].view(np.uint16)
    odd = data[1 : 1 + ((n - 1) // 2) * 2].view(np.uint16)
    hits: list[np.ndarray] = []
    idx = np.empty(block + npair, dtype=np.intp)
    H = np.empty(block, dtype=np.uint16)
    for view, total, off in ((even, (m + 1) // 2, 0), (odd, m // 2, 1)):
        for s in range(0, total, block):
            length = min(block, total - s)
            need = length + npair - 1
            idx[:need] = view[s : s + need]
            H[:length] = P[0][idx[:length]]
            for j in range(1, npair):
                H[:length] ^= P[j][idx[j : j + length]]
            h = np.flatnonzero(H[:length] == 0)
            if len(h):
                hits.append((h + s) * 2 + off + NWINDOW)
    if not hits:
        return np.zeros(0, dtype=np.int64)
    res = np.concatenate(hits)
    res.sort()
    return res


def coarse_boundaries(matches: np.ndarray, n: int) -> list[int]:
    """Fragment-stage anchors (encoder.c:1140-1192): starting from the last
    anchor, the next boundary is the first match >= anchor + ANCHOR_JUMP + 32
    (the rabinseg scan starts ANCHOR_JUMP into the remainder), if < n."""
    out: list[int] = []
    cur = 0
    while n - cur > ANCHOR_JUMP:
        idx = int(np.searchsorted(matches, cur + ANCHOR_JUMP + NWINDOW))
        if idx >= len(matches) or matches[idx] >= n:
            break
        cur = int(matches[idx])
        out.append(cur)
    return out


def fine_boundaries(matches: np.ndarray, start: int, end: int) -> list[int]:
    """FragmentRefine splits (encoder.c:885-958): repeatedly take the first
    match at least NWINDOW past the current chunk start; a match at ``end``
    is 'no split' (rabinseg returning n)."""
    out: list[int] = []
    cur = start
    while True:
        idx = int(np.searchsorted(matches, cur + NWINDOW))
        if idx >= len(matches) or matches[idx] >= end:
            return out
        cur = int(matches[idx])
        out.append(cur)


def chunk_offsets(data: bytes | np.ndarray) -> list[tuple[int, int, int, int, bool]]:
    """Chunk a buffer; returns [(l1, l2, start, end, is_last_l2), ...].

    l1 = coarse anchor index, l2 = refine index within the anchor,
    is_last_l2 mirrors the reference's isLastL2Chunk (dedupdef.h:205) which
    the Reorder stage uses to learn per-anchor lengths.
    """
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    n = int(arr.shape[0])
    if n == 0:
        return [(0, 0, 0, 0, True)]
    matches = match_positions(arr)
    anchors = [0, *coarse_boundaries(matches, n), n]
    out: list[tuple[int, int, int, int, bool]] = []
    for l1 in range(len(anchors) - 1):
        cs, ce = anchors[l1], anchors[l1 + 1]
        bounds = [cs, *fine_boundaries(matches, cs, ce), ce]
        last = len(bounds) - 2
        for l2 in range(len(bounds) - 1):
            out.append((l1, l2, bounds[l2], bounds[l2 + 1], l2 == last))
    return out


def rabinseg_scalar(data: bytes, start: int = 0) -> int:
    """Scalar transcription of rabinseg's recurrence (rabin.c:72-100) —
    the independent test oracle for the vectorized kernel."""
    tab = np.array([_fpreduce(i) for i in range(256)], dtype=np.uint64)
    win = _tables()[0][0].astype(np.uint64)  # T[0] == rabinwintab
    p = data[start:]
    n = len(p)
    if n < NWINDOW:
        return n
    h = 0
    for i in range(NWINDOW):
        x = h >> 24
        h = ((h << 8) | p[i]) & _U32
        h ^= int(tab[x])
    if (h & RABIN_MASK) == 0:
        return NWINDOW
    i = NWINDOW
    while i < n:
        h ^= int(win[p[i - NWINDOW]])
        x = h >> 24
        h = ((h << 8) & _U32) | p[i]
        i += 1
        h ^= int(tab[x])
        if (h & RABIN_MASK) == 0:
            return i
    return n
