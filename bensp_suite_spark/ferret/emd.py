"""Exact Earth Mover's Distance (reference: apps/ferret/src/src/emd.c, the
Rubner transportation-simplex implementation; cass wrapper sdist_emd,
apps/ferret/src/src/dist.c:297-351).

Pure numpy/Python re-derivation of the classic transportation problem:
Vogel-approximation initial basic feasible solution + MODI (u-v) pivoting.
Exact optimum — NOT a Sinkhorn approximation — matching the reference's
choice of exact EMD for the rank stage. Signatures are small (regions per
image ≤ MAXR=256, typically ≤ 16; extract.c:23), so simplex cost is
negligible next to the candidate scan.

Semantics (Rubner): total flow = min(Σw1, Σw2); unequal masses handled by a
zero-cost slack sink; emd = Σ f_ij d_ij / total_flow.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def emd(w1: np.ndarray, w2: np.ndarray, dist: np.ndarray) -> float:
    """EMD between signatures (weights w1, w2; ground-distance matrix dist
    of shape (len(w1), len(w2)))."""
    w1 = np.asarray(w1, dtype=np.float64).copy()
    w2 = np.asarray(w2, dtype=np.float64).copy()
    D = np.asarray(dist, dtype=np.float64)
    s1, s2 = float(w1.sum()), float(w2.sum())
    total = min(s1, s2)
    if total <= _EPS:
        return 0.0
    # Rubner slack: pad the lighter side with a zero-cost node so supplies
    # and demands balance exactly.
    if s1 > s2 + _EPS:
        w2 = np.append(w2, s1 - s2)
        D = np.hstack([D, np.zeros((D.shape[0], 1))])
    elif s2 > s1 + _EPS:
        w1 = np.append(w1, s2 - s1)
        D = np.vstack([D, np.zeros((1, D.shape[1]))])
    flow = _transport(w1, w2, D)
    return float((flow * D).sum() / total)


def _transport(supply: np.ndarray, demand: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Optimal transportation plan by Vogel init + MODI pivoting."""
    n, m = C.shape
    s = supply.astype(np.float64).copy()
    d = demand.astype(np.float64).copy()
    # rescale to a common total to absorb fp drift
    tot = s.sum()
    d *= tot / d.sum()

    flow = np.zeros((n, m))
    basis: set[tuple[int, int]] = set()

    # --- Vogel approximation for the initial basic feasible solution ---
    rows = list(range(n))
    cols = list(range(m))
    srem, drem = s.copy(), d.copy()
    big = C.max() * 2 + 1.0
    Cw = C.copy()
    while rows and cols:
        if len(rows) == 1 and len(cols) == 1:
            i, j = rows[0], cols[0]
        else:
            # penalties for ALL remaining lines in two partition calls
            # (per-line numpy calls dominated the whole simplex before);
            # first-max argmax + strict col-beats-row comparison reproduce
            # the scalar loop's tie-breaks exactly, so flows are unchanged
            sub = Cw[np.ix_(rows, cols)]
            if len(cols) >= 2:
                two = np.partition(sub, 1, axis=1)
                rpen = two[:, 1] - two[:, 0]
            else:
                rpen = sub[:, 0]
            if len(rows) >= 2:
                twoc = np.partition(sub, 1, axis=0)
                cpen = twoc[1, :] - twoc[0, :]
            else:
                cpen = sub[0, :]
            ri = int(np.argmax(rpen))
            ci = int(np.argmax(cpen))
            if cpen[ci] > rpen[ri]:
                j = cols[ci]
                i = rows[int(np.argmin(sub[:, ci]))]
            else:
                i = rows[ri]
                j = cols[int(np.argmin(sub[ri, :]))]
        q = min(srem[i], drem[j])
        flow[i, j] += q
        basis.add((i, j))
        srem[i] -= q
        drem[j] -= q
        # remove exactly one exhausted line per step (keeps n+m-1 basis size)
        if srem[i] <= _EPS and len(rows) > 1:
            rows.remove(i)
        elif drem[j] <= _EPS and len(cols) > 1:
            cols.remove(j)
        elif srem[i] <= _EPS and drem[j] <= _EPS and len(rows) == 1 and len(cols) == 1:
            break
        elif srem[i] <= _EPS:
            rows.remove(i)
        else:
            cols.remove(j)

    # ensure a spanning basis (degenerate zero-flow cells if needed)
    _complete_basis(basis, n, m)

    # --- MODI (u-v) improvement ---
    for _ in range(500):
        u, v = _potentials(basis, C, n, m)
        # reduced costs for non-basis cells
        red = C - u[:, None] - v[None, :]
        for i, j in basis:
            red[i, j] = 0.0
        ij = np.unravel_index(np.argmin(red), red.shape)
        if red[ij] >= -1e-10:
            break
        cycle = _find_cycle(basis, ij, n, m)
        # alternate +/- along the cycle starting with + at the entering cell
        minus = cycle[1::2]
        theta = min(flow[c] for c in minus)
        leave = min((c for c in minus if abs(flow[c] - theta) <= _EPS), key=lambda c: C[c])
        for k, c in enumerate(cycle):
            flow[c] += theta if k % 2 == 0 else -theta
        basis.add(tuple(ij))
        basis.discard(leave)
        flow[leave] = 0.0
        _complete_basis(basis, n, m)
    return flow


def _complete_basis(basis: set[tuple[int, int]], n: int, m: int) -> None:
    """Grow the basis to a spanning tree (n+m-1 edges) with zero-flow cells."""
    parent = list(range(n + m))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in basis:
        a, b = find(i), find(n + j)
        if a != b:
            parent[a] = b
    if len(basis) >= n + m - 1:
        return
    for i in range(n):
        for j in range(m):
            a, b = find(i), find(n + j)
            if a != b:
                parent[a] = b
                basis.add((i, j))
                if len(basis) == n + m - 1:
                    return


def _potentials(basis: set[tuple[int, int]], C: np.ndarray, n: int, m: int):
    # plain lists + None sentinels: at signature sizes (n,m ≲ 16) per-element
    # numpy scalar ops cost more than the whole traversal
    u: list = [None] * n
    v: list = [None] * m
    u[0] = 0.0
    by_row: dict[int, list[int]] = {}
    by_col: dict[int, list[int]] = {}
    for i, j in basis:
        by_row.setdefault(i, []).append(j)
        by_col.setdefault(j, []).append(i)
    stack = [(True, 0)]
    while stack:
        isrow, idx = stack.pop()
        if isrow:
            ui = u[idx]
            for j in by_row.get(idx, ()):
                if v[j] is None:
                    v[j] = C[idx, j] - ui
                    stack.append((False, j))
        else:
            vj = v[idx]
            for i in by_col.get(idx, ()):
                if u[i] is None:
                    u[i] = C[i, idx] - vj
                    stack.append((True, i))
    ua = np.array([0.0 if x is None else x for x in u])
    va = np.array([0.0 if x is None else x for x in v])
    return ua, va


def _find_cycle(basis: set[tuple[int, int]], enter: tuple[int, int], n: int, m: int):
    """Unique alternating row/col cycle created by adding ``enter`` to the
    basis spanning tree. Returns cells in cycle order starting at enter."""
    adj: dict[int, list[tuple[int, tuple[int, int]]]] = {}
    for i, j in basis:
        adj.setdefault(i, []).append((n + j, (i, j)))
        adj.setdefault(n + j, []).append((i, (i, j)))
    start, goal = enter[0], n + enter[1]
    # DFS path from start row-node to goal col-node through basis edges
    prev: dict[int, tuple[int, tuple[int, int]]] = {start: None}
    stack = [start]
    while stack:
        x = stack.pop()
        if x == goal:
            break
        for y, cell in adj.get(x, []):
            if y not in prev:
                prev[y] = (x, cell)
                stack.append(y)
    path_cells = []
    x = goal
    while prev[x] is not None:
        px, cell = prev[x]
        path_cells.append(cell)
        x = px
    return [enter, *path_cells]


def pairwise_l2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Ground distance used by ferret: L2 between region feature vectors
    (dist_L2_float semantics, cass_dist.c:45-58 — note the reference's
    vec dist is SQUARED L2; the EMD wrapper uses it as-is)."""
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d2
