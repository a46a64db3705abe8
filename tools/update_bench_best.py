#!/usr/bin/env python
"""Merge a full bench payload (bench_results.json or a committed bench_rN.json)
into the per-query best-of-round table ``bench_best.json`` that bench.py's
drift guard compares against.

Usage: python tools/update_bench_best.py [payload.json ...]
       (no args: merges every committed bench_r*.json + bench_results.json)
       python tools/update_bench_best.py --rebase NAME=SEC "reason"

Only sf=0.1 payloads are merged — the guard runs at the driver's per-round
config; mixing scale factors would make the "best" meaningless. Queries new
to the table enter at their first recorded time.

``--rebase`` REPLACES one query's best (merge only ever lowers it) and logs
the reason — for when a flagged drift is root-caused as environmental
(e.g. a suite-ordering neighbor effect) and the old best is no longer the
steady state the guard should compare against. The rebase is recorded in
the file's ``rebased`` list so the audit trail survives.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEST = os.path.join(REPO, "bench_best.json")


def rebase(name_sec: str, reason: str) -> None:
    name, sec = name_sec.split("=")
    data = json.load(open(BEST))
    old = data["queries"].get(name)
    data["queries"][name] = float(sec)
    data.setdefault("rebased", []).append(
        {"query": name, "old": old, "new": float(sec), "reason": reason}
    )
    with open(BEST, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"rebased {name}: {old} -> {sec} ({reason})")


def main(paths: list[str]) -> None:
    if not paths:
        paths = sorted(glob.glob(os.path.join(REPO, "bench_r*.json")))
        default_full = os.path.join(REPO, "bench_results.json")
        if os.path.exists(default_full):
            paths.append(default_full)

    best: dict[str, float] = {}
    sources: list[str] = []
    rebased: list[dict] = []
    if os.path.exists(BEST):
        prior = json.load(open(BEST))
        best = prior.get("queries", {})
        sources = prior.get("sources", [])
        rebased = prior.get("rebased", [])

    for p in paths:
        with open(p) as fh:
            payload = json.load(fh)
        if payload.get("sf") != 0.1:
            print(f"skip {p}: sf={payload.get('sf')}", file=sys.stderr)
            continue
        for name, sec in payload.get("queries", {}).items():
            if name not in best or sec < best[name]:
                best[name] = sec
        tag = os.path.basename(p)
        if tag not in sources:
            sources.append(tag)

    out = {"sf": 0.1, "sources": sources, "queries": dict(sorted(best.items()))}
    if rebased:
        out["rebased"] = rebased
    with open(BEST, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{BEST}: {len(best)} queries from {len(sources)} payloads")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--rebase":
        rebase(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "")
    else:
        main(sys.argv[1:])
