#!/usr/bin/env python
"""Merge a full bench payload (bench_results.json or a committed bench_rN.json)
into the per-query best-of-round table ``bench_best.json`` that bench.py's
drift guard compares against.

Usage: python tools/update_bench_best.py [payload.json ...]
       (no args: merges every committed bench_r*.json + bench_results.json)

Only sf=0.1 payloads are merged — the guard runs at the driver's per-round
config; mixing scale factors would make the "best" meaningless. Queries new
to the table enter at their first recorded time.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEST = os.path.join(REPO, "bench_best.json")


def main(paths: list[str]) -> None:
    if not paths:
        paths = sorted(glob.glob(os.path.join(REPO, "bench_r*.json")))
        default_full = os.path.join(REPO, "bench_results.json")
        if os.path.exists(default_full):
            paths.append(default_full)

    best: dict[str, float] = {}
    sources: list[str] = []
    if os.path.exists(BEST):
        prior = json.load(open(BEST))
        best = prior.get("queries", {})
        sources = prior.get("sources", [])

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

    with open(BEST, "w") as fh:
        json.dump(
            {"sf": 0.1, "sources": sources, "queries": dict(sorted(best.items()))},
            fh,
            indent=1,
        )
    print(f"{BEST}: {len(best)} queries from {len(sources)} payloads")


if __name__ == "__main__":
    main(sys.argv[1:])
