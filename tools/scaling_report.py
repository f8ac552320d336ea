#!/usr/bin/env python
"""Render the scaling table for docs/SCALING.md from scale_heavy runs.

Reads the JSON result line from one or more scale_heavy.py logs (the
last valid JSON line of each) and, when several logs are given, takes
the per-(query, sf) MINIMUM wall across runs — each run is already a
min-of-2, so multiple independent runs guard against machine-level
noise windows (shuffle bytes and row counts are plan-determined and
identical across runs; they are taken from the min-wall run).

Prints a markdown table with per-query walls, shuffle-write bytes,
output rows, and the observed wall exponents: exp a->b =
log10(wall_b / wall_a) for a 10x data step — 1.0 linear, < 1
sublinear, > 1 superlinear. The sf0.1 -> sf1 column carries the
evidence; at sf0.01 absolute walls are overhead-dominated.

Usage:
    python tools/scaling_report.py LOG [LOG ...]
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict:
    data = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    data = json.loads(line)
                except json.JSONDecodeError:
                    pass
    if data is None:
        raise SystemExit(f"no JSON result line in {path}")
    return data


def main() -> None:
    paths = sys.argv[1:] or ["/tmp/scale_heavy.log"]
    runs = [load(p) for p in paths]

    sfs = ["sf0.01", "sf0.1", "sf1"]
    names = list(runs[0][sfs[0]])
    merged: dict[str, dict[str, dict]] = {s: {} for s in sfs}
    for s in sfs:
        for n in names:
            best = min((r[s][n] for r in runs if s in r and n in r[s]),
                       key=lambda e: e["wall_s"])
            merged[s][n] = best

    hdr = ("| query | " + " | ".join(f"{s} wall" for s in sfs)
           + " | exp 0.01→0.1 | exp 0.1→1 | "
           + " | ".join(f"{s} shuffle W" for s in sfs)
           + " | " + " | ".join(f"{s} rows" for s in sfs) + " |")
    print(hdr)
    print("|" + "---|" * (hdr.count("|") - 1))
    for n in names:
        row = [merged[s][n] for s in sfs]
        walls = [r["wall_s"] for r in row]
        e01 = math.log10(walls[1] / walls[0]) if walls[0] > 0 else float("nan")
        e1 = math.log10(walls[2] / walls[1]) if walls[1] > 0 else float("nan")
        cells = [n] + [f"{w:.2f}s" for w in walls] + [f"{e01:.2f}", f"{e1:.2f}"]
        cells += [f"{r['shuffle_write_mb']:.1f}MB" for r in row]
        cells += [f"{r['rows']:,}" for r in row]
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
