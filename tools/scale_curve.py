#!/usr/bin/env python3
"""Three-point scale curve for the pair-heavy dedup family.

Reads the pair-family subset bench artifacts produced at sf1/sf2/sf4
(replica and fresh ScaleUp corpora, 10x/20x/40x the sf0.1 base) and
prints, per query and per mode:

  - wall seconds at each point
  - the log-log wall-vs-data exponent fitted on sf1->sf4 (slope of
    ln(t) vs ln(data factor) through the end points; 1.0 = linear in
    data, 2.0 = quadratic)

The pair family's WORK is quadratic in data for the by-construction
exact arms and ~linear for the banded/blocked production paths, so the
exponent is the number that separates "absorbing 16x pair mass
sublinearly" from "wall tracks pair mass 1:1".

Usage: python3 tools/scale_curve.py [dir-with-jsons]
Expects BENCH_FULL_sf{1,2,4}{,f}_partial.json (falls back to /tmp).
"""
import json
import math
import os
import sys


def load(d, name):
    for base in (d, "/tmp", "."):
        p = os.path.join(base, name)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
    return None


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "."
    points = [("sf1", 10), ("sf2", 20), ("sf4", 40)]
    for mode, suffix in (("replica", ""), ("fresh", "f")):
        runs = {}
        for sf, factor in points:
            j = load(d, f"BENCH_FULL_{sf}{suffix}_partial.json")
            if j:
                runs[factor] = j["queries"]
        if len(runs) < 2:
            print(f"[{mode}] missing artifacts, skipping")
            continue
        factors = sorted(runs)
        qs = sorted(set.intersection(*(set(r) for r in runs.values())))
        print(f"\n### {mode} corpora (data factor vs sf0.1 base)")
        hdr = " | ".join(f"{f}x s" for f in factors)
        print(f"| query | {hdr} | exponent |")
        print("|---|" + "---|" * (len(factors) + 1))
        rows = []
        for q in qs:
            ts = [runs[f][q] for f in factors]
            if any(t is None or t <= 0 for t in ts):
                exp = float("nan")
            else:
                exp = (math.log(ts[-1] / ts[0]) /
                       math.log(factors[-1] / factors[0]))
            rows.append((exp, q, ts))
        rows.sort(reverse=True)
        for exp, q, ts in rows:
            cells = " | ".join(f"{t:.1f}" for t in ts)
            print(f"| {q} | {cells} | {exp:.2f} |")


if __name__ == "__main__":
    main()
