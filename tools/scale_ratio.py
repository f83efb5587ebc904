#!/usr/bin/env python3
"""Per-query scale-up ratio table: BENCH_SF1.json (sf1 run) vs the
committed BENCH_FULL.json (sf0.1 idle map). 10x data on a fixed 32-core
box should land roughly linear (<= ~15x wall) for shuffle/scan-bound
queries; anything far above that is a candidate data-dependent blowup.

Usage: python3 tools/scale_ratio.py [BENCH_SF1.json] [BENCH_FULL.json]
Writes a markdown table to stdout.
"""
import json
import subprocess
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SF1.json"
    sf1 = load(sf1_path)
    if len(sys.argv) > 2:
        base = load(sys.argv[2])
    else:
        # the committed sf0.1 map, not the working tree (a scale run may
        # have overwritten the working-tree file mid-flight)
        base = json.loads(subprocess.check_output(
            ["git", "show", "HEAD:BENCH_FULL.json"]).decode())
    b, s = base["queries"], sf1["queries"]
    rows = []
    for q in sorted(s):
        t1, t0 = s[q], b.get(q)
        if t0 is None or t0 <= 0 or t1 < 0:
            rows.append((float("inf"), q, t0, t1))
        else:
            rows.append((t1 / t0, q, t0, t1))
    rows.sort(reverse=True)
    print(f"sf0.1: total {base['value']}s over {base['n_queries']} queries "
          f"(repeat={base.get('repeat')}); "
          f"sf1: total {sf1['value']}s over {sf1['n_queries']} "
          f"(repeat={sf1.get('repeat')}, errors={sf1.get('errors')})")
    print()
    print("| query | sf0.1 s | sf1 s | ratio | flag |")
    print("|---|---|---|---|---|")
    for r, q, t0, t1 in rows:
        flag = ""
        if t1 is not None and t1 < 0:
            flag = "ERROR/TIMEOUT"
        elif r > 15:
            flag = ">15x"
        print(f"| {q} | {t0 if t0 is not None else '-'} | {t1} | "
              f"{'-' if r == float('inf') else f'{r:.1f}x'} | {flag} |")
    over = [q for r, q, _, t1 in rows
            if r != float("inf") and r > 15 and (t1 is None or t1 >= 0)]
    errs = [q for _, q, _, t1 in rows if t1 is not None and t1 < 0]
    print()
    print(f"queries >15x: {len(over)} {over}")
    print(f"errors/timeouts: {len(errs)} {errs}")


if __name__ == "__main__":
    main()
