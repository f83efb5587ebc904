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

Inputs: every file matching BENCH_FULL_{sf1,sf2,sf4}{,f}_partial*.json
in the given dir (then /tmp, then .). MULTIPLE files per point (e.g.
`..._partial.json`, `..._partial.run2.json`) are MIN-MERGED per query —
re-runs of individually polluted rows land in their own artifact and
the curve takes the best identical-protocol time, with every input
committed so the published table regenerates from the repo alone.
Values <= 0 (error markers) are ignored in the merge.

Usage: python3 tools/scale_curve.py [dir-with-jsons] [--json OUT]
  --json OUT   additionally write the SCALE_CURVE artifact (the
               committed SCALE_CURVE_r{N}.json format) to OUT.
"""
import glob
import json
import math
import os
import sys


def load_merged(d, sf, suffix):
    """Min-merge every artifact for one (sf, mode) point.

    Returns (merged, n_runs): n_runs is the number of artifact files
    merged — recorded in the emitted artifact and printed table because
    an UNEQUAL run count across points biases the fitted exponent (a
    min-of-3 endpoint vs a min-of-1 start point pulls the slope down;
    readers must be able to see the asymmetry).
    """
    merged = {}
    n_runs = 0
    seen = False
    for base in (d, "/tmp", "."):
        paths = sorted(glob.glob(
            os.path.join(base, f"BENCH_FULL_{sf}{suffix}_partial*.json")))
        if not paths:
            continue
        seen = True
        n_runs = len(paths)
        for p in paths:
            with open(p) as f:
                qs = json.load(f)["queries"]
            for q, t in qs.items():
                if t is None or t <= 0:
                    continue  # error marker, never a time
                if q not in merged or t < merged[q]:
                    merged[q] = t
        break  # first dir that has any artifact wins (no cross-dir mixing)
    return (merged, n_runs) if seen else (None, 0)


def main():
    args = [a for a in sys.argv[1:]]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i:i + 2]
    d = args[0] if args else "."
    # sf8 (80x) is an optional 4th octave — load_merged returns None when
    # a point has no artifact and the point is simply absent from that
    # mode's fit (the exponent is always fitted end point vs start point
    # of whatever is present)
    points = [("sf1", 10), ("sf2", 20), ("sf4", 40), ("sf8", 80)]
    artifact = {
        "metric": "pair_family_scale_curve",
        "base": "sf0.1 (factor 1)",
        "protocol": ("SPARK_GRAFT_CPUS=32, repeat=2 min, min-merged across "
                     "committed BENCH_FULL_{sf}{mode}_partial*.json re-runs"),
        "factors": {sf: f for sf, f in points},
        "modes": {},
    }
    artifact["run_counts"] = {}
    # dup = the dup-heavy ScaleUp mode (~33% exact duplicates — the
    # real-crawl regime the exact-duplicate collapse exists for); its
    # artifacts first appear in round 14, earlier dirs simply skip it
    for mode, suffix in (("replica", ""), ("fresh", "f"), ("dup", "d")):
        runs = {}
        run_counts = {}
        for sf, factor in points:
            j, n_runs = load_merged(d, sf, suffix)
            if j:
                runs[factor] = j
                run_counts[sf] = n_runs
        if len(runs) < 2:
            print(f"[{mode}] missing artifacts, skipping")
            continue
        artifact["run_counts"][mode] = run_counts
        factors = sorted(runs)
        # fit each query on the points where it was MEASURED (an sf8
        # octave artifact deliberately covers a small subset; a global
        # intersection would shrink every other query's table to it)
        qs = sorted(set.union(*(set(r) for r in runs.values())))
        print(f"\n### {mode} corpora (data factor vs sf0.1 base)")
        print("runs merged per point: " + ", ".join(
            f"{sf}={n}" for sf, n in sorted(run_counts.items())))
        hdr = " | ".join(f"{f}x s" for f in factors)
        print(f"| query | {hdr} | exponent |")
        print("|---|" + "---|" * (len(factors) + 1))
        rows = []
        mode_out = {}
        for q in qs:
            pts = [(f, runs[f][q]) for f in factors
                   if q in runs[f] and runs[f][q] and runs[f][q] > 0]
            if len(pts) < 2:
                continue
            exp = (math.log(pts[-1][1] / pts[0][1]) /
                   math.log(pts[-1][0] / pts[0][0]))
            # cells use the SAME t > 0 predicate as the fit (load_merged
            # already drops error markers, so this is belt-and-braces):
            # a value absent from the exponent must not silently appear
            # as a table cell
            ts = [t if (t := runs[f].get(q)) is not None and t > 0 else None
                  for f in factors]
            rows.append((exp, q, ts))
            # span: the factor range this query's exponent was actually
            # fitted on — per-query fits may cover different octaves
            # within one table (e.g. an sf8 subset artifact)
            mode_out[q] = dict(
                {f"s{f}": round(t, 3) for f, t in zip(factors, ts)
                 if t is not None},
                exponent=round(exp, 2),
                span=f"{pts[0][0]}x-{pts[-1][0]}x")
        # explicit key: NaN exponents sort LAST deterministically (plain
        # tuple sort left them in arbitrary positions — NaN comparisons
        # are always False — and ties fell through to comparing ts lists)
        rows.sort(key=lambda r: (not math.isnan(r[0]),
                                 r[0] if not math.isnan(r[0]) else 0.0,
                                 r[1]),
                  reverse=True)
        for exp, q, ts in rows:
            cells = " | ".join(
                "-" if t is None else f"{t:.1f}" for t in ts)
            print(f"| {q} | {cells} | {exp:.2f} |")
        artifact["modes"][mode] = mode_out
    if out_json:
        with open(out_json, "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")
        print(f"\nwrote {out_json}")


if __name__ == "__main__":
    main()
