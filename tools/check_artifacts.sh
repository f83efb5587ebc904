#!/usr/bin/env bash
# Round-end artifact reproducibility check (SURVEY §5m-7 contract):
# the committed SCALE_CURVE_r{N}.json must byte-equal what
# tools/scale_curve.py regenerates from the committed per-point partials —
# r12 shipped a curve built from run 1 of 7, and the table SURVEY quoted
# could not be reproduced from the committed artifact (only from the
# partials). Run this before the end-of-round commit:
#
#   tools/check_artifacts.sh scalebench_r13 SCALE_CURVE_r13.json
#
# Exit 0 = committed curve reproduces; exit 1 = regen differs (diff shown).
set -euo pipefail
dir="${1:?usage: check_artifacts.sh <partials-dir> <committed-curve.json>}"
committed="${2:?usage: check_artifacts.sh <partials-dir> <committed-curve.json>}"
tmp="$(mktemp /tmp/scale_curve_regen.XXXXXX.json)"
trap 'rm -f "$tmp"' EXIT
python3 "$(dirname "$0")/scale_curve.py" "$dir" --json "$tmp" >/dev/null
if cmp -s "$tmp" "$committed"; then
  echo "OK: $committed reproduces from $dir"
else
  echo "STALE: $committed != regeneration from $dir" >&2
  diff <(python3 -m json.tool "$committed") \
       <(python3 -m json.tool "$tmp") | head -40 >&2 || true
  exit 1
fi
# Probe artifacts (round 15, r14 verdict item 3): the recall/occupancy
# grids that justify banding defaults live in probes/*.jsonl — every
# line of every committed probe file must parse as JSON, so a truncated
# or comma-broken probe line can never be cited as evidence.
if [ -d "$(dirname "$0")/../probes" ]; then
  PROBES_DIR="$(dirname "$0")/../probes" python3 - <<'EOF'
import glob, json, os, sys
base = os.environ["PROBES_DIR"]
bad = 0
files = sorted(glob.glob(os.path.join(base, '*.jsonl')))
for f in files:
    for i, line in enumerate(open(f), 1):
        line = line.strip()
        if not line:
            continue
        try:
            json.loads(line)
        except Exception as e:
            print(f"BAD JSON {f}:{i}: {e}", file=sys.stderr)
            bad += 1
if bad:
    sys.exit(1)
print(f"OK: {len(files)} probe file(s) parse clean")
EOF
fi
