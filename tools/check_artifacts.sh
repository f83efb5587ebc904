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
