#!/usr/bin/env bash
# Parallel per-query oracle compare over a full Verify dump: each catalog
# entry gets its own compare_one.py (own DuckDB process) under a timeout,
# P at a time. A TIMEOUT line names the query so undecided entries are
# explicit, never silent. Exit status is a real gate (round-10 advice):
# 1 if any FAIL/TIMEOUT/ERROR line was produced, 0 only on all-green.
# Usage:
#   scripts/sweep_parallel.sh <sfDir> <outDir> [timeoutSec=240] [parallel=8]
set -u
# resolve args to absolute paths BEFORE cd (relative args used to break)
SF=$(readlink -f "$1"); OUT=$(readlink -f "$2"); T=${3:-240}; P=${4:-8}
cd "$(dirname "$0")/.."
NAMES=$(mktemp /tmp/sweep_names.XXXXXX)
RESULTS=$(mktemp /tmp/sweep_results.XXXXXX)
trap 'rm -f "$NAMES" "$RESULTS"' EXIT
python3 - "$OUT" <<'EOF' > "$NAMES"
import json, sys
print("\n".join(sorted(json.load(open(f"{sys.argv[1]}/oracle_sql.json")))))
EOF
export SF OUT T
xargs -P "$P" -I{} bash -c '
  out=$(timeout "$T" python3 scripts/compare_one.py "$SF" "$OUT" "{}" 2>&1)
  s=$?
  if [ $s -eq 124 ]; then echo "TIMEOUT {} (oracle exceeded ${T}s)"
  elif [ $s -ne 0 ] && ! echo "$out" | tail -1 | grep -q "^FAIL\|^PASS"; then
    echo "ERROR {} (compare_one exited $s): $(echo "$out" | tail -1)"
  else echo "$out" | tail -1
  fi' < "$NAMES" | tee "$RESULTS"
# anchored: the per-line producers above emit FAIL/TIMEOUT/ERROR only at
# line start; an unanchored match would false-fail on a PASS line whose
# text merely contains one of those words (e.g. a row-diff echo)
if grep -Eq '^(FAIL|TIMEOUT|ERROR)' "$RESULTS"; then exit 1; fi
