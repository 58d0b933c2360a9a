#!/usr/bin/env bash
# Incremental sweep: compare every dump that has a fresh _oracle_sha1
# stamp and no recorded attempt yet. Safe to re-run; results accumulate
# in $OUT/sweep_results.txt (names attempted in $OUT/sweep_done.txt).
# Used to overlap DuckDB compares with a long-running Verify dump at
# stress scales.
# Usage: sweep_incremental.sh <sfDir> <outDir> [timeoutSec=900] [parallel=4]
set -u
SF=$(readlink -f "$1"); OUT=$(readlink -f "$2"); T=${3:-900}; P=${4:-4}
cd "$(dirname "$0")/.."
RESULTS="$OUT/sweep_results.txt"; DONE="$OUT/sweep_done.txt"
touch "$RESULTS" "$DONE"
export SF OUT T RESULTS
ls "$OUT" | while read -r d; do
  [ -f "$OUT/$d/_oracle_sha1" ] || continue
  grep -qx "$d" "$DONE" && continue
  echo "$d" >> "$DONE"
  echo "$d"
done | xargs -r -P "$P" -I{} bash -c '
  out=$(timeout "$T" python3 scripts/compare_one.py "$SF" "$OUT" "{}" 2>&1)
  s=$?
  if [ $s -eq 124 ]; then line="TIMEOUT {} (oracle exceeded ${T}s)"
  elif [ $s -ne 0 ] && ! echo "$out" | tail -1 | grep -q "^FAIL\|^PASS"; then
    line="ERROR {} (compare_one exited $s): $(echo "$out" | tail -1)"
  else line=$(echo "$out" | tail -1)
  fi
  echo "$line" >> "$RESULTS"
  echo "$line"'
