#!/usr/bin/env bash
# Parallel per-query oracle compare over a full Verify dump: each catalog
# entry gets its own compare_one.py (own DuckDB process) under a timeout,
# P at a time. A TIMEOUT line names the query so undecided entries are
# explicit, never silent. Usage:
#   scripts/sweep_parallel.sh <sfDir> <outDir> [timeoutSec=240] [parallel=8]
set -u
SF=$1; OUT=$2; T=${3:-240}; P=${4:-8}
cd "$(dirname "$0")/.."
python3 - "$OUT" <<'EOF' > /tmp/sweep_names.txt
import json, sys
print("\n".join(sorted(json.load(open(f"{sys.argv[1]}/oracle_sql.json")))))
EOF
export SF OUT T
xargs -P "$P" -I{} bash -c '
  out=$(timeout "$T" python3 scripts/compare_one.py "$SF" "$OUT" "{}" 2>&1)
  s=$?
  if [ $s -eq 124 ]; then echo "TIMEOUT {} (oracle exceeded ${T}s)"
  else echo "$out" | tail -1
  fi' < /tmp/sweep_names.txt
