#!/usr/bin/env bash
# Round-end doc gate (r12 verdict item 2 / ADVICE r12): the r10 and r12
# rounds both shipped round docs with literal placeholder tokens or
# dangling forward references ("see below" at EOF). This check is the
# mechanical regression guard: run it before any snapshot commit; it
# exits 1 if any TRACKED markdown contains an unfilled placeholder or a
# file-final dangling forward reference.
# Usage: scripts/doccheck.sh
set -u
cd "$(dirname "$0")/.."
bad=0
# 1. literal placeholder tokens anywhere in tracked md. VERDICT/ADVICE
#    are DRIVER-written (they quote the tokens while describing the
#    defect) — excluded; everything else is ours to keep clean.
#    Any all-caps angle token counts (<GRAPH_TABLE>, <SF100_RESULT_…>),
#    not just ones spelled "PLACEHOLDER" — verified zero false
#    positives across currently tracked md.
if git grep -nE '<[A-Z][A-Z0-9_]{2,}>|TBD_|FILLME' -- '*.md' \
     ':!VERDICT.md' ':!ADVICE.md'; then
  echo "DOCCHECK FAIL: unfilled placeholder token(s) above"; bad=1
fi
# 2. a forward reference in the last 3 lines of a doc ("see below" with
#    no below is the r12 STRESS defect shape)
for f in $(git ls-files '*.md'); do
  if tail -3 "$f" | grep -qiE 'see below|filled in later|results pending'; then
    echo "DOCCHECK FAIL: $f ends with a dangling forward reference:"
    tail -3 "$f" | sed 's/^/  | /'; bad=1
  fi
done
[ $bad -eq 0 ] && echo "DOCCHECK PASS: no placeholders, no dangling EOF references"
exit $bad
