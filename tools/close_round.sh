#!/usr/bin/env bash
# Close a build round: archive the definitive sweep detail under the round
# name and show exactly what still needs committing, so the round's
# provenance chain (BENCH_rN / CORRECTNESS_rN / BENCH_DETAIL_rN / DRIFT /
# LEAKCHECK) never ends with a loose end. Run as the LAST action of a round:
#   tools/close_round.sh <round-number>
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/close_round.sh <round-number, e.g. 13>}"
RN=$(printf 'r%02d' "$ROUND")
if [ -f BENCH_DETAIL.json ]; then
  # Guard (added r15 after the r14 mix-up): the drift baseline MUST be the
  # sf0.1 gate sweep. Refuse to archive an endurance (sf1/sf3) detail —
  # that would mask every future drift comparison.
  DETAIL_SF=$(python3 -c "import json; print(json.load(open('BENCH_DETAIL.json')).get('sf',''))")
  if [ "$DETAIL_SF" != "/root/testdata/sf0.1" ]; then
    echo "REFUSING to archive: BENCH_DETAIL.json sf='${DETAIL_SF}'" >&2
    echo "expected '/root/testdata/sf0.1' — rerun the sf0.1 sweep first" >&2
    exit 1
  fi
  cp BENCH_DETAIL.json "BENCH_DETAIL_${RN}.json"
  echo "archived BENCH_DETAIL.json -> BENCH_DETAIL_${RN}.json (sf0.1 verified)"
else
  echo "WARN: no BENCH_DETAIL.json in tree — nothing to archive" >&2
fi
echo
echo "round-state files needing git add (empty = board already clean):"
# Both the padded (r09) and unpadded (r9) spellings exist across the
# tree's history — list both so nothing escapes the provenance check.
git status --porcelain -- "BENCH_r${ROUND}.json" "BENCH_${RN}.json" \
  "CORRECTNESS_r${ROUND}.json" "CORRECTNESS_${RN}.json" \
  "BENCH_DETAIL.json" "BENCH_DETAIL_${RN}.json" DRIFT.md LEAKCHECK.json \
  BASELINE.md COVERAGE.md "SCALE_r${ROUND}.json" "SCALE_${RN}.json" \
  "BENCH_SF1_r${ROUND}.json" "BENCH_SF1_${RN}.json" | sed 's/^/  /'
DIRTY=$(git status --porcelain | wc -l)
echo
echo "total dirty paths in tree: ${DIRTY} (goal: 0 after the close commit)"
