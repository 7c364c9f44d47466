#!/bin/sh
# Scripted round-open hygiene — the mirror of round_close.sh. Every
# round since r14 the verdict has repeated the same ask: the driver
# leaves its artifacts in the working tree (BENCH_r{N}.json /
# CORRECTNESS_r{N}.json / VERDICT.md / ADVICE.md updates, a LEAKCHECK
# round bump, sometimes a BENCH_LAST.json overwritten by a post-close
# re-run) and the builder should commit them FIRST so the round starts
# from a clean tree and every later diff is the builder's own.
#
# Run as the FIRST builder action of a round:
#   sh tools/round_open.sh
set -e
cd "$(dirname "$0")/.." || exit 1

if git diff --quiet && git diff --cached --quiet \
    && [ -z "$(git status --porcelain)" ]; then
  echo "round_open: tree already clean — nothing to commit"
  exit 0
fi

ROUND=$(python3 -c "
import json
print(max(json.loads(l)['round'] for l in open('PROGRESS.jsonl') if l.strip()))
") || { echo "round_open: cannot determine round"; exit 1; }

echo "round_open: committing driver artifacts for round $ROUND:"
git status --short
git add -A
git commit -m "round $((ROUND - 1)): verdict/advice/correctness/bench (driver artifacts, committed at r$ROUND open)"
echo "round_open: done — tree clean, start building"
