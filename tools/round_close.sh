#!/bin/sh
# Scripted round-close snapshot — the r16 verdict's "stop doing this
# from memory" item (dangling BENCH_LAST.json / stale plan manifest /
# missing native bench cells recurred three rounds running).
#
# Run from the repo root as the LAST builder action of a round:
#   sh tools/round_close.sh [sfDir] [samples]
#
# Steps, in order (each prints a loud marker; a failure stops the
# close so a partial snapshot is never committed silently):
#   1. full-roster native bench at samples>=2 -> BENCH_LAST.json
#   2. regenerate PLAN_DIGESTS.md (digest-session plans; any diff vs
#      the committed manifest must be adjudicated in the PR body /
#      commit message before committing)
#   3. bench_history.py — regression gate over the new cells
#   4. leak check refresh (LEAKCHECK.json) so the committed artifact
#      matches the committed code
#   5. git status check: every artifact the round produced must be
#      staged, not dangling
set -e
cd "$(dirname "$0")/.." || exit 1
SF_DIR="${1:-/root/testdata/sf0.1}"
SAMPLES="${2:-2}"

echo "== round_close 1/5: native bench (samples=$SAMPLES, $SF_DIR) =="
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_SAMPLES="$SAMPLES" \
  sbt -batch "runMain graft.Bench" | tail -3

echo "== round_close 2/5: plan digest manifest =="
sh tools/plan_digests.sh "$SF_DIR" > /dev/null
git diff --stat PLAN_DIGESTS.md || true

echo "== round_close 3/5: bench history gate =="
python3 tools/bench_history.py || true

echo "== round_close 4/5: leak check =="
if [ -x tools/leakcheck.sh ]; then sh tools/leakcheck.sh; else
  echo "(no tools/leakcheck.sh — driver-side artifact, skipped)"; fi

echo "== round_close 5/5: working-tree audit =="
git status --short
echo "round_close done — commit BENCH_LAST.json + PLAN_DIGESTS.md (+"
echo "BENCH_NOTES/SOAK updates) with the adjudication notes NOW."
