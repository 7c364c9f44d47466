#!/bin/sh
# Scripted round-close snapshot — the r16 verdict's "stop doing this
# from memory" item (dangling BENCH_LAST.json / stale plan manifest /
# missing native bench cells recurred three rounds running), hardened
# per the r17 verdict (the script graded ZERO r17 cells because no
# BENCH_r17_native.json existed and the gate was `|| true`).
#
# Run from the repo root as the LAST builder action of a round:
#   sh tools/round_close.sh [sfDir] [samples]
#
# Steps, in order (each prints a loud marker; a failure stops the
# close so a partial snapshot is never committed silently):
#   1. full-roster native bench at samples>=2 -> BENCH_LAST.json,
#      snapshotted as BENCH_r{N}_native.json (N from PROGRESS.jsonl,
#      override with ROUND=N) so bench_history grows this round's
#      column. sbt's exit status is checked directly (no pipeline —
#      POSIX sh has no pipefail, and `sbt | tail` took tail's status).
#   2. regenerate PLAN_DIGESTS.md (digest-session plans; any diff vs
#      the committed manifest must be adjudicated in the PR body /
#      commit message before committing)
#   3. bench_history.py — regression gate over the new cells. A hard
#      (>=2x) round-over-round regression FAILS the close: adjudicate
#      it (control run / BENCH_NOTES), then re-run.
#   4. leak check refresh (LEAKCHECK.json) so the committed artifact
#      matches the committed code
#   5. git status check: every artifact the round produced must be
#      staged, not dangling
set -e
cd "$(dirname "$0")/.." || exit 1
SF_DIR="${1:-/root/testdata/sf0.1}"
SAMPLES="${2:-2}"
# round number: explicit ROUND=N env wins; else the newest round the
# driver logged in PROGRESS.jsonl (the close runs inside that round)
if [ -z "$ROUND" ]; then
  ROUND=$(python3 -c "
import json
print(max(json.loads(l)['round'] for l in open('PROGRESS.jsonl') if l.strip()))
") || { echo "round_close: cannot determine round (set ROUND=N)"; exit 1; }
fi

echo "== round_close 1/5: native bench (r$ROUND, samples=$SAMPLES, $SF_DIR) =="
log=$(mktemp)
if ! SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_BENCH_SAMPLES="$SAMPLES" \
    sbt -batch "runMain graft.Bench" > "$log" 2>&1; then
  tail -20 "$log"
  echo "round_close: bench run FAILED — close aborted (full log: $log)"
  exit 1
fi
tail -3 "$log"
rm -f "$log"
# the bench main rewrites BENCH_LAST.json; snapshot it as this round's
# native cell so bench_history.py can grade it (r17 gap: this file was
# never written, so the gate silently graded nothing)
python3 -c "
import json
d = json.load(open('BENCH_LAST.json'))
assert d.get('queries'), 'BENCH_LAST.json has no per-query map'
" || { echo "round_close: BENCH_LAST.json malformed — close aborted"; exit 1; }
cp BENCH_LAST.json "BENCH_r${ROUND}_native.json"
echo "snapshotted BENCH_r${ROUND}_native.json"

echo "== round_close 2/5: plan digest manifest =="
# always dump the normalized plans beside the manifest: when a digest
# flaps (r18: m09 read a never-reproduced value in one sweep), the
# adjudication protocol needs the flapped PLAN TEXT, which a
# digest-only run discards
dump_dir="/tmp/graft_digest_dump_r${ROUND}"
mkdir -p "$dump_dir"
SPARK_GRAFT_DIGEST_DUMP="$dump_dir" sh tools/plan_digests.sh "$SF_DIR" > /dev/null
echo "(normalized plans dumped to $dump_dir)"
git diff --stat PLAN_DIGESTS.md || true

echo "== round_close 3/5: bench history gate =="
# no `|| true`: a hard regression (exit 2) or builder error fails the
# close. Adjudicate the flagged cells, record in tools/BENCH_NOTES.md,
# and re-run the close (or re-run with the regression resolved).
python3 tools/bench_history.py

echo "== round_close 4/5: leak check =="
if [ -x tools/leakcheck.sh ]; then sh tools/leakcheck.sh; else
  echo "(no tools/leakcheck.sh — driver-side artifact, skipped)"; fi

echo "== round_close 5/5: working-tree audit =="
git status --short
echo "round_close done — commit BENCH_LAST.json + BENCH_r${ROUND}_native.json"
echo "+ PLAN_DIGESTS.md (+ BENCH_NOTES/SOAK updates) with the adjudication"
echo "notes NOW."
