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

ROUND=$(python3 -c "
import json
print(max(json.loads(l)['round'] for l in open('PROGRESS.jsonl') if l.strip()))
") || { echo "round_open: cannot determine round"; exit 1; }

# Driver-artifact sanity (the r19 '{}' lesson): the driver's
# CORRECTNESS_r{N}.json is EVIDENCE, not truth — validate it before
# committing, and if it's empty or missing roster queries, log that
# loudly in tools/BENCH_NOTES.md (the SOURCE of BENCH_HISTORY.md's
# notes section — the r20 verdict caught that appending to the
# generated BENCH_HISTORY.md itself loses the note at the next
# bench_history.py regeneration) so a cold reader never mistakes an
# empty artifact for zero queries passing. Non-fatal: the builder's
# own sweep logs + the judge compare are the backstop.
python3 - "$ROUND" <<'EOF' || true
import json, sys, re
rnd = int(sys.argv[1]) - 1  # artifacts belong to the JUST-CLOSED round
path = f"CORRECTNESS_r{rnd:02d}.json"
try:
    art = json.load(open(path))
except (OSError, ValueError) as e:
    print(f"round_open: NOTE — {path} unreadable ({e}); skipping check")
    sys.exit(0)
# roster lives in the per-family query maps, NOT SparkEntry.scala
# (which only aggregates them — the r20 ADVICE caught that regexing
# SparkEntry yields an empty roster and a vacuous "coverage verified")
import glob
roster = set()
for f in glob.glob("src/main/scala/graft/queries/*.scala"):
    try:
        roster |= set(re.findall(r'"([a-z]\d+_\w+)"\s*->', open(f).read()))
    except OSError:
        pass
keys = set(art) if isinstance(art, dict) else set()
missing = roster - keys
if not keys or (roster and len(missing) > len(roster) // 2):
    line = (f"- r{rnd:02d} open (r{rnd+1:02d}): driver correctness "
            f"artifact {path} is "
            + ("EMPTY" if not keys else
               f"short ({len(keys)}/{len(roster)} roster queries)")
            + " — builder sweep logs + judge compare are the evidence; "
              "do not read this as queries failing.")
    notes = open("tools/BENCH_NOTES.md").read()
    if line not in notes:
        with open("tools/BENCH_NOTES.md", "a") as f:
            f.write("\n" + line + "\n")
        print(f"round_open: WARNING — {line}")
        print("round_open: appended note to tools/BENCH_NOTES.md "
              "(synced into BENCH_HISTORY.md at the next regeneration)")
elif not roster:
    # an empty roster means THIS check is broken, not that coverage held
    print(f"round_open: WARNING — roster scan found no queries; "
          f"{path} has {len(keys)} entries but coverage is UNVERIFIED")
else:
    print(f"round_open: {path} OK "
          f"({len(keys)} entries, roster coverage verified)")
EOF
git add tools/BENCH_NOTES.md 2>/dev/null || true

if git diff --quiet && git diff --cached --quiet \
    && [ -z "$(git status --porcelain)" ]; then
  echo "round_open: tree already clean — nothing to commit"
  exit 0
fi

# Stage ONLY the known driver-artifact paths (r18 advice: a blanket
# `git add -A` would sweep stray builder edits or untracked junk into
# a commit mislabeled as driver artifacts). Anything else dirty is a
# loud warning, left in the tree for the builder to handle explicitly.
git add -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' VERDICT.md ADVICE.md \
  LEAKCHECK.json BENCH_LAST.json PROGRESS.jsonl 2>/dev/null || true
if git diff --cached --quiet; then
  echo "round_open: tree is dirty but NONE of it is driver artifacts —"
  git status --short
  echo "round_open: nothing committed; review the above by hand"
  exit 0
fi

echo "round_open: committing driver artifacts for round $ROUND:"
git diff --cached --stat
git commit -m "round $((ROUND - 1)): verdict/advice/correctness/bench (driver artifacts, committed at r$ROUND open)"
if [ -n "$(git status --porcelain)" ]; then
  echo "round_open: WARNING — non-driver-artifact changes remain unstaged:"
  git status --short
fi
echo "round_open: done — start building"
