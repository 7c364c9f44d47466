#!/bin/sh
# Builder-side mirror of the driver's leak check (r17 verdict ask 5:
# round_close step 4 skipped when this file was absent, so the
# committed LEAKCHECK.json was always one round stale at close).
# Seven categories matching the driver artifact's "hits" keys. The
# patterns are assembled with bracket tricks so this script never
# matches itself; the scan also excludes this file.
# Writes LEAKCHECK.json in the driver's shape and exits nonzero on
# any hit.
set -e
cd "$(dirname "$0")/.." || exit 1
python3 - <<'EOF'
import json, os, re, sys

# category -> regex (case-insensitive where noted). Generic signals for
# anything non-public: company-internal imports/URLs/buckets, chat
# links, credential literals, internal env-var prefixes.
pats = {
    "internal-import": re.compile(
        r"^\s*import\s+\S*(" + "anthro" + r"pic|claude[._-]internal)", re.M),
    "internal-url": re.compile(
        r"https?://\S*(" + "anthro" + r"pic\.com|\.corp\.|\.internal[./])"),
    "internal-pkg2": re.compile(
        r"\b(claude[-_]?cli[-_]?internal|com\." + "anthro" + r"pic)\b"),
    # scoped to internal-looking bucket NAMES (r18 advice: the bare
    # scheme pattern flagged every s3:///gs:// URI, including legitimate
    # public-dataset references in docs — e.g. s3://commoncrawl). A
    # bucket is a hit only when its name carries an internal signal.
    "internal-bucket": re.compile(
        r"\b(s3|gs)://[a-z0-9._-]*(" + "anthro" + r"pic|claude|internal"
        r"|corp|prod[.-]|staging[.-])[a-z0-9._-]*"),
    "slack-link": re.compile(
        r"(hooks\.slack\.com|slack\.com/archives|app\.slack\.com)"),
    "api-key": re.compile(
        r"(sk-" + "ant-" + r"[A-Za-z0-9_-]{8,}|AKIA[0-9A-Z]{16}"
        r"|-----BEGIN [A-Z ]*PRIVATE KEY-----)"),
    "axon-env": re.compile(r"\b(" + "AXON" + r"|ANTHRO" + r"PIC)_[A-Z0-9_]+\b"),
}

SKIP_DIRS = {".git", "target", ".bsp", ".idea", "project"}
SKIP_FILES = {"tools/leakcheck.sh"}
EXTS = (".scala", ".sbt", ".md", ".sh", ".py", ".json", ".sql", ".conf",
        ".properties", ".txt")

hits = {k: [] for k in pats}
for root, dirs, files in os.walk("."):
    dirs[:] = [d for d in dirs if d not in SKIP_DIRS]
    for f in files:
        path = os.path.normpath(os.path.join(root, f))
        if path in SKIP_FILES or not f.endswith(EXTS):
            continue
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for cat, rx in pats.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{path}:{line}")

try:
    rnd = max(json.loads(l)["round"]
              for l in open("PROGRESS.jsonl") if l.strip())
except Exception:
    rnd = None
n = sum(len(v) for v in hits.values())
out = {"round": rnd, "n_hits": n, "hits": hits}
with open("LEAKCHECK.json", "w") as fh:
    json.dump(out, fh, indent=2)
    fh.write("\n")
print(f"leakcheck: {n} hits (LEAKCHECK.json refreshed, round {rnd})")
if n:
    for cat, v in hits.items():
        for h in v:
            print(f"  {cat}: {h}")
    sys.exit(1)
EOF
