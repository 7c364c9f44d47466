#!/bin/sh
# Regenerate PLAN_DIGESTS.md — the committed per-query physical-plan
# digest manifest (see graft.PlanDigest). Run at round end from the
# repo root, like tools/bench_history.py:
#   sh tools/plan_digests.sh [sfDir]
# Uses the bench's session shape (SPARK_GRAFT_CPUS, default 32) so the
# digested plans are the plans BENCH_r{N} actually timed.
cd "$(dirname "$0")/.." || exit 1
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  exec sbt -batch "runMain graft.PlanDigest --all ${1:-/root/testdata/sf0.1}"
