#!/bin/bash
# Paired A/B bench vs a prior round's snapshot commit — the standard
# round-over-round perf basis (ambient drift cancels inside one window).
#
#   tools/bench_ab.sh <baseline-commit> [rounds]
#
# Builds the baseline jar from the commit in a throwaway git worktree,
# runs graft.BenchAB (both sides timed in one window, order-alternated),
# and leaves bench_ab_detail.json + the BENCH_AB summary line. Commit
# the summary as BENCH_AB_r<N>.json keyed to the baseline commit.
set -euo pipefail
COMMIT="${1:?usage: tools/bench_ab.sh <baseline-commit> [rounds]}"
ROUNDS="${2:-2}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
WT=$(mktemp -d /tmp/graft_ab_base.XXXX)
trap 'git worktree remove --force "$WT" 2>/dev/null || true' EXIT
git worktree add --detach "$WT" "$COMMIT"
(cd "$WT" && sbt -batch package)
JAR=$(ls "$WT"/target/scala-2.13/*.jar | head -1)
echo "baseline jar: $JAR (from $COMMIT)"
SPARK_GRAFT_SF_DIR="$SF_DIR" sbt -batch "runMain graft.BenchAB $JAR $ROUNDS"
