#!/bin/bash
# A/B bench runner (round-17 verdict #3): run graft.Bench on two trees
# in one window, sampling /proc/stat user/steal ticks around each run
# so the adjudication is mechanical. Usage: bench_ab.sh <treeA> <treeB>
# (each a checked-out repo dir with compiled classes; run from anywhere)
set -u
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
ticks() { awk '/^cpu /{print $2+$3, $9}' /proc/stat; }
for tree in "$@"; do
  cd "$tree" || exit 1
  read u0 s0 <<<"$(ticks)"
  out=$(SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" 2>/dev/null |
        grep '"metric"')
  read u1 s1 <<<"$(ticks)"
  echo "{\"tree\": \"$tree\", \"user_ticks\": $((u1-u0)), \"steal_ticks\": $((s1-s0)), \"bench\": $out}"
done
