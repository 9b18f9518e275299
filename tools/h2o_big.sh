#!/bin/bash
# H2O db-benchmark group-by at the reference's canonical N=1e9 on one host.
# One query per JVM: q10's group keys are near-unique, so its shuffle is
# ~raw-data-sized (no partial-agg reduction possible) and two queries'
# shuffle files at once outrun this host's scratch disk. zstd shuffle
# compression halves the on-disk shuffle vs lz4 for the same reason —
# the codec choice is recorded with the numbers in BASELINE.md.
#
# Usage: tools/h2o_big.sh [N] [K] [log]   (defaults 1e9, 100, stdout)
set -u
cd "$(dirname "$0")/.."
N=${1:-1e9}; K=${2:-100}
QS="q1_sum_by_id1 q2_sum_by_id1_id2 q3_sum_mean_by_id3 q4_mean_by_id4
    q5_sum_by_id6 q6_median_std_by_id4_id5 q7_range_by_id3 q8_top2_by_id6
    q9_r2_by_id2_id4 q10_sum_count_by_id1_6"
for q in $QS; do
  echo "=== $q $(date -u +%H:%M:%S) free=$(df -h /tmp | awk 'NR==2{print $4}')"
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-96g} \
  SPARK_GRAFT_SHUFFLE_CODEC=${SPARK_GRAFT_SHUFFLE_CODEC:-zstd} \
    sbt -batch "runMain graft.GroupByBench $N $K $q" 2>/dev/null \
    | grep -E '"metric"' || echo "FAILED $q"
done
echo "=== done $(date -u +%H:%M:%S)"
