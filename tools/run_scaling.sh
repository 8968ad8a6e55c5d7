#!/bin/bash
# N-vs-4N scaling study (north rule): same input, two parallelism levels,
# separate JVMs, configs interleaved twice to average out the sandbox's
# noisy-neighbor CPU steal; each JVM runs a warmup + SPARK_GRAFT_REPS
# timed reps and reports the best (least-contended) one.
# Usage: tools/run_scaling.sh [N] [ROWS]
set -e
N=${1:-8}
N4=$((N * 4))
ROWS=${2:-8000000}
cd "$(dirname "$0")/.."
for CPUS in $N $N4 $N $N4; do
  SPARK_GRAFT_ROWS=$ROWS SPARK_GRAFT_REPS=${SPARK_GRAFT_REPS:-2} \
    timeout 560 sbt -batch "runMain graft.ScalingBench $CPUS" 2>&1 \
    | grep -oE '\{"cpus".*\}' | tail -1
done
