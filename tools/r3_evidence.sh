#!/bin/bash
# Round-3 end-of-round evidence run (VERDICT r2 ask #2: no perf claim
# without a committed artifact). Run when the device tunnel is healthy:
#     bash tools/r3_evidence.sh [quick]
# Appends to perf_results/*.jsonl; run twice in one session to bound
# session variance. Each step is individually timeouted so a wedged
# compile service skips forward instead of eating the round.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
Q=${1:-}

run() {
    echo "=== $* ===" >&2
    timeout "$T" "$@" 2>&1 | grep -v WARNING
    # report the profiled command's status (timeout's 124 included), not
    # grep's — PIPESTATUS[0] is the first element of the pipe
    echo "--- rc=${PIPESTATUS[0]} ---" >&2
}

T=1800
run python tools/conv_probe.py --dtypes int8
run python tools/prefix_prof.py --net cnv-w1a1 --route s2d --batch 1024
run python tools/prefix_prof.py --net cnv-w1a1 --route xla --batch 1024
run python tools/batch1_latency.py --net cnv-w1a1 --routes s2d,xla
T=3600
if [ "$Q" = "quick" ]; then
    run python tools/tpu_perf_suite.py --quick --verify --tag r3-evidence
else
    run python tools/tpu_perf_suite.py --verify --tag r3-evidence
fi
T=1800
run python bench.py
