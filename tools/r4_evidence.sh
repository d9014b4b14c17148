#!/bin/bash
# Round-4 end-of-round evidence run. Run when the device tunnel is
# healthy:   bash tools/r4_evidence.sh [quick]
# Appends to perf_results/*.jsonl. Each step is individually timeouted so
# a wedged compile service skips forward instead of eating the round.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
Q=${1:-}

run() {
    echo "=== $* ===" >&2
    timeout "$T" "$@" 2>&1 | grep -v WARNING
    # PIPESTATUS[0] = the profiled command's status (timeout's 124 incl.)
    echo "--- rc=${PIPESTATUS[0]} ---" >&2
}

T=1800
# packed word transport vs int8 codes on the production MLP route
run python tools/packed_transport.py --tag r4-final
# MLP per-layer floors (input row + noise fields)
run python tools/prefix_prof.py --net sfc-w1a1 --route xla --batch 65536 --tag r4-final
run python tools/prefix_prof.py --net lfc-w1a1 --route xla --batch 32768 --tag r4-final
run python tools/prefix_prof.py --net cnv-w1a1 --route s2d --batch 1024 --tag r4-final
# request-level serving latency under open-loop Poisson load:
# CNV (image input) + MLP packed-vs-unpacked transport A/B
run python tools/serving_bench.py --net cnv-w1a1 --tag r4-final
run python tools/serving_bench.py --net sfc-w1a1 --route xla \
    --max-batch 8192 --req-batch 512 --max-wait-ms 5 --loads 0.6 \
    --tag r4-final-packed
run python tools/serving_bench.py --net sfc-w1a1 --route xla \
    --max-batch 8192 --req-batch 512 --max-wait-ms 5 --loads 0.6 \
    --no-packed --tag r4-final-unpacked
# the device-argmax classify path (the production serving op) at the
# floor-amortizing MLP batches
run python tools/tpu_perf_suite.py --nets sfc-w1a1,lfc-w1a1 \
    --batches 262144,131072 --classify --verify --tag r4-final-classify
# batch-1 latency rows, repeated windows (median-of-windows evidence)
for i in 1 2 3; do
    run python tools/tpu_perf_suite.py --batches 1 --quick --tag "r4-batch1-w$i"
done
T=3600
if [ "$Q" = "quick" ]; then
    run python tools/tpu_perf_suite.py --quick --verify --tag r4-final
else
    run python tools/tpu_perf_suite.py --verify --tag r4-final
fi
T=1800
run python bench.py
