#!/bin/bash
# Round-5 end-of-round evidence run. Run when the device tunnel is
# healthy:   bash tools/r5_evidence.sh [quick]
# Appends to perf_results/*.jsonl. Each step is individually timeouted so
# a wedged compile service skips forward instead of eating the round.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
Q=${1:-}

run() {
    echo "=== $* ===" >&2
    timeout "$T" "$@" 2>&1 | grep -v WARNING
    echo "--- rc=${PIPESTATUS[0]} ---" >&2
}

T=1800
# upload-wall decomposition (fresh-window check of the r5 capacity model)
run python tools/upload_probe.py --quick --tag r5-evidence-upload
# latency tier: granular buckets + adaptive dispatch (the r5 serving story)
run python tools/serving_bench.py --max-batch 2048 --max-wait-ms 10 \
    --req-batch 64 --duration 15 --loads 0.1,0.3,0.9 \
    --buckets 1,16,64,256,1024,2048 --tag r5-evidence-latency
# MLP classify-path window (headline hygiene: one more window for the
# multi-window median; aggregate afterwards)
run python tools/tpu_perf_suite.py --classify --verify \
    --nets sfc-w1a1,lfc-w1a1 --routes xla --batches 65536,262144 \
    --tag r5-mlp-w3
run python tools/mlp_median.py --tag-prefix r5-mlp-w --min-windows 3 \
    --out-tag r5-mlp-median
# batch-1 latency rows, repeated windows (median-of-windows evidence)
for i in 1 2 3; do
    run python tools/tpu_perf_suite.py --batches 1 --quick --tag "r5-batch1-w$i"
done
T=3600
if [ "$Q" = "quick" ]; then
    run python tools/tpu_perf_suite.py --quick --verify --tag r5-final
else
    run python tools/tpu_perf_suite.py --verify --tag r5-final
fi
T=1800
# the two environment-blocked gates stay zero-work (VERDICT next #8):
# fresh calibrated drill (near-boundary margins) + 2-process jax.distributed
run python -m pytest tests/test_multihost.py -x -q
run python bench.py
