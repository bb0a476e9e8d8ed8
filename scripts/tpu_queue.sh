#!/bin/bash
# On-chip measurement queue for when the accelerator tunnel returns.
# Runs each job sequentially (NEVER two JAX processes at once — CLAUDE.md)
# with a bound, logging to /tmp/tpuq_*.log. Run from the repo root:
#   bash scripts/tpu_queue.sh
set -u
cd "$(dirname "$0")/.."

run() {
    local name=$1; shift
    echo "=== $name: $* ==="
    timeout 1200 "$@" >"/tmp/tpuq_${name}.log" 2>&1
    local rc=$?
    tail -3 "/tmp/tpuq_${name}.log"
    echo "=== $name done (rc=$rc) ==="
}

# 1. the driver metric (also verifies the bench surface end-to-end)
run bench python bench.py

# 2. ensemble member-axis marginal cost (fills the BENCH_NOTES pending
#    measurement)
run ensbench python scripts/ensemble_bench.py

# 3. production-scale fused-kernel block sweep (refreshes the
#    BENCH_NOTES "production-scale block sweep" table on this toolchain)
run mxuprobe python scripts/mxu_probe.py

# 4. HTTP-stack serving throughput, batched vs unbatched (refreshes the
#    BENCH_NOTES "Serving micro-batching" numbers on-chip)
run servbench python scripts/serving_bench.py --clients 32 --seconds 5

echo "queue complete"
