#!/bin/bash
# TPU measurement campaign — run when the axon tunnel is up.
# Produces: bench JSON line (all metric halves + envelope), DG mode sweep,
# and leaves raw logs under /tmp/tpu_campaign/.
#
# Usage:  bash benchmarks/run_tpu_campaign.sh
# Check tunnel first:  timeout 120 python -c "import jax; print(jax.devices())"
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_campaign

echo "== 1. headline + assembled + DG halves + envelope (bench.py)"
timeout 5400 python bench.py 2>/tmp/tpu_campaign/bench.log \
    | tee /tmp/tpu_campaign/bench.json
tail -5 /tmp/tpu_campaign/bench.log

echo "== 2. DG mode sweep at 128^3 (vpu, mxu, mxu2)"
timeout 3600 python benchmarks/bench_dg_mm.py 128 \
    2>&1 | tee /tmp/tpu_campaign/dg_mm.log | tail -12

echo "== done. If mxu2 beats mxu: flip the default in"
echo "   solvers/linear.py (try_mm_block_stencil mode=...) and update"
echo "   PERFORMANCE.md round-3 section + ROUND3_NOTES item 1."

echo "== 3. end-to-end DG solve (Jacobi-CG path, 128^3)"
timeout 3600 python benchmarks/dg_solve_tpu.py 128 \
    2>&1 | tee /tmp/tpu_campaign/dg_solve.log | tail -6

echo "== 4. deep-convergence DG two-level (64^3)"
timeout 3600 python benchmarks/dg_mg_tpu.py 64 \
    2>&1 | tee /tmp/tpu_campaign/dg_mg.log | tail -5

echo "== 5. fp64 parity campaign (configs 2/3/5/12 + big)"
timeout 5400 python benchmarks/fp64_tpu.py \
    2>&1 | tee /tmp/tpu_campaign/fp64.log | tail -8
