#!/bin/bash
# Round-3 galerkin + bf16-activation measurement sequence (real TPU).
# Spaced, bounded steps — the device tunnel wedges under sustained load
# (CLAUDE.md), so each stage is individually timeout-bounded and the
# script stops at the first failure rather than hammering the backend.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

echo "=== [1/4] probe ==="
timeout 300 python -c "
import jax, jax.numpy as jnp
print('probe:', jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128))))"

echo "=== [2/4] solver scaling: galerkin vs aligned vs fused (b8, b128) ==="
for impl in dft_aligned dft_galerkin dft_aligned_fused; do
  timeout 900 python scripts/profile_solver.py --scaling --impl "$impl" \
    --precision high --batches 8,128 | tee -a /tmp/r3_galerkin_scaling.jsonl
done

echo "=== [3/4] full bench (headline + bf16 train row) ==="
timeout 2400 python bench.py | tee /tmp/r3_bench.json

echo "=== [4/4] physics ladder incl. galerkin ==="
timeout 2400 python scripts/validate_dft_precision.py | tee /tmp/r3_physics.jsonl

echo "ALL MEASUREMENTS DONE"
