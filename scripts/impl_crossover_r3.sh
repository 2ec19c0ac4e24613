#!/bin/bash
# Grid-size crossover sweep: dense-DFT MXU stepping vs XLA FFT, per
# resolution. The dense-DFT transform is O(n^3) vs the FFT's O(n^2 log n),
# so the MXU win measured at 256^2 (RESULTS.md round 3) must invert at some
# n — this measures where, to justify per-resolution impl defaults.
# Each point is a bounded scaling fit (per-call overhead vs per-step device
# time, scripts/profile_solver.py --scaling); stages stay small so the
# fragile device tunnel is never saturated (CLAUDE.md).
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
out=/tmp/r3_crossover.jsonl
: > "$out"
for n in 128 256 512 1024; do
  b=8
  for impl in fft dft_aligned dft_galerkin; do
    echo "=== n=$n impl=$impl b=$b ==="
    timeout 900 python scripts/profile_solver.py --scaling --impl "$impl" \
      --precision high --n "$n" --batches "$b" | tee -a "$out"
  done
done
echo "crossover sweep done -> $out"
