#!/bin/bash
# Round-4 grid-size crossover sweep (VERDICT r3 item 2): fft vs dft_aligned
# vs dft_galerkin vs the fused Pallas stepper at 128/256/512/1024, at b8 and
# the data-gen batch b128 (b8 only at >=512 to bound HBM and tunnel load).
# The dense-DFT transform is O(n^3) vs the FFT's O(n^2 log n), so the MXU
# win measured at 256^2 must invert at some n — this measures where, to
# justify per-resolution impl defaults. Fault-tolerant: a failing point
# (OOM/VMEM/timeout) is recorded and the sweep continues.
cd "$(dirname "$0")/.."
set -o pipefail  # a failing profile run must not be masked by tee
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
out=results/crossover_r4.jsonl
mkdir -p results
: > "$out"
for n in 128 256 512 1024; do
  if [ "$n" -ge 512 ]; then batches=8; else batches=8,128; fi
  for impl in fft dft_aligned dft_galerkin dft_aligned_fused; do
    echo "=== n=$n impl=$impl b=$batches ===" | tee -a "$out.log"
    if ! timeout 1200 python scripts/profile_solver.py --scaling \
        --impl "$impl" --precision high --n "$n" --batches "$batches" \
        2>>"$out.log" | tee -a "$out"; then
      echo "{\"impl\": \"$impl\", \"n\": $n, \"batches\": \"$batches\", \"error\": \"failed or timed out\"}" >> "$out"
    fi
  done
done
echo "crossover sweep done -> $out"
