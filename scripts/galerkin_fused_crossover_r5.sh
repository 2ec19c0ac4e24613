#!/bin/bash
# Round-5 (VERDICT r4 next-step 4, second half): the galerkin-block FUSED
# Pallas layout (spectral_step.fused_rollout_galerkin) was built and
# parity-tested but never measured on the chip. It is the designated
# large-n candidate: ~55% fewer transform FLOPs than the aligned layout
# once MXU tile padding stops hiding the smaller block (R≈2n/3, m≈n/3
# pads to 0.5625 of the aligned tile area at 1024², vs identical tile
# area at 256²), and a (R, m) state that shrinks every VMEM item the
# aligned kernel is capacity-bound on. Measures it against the standing
# champions at 256² (aligned_fused at b>=32, XLA galerkin at b8), 512²
# (XLA galerkin) and 1024² (XLA galerkin; aligned_fused cannot compile).
# Fault-tolerant: failing points are recorded and the sweep continues.
cd "$(dirname "$0")/.."
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
out=results/galerkin_fused_crossover_r5.jsonl
mkdir -p results
: > "$out"

run_point() {
  local n=$1 batches=$2 impl=$3 bc=$4
  echo "=== n=$n impl=$impl block_cols=$bc b=$batches ===" | tee -a "$out.log"
  if ! timeout 1800 python scripts/profile_solver.py --scaling \
      --impl "$impl" --precision high --n "$n" --batches "$batches" \
      --block-cols "$bc" 2>>"$out.log" | tee -a "$out"; then
    echo "{\"impl\": \"$impl\", \"n\": $n, \"batches\": \"$batches\", \"block_cols\": \"$bc\", \"error\": \"failed or timed out\"}" >> "$out"
  fi
}

# 256²: does the galerkin block dethrone either champion despite tile padding?
run_point 256 8,128 dft_galerkin_fused none
# 512²: resident galerkin-block state is 4.5x smaller than aligned resident
run_point 512 8,64 dft_galerkin_fused none
run_point 512 8,64 dft_galerkin_fused 256
# 1024²: the first fused kernel with a chance to compile here
run_point 1024 8 dft_galerkin_fused 256
run_point 1024 8 dft_galerkin_fused none
run_point 1024 8 dft_galerkin_fused 128

echo "galerkin-fused crossover done -> $out"
cat "$out"
