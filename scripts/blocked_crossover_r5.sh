#!/bin/bash
# Round-5 (VERDICT r4 next-step 4): extend the fused Pallas stepper past its
# single 256² design point. The blocked layout (spectral_step.py
# explicit_blocked) tiles the last-axis DFT / advection / forward-DFT fusion
# over physical-column blocks so the (n, n) physical fields never
# materialize in VMEM — targeting 512² b>=32 (resident ties dft_galerkin
# there) and 1024² (resident cannot compile: 191.8 MiB > VMEM). Measures
# blocked vs resident vs dft_galerkin at 512² (b8, b64) and 1024² (b8),
# plus block-width sensitivity. Fault-tolerant: failing points are recorded
# and the sweep continues.
cd "$(dirname "$0")/.."
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
out=results/blocked_crossover_r5.jsonl
mkdir -p results
: > "$out"

run_point() {
  local n=$1 batches=$2 impl=$3 bc=$4
  echo "=== n=$n impl=$impl block_cols=$bc b=$batches ===" | tee -a "$out.log"
  if ! timeout 1500 python scripts/profile_solver.py --scaling \
      --impl "$impl" --precision high --n "$n" --batches "$batches" \
      --block-cols "$bc" 2>>"$out.log" | tee -a "$out"; then
    echo "{\"impl\": \"$impl\", \"n\": $n, \"batches\": \"$batches\", \"block_cols\": \"$bc\", \"error\": \"failed or timed out\"}" >> "$out"
  fi
}

# 512²: resident compiles (round-4 scoped-VMEM raise) but ties galerkin —
# does removing the physical fields from VMEM un-tie it?
run_point 512 8,64 dft_galerkin auto
run_point 512 8,64 dft_aligned_fused none
run_point 512 8,64 dft_aligned_fused 256
run_point 512 8,64 dft_aligned_fused 128

# 1024²: resident cannot compile; blocked is the first fused kernel here
run_point 1024 8 dft_galerkin auto
run_point 1024 8 dft_aligned_fused 256
run_point 1024 8 dft_aligned_fused 128

echo "blocked crossover done -> $out"
cat "$out"
