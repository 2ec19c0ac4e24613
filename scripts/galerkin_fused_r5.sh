#!/bin/bash
# Round-5: measure the Galerkin-block fused stepper (fused=True +
# fft_impl=dft_galerkin) across resolutions vs the current defaults.
# FLOP math: the block cuts ~55% of transform FLOPs vs the aligned fused
# layout, which is exactly offset by MXU tile padding at 256² (170x86 pads
# to the same tiles as 256x128) but not at 512²/1024², where the aligned
# kernel is FLOP-capped below the XLA galerkin path. Ceilings at 100% MXU
# (high = 3 bf16 passes): 512² ~6300 sample-steps/s (XLA galerkin measured
# 4537 b8 / 3121 b64), 1024² ~790 (XLA galerkin 583). Appends to
# results/galerkin_fused_r5.jsonl; failures recorded, sweep continues.
cd "$(dirname "$0")/.."
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
out=results/galerkin_fused_r5.jsonl
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

# 256²: the production data-gen point — does the block help or is the
# tile-padding offset exact?
run_point 256 8,128 dft_galerkin_fused none

# 512²: resident and column-blocked
run_point 512 8,64 dft_galerkin_fused none
run_point 512 8,64 dft_galerkin_fused 256

# 1024²: the resolution the aligned kernel cannot reach
run_point 1024 8 dft_galerkin_fused none
run_point 1024 8 dft_galerkin_fused 256
run_point 1024 8 dft_galerkin_fused 128

echo "galerkin fused sweep done -> $out"
cat "$out"
