#!/bin/bash
# Round-5: McWilliams 256² zero-shot contract (the one acceptance row still
# behind the reference: 1.2236e-1 here vs the notebook artifact 1.17564e-1,
# RESULTS.md). The recipe is fixed by the reference notebook (15 epochs,
# batch 4, m32/w10, 1152 samples), so the honest remaining lever is
# initialization/realization noise: train the EXACT recipe at several seeds
# and report the spread + best. Each seed gets its own MODEL_PATH (under
# the gitignored repo-root models/, NEVER inside the package tree) so the
# best-val checkpoints never clobber each other. Training is skipped when
# the seed's checkpoint already exists (resume after interruption).
cd "$(dirname "$0")/.."
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p logs results models
out=results/mc_seed_sweep_r5.jsonl
: > "$out"
for seed in 1127825 42 20260819; do
  mp="models/seed${seed}"
  log="logs/mc_seed${seed}_r5.log"
  ckpt="$mp/sfno_McWilliams2d_64x64_m32_w10"
  if [ -d "$ckpt" ]; then
    echo "=== seed=$seed checkpoint exists, skipping train ==="
  else
    echo "=== seed=$seed train ==="
    if ! MODEL_PATH="$mp" timeout 2400 python -m tpu_cfd.train.train \
        --example McWilliams2d --num-samples 1152 --num-val-samples 128 \
        --epochs 15 --seed "$seed" --train-only 2>&1 | tee "$log"; then
      echo "{\"seed\": $seed, \"error\": \"train failed\"}" >> "$out"
      continue
    fi
  fi
  echo "=== seed=$seed eval 256^2 fp64 T_start=50 ==="
  if ! MODEL_PATH="$mp" timeout 1800 python -m tpu_cfd.train.train \
      --example McWilliams2d --eval-only --double --num-test-samples 16 \
      --test-t-start 50 --seed "$seed" 2>&1 | tee -a "$log"; then
    echo "{\"seed\": $seed, \"error\": \"eval failed\"}" >> "$out"
    continue
  fi
  val=$(grep -oP 'avg val rel: \K[0-9.e-]+' "$log" | tail -1)
  [ -z "$val" ] && val=null
  tst=$(grep -oP 'Test rel Sobolev metric at 256x256: \K[0-9.e-]+' "$log" | tail -1)
  echo "{\"seed\": $seed, \"val_rel_l2_15ep\": $val, \"test_sobolev_256\": $tst, \"log\": \"$log\"}" >> "$out"
done
echo "seed sweep done -> $out"
cat "$out"
