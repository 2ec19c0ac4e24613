#!/bin/bash
# Round-5: recipe probes for the McWilliams 256² zero-shot contract row
# (VERDICT r4 next-step 1b: "beat it outright ... try longer training or
# modes_t/β tuning within the notebook's budget"). Each probe keeps the
# notebook recipe (1152 samples, batch 4, m32/w10, lr 1e-2 OneCycle, seed
# 1127825) and varies ONE lever; eval is the fixed protocol (fp64 256²,
# T_start=50, 16 samples). Results append to results/mc_probe_r5.jsonl.
#
# Two phases: `train` runs every probe's 15/30-epoch training on the TPU;
# `eval` runs the fp64 256² evals (CPU path) and writes the jsonl — split
# so the trainings can start before the fp64 test set finishes generating.
# Default = both, in order. Training is skipped when the probe's
# checkpoint already exists (resume after interruption).
#
# Provenance (round-5 finding): the reference's 1.17564e-1 artifact comes
# from examples/ex2_SFNO_finetune_McWilliams2d.ipynb cell 3 — a model built
# with beta=-1e-2 (the SFNO class default, sfno.py:468), NOT train.py's
# --beta default of 0.0 that the repo recipe mirrored. beta is the
# exponential decay scale of the time positional encoding ("should match
# the a priori energy estimate of the NSE" — sfno.py:529); for decaying
# McWilliams turbulence the negative value is the physical choice. Probe it
# first, alone and combined with the secondary levers.
cd "$(dirname "$0")/.."
set -o pipefail
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p logs results models
out=results/mc_probe_r5.jsonl
phase="${1:-all}"

PROBES=(betaneg betaneg_ep30 betaneg_relu h1loss betaneg_ep45 betaneg_ep90)
train_flags_betaneg=(--epochs 15 --beta -0.01)
eval_flags_betaneg=(--beta -0.01)
train_flags_betaneg_ep30=(--epochs 30 --beta -0.01)
eval_flags_betaneg_ep30=(--beta -0.01)
# ep30 was the only probe that moved the 256² metric (1.2092e-1 vs
# 1.2236e-1) — ep45 measures whether the training-budget lever saturates
train_flags_betaneg_ep45=(--epochs 45 --beta -0.01)
eval_flags_betaneg_ep45=(--beta -0.01)
# ep45 measured 1.2027e-1 (deltas: -1.2% then -0.5% — geometric); ep90
# measures the actual plateau instead of extrapolating it
train_flags_betaneg_ep90=(--epochs 90 --beta -0.01)
eval_flags_betaneg_ep90=(--beta -0.01)
train_flags_betaneg_relu=(--epochs 15 --beta -0.01 --activation ReLU)
eval_flags_betaneg_relu=(--beta -0.01 --activation ReLU)
train_flags_h1loss=(--epochs 15 --norm-order 1.0)
eval_flags_h1loss=()

train_probe() {
  local name=$1
  local -n tf="train_flags_${name}"
  local mp="models/probe_${name}"
  local log="logs/mc_probe_${name}_r5.log"
  if [ -d "$mp/sfno_McWilliams2d_64x64_m32_w10" ]; then
    echo "=== probe=$name checkpoint exists, skipping train ==="
    return 0
  fi
  echo "=== probe=$name train: ${tf[*]} ==="
  MODEL_PATH="$mp" timeout 4800 python -m tpu_cfd.train.train \
    --example McWilliams2d --num-samples 1152 --num-val-samples 128 \
    --train-only "${tf[@]}" 2>&1 | tee "$log"
}

eval_probe() {
  local name=$1
  local -n tf="train_flags_${name}"
  local -n ef="eval_flags_${name}"
  local mp="models/probe_${name}"
  local log="logs/mc_probe_${name}_r5.log"
  if grep -q "\"probe\": \"$name\"" "$out" 2>/dev/null; then
    echo "=== probe=$name already evaluated, skipping ==="
    return
  fi
  if [ ! -d "$mp/sfno_McWilliams2d_64x64_m32_w10" ]; then
    echo "{\"probe\": \"$name\", \"error\": \"no checkpoint (train failed)\"}" >> "$out"
    return
  fi
  echo "=== probe=$name eval 256^2 fp64 T_start=50 ==="
  if ! MODEL_PATH="$mp" timeout 2400 python -m tpu_cfd.train.train \
      --example McWilliams2d --eval-only --double --num-test-samples 16 \
      --test-t-start 50 "${ef[@]}" 2>&1 | tee -a "$log"; then
    echo "{\"probe\": \"$name\", \"error\": \"eval failed\"}" >> "$out"
    return
  fi
  val=$(grep -oP 'avg val rel: \K[0-9.e-]+' "$log" | tail -1)
  [ -z "$val" ] && val=null
  tst=$(grep -oP 'Test rel Sobolev metric at 256x256: \K[0-9.e-]+' "$log" | tail -1)
  [ -z "$tst" ] && tst=null
  echo "{\"probe\": \"$name\", \"train_flags\": \"${tf[*]}\", \"val_rel_l2\": $val, \"test_sobolev_256\": $tst, \"log\": \"$log\"}" >> "$out"
}

if [ "$phase" = "train" ] || [ "$phase" = "all" ]; then
  for p in "${PROBES[@]}"; do train_probe "$p"; done
fi
if [ "$phase" = "eval" ] || [ "$phase" = "all" ]; then
  for p in "${PROBES[@]}"; do eval_probe "$p"; done
  echo "probe ladder done -> $out"
  cat "$out"
fi
