#!/bin/bash
# Round-4 measurement queue, part 5 (CPU fp64): regenerate the fine-tune and
# high-res-eval evidence whose round-2/3 logs died with earlier containers.
# Recipes are the adopted ones from RESULTS.md (notebook lrs + exponential
# lr decay 0.05 stretched over ~1.6x the iteration budget, best iterate
# within the budget; --gt-floor records the discretization floor).
set -o pipefail
cd "$(dirname "$0")/.."
mkdir -p logs

stamp() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

stamp "[1/4] fnodata fine-tune 256^2 fp64 (adopted recipe, report iter<=50 best)"
timeout 10800 python examples/ex2_sfno_finetune.py --example fno \
  --iters 80 --lr-decay 0.05 --gt-floor \
  --test-file fnodata_extra_fp64_256x256_N4_v1e-3_T50_steps100.npz \
  > logs/finetune_fno_r4.log 2>&1 || true
tail -5 logs/finetune_fno_r4.log

stamp "[2/4] McWilliams fine-tune 256^2 fp64 (160-iter horizon, best<=100)"
timeout 10800 python examples/ex2_sfno_finetune.py --example McWilliams2d \
  --iters 160 --lr-decay 0.05 --gt-floor \
  > logs/finetune_mc_r4.log 2>&1 || true
tail -5 logs/finetune_mc_r4.log

stamp "[3/4] McWilliams high-res eval phase (256^2 fp64, 16 samples, T_start=50)"
timeout 7200 python -m tpu_cfd.train.train --example McWilliams2d \
  --eval-only --double --test-t-start 50 2>&1 | tail -6 || true
cp "$(ls -t tpu_cfd/train/logs/*_train.log | head -1)" logs/eval_mc_256_r4.log || true

stamp "[4/4] fnodata 256^2 zero-shot eval (4 fp64 samples available)"
timeout 7200 python -m tpu_cfd.train.train --example fno \
  --eval-only --double --num-test-samples 4 \
  --width 20 --modes 12 --modes-t 5 --out-time-steps 40 --beta 0.02 \
  --test-file fnodata_extra_fp64_256x256_N4_v1e-3_T50_steps100.npz \
  2>&1 | tail -6 || true
cp "$(ls -t tpu_cfd/train/logs/*_train.log | head -1)" logs/eval_fno_256_r4.log || true

echo "R4 MEASUREMENT QUEUE PART 5 DONE"
