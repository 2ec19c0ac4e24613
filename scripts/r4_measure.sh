#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 items 3, 4, 5 + evidence regen).
# Sequential, individually timeout-bounded stages; stops at the first TPU
# failure rather than hammering a wedged tunnel (CLAUDE.md). Run AFTER the
# crossover sweep (scripts/impl_crossover_r4.sh) finishes.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p results logs

stamp() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
save_train_log() { cp "$(ls -t tpu_cfd/train/logs/*_train.log | head -1)" "logs/$1"; }

stamp "probe"
timeout 300 python -c "
import jax, jax.numpy as jnp
print('probe:', jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128))))"

stamp "[1/8] physics ladder (fused rows on real TPU)"
timeout 2400 python scripts/validate_dft_precision.py | tee results/physics_ladder_r4.jsonl

stamp "[2/8] McWilliams2d dataset 256->64 N1152 (fused, b64)"
timeout 3600 python -m tpu_cfd.data.generate mcwilliams --grid-size 256 \
  --subsample 4 --num-samples 1152 --batch-size 64 --num-steps 100 \
  2>&1 | tail -5

stamp "[3/8] fnodata dataset 256->64 N1280 extra (fused, b64)"
timeout 7200 python -m tpu_cfd.data.generate fno --grid-size 256 \
  --subsample 4 --num-samples 1280 --batch-size 64 --extra-vars \
  --num-steps 100 2>&1 | tail -5

# reference fnodata recipe: 10 epochs, batch 4, 1152 train / 128 val samples,
# modes 32/5 width 10 (RESULTS.md training contracts). Three runs measure
# (a) the host-loop baseline, (b) bf16 activations, (c) the scan-epoch
# default — fp32 scan runs LAST so its checkpoint is the canonical model.
stamp "[4/8] train fnodata fp32 HOST loop 10ep"
timeout 3600 python -m tpu_cfd.train.train --example fno --train-only \
  --epochs 10 --batch-size 4 --num-samples 1152 --num-val-samples 128 \
  --host-data 2>&1 | tail -3
save_train_log train_fno_host_r4.log

stamp "[5/8] train fnodata bf16 activations scan-epoch 10ep"
timeout 3600 python -m tpu_cfd.train.train --example fno --train-only \
  --epochs 10 --batch-size 4 --num-samples 1152 --num-val-samples 128 \
  --compute-dtype bfloat16 2>&1 | tail -3
save_train_log train_fno_bf16act_r4.log
cp -r tpu_cfd/train/models/sfno_fno_64x64_m32_w10 /tmp/ckpt_fno_bf16 || true

stamp "[6/8] train fnodata fp32 scan-epoch (default) 10ep"
timeout 3600 python -m tpu_cfd.train.train --example fno --train-only \
  --epochs 10 --batch-size 4 --num-samples 1152 --num-val-samples 128 \
  2>&1 | tail -3
save_train_log train_fno_scan_r4.log

stamp "[7/8] train McWilliams2d 15ep (scan-epoch default)"
timeout 3600 python -m tpu_cfd.train.train --example McWilliams2d \
  --train-only --epochs 15 --batch-size 4 --num-samples 1152 \
  --num-val-samples 128 2>&1 | tail -3
save_train_log train_mc_r4.log

stamp "[8/9] 5-epoch enstrophy-spectra figure"
timeout 2400 python examples/ex2_sfno_5ep_spectra.py 2>&1 | tail -5

stamp "[9/9] remat headroom ladder (w128: OOM point with remat off vs on)"
# run LAST: the no-remat points are expected to OOM device HBM; a clean
# OOM error is fine but comes after everything else so a wedged backend
# cannot take the queue down. Failures are recorded, not fatal.
: > results/remat_headroom_r4.jsonl
for cfg in "off 16" "off 32" "on 16" "on 32" "on 64"; do
  set -- $cfg
  flag=""; [ "$1" = on ] && flag="--remat"
  echo "--- remat=$1 batch=$2 ---"
  if ! timeout 900 python scripts/profile_sfno.py --widths 128 \
      --batches "$2" $flag 2>logs/remat_w128_b$2_$1.err \
      | tee -a results/remat_headroom_r4.jsonl; then
    echo "{\"width\": 128, \"batch\": $2, \"remat\": \"$1\", \"error\": \"OOM or failure (logs/remat_w128_b$2_$1.err)\"}" \
      >> results/remat_headroom_r4.jsonl
  fi
done

echo "R4 MEASUREMENT QUEUE DONE"
