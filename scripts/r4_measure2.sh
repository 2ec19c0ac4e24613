#!/bin/bash
# Round-4 measurement queue, part 2: the stages that failed in part 1
# (scripts/r4_measure.sh) because the defaulted fused impl crashed the
# fnodata generation (IMEXStepper incompatibility — fixed in generate.py,
# regression-tested in tests/test_data_train.py). pipefail so a failing
# python is no longer masked by the `| tail` (the part-1 bug that let
# stages 4-6 run against a missing dataset).
set -eo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p results logs

stamp() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
save_train_log() { cp "$(ls -t tpu_cfd/train/logs/*_train.log | head -1)" "logs/$1"; }

stamp "probe"
timeout 300 python -c "
import jax, jax.numpy as jnp
print('probe:', jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128))))"

stamp "[1/4] fnodata dataset 256->64 N1280 extra (galerkin fallback, b64)"
timeout 7200 python -m tpu_cfd.data.generate fno --grid-size 256 \
  --subsample 4 --num-samples 1280 --batch-size 64 --extra-vars \
  --num-steps 100 2>&1 | tail -5

stamp "[2/4] train fnodata fp32 HOST loop 10ep"
timeout 3600 python -m tpu_cfd.train.train --example fno --train-only \
  --epochs 10 --batch-size 4 --num-samples 1152 --num-val-samples 128 \
  --host-data 2>&1 | tail -3
save_train_log train_fno_host_r4.log

stamp "[3/4] train fnodata bf16 activations scan-epoch 10ep"
timeout 3600 python -m tpu_cfd.train.train --example fno --train-only \
  --epochs 10 --batch-size 4 --num-samples 1152 --num-val-samples 128 \
  --compute-dtype bfloat16 2>&1 | tail -3
save_train_log train_fno_bf16act_r4.log
cp -r tpu_cfd/train/models/sfno_fno_64x64_m32_w10 /tmp/ckpt_fno_bf16 || true

stamp "[4/5] train fnodata fp32 scan-epoch (default) 10ep"
timeout 3600 python -m tpu_cfd.train.train --example fno --train-only \
  --epochs 10 --batch-size 4 --num-samples 1152 --num-val-samples 128 \
  2>&1 | tail -3
save_train_log train_fno_scan_r4.log

stamp "[5/5] train McWilliams2d 15ep (scan-epoch default; part-1 stage 7 retry)"
# part-1 stage 7 hung 50 min in remote_compile then broke the tunnel pipe:
# the device-resident dataset was a closed-over jit CONSTANT (2 GiB
# serialized into the program). pipeline.py now threads data as an argument.
timeout 3600 python -m tpu_cfd.train.train --example McWilliams2d \
  --train-only --epochs 15 --batch-size 4 --num-samples 1152 \
  --num-val-samples 128 2>&1 | tail -3
save_train_log train_mc_r4.log

echo "R4 MEASUREMENT QUEUE PART 2 DONE"
