#!/bin/sh
# Round-2 contract trainings: waits for the fno data-gen to finish, then
# trains the two reference recipes sequentially on the TPU.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
while [ ! -f data/fnodata_extra_64x64_N1280_v1e-3_T50_steps100.npz ]; do sleep 15; done
sleep 5

for i in 1 2 3; do
  python -m tpu_cfd.train.train --example fno --epochs 10 \
    --num-samples 1152 --num-val-samples 128 --batch-size 4 \
    --width 20 --modes 12 --modes-t 5 --beta=1e-2 \
    --time-steps 10 --out-time-steps 40 --lr 1e-2 --train-only \
    >> logs/train_fno_r2.log 2>&1 && break
  echo "=== fno train attempt $i failed; retry in 60s ===" >> logs/train_fno_r2.log
  sleep 60
done
echo "=== fno training done ===" >> logs/train_fno_r2.log

for i in 1 2 3; do
  python -m tpu_cfd.train.train --example McWilliams2d --epochs 15 \
    --num-samples 1024 --num-val-samples 64 --batch-size 4 \
    --width 10 --modes 32 --modes-t 5 --beta=-1e-2 \
    --time-steps 10 --out-time-steps 10 --lr 1e-2 --train-only \
    >> logs/train_mc_r2.log 2>&1 && break
  echo "=== mc train attempt $i failed; retry in 60s ===" >> logs/train_mc_r2.log
  sleep 60
done
echo "=== mcwilliams training done ===" >> logs/train_mc_r2.log
