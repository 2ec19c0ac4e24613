#!/bin/sh
# Waits for the 256^2->64^2 fnodata regeneration, then reruns the fnodata
# contract chain: 10-epoch training, 256^2 eval phase, notebook fine-tune.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
F=data/fnodata_extra_256to64_N1280_v1e-3_T50_steps100.npz
while [ ! -f "$F" ]; do sleep 30; done
sleep 10

# keep the old (64^2-native-data) checkpoint for comparison
[ -d tpu_cfd/train/models/sfno_fno_64x64_m12_w20 ] && \
  cp -r tpu_cfd/train/models/sfno_fno_64x64_m12_w20 \
        tpu_cfd/train/models/sfno_fno_64x64_m12_w20_native64 2>/dev/null

python -m tpu_cfd.train.train --example fno --epochs 10 \
  --num-samples 1152 --num-val-samples 128 --batch-size 4 \
  --width 20 --modes 12 --modes-t 5 --beta=1e-2 \
  --time-steps 10 --out-time-steps 40 --lr 1e-2 --train-only \
  --train-file "$F" \
  > logs/train_fno_256to64_r2.log 2>&1
echo "=== train done rc=$? ===" >> logs/train_fno_256to64_r2.log

python -m tpu_cfd.train.train --example fno --eval-only \
  --width 20 --modes 12 --modes-t 5 --beta=1e-2 \
  --time-steps 10 --out-time-steps 40 --test-t-start 30 \
  --num-test-samples 16 --test-batch-size 1 \
  >> logs/train_fno_256to64_r2.log 2>&1
echo "=== eval done rc=$? ===" >> logs/train_fno_256to64_r2.log

python examples/ex2_sfno_finetune.py --example fno \
  > logs/finetune_fno_256to64_r2.log 2>&1
echo "=== finetune done rc=$? ===" >> logs/finetune_fno_256to64_r2.log
