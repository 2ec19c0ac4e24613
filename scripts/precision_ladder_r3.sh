#!/bin/bash
# mxu_precision accuracy/throughput ladder on the fnodata training recipe
# (VERDICT r2 item 3). Trains the exact reference recipe (10 epochs, batch 4,
# 256to64 data) at each precision; logs land in logs/train_fno_prec_*.log.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
for prec in highest high default; do
  echo "=== mxu_precision=$prec ==="
  timeout 3000 python -m tpu_cfd.train.train --example fno --train-only \
    --epochs 10 --batch-size 4 --num-samples 1152 --num-val-samples 128 \
    --mxu-precision "$prec" 2>&1 | tail -4 | tee /tmp/prec_${prec}.tail
  latest=$(ls -t tpu_cfd/train/logs/*_train.log | head -1)
  cp "$latest" "logs/train_fno_prec_${prec}.log"
done
