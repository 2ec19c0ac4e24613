#!/bin/bash
# bfloat16 activation-storage accuracy/throughput run on the fnodata
# training recipe (round-3 perf frontier: the SFNO train step is
# activation-HBM-traffic-bound, so compute_dtype=bfloat16 is the
# bytes-level lever the mxu_precision ladder could not reach).
# Compare against logs/train_fno_prec_highest.log (fp32 activations,
# same recipe). Logs land in logs/train_fno_bf16act.log.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
echo "=== compute_dtype=bfloat16 ==="
timeout 3000 python -m tpu_cfd.train.train --example fno --train-only \
  --epochs 10 --batch-size 4 --num-samples 1152 --num-val-samples 128 \
  --compute-dtype bfloat16 2>&1 | tail -4 | tee /tmp/bf16act.tail
latest=$(ls -t tpu_cfd/train/logs/*_train.log | head -1)
cp "$latest" "logs/train_fno_bf16act.log"
