#!/bin/bash
# Round-4 measurement queue, part 4: regenerate the evidence whose round-2/3
# logs died with earlier containers (VERDICT r3 item 7 — every RESULTS.md
# citation must resolve at HEAD).
set -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p results logs

stamp() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
save_train_log() { cp "$(ls -t tpu_cfd/train/logs/*_train.log | head -1)" "logs/$1"; }

stamp "probe"
timeout 300 python -c "
import jax, jax.numpy as jnp
print('probe:', jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128))))" || exit 1

stamp "[1/2] train fnodata REFERENCE recipe (w20 m12 t10->40 beta .02) 10ep"
# reference fno/README.md:60 — the m12/w20 recipe the fine-tune notebooks
# load; also regenerates the 1e-2-contract val number on the right config
timeout 3600 python -m tpu_cfd.train.train --example fno --train-only \
  --epochs 10 --batch-size 4 --num-samples 1152 --num-val-samples 128 \
  --width 20 --modes 12 --modes-t 5 --time-steps 10 --out-time-steps 40 \
  --beta 0.02 2>&1 | tail -3 || true
save_train_log train_fno_ref_r4.log || true

stamp "[2/2] FNO3d baseline training example (contract row evidence)"
timeout 3600 python examples/ex2_fno3d_train.py > logs/fno3d_train_r4.log 2>&1 || true
tail -3 logs/fno3d_train_r4.log

echo "R4 MEASUREMENT QUEUE PART 4 DONE"
