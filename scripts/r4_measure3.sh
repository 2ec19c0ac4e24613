#!/bin/bash
# Round-4 measurement queue, part 3: the perf/memory levers that need the
# chip after part 2's training runs (VERDICT r3 items 4b and 8).
# Stages are individually fault-isolated (|| true): a single OOM point must
# not kill the sweep behind it.
set -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p results logs

stamp() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

stamp "probe"
timeout 300 python -c "
import jax, jax.numpy as jnp
print('probe:', jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128))))" || exit 1

stamp "[1/4] remat+donate runtime headroom (w128 b16,b32 — memory analysis says 9.09/13.89 GiB)"
timeout 1800 python scripts/profile_sfno.py --widths 128 --batches 16,32 \
  --remat >> results/remat_headroom_r4.jsonl 2> logs/remat_donate_w128.err || true
timeout 900 python scripts/profile_sfno.py --widths 128 --batches 16 \
  >> results/remat_headroom_r4.jsonl 2>> logs/remat_donate_w128.err || true

stamp "[2/4] opt-layout sweep fp32 (check vs base numerics on Mosaic)"
timeout 2400 python scripts/opt_layout_r4.py \
  --variants base,merge2,merge2d,packed,fused_adam --n-calls 20 --check \
  >> results/opt_layout_r4.jsonl 2> logs/opt_layout_fp32.err || true

stamp "[3/4] opt-layout sweep bf16 activations"
timeout 2400 python scripts/opt_layout_r4.py \
  --variants base,merge2,merge2d,packed,fused_adam --n-calls 20 \
  --compute-dtype bfloat16 \
  >> results/opt_layout_r4.jsonl 2> logs/opt_layout_bf16.err || true

stamp "[4/4] opt-layout b32 operating point (fp32 + bf16, best-known variants filled in later)"
timeout 1800 python scripts/opt_layout_r4.py \
  --variants base,merge2,fused_adam --batch 32 --n-calls 10 \
  >> results/opt_layout_r4.jsonl 2> logs/opt_layout_b32.err || true
timeout 1800 python scripts/opt_layout_r4.py \
  --variants base,merge2,fused_adam --batch 32 --n-calls 10 \
  --compute-dtype bfloat16 \
  >> results/opt_layout_r4.jsonl 2>> logs/opt_layout_b32.err || true

echo "R4 MEASUREMENT QUEUE PART 3 DONE"
