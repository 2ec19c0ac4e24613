"""SFNO train-step scaling probe: batch and width sweeps on the real TPU.

Diagnoses VERDICT r2 weak #3 (b4->b32 only 1.1x at 0.7% MFU). Theory under
test: channels-last activations with c=20 pad the TPU lane dimension to 128
(6.4x wasted vector throughput on every elementwise op), so step time is
layout-bound, not compute-bound — in which case width sweeps should show
sub-linear cost growth up to c~128 while batch sweeps grow linearly.

Usage: python scripts/profile_sfno.py [--widths 20,64,128] [--batches 4,32]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_one(width, batch, n=64, t_in=10, t_out=40, n_calls=8,
              compute_dtype=None, remat=False):
    import optax

    from tpu_cfd.models import SFNO
    from tpu_cfd.train import losses

    model = SFNO(modes_x=12, modes_y=12, modes_t=5, width=width, beta=1e-2,
                 output_steps=t_out, compute_dtype=compute_dtype, remat=remat)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, n, n, t_in), jnp.float32)
    y = jax.random.normal(key, (batch, n, n, t_out), jnp.float32)
    params = jax.jit(lambda k, v: model.init(k, v, out_steps=t_out))(key, x)
    loss_fn = losses.SobolevLoss(n_grid=n, norm_order=0, relative=True)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    # donate the carry: un-aliased params+opt held the in+out copies live
    # simultaneously (4.25 GiB of the w128/b16 12-GiB peak — see
    # scripts/remat_memory_r4.py), which is what actually OOM'd the round-4
    # remat ladder at every w128 point
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(carry, x, y):
        params, opt_state = carry

        def loss(p):
            return loss_fn(model.apply(p, x, out_steps=t_out), y)

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), l

    carry = (params, opt_state)
    carry, l = train_step(carry, x, y)
    _ = float(l)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        carry, l = train_step(carry, x, y)
    _ = float(l)
    dt = (time.perf_counter() - t0) / n_calls
    return {"width": width, "batch": batch, "ms_step": round(dt * 1e3, 2),
            "samples_per_s": round(batch / dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="20,64,128")
    ap.add_argument("--batches", default="4,32")
    ap.add_argument("--compute-dtype", default=None,
                    choices=["float32", "bfloat16"])
    ap.add_argument("--remat", default=False, action="store_true",
                    help="rematerialize lifting/backbone blocks in backward")
    args = ap.parse_args()
    out = []
    for w in [int(x) for x in args.widths.split(",")]:
        for b in [int(x) for x in args.batches.split(",")]:
            r = bench_one(w, b, compute_dtype=args.compute_dtype,
                          remat=args.remat)
            r["compute_dtype"] = args.compute_dtype or "float32"
            r["remat"] = args.remat
            print(json.dumps(r), flush=True)
            out.append(r)
    print(json.dumps({"sweep": out}))


if __name__ == "__main__":
    main()
