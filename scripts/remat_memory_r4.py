"""Compile-only HBM accounting for the SFNO train step: remat on/off.

The round-4 remat ladder OOM'd at w128/b16 with remat BOTH off and on —
so either the remat scope misses the dominant liveness, or w128's floor
(params+opt+backbone inputs) exceeds HBM regardless. This script AOT-
compiles the train step (no execution, safe to run alongside other TPU
work) and prints XLA's own memory analysis: argument/output/temp/peak
bytes per (width, batch, remat, compute_dtype) point. Evidence for
results/remat_headroom_r4.jsonl.

Usage: python scripts/remat_memory_r4.py [--widths 64,128] [--batches 8,16,32]
       [--remat off,on] [--compute-dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def analyze(width, batch, remat, n=64, t_in=10, t_out=40, compute_dtype=None,
            donate=False):
    import optax

    from tpu_cfd.models import SFNO
    from tpu_cfd.train import losses

    model = SFNO(modes_x=12, modes_y=12, modes_t=5, width=width, beta=1e-2,
                 output_steps=t_out, compute_dtype=compute_dtype, remat=remat)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, n, n, t_in), jnp.float32)
    y = jax.random.normal(key, (batch, n, n, t_out), jnp.float32)
    params = jax.eval_shape(lambda k, v: model.init(k, v, out_steps=t_out),
                            key, x)
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    loss_fn = losses.SobolevLoss(n_grid=n, norm_order=0, relative=True)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def train_step(params, opt_state, x, y):
        def loss(p):
            return loss_fn(model.apply(p, x, out_steps=t_out), y)

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, l

    donate_argnums = (0, 1) if donate else ()
    compiled = jax.jit(
        train_step, donate_argnums=donate_argnums
    ).lower(params, opt_state, x, y).compile()
    m = compiled.memory_analysis()
    gib = 2.0**30
    return {
        "width": width, "batch": batch, "remat": remat, "donate": donate,
        "compute_dtype": compute_dtype or "float32",
        "args_gib": round(m.argument_size_in_bytes / gib, 3),
        "out_gib": round(m.output_size_in_bytes / gib, 3),
        "temp_gib": round(m.temp_size_in_bytes / gib, 3),
        "peak_gib": round(
            (m.argument_size_in_bytes + m.output_size_in_bytes
             + m.temp_size_in_bytes - m.alias_size_in_bytes) / gib, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="64,128")
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--remat", default="off,on")
    ap.add_argument("--compute-dtype", default=None,
                    choices=["float32", "bfloat16"])
    ap.add_argument("--donate", default="off,on",
                    help="donate params/opt_state buffers (aliases the "
                    "4x-param-size in+out copies away)")
    args = ap.parse_args()
    for w in [int(v) for v in args.widths.split(",")]:
        for b in [int(v) for v in args.batches.split(",")]:
            for r in args.remat.split(","):
                for d in args.donate.split(","):
                    try:
                        row = analyze(w, b, r == "on", donate=d == "on",
                                      compute_dtype=args.compute_dtype)
                    except Exception as e:  # noqa: BLE001 — record, sweep on
                        row = {"width": w, "batch": b, "remat": r,
                               "donate": d,
                               "error": str(e).split("\n")[0][:200]}
                    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
