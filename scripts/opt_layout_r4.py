"""Optimizer/layout lever sweep for the SFNO train step (VERDICT r3 item 8).

The round-3 trace named two wastes in the bench-config train step
(modes 12/12/5, width 20, 64^2, t 10->40, batch 4, Adam + Sobolev):
~0.8 ms/step re-tiling every weight leaf at the jit boundary, and Adam
fusions running at 0.14 TB/s because complex weights are stored as real
``(..., m, 2)`` pairs whose 2-lane minor axis tiles to 2/128 lanes.

This script measures the candidate fixes WITHOUT changing the model's
parameter pytree (checkpoints stay compatible):

- ``base``      plain jitted step (the bench headline path)
- ``merge2``    Adam state + update math on views with the trailing
                ``(m, 2)`` axes merged to ``(2m,)`` — grads are packed and
                updates unpacked once per step (2 small relayouts) while the
                4-array m/v/g/u elementwise traffic runs on lane-friendly
                tiles
- ``merge2d``   same, but trailing axes merged until the minor dim >= 256
- ``packed``    params themselves carried in merged form; the step unpacks
                before ``model.apply`` (autodiff repacks grads), Adam runs
                fully packed.  Packed shapes are plain row-major reshapes, so
                unlike the reverted AUTO-layout experiment they are safe to
                feed to other programs after a final unpack.
- ``fused_adam`` single-pass Pallas elementwise Adam on merge2d views: one
                kernel reads (p, g, m, v) and writes (p, m, v), replacing
                optax's multi-fusion update

Flags compose: ``--compute-dtype bfloat16`` applies the round-3 activation
lever to any variant; ``--scan N`` times N steps inside ONE jitted
``lax.scan`` (steady-state carry layouts — what the scan-epoch trainer
sees, and the honest-timing mode per CLAUDE.md).

Usage: python scripts/opt_layout_r4.py [--variants base,merge2,...]
       [--compute-dtype bfloat16] [--scan 8] [--batch 4] [--n-calls 20]
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


def merged_shape(shape, kind):
    """Row-major-contiguous merge of trailing axes (a pure reshape/view)."""
    if kind == "merge2":
        if len(shape) >= 2 and shape[-1] == 2:
            return shape[:-2] + (shape[-2] * 2,)
        return shape
    if kind == "merge2d":
        if len(shape) < 2:
            return shape
        trail, i = 1, len(shape)
        while i > 1 and trail < 256:
            i -= 1
            trail *= shape[i]
        return shape[:i] + (trail,)
    raise ValueError(kind)


def make_packers(params, kind):
    shapes = jax.tree.map(lambda x: x.shape, params)

    def pack(t):
        return jax.tree.map(
            lambda x: x.reshape(merged_shape(x.shape, kind)), t)

    def unpack(t):
        return jax.tree.map(lambda a, s: a.reshape(s), t, shapes)

    return pack, unpack


def merged_adam(lr, kind):
    """optax.adam whose state AND elementwise math live on merged views.

    Grads are packed / updates unpacked once per step; adam does not read
    params so they are never repacked.
    """
    import optax

    tx = optax.adam(lr)

    def init(params):
        return tx.init(jax.tree.map(
            lambda x: x.reshape(merged_shape(x.shape, kind)), params))

    def update(grads, state, params=None):
        del params
        pg = jax.tree.map(
            lambda x: x.reshape(merged_shape(x.shape, kind)), grads)
        u, state = tx.update(pg, state, None)
        u = jax.tree.map(lambda a, g: a.reshape(g.shape), u, grads)
        return u, state

    return optax.GradientTransformation(init, update)


def fused_adam_pallas(lr, kind, b1=0.9, b2=0.999, eps=1e-8):
    """Single-pass Pallas Adam on merge-view leaves.

    One kernel instance per leaf: reads (p, g, m, v) + scalar step count,
    writes (p, m, v) — 7 HBM streams in one pass instead of optax's chain of
    fusions. Leaves are flattened to (rows, 128·k) blocks host-side via the
    same contiguous merge as ``merged_adam`` so every stream is lane-aligned.
    """
    from jax.experimental import pallas as pl

    def kernel(corr_ref, p_ref, g_ref, m_ref, v_ref,
               po_ref, mo_ref, vo_ref):
        # corr = (1/(1-b1^t), 1/(1-b2^t)) precomputed outside: Mosaic has no
        # lowering for math.powf on scalars inside the kernel
        c1, c2 = corr_ref[0], corr_ref[1]
        g = g_ref[...]
        m = b1 * m_ref[...] + (1.0 - b1) * g
        v = b2 * v_ref[...] + (1.0 - b2) * g * g
        po_ref[...] = p_ref[...] - lr * (m * c1) / (jnp.sqrt(v * c2) + eps)
        mo_ref[...] = m
        vo_ref[...] = v

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def apply_leaf(corr, p, m, v, g):
        sh = merged_shape(p.shape, kind)
        pm, mm, vm, gm = (a.reshape(sh) for a in (p, m, v, g))
        out = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(sh, p.dtype)] * 3,
            interpret=jax.default_backend() == "cpu",
        )(corr, pm, gm, mm, vm)
        return tuple(a.reshape(p.shape) for a in out)

    return kernel, apply_leaf


def build_step(variant, model, loss_fn, params, t_out, lr=1e-3):
    import optax

    if variant == "base":
        tx = optax.adam(lr)
    elif variant in ("merge2", "merge2d"):
        tx = merged_adam(lr, variant)
    elif variant == "packed":
        tx = optax.adam(lr)
    elif variant == "fused_adam":
        tx = None
    else:
        raise ValueError(variant)

    if variant == "packed":
        pack, unpack = make_packers(params, "merge2d")
        params0 = pack(params)
        opt_state = tx.init(params0)

        def step(carry, x, y):
            pp, opt_state = carry

            def loss(q):
                return loss_fn(model.apply(unpack(q), x, out_steps=t_out), y)

            l, grads = jax.value_and_grad(loss)(pp)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(pp, updates), opt_state), l

        return step, (params0, opt_state)

    if variant == "fused_adam":
        b1, b2 = 0.9, 0.999
        _, apply_leaf = fused_adam_pallas(lr, "merge2d", b1=b1, b2=b2)
        m0 = jax.tree.map(jnp.zeros_like, params)
        v0 = jax.tree.map(jnp.zeros_like, params)

        def step(carry, x, y):
            params, (m, v, count) = carry

            def loss(p):
                return loss_fn(model.apply(p, x, out_steps=t_out), y)

            l, grads = jax.value_and_grad(loss)(params)
            count = count + 1
            t = count.astype(jnp.float32)
            corr = jnp.stack([1.0 / (1.0 - b1 ** t), 1.0 / (1.0 - b2 ** t)])
            flat_p, tdef = jax.tree.flatten(params)
            flat_m = tdef.flatten_up_to(m)
            flat_v = tdef.flatten_up_to(v)
            flat_g = tdef.flatten_up_to(grads)
            out = [apply_leaf(corr, p_, m_, v_, g_)
                   for p_, m_, v_, g_ in zip(flat_p, flat_m, flat_v, flat_g)]
            params = tdef.unflatten([o[0] for o in out])
            m = tdef.unflatten([o[1] for o in out])
            v = tdef.unflatten([o[2] for o in out])
            return (params, (m, v, count)), l

        return step, (params, (m0, v0, jnp.zeros((), jnp.int32)))

    opt_state = tx.init(params)

    def step(carry, x, y):
        params, opt_state = carry

        def loss(p):
            return loss_fn(model.apply(p, x, out_steps=t_out), y)

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), l

    return step, (params, opt_state)


def bench_variant(variant, batch=4, n=64, t_in=10, t_out=40, n_calls=20,
                  compute_dtype=None, scan=0, check=False):
    import optax  # noqa: F401  (backend touch before model import)

    from tpu_cfd.models import SFNO
    from tpu_cfd.train import losses

    model = SFNO(modes_x=12, modes_y=12, modes_t=5, width=20, beta=1e-2,
                 output_steps=t_out, compute_dtype=compute_dtype)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, n, n, t_in), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (batch, n, n, t_out),
                          jnp.float32)
    params = jax.jit(
        lambda k, v: model.init(k, v, out_steps=t_out))(key, x)
    loss_fn = losses.SobolevLoss(n_grid=n, norm_order=0, relative=True)

    step, carry = build_step(variant, model, loss_fn, params, t_out)

    if check:
        base_step, base_carry = build_step(
            "base", model, loss_fn, params, t_out)
        c1, l1 = jax.jit(base_step)(base_carry, x, y)
        c2, l2 = jax.jit(step)(carry, x, y)
        for _ in range(2):
            c1, l1 = jax.jit(base_step)(c1, x, y)
            c2, l2 = jax.jit(step)(c2, x, y)
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
        print(f"check ok: {variant} loss {float(l2):.6f} == base "
              f"{float(l1):.6f}", file=sys.stderr)

    if scan:
        @jax.jit
        def run(carry, x, y):
            def body(c, _):
                return step(c, x, y)
            carry, ls = jax.lax.scan(body, carry, None, length=scan)
            return carry, ls[-1]
        per_call = scan
    else:
        run = jax.jit(step)
        per_call = 1

    carry, l = run(carry, x, y)
    _ = float(l)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        carry, l = run(carry, x, y)
    _ = float(l)
    dt = (time.perf_counter() - t0) / (n_calls * per_call)
    return {"variant": variant, "compute_dtype": compute_dtype or "float32",
            "scan": scan, "batch": batch, "ms_step": round(dt * 1e3, 2),
            "samples_per_s": round(batch / dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,merge2,merge2d,packed")
    ap.add_argument("--compute-dtype", default=None,
                    choices=["float32", "bfloat16"])
    ap.add_argument("--scan", type=int, default=0)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n-calls", type=int, default=20)
    ap.add_argument("--check", action="store_true",
                    help="assert a few steps match the base variant's loss")
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"],
                    help="force a jax platform (the axon sitecustomize "
                    "presets TPU; env vars alone are too late — CLAUDE.md)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    for v in args.variants.split(","):
        r = bench_variant(v, batch=args.batch, n_calls=args.n_calls,
                          compute_dtype=args.compute_dtype, scan=args.scan,
                          check=args.check)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
