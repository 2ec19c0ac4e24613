"""Multi-resolution SFNO inference shapes, latent taps, and eval timing.

Counterpart of the reference's ``examples/check_SFNO_shapes.py`` (shape
sweep, latent-hook inspection, 100-iteration eval timing :48-59). Latent
inspection uses flax's ``capture_intermediates`` instead of forward hooks.

Run: PYTHONPATH=. python examples/check_sfno_shapes.py
"""

import time

import jax
import jax.numpy as jnp

from tpu_cfd.models import SFNO


def main():
    model = SFNO(
        modes_x=16, modes_y=16, modes_t=5, width=20,
        latent_steps=10, num_spectral_layers=4,
    )
    key = jax.random.PRNGKey(0)
    v64 = jax.random.normal(key, (2, 64, 64, 10))
    params = jax.jit(model.init)(key, v64)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"SFNO parameters: {n_params / 1e6:.2f}M")

    # shape polymorphism: arbitrary space-time discretizations in and out
    # note: t_in must be >= latent_steps (reference sfno.py:254)
    for n, t_in, t_out in [(64, 10, 10), (64, 10, 40), (128, 12, 10), (256, 10, 10)]:
        v = jax.random.normal(key, (1, n, n, t_in))
        out = jax.jit(lambda p, v: model.apply(p, v, out_steps=t_out))(params, v)
        print(f"in (1, {n:>3}, {n:>3}, {t_in:>2}) -> out {tuple(out.shape)}")

    # latent tensors via capture_intermediates (replaces add_latent_hook)
    out, state = model.apply(
        params, v64, capture_intermediates=lambda mdl, name: "SpectralConvS" in type(mdl).__name__
    )
    inter = jax.tree_util.tree_leaves(state["intermediates"])
    print(f"captured {len(inter)} latent tensors; first: {inter[0].shape}")

    # eval latency: mean of 100 forward passes at 128^2 x 10 steps
    v128 = jax.random.normal(key, (1, 128, 128, 10))
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    fwd(params, v128).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(100):
        out = fwd(params, v128)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 100
    print(f"eval latency 128^2 x 10: {dt * 1e3:.2f} ms/forward")


if __name__ == "__main__":
    main()
