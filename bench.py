"""Headline benchmark: batched 256² McWilliams vorticity solver throughput.

Runs the pseudo-spectral RK4-Crank-Nicolson step (the reference's data-gen
hot loop, SURVEY.md §3.1) batched over 8 trajectories at 256² on the
available accelerator and prints ONE JSON line.

Baseline: the PyTorch reference (torch_cfd.equations.NavierStokes2DSpectral,
RK4CrankNicolsonStepper) on an 8-thread CPU measures 5.48 batched steps/s at
the same configuration (batch=8, 256², dt=1e-3, dealiased) — measured once
in this container; the driver's north star is ≥50x per chip.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from tpu_cfd import grids
from tpu_cfd.solvers import equations, initial_conditions as ic

TORCH_CPU_BASELINE_STEPS_PER_S = 5.48  # see module docstring


def main():
    n, batch = 256, 8
    steps_per_call = 100
    grid = grids.Grid((n, n), domain=((0, 2 * jnp.pi), (0, 2 * jnp.pi)))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    w0 = jax.vmap(lambda k: ic.vorticity_field(k, grid, peak_wavenumber=4).data)(
        keys
    )
    ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
    what = jnp.fft.rfft2(w0)

    step = jax.jit(lambda w: ns.forward(w, 1e-3, steps=steps_per_call)[0])
    checksum_fn = jax.jit(lambda w: jnp.abs(w).max())
    # warmup/compile (including the checksum reduction)
    out = step(what)
    _ = float(checksum_fn(out))

    n_calls = 5
    t0 = time.perf_counter()
    w = what
    for _ in range(n_calls):
        w = step(w)
    # host fetch: forces completion even where block_until_ready is
    # unreliable (verified equal to block-based timing on this backend)
    checksum = float(checksum_fn(w))
    dt = time.perf_counter() - t0
    assert jnp.isfinite(checksum)

    steps_per_s = n_calls * steps_per_call / dt
    result = {
        "metric": "McWilliams 256^2 batch=8 RK4-CN vorticity solver steps/s",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / TORCH_CPU_BASELINE_STEPS_PER_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
