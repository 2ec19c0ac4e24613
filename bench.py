"""Headline benchmark: batched 256² McWilliams vorticity solver throughput.

Runs the pseudo-spectral RK4-Crank-Nicolson step (the reference's data-gen
hot loop, SURVEY.md §3.1) batched over 8 trajectories at 256² on the
available accelerator and prints ONE JSON line. The line's "extra" field
carries the second BASELINE.json metric (SFNO train samples/sec/chip at the
reference's fnodata training configuration), the data-gen operating point
(batch 128), and an XLA cost-analysis FLOPs/HBM roofline statement.

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
import numpy as np

from tpu_cfd import grids
from tpu_cfd.solvers import equations, initial_conditions as ic

TORCH_CPU_BASELINE_STEPS_PER_S = 5.48  # see module docstring

# v5e chip peaks (public spec): 197 TFLOP/s bf16, ~0.82 TB/s HBM BW.
# fp32 work runs through the same MXU via passes; we report MFU against the
# bf16 peak as the conservative upper bound.
V5E_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 0.82e12


def _time_calls(fn, x, n_calls, checksum_fn):
    """Times n_calls chained dispatches, forcing completion via host fetch
    (block_until_ready under-reports on the tunnel backend; see CLAUDE.md)."""
    out = fn(x)  # warmup/compile
    _ = float(checksum_fn(out))
    t0 = time.perf_counter()
    w = x
    for _ in range(n_calls):
        w = fn(w)
    checksum = float(checksum_fn(w))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return dt


def _cost_analysis(jitted, *args):
    """(flops, bytes accessed) from XLA's own cost model; 0s if unavailable."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def bench_solver(n=256, batch=8, steps_per_call=100, n_calls=5):
    grid = grids.Grid((n, n), domain=((0, 2 * jnp.pi), (0, 2 * jnp.pi)))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    w0 = jax.vmap(lambda k: ic.vorticity_field(k, grid, peak_wavenumber=4).data)(
        keys
    )
    ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
    what = jnp.fft.rfft2(w0)

    step = jax.jit(lambda w: ns.forward(w, 1e-3, steps=steps_per_call)[0])
    checksum_fn = jax.jit(lambda w: jnp.abs(w).max())
    dt = _time_calls(step, what, n_calls, checksum_fn)
    steps_per_s = n_calls * steps_per_call / dt
    flops, hbm = _cost_analysis(step, what)
    return steps_per_s, flops / steps_per_call, hbm / steps_per_call


def bench_sfno_train(n=64, batch=4, t_in=10, t_out=40, n_calls=10):
    """SFNO train samples/sec/chip at the reference's fnodata configuration
    (modes 12/12/5, width 20, batch 4 — examples/ex2_SFNO_train_fnodata.ipynb
    cell 1-3), jitted value_and_grad + Adam update per call."""
    import optax

    from tpu_cfd.models import SFNO
    from tpu_cfd.train import losses

    model = SFNO(modes_x=12, modes_y=12, modes_t=5, width=20, beta=1e-2,
                 output_steps=t_out)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, n, n, t_in), jnp.float32)
    y = jax.random.normal(key, (batch, n, n, t_out), jnp.float32)
    params = jax.jit(lambda k, v: model.init(k, v, out_steps=t_out))(key, x)
    loss_fn = losses.SobolevLoss(n_grid=n, norm_order=0, relative=True)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(carry, x, y):
        params, opt_state = carry
        def loss(p):
            return loss_fn(model.apply(p, x, out_steps=t_out), y)
        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), l

    carry = (params, opt_state)
    (carry, l) = train_step(carry, x, y)  # compile
    _ = float(l)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        carry, l = train_step(carry, x, y)
    _ = float(l)
    dt = time.perf_counter() - t0
    flops, hbm = _cost_analysis(train_step, carry, x, y)
    return n_calls * batch / dt, flops, hbm


def main():
    steps_per_s, solver_flops, solver_hbm = bench_solver()
    dgen_steps_per_s, _, _ = bench_solver(batch=128, steps_per_call=100,
                                          n_calls=2)
    sfno_samples_per_s, train_flops, train_hbm = bench_sfno_train()
    # batch-scaling point: larger per-step parallelism amortizes op overhead
    sfno_b32_samples_per_s, _, _ = bench_sfno_train(batch=32, n_calls=5)

    def roofline(flops_per_unit, hbm_per_unit, units_per_s):
        fl = flops_per_unit * units_per_s
        bw = hbm_per_unit * units_per_s
        return {
            "tflops_per_s": round(fl / 1e12, 3),
            "mfu_vs_bf16_peak": round(fl / V5E_PEAK_FLOPS, 4),
            "hbm_gb_per_s": round(bw / 1e9, 1),
            "hbm_utilization": round(bw / V5E_HBM_BYTES_PER_S, 3),
        }

    result = {
        "metric": "McWilliams 256^2 batch=8 RK4-CN vorticity solver steps/s",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / TORCH_CPU_BASELINE_STEPS_PER_S, 2),
        "extra": {
            "solver_roofline_b8": roofline(solver_flops, solver_hbm,
                                           steps_per_s),
            "datagen_b128_steps_per_s": round(dgen_steps_per_s, 2),
            "datagen_b128_samples_x_steps_per_s": round(
                dgen_steps_per_s * 128, 0),
            "sfno_train_samples_per_s_per_chip": round(sfno_samples_per_s, 2),
            "sfno_train_b32_samples_per_s_per_chip": round(
                sfno_b32_samples_per_s, 2),
            "sfno_train_roofline": roofline(
                train_flops, train_hbm, sfno_samples_per_s / 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
