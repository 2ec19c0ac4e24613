"""Forced Kolmogorov turbulence with the MAC-grid FVM solver (RK4 + projection).

Counterpart of the reference's
``examples/Kolmogrov2d_rk4_fvm_forced_turbulence.ipynb``: fp64
``filtered_velocity_field`` initial condition, classic RK4 stepping with
Chorin pressure projection, ``KolmogorovForcing`` (wave number 3) and drag
0.1, CFL-bounded dt via ``stable_time_step``, then a vorticity-snapshot
facet plot via the finite-difference curl. The whole
inner_steps-per-frame rollout is one jitted ``lax.scan``.

Run: PYTHONPATH=. python examples/ex1_kolmogorov_fvm.py [--n 128] [--frames 10]
(fp64 runs on CPU; pass --f32 for the TPU path.)
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--frames", type=int, default=10,
                   help="recorded frames (notebook: 100)")
    p.add_argument("--inner-steps", type=int, default=20)
    p.add_argument("--f32", action="store_true",
                   help="fp32 (TPU-friendly); default fp64 on CPU")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    if not args.f32:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from tpu_cfd import grids
    from tpu_cfd.ops import finite_differences as fdm
    from tpu_cfd.solvers import equations, forcings, fvm
    from tpu_cfd.solvers import initial_conditions as ic
    from tpu_cfd.train import pipeline
    from tpu_cfd.utils import visualizations as viz

    dtype = jnp.float32 if args.f32 else jnp.float64
    n, diam = args.n, 2 * jnp.pi
    viscosity, density, max_velocity, peak_wavenumber = 1e-3, 1.0, 3.0, 3
    grid = grids.Grid((n, n), domain=((0, diam), (0, diam)))

    v0 = ic.filtered_velocity_field(
        jax.random.PRNGKey(42), grid, max_velocity, peak_wavenumber,
        iterations=3, dtype=dtype,
    )
    div0 = fdm.divergence(v0)
    print(f"divergence of initial velocity L2: "
          f"{float(jnp.linalg.norm(div0.data)):.2e}")

    dt = equations.stable_time_step(
        dx=min(grid.step), max_velocity=max_velocity,
        max_courant_number=0.5, viscosity=viscosity,
    )
    print(f"dt: {dt}")

    eqn = fvm.NavierStokes2DFVMProjection(
        viscosity=viscosity,
        grid=grid,
        density=density,
        drag=0.1,
        forcing=forcings.KolmogorovForcing(
            grid=grid, diam=float(diam), wave_number=peak_wavenumber,
            offsets=(v0[0].offset, v0[1].offset),
        ),
        solver=fvm.RKStepper.from_method("classic_rk4"),
        dtype=dtype,
    )

    @jax.jit
    def frame(v):
        def body(u, _):
            return eqn(u, dt), None
        return jax.lax.scan(body, v, None, length=args.inner_steps)[0]

    v, frames = v0, []
    for i in range(args.frames):
        v = frame(v)
        u_np = np.asarray(v[0].data)
        assert np.isfinite(u_np).all(), f"NaN at frame {i}"
        w = fdm.curl_2d(v)
        frames.append(np.asarray(w.data))
    div = fdm.divergence(v)
    print(f"final max |divergence|: {float(jnp.abs(div.data).max()):.2e}")

    pipeline.ensure_paths()
    out_path = args.out or os.path.join(
        pipeline.FIG_PATH, f"kolmogorov_fvm_{n}.png")
    fig, _ = viz.plot_contour_trajectory(np.stack(frames))
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    print(f"figure: {out_path}")


if __name__ == "__main__":
    main()
