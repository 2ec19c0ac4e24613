"""Forced Kolmogorov turbulence demo: simulate, plot spectra + snapshots.

Counterpart of the reference's simulation notebooks (examples/ex0/ex1,
README.md:42-52): runs the pseudo-spectral solver and checks the enstrophy
spectrum against the k^(-slope) inverse-cascade guide.

Run: PYTHONPATH=. python examples/ex1_kolmogorov_simulation.py [--n 256]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpu_cfd import grids
from tpu_cfd.solvers import equations, forcings, initial_conditions as ic
from tpu_cfd.solvers import trajectories
from tpu_cfd.utils.visualizations import (
    plot_contour_trajectory,
    plot_enstrophy_spectrum,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--dt", type=float, default=7e-4)
    p.add_argument("--out", type=str, default="/tmp/kolmogorov_demo")
    args = p.parse_args()

    n = args.n
    diam = 2 * jnp.pi
    grid = grids.Grid((n, n), domain=((0, diam), (0, diam)))
    forcing = forcings.KolmogorovForcing(grid=grid, scale=1.0, wave_number=4)
    ns = equations.NavierStokes2DSpectral(
        viscosity=1e-3, grid=grid, drag=0.1, forcing_fn=forcing
    )
    w0 = ic.vorticity_field(jax.random.PRNGKey(0), grid, peak_wavenumber=4).data

    rollout = jax.jit(
        lambda w: trajectories.get_trajectory_imex(
            ns, w, args.dt, num_steps=args.steps,
            record_every_steps=args.steps // 10,
        )
    )
    result = rollout(jnp.fft.rfft2(w0))
    w_traj = np.asarray(jnp.fft.irfft2(result["vorticity"], s=(n, n)))
    print(f"trajectory: {w_traj.shape}, final enstrophy {np.mean(w_traj[-1]**2):.3f}")

    fig, _ = plot_contour_trajectory(w_traj, num_snapshots=5)
    fig.savefig(f"{args.out}_snapshots.png", dpi=110)
    fig2, _ = plot_enstrophy_spectrum(
        [w_traj[-1]], h=float(diam) / n, slope=5,
        labels=["simulated"], title="Kolmogorov flow enstrophy spectrum",
    )
    fig2.savefig(f"{args.out}_spectrum.png", dpi=110)
    print(f"saved {args.out}_snapshots.png and {args.out}_spectrum.png")


if __name__ == "__main__":
    main()
