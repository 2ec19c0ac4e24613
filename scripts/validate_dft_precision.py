"""Accuracy ladder for the dense-DFT solver path (VERDICT r2 item 3, solver
side): quantifies what fft_impl="dft_aligned" at each mxu_precision costs in
physics vs the jnp.fft fp32 reference, so the data-gen default is a measured
choice rather than a guess.

Measures, for McWilliams 256² decaying turbulence:
  - one-step relative L2 error vs the fft path (pre-chaos, pure numerics)
  - 100-step relative L2 error (error growth, still sub-Lyapunov)
  - enstrophy-spectrum agreement after a 2000-step rollout
    (mean |log10 E_impl - log10 E_fft| over k=2..80 — the statistic the
    datasets exist to capture; pointwise agreement is meaningless at
    chaotic horizons)

Usage: python scripts/validate_dft_precision.py [--n 256] [--batch 8]
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
import numpy as np

from tpu_cfd import grids
from tpu_cfd.solvers import equations, initial_conditions as ic


def rel_l2(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def spectrum(w, grid):
    """Isotropic enstrophy spectrum E(k) of real vorticity fields (b, n, n)."""
    n = w.shape[-1]
    what = np.fft.fft2(np.asarray(w))
    e = 0.5 * np.abs(what) ** 2 / n**4
    k = np.fft.fftfreq(n, d=1.0 / n)
    kx, ky = np.meshgrid(k, k, indexing="ij")
    kr = np.sqrt(kx**2 + ky**2)
    kbins = np.arange(1, n // 2)
    spec = np.zeros(len(kbins))
    for i, kb in enumerate(kbins):
        mask = (kr >= kb - 0.5) & (kr < kb + 0.5)
        spec[i] = e[..., mask].sum() / w.shape[0]
    return kbins, spec


def rollout(impl, precision, what, grid, steps, dt=1e-3):
    fused = impl == "dft_aligned_fused"
    ns = equations.NavierStokes2DSpectral(
        viscosity=1e-3, grid=grid, drag=0.1,
        fft_impl="dft_aligned" if fused else impl,
        mxu_precision=precision, fused=fused,
    )
    fwd = jax.jit(lambda w: ns.forward(w, dt, steps=steps)[0])
    out = fwd(what)
    return np.asarray(jnp.fft.irfft2(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--spectrum-steps", type=int, default=2000)
    ap.add_argument("--impls", default=None,
                    help="comma-separated impl filter (default: all)")
    args = ap.parse_args()

    grid = grids.Grid(
        (args.n, args.n), domain=((0, 2 * jnp.pi), (0, 2 * jnp.pi))
    )
    keys = jax.random.split(jax.random.PRNGKey(7), args.batch)
    w0 = jax.vmap(
        lambda k: ic.vorticity_field(k, grid, peak_wavenumber=4).data
    )(keys)
    what0 = jnp.fft.rfft2(w0)
    # 200 warmup steps on the reference path so the state is spectrally
    # filtered (Nyquist column viscously dead — the truncation's premise)
    warm = rollout("fft", "highest", what0, grid, 200)
    what0 = jnp.fft.rfft2(jnp.asarray(warm))

    configs = [
        ("fft", "highest"),
        ("dft_aligned", "highest"),
        ("dft_aligned", "high"),
        ("dft_aligned", "default"),
        ("dft_galerkin", "highest"),
        ("dft_galerkin", "high"),
        ("dft_aligned_fused", "highest"),
        ("dft_aligned_fused", "high"),
    ]
    if args.impls:
        keep = set(args.impls.split(","))
        configs = [c for c in configs if c[0] in keep]
    ref = {}
    for steps in (1, 100, args.spectrum_steps):
        ref[steps] = rollout("fft", "highest", what0, grid, steps)
    kb, ref_spec = spectrum(ref[args.spectrum_steps], grid)
    lo = slice(1, 80)  # k = 2..80: the dynamically active band

    for impl, prec in configs:
        row = {"impl": impl, "precision": prec}
        for steps, key in ((1, "rel_l2_1step"), (100, "rel_l2_100step")):
            out = rollout(impl, prec, what0, grid, steps)
            row[key] = float(f"{rel_l2(out, ref[steps]):.3e}")
        out = rollout(impl, prec, what0, grid, args.spectrum_steps)
        _, spec = spectrum(out, grid)
        gap = np.abs(np.log10(spec[lo]) - np.log10(ref_spec[lo]))
        row[f"spectrum_log10_gap_k2_80_{args.spectrum_steps}step"] = float(
            f"{gap.mean():.4f}"
        )
        row["finite"] = bool(np.isfinite(out).all())
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
