"""Initial conditions: filtered divergence-free velocity and McWilliams vorticity.

TPU-native counterpart of the reference's ``torch_cfd/initial_conditions.py``
(wrap_velocities/wrap_vorticity: :34,48, spectral densities: :59,68,
spectral_filter: :89, streamfunc_normalize: :102, project_and_normalize:
:110, filtered_velocity_field: :122, vorticity_field: :170).

Randomness uses ``jax.random`` keys instead of ``torch.Generator`` seeds:
per-sample determinism comes from ``jax.random.fold_in(key, sample_idx)``,
which is resume-compatible like the reference's ``seed + idx`` formula
(SURVEY.md §7 "RNG parity" — distributions match, not bit patterns).
All functions are jit/vmap-safe for a fixed grid.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from tpu_cfd import boundaries, grids
from tpu_cfd.solvers import pressure

Array = jax.Array
Grid = grids.Grid
GridArray = grids.GridArray
GridVariable = grids.GridVariable
GridVariableVector = grids.GridVariableVector


def wrap_velocities(
    v: Sequence[Array], grid: Grid, bcs: Sequence[object]
) -> GridVariableVector:
    """Wraps raw velocity arrays on cell faces for input into simulations."""
    return GridVariableVector(
        tuple(
            GridVariable(GridArray(u, offset, grid), bc)
            for u, offset, bc in zip(v, grid.cell_faces, bcs)
        )
    )


def wrap_vorticity(w: Array, grid: Grid, bc: object) -> GridVariable:
    """Wraps a raw vorticity array at cell centers."""
    return GridVariable(GridArray(w, grid.cell_center, grid), bc)


def _log_normal_density(k: Array, mode: float, variance: float = 0.25) -> Array:
    """Unscaled log-normal PDF peaked at ``mode``."""
    mean = math.log(mode) + variance
    logk = jnp.log(k)
    return jnp.exp(-((mean - logk) ** 2) / 2 / variance - logk)


def McWilliams_density(k: Array, mode: float, tau: float = 1.0) -> Array:
    """McWilliams-1984 spectral density |ψ̂|² ~ k⁻¹(τ² + (k/k₀)⁴)⁻¹."""
    return (k * (tau**2 + (k / mode) ** 4)) ** (-1)


def _angular_frequency_magnitude(grid: Grid, dtype=jnp.float32) -> Array:
    frequencies = [
        2 * jnp.pi * jnp.fft.fftfreq(size, step).astype(dtype)
        for size, step in zip(grid.shape, grid.step)
    ]
    freq_vector = jnp.stack(jnp.meshgrid(*frequencies, indexing="ij"), axis=0)
    return jnp.linalg.norm(freq_vector, axis=0)


def spectral_filter(
    spectral_density: Callable[[Array], Array], v: Array, grid: Grid
) -> Array:
    """Filters white noise to match a prescribed spectral density."""
    k = _angular_frequency_magnitude(grid, dtype=v.dtype)
    filters = jnp.where(k > 0, spectral_density(k), 0.0)
    # output is real because the density only depends on |k|
    return jnp.fft.ifftn(jnp.fft.fftn(v) * filters).real


def streamfunc_normalize(k: Array, psi: Array) -> Array:
    """Normalizes a stream function to unit kinetic energy (ref :102)."""
    nx, ny = psi.shape[-2:]
    psih = jnp.fft.fft2(psi)
    uh_mag = k * psih
    # python-float normalizer: (nx*ny)**2 overflows int32 at 256^2 and above
    norm = 2.0 / float(nx * ny) ** 2
    kinetic_energy = (norm * jnp.abs(uh_mag) ** 2).sum()
    return psi / jnp.sqrt(kinetic_energy)


def project_and_normalize(
    v: GridVariableVector,
    maximum_velocity: float = 1,
    projection: Optional[pressure.PressureProjection] = None,
) -> GridVariableVector:
    grid = grids.consistent_grid_arrays(*v)
    if projection is None:
        pressure_bc = boundaries.get_pressure_bc_from_velocity(v)
        projection = pressure.PressureProjection(grid, pressure_bc, dtype=v.dtype)
    v = projection(v)
    vmax = jnp.max(jnp.linalg.norm(jnp.stack([u.data for u in v]), axis=0))
    return GridVariableVector(
        tuple(GridVariable(maximum_velocity * u.array / vmax, u.bc) for u in v)
    )


def filtered_velocity_field(
    key: jax.Array,
    grid: Grid,
    maximum_velocity: float = 1,
    peak_wavenumber: float = 3,
    iterations: int = 3,
    dtype=jnp.float32,
) -> GridVariableVector:
    """Divergence-free velocity with a log-normal energy spectrum.

    White noise per component is spectrally filtered (density peaked at
    ``peak_wavenumber``, divided by k^(ndim-1) for the shell volume), then
    repeatedly projected and renormalized (reference :122-168).
    """
    spectral_density = lambda k: _log_normal_density(k, peak_wavenumber) / k ** (
        grid.ndim - 1
    )
    keys = jax.random.split(key, grid.ndim)
    velocity_components = []
    boundary_conditions = []
    for i in range(grid.ndim):
        noise = jax.random.normal(keys[i], grid.shape, dtype=dtype)
        velocity_components.append(spectral_filter(spectral_density, noise, grid))
        boundary_conditions.append(boundaries.periodic_boundary_conditions(grid.ndim))
    velocity = wrap_velocities(velocity_components, grid, boundary_conditions)

    # repeated projection+normalization fixes numerical-precision drift
    pressure_bc = boundaries.get_pressure_bc_from_velocity(velocity)
    projection = pressure.PressureProjection(grid, pressure_bc, dtype=dtype)
    for _ in range(iterations):
        velocity = project_and_normalize(velocity, maximum_velocity, projection)
    return velocity


def vorticity_field(
    key: jax.Array,
    grid: Grid,
    peak_wavenumber: float = 3,
    dtype=jnp.float32,
) -> GridVariable:
    """McWilliams-1984 isotropic-turbulence initial vorticity (ref :170-198).

    Stream function sampled from the McWilliams density, normalized to unit
    kinetic energy; vorticity = -Δψ evaluated spectrally.
    """
    spectral_density = lambda k: McWilliams_density(k, peak_wavenumber)
    noise = jax.random.normal(key, grid.shape, dtype=dtype)
    k = _angular_frequency_magnitude(grid, dtype=dtype)
    psi = spectral_filter(spectral_density, noise, grid)
    psi = streamfunc_normalize(k, psi)
    vorticity = jnp.fft.ifftn(jnp.fft.fftn(psi) * k**2).real
    bc = boundaries.periodic_boundary_conditions(grid.ndim)
    return wrap_vorticity(vorticity, grid, bc)
