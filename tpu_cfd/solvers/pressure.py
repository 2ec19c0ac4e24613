"""Pressure solve and Chorin projection for the MAC-grid FVM solver.

TPU-native counterpart of the reference's ``torch_cfd/pressure.py``
(Pseudoinverse module: pressure.py:153, PressureProjection: :68,
rhs_transform: :127-150). Instead of ``nn.Module``s with registered buffers,
these are plain Python factory objects built once at setup time: the
precomputed eigen-operators are ordinary arrays closed over by the apply
function, which jits/fuses cleanly (buffers are deterministic functions of
the grid, so they are reconstructed rather than serialized — SURVEY.md §5).

The solve itself is one rfftn/irfftn pair (periodic) or a pair of MXU
tensordot rotations (walls) — both TPU-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_cfd import boundaries, grids
from tpu_cfd.ops import fast_diagonalization, finite_differences as fdm

Array = jax.Array
Grid = grids.Grid
GridArray = grids.GridArray
GridVariable = grids.GridVariable
GridVariableVector = grids.GridVariableVector


def _default_implementation(grid: Grid, bc) -> str:
    """Picks the fast-diagonalization implementation for the given BC.

    Periodic boundaries give circulant operators: use 'rfft' (falls back to
    'fft' for odd last axis). Walls give non-circulant symmetric operators:
    use the MXU 'matmul' path.
    """
    periodic = all(
        boundaries.is_bc_periodic_boundary_conditions(bc, dim)
        for dim in range(grid.ndim)
    )
    if not periodic:
        return "matmul"
    return "rfft" if grid.shape[-1] % 2 == 0 else "fft"


@dataclasses.dataclass
class Pseudoinverse:
    """Pseudoinverse of the separable Laplacian on ``grid`` under ``bc``.

    Counterpart of reference pressure.py:153 (eigenvalue precompute :319,
    cutoff filter :351, frequency-space apply :357, SVD-space apply :366).
    Construct once; ``__call__`` is a pure jit-safe function of the rhs (any
    leading batch dims allowed).
    """

    grid: Grid
    bc: Optional[object] = None
    dtype: object = jnp.float32
    hermitian: bool = True
    circulant: bool = True
    implementation: Optional[str] = None
    cutoff: Optional[float] = None

    def __post_init__(self):
        if self.bc is None:
            self.bc = boundaries.periodic_boundary_conditions(self.grid.ndim)
        if self.implementation is None:
            self.implementation = _default_implementation(self.grid, self.bc)
        if self.implementation == "matmul":
            self.circulant = False
        laplacians = fdm.set_laplacian_matrix(self.grid, self.bc)
        self._apply = fast_diagonalization.pseudoinverse_transform(
            laplacians,
            self.dtype,
            hermitian=self.hermitian,
            circulant=self.circulant,
            implementation=self.implementation,
            cutoff=self.cutoff,
        )

    def __call__(self, value: Array) -> Array:
        return self._apply(value)


@dataclasses.dataclass
class PressureProjection:
    """Chorin pressure projection: make a velocity field divergence-free.

    Pipeline (reference pressure.py:109-124): divergence rhs → mean
    subtraction for all-Neumann stability → Laplacian pseudoinverse →
    ``impose_bc`` on the pressure → forward-difference gradient → subtract.
    """

    grid: Grid
    bc: object  # pressure BC
    dtype: object = jnp.float32
    implementation: Optional[str] = None

    def __post_init__(self):
        self.solver = Pseudoinverse(
            grid=self.grid,
            bc=self.bc,
            dtype=self.dtype,
            hermitian=True,
            implementation=self.implementation,
        )

    def __call__(self, v: GridVariableVector) -> GridVariableVector:
        grids.consistent_grid(self.grid, *v)
        pressure_bc = boundaries.get_pressure_bc_from_velocity(v)
        rhs = fdm.divergence(v)
        rhs_transformed = rhs_transform(rhs, pressure_bc)
        rhs_inv = self.solver(rhs_transformed)
        q = GridArray(rhs_inv, rhs.offset, rhs.grid)
        q = pressure_bc.impose_bc(q)
        q_grad = fdm.forward_difference(q)
        return GridVariableVector(
            tuple(u.bc.impose_bc(u.array - q_g) for u, q_g in zip(v, q_grad))
        )


def rhs_transform(u: GridArray, bc) -> Array:
    """Subtracts the mean over grid dims for all-Neumann axes (solvability).

    The all-Neumann Poisson problem is only solvable for mean-free rhs; batch
    dims (if any) keep their own means (reference pressure.py:127-150).
    """
    u_data = u.data
    for axis in range(u.grid.ndim):
        if (
            bc.types[axis][0] == boundaries.BCType.NEUMANN
            and bc.types[axis][1] == boundaries.BCType.NEUMANN
        ):
            dims = tuple(range(-u.grid.ndim, 0))
            mean = jnp.mean(u_data, axis=dims, keepdims=True)
            u_data = u_data - mean
    return u_data


def projection(
    v: GridVariableVector,
    solver: Optional[PressureProjection] = None,
) -> GridVariableVector:
    """Functional one-shot projection (builds the solver if not given)."""
    if solver is None:
        grid = grids.consistent_grid_arrays(*v)
        pressure_bc = boundaries.get_pressure_bc_from_velocity(v)
        solver = PressureProjection(grid=grid, bc=pressure_bc, dtype=v[0].dtype)
    return solver(v)
