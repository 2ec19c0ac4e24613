"""Finite-difference operators on staggered grid variables.

TPU-native counterpart of the reference's ``torch_cfd/finite_differences.py``
(forward/central/backward differences: :74-123, divergence: :126, laplacian:
:150, laplacian_matrix[_w_boundaries]: :167,266, gradient_tensor: :392,
curl_2d: :412). FDM ops consume ``GridVariable`` (BCs define ghost cells) and
return ``GridArray`` (derivatives have no well-defined BC).

All stencils reduce to ``shift`` (a ``jnp.roll`` for periodic BCs) plus
pointwise arithmetic, which XLA fuses into a handful of elementwise kernels
inside a jitted solver step — no hand scheduling required.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpu_cfd import boundaries, grids

Array = jax.Array
Grid = grids.Grid
GridArray = grids.GridArray
GridVariable = grids.GridVariable
GridArrayTensor = grids.GridArrayTensor
GridVariableVector = grids.GridVariableVector


def stencil_sum(*arrays: GridArray) -> GridArray:
    """Sums arrays across a stencil, with an averaged offset."""
    offset = grids.averaged_offset_arrays(*arrays)
    result = sum(array.data for array in arrays)
    grid = grids.consistent_grid_arrays(*arrays)
    return GridArray(result, offset, grid)


def forward_difference(
    u: GridVariable, axis: Optional[Union[int, Tuple[int, ...]]] = None
):
    """Forward difference (u[i+1]-u[i])/h; offset moves +0.5 along ``axis``."""
    if axis is None:
        axis = range(u.grid.ndim)
    if not isinstance(axis, int):
        return tuple(forward_difference(u, a) for a in axis)
    diff = stencil_sum(u.shift(+1, axis), -u.array)
    return diff / u.grid.step[axis]


def central_difference(
    u: GridVariable, axis: Optional[Union[int, Tuple[int, ...]]] = None
):
    """Central difference (u[i+1]-u[i-1])/(2h); offset unchanged."""
    if axis is None:
        axis = range(u.grid.ndim)
    if not isinstance(axis, int):
        return tuple(central_difference(u, a) for a in axis)
    diff = stencil_sum(u.shift(+1, axis), -u.shift(-1, axis))
    return diff / (2 * u.grid.step[axis])


def backward_difference(
    u: GridVariable, axis: Optional[Union[int, Tuple[int, ...]]] = None
):
    """Backward difference (u[i]-u[i-1])/h; offset moves -0.5 along ``axis``."""
    if axis is None:
        axis = range(u.grid.ndim)
    if not isinstance(axis, int):
        return tuple(backward_difference(u, a) for a in axis)
    diff = stencil_sum(u.array, -u.shift(-1, axis))
    return diff / u.grid.step[axis]


def divergence(v: GridVariableVector) -> GridArray:
    """Divergence of a face-staggered vector field via backward differences."""
    grid = grids.consistent_grid_arrays(*v)
    if len(v) != grid.ndim:
        raise ValueError(
            "The length of `v` must be equal to `grid.ndim`. "
            f"Expected length {grid.ndim}; got {len(v)}."
        )
    differences = [backward_difference(u, axis) for axis, u in enumerate(v)]
    return sum(differences)


def centered_divergence(v: GridVariableVector) -> GridArray:
    """Divergence via central differences."""
    grid = grids.consistent_grid_arrays(*v)
    if len(v) != grid.ndim:
        raise ValueError(
            "The length of `v` must be equal to `grid.ndim`. "
            f"Expected length {grid.ndim}; got {len(v)}."
        )
    differences = [central_difference(u, axis) for axis, u in enumerate(v)]
    return sum(differences)


def laplacian(u: GridVariable, scales: Optional[Tuple[float, ...]] = None) -> GridArray:
    """5-point (2*ndim+1) Laplacian stencil of ``u``."""
    if scales is None:
        scales = tuple(1 / s**2 for s in u.grid.step)
    result = -2 * u.array * sum(scales)
    for axis in range(u.grid.ndim):
        result += stencil_sum(u.shift(-1, axis), u.shift(+1, axis)) * scales[axis]
    return result


def laplacian_matrix(n: int, step: float, dtype=None) -> Array:
    """Dense 1-D periodic Laplacian (circulant [1, -2, 1]/h²) matrix.

    Counterpart of reference finite_differences.py:167 (circulant build
    :189-193). Built host-side with numpy: these matrices are small setup
    constants (n ≤ a few thousand) consumed by the fast-diagonalization
    eigendecomposition — never in the hot path.
    """
    column = np.zeros(n)
    column[0] = -2 / step**2
    column[1] = column[-1] = 1 / step**2
    idx = (n - np.arange(n)[:, None] + np.arange(n)[None, :]) % n
    lap = column[idx]
    # host numpy on purpose: setup constant consumed by the eigendecomposition
    return lap.astype(dtype) if dtype is not None else lap


def _laplacian_boundary_dirichlet_cell_centered(
    laplacians: list, grid: Grid, axis: int, side: str
) -> list:
    """Patches a 1-D periodic Laplacian for homogeneous Dirichlet walls.

    For cell-centered data half a step from the wall, the ghost cell value is
    u[-1] = -u[0], so the diagonal entry gains an extra -1/h².
    """
    lap = np.asarray(laplacians[axis])
    h2 = grid.step[axis] ** 2
    if side == "lower":
        lap[0, 0] -= 1 / h2
    else:
        lap[-1, -1] -= 1 / h2
    # remove the periodic wrap-around couplings
    lap[0, -1] = 0.0
    lap[-1, 0] = 0.0
    laplacians[axis] = lap
    return laplacians


def _laplacian_boundary_neumann_cell_centered(
    laplacians: list, grid: Grid, axis: int, side: str
) -> list:
    """Patches a 1-D periodic Laplacian for homogeneous Neumann walls.

    Ghost cell value u[-1] = u[0], so the diagonal entry gains +1/h².
    """
    lap = np.asarray(laplacians[axis])
    h2 = grid.step[axis] ** 2
    if side == "lower":
        lap[0, 0] += 1 / h2
    else:
        lap[-1, -1] += 1 / h2
    lap[0, -1] = 0.0
    lap[-1, 0] = 0.0
    laplacians[axis] = lap
    return laplacians


def laplacian_matrix_w_boundaries(
    grid: Grid,
    offset: Tuple[float, ...],
    bc,
    laplacians: Optional[Sequence[Array]] = None,
) -> list:
    """1-D Laplacian matrices satisfying ``bc`` along each axis.

    Counterpart of reference finite_differences.py:266. Only homogeneous or
    periodic boundary conditions are supported.
    """
    if not isinstance(bc, boundaries.ConstantBoundaryConditions):
        raise NotImplementedError(f"Explicit laplacians are not implemented for {bc}.")
    if laplacians is None:
        laplacians = list(map(laplacian_matrix, grid.shape, grid.step))
    laplacians = list(laplacians)
    for axis in range(grid.ndim):
        if math.isclose(offset[axis], 0.5):
            for i, side in enumerate(["lower", "upper"]):
                if bc.types[axis][i] == boundaries.BCType.NEUMANN:
                    _laplacian_boundary_neumann_cell_centered(
                        laplacians, grid, axis, side
                    )
                elif bc.types[axis][i] == boundaries.BCType.DIRICHLET:
                    _laplacian_boundary_dirichlet_cell_centered(
                        laplacians, grid, axis, side
                    )
        if math.isclose(offset[axis] % 1, 0.0):
            if (
                bc.types[axis][0] == boundaries.BCType.DIRICHLET
                and bc.types[axis][1] == boundaries.BCType.DIRICHLET
            ):
                # interior grid has one fewer cell for edge-aligned Dirichlet
                laplacians[axis] = laplacians[axis][:-1, :-1]
            elif boundaries.BCType.NEUMANN in bc.types[axis]:
                raise NotImplementedError(
                    "edge-aligned Neumann boundaries are not implemented."
                )
    return laplacians


def set_laplacian_matrix(grid: Grid, bc) -> list:
    """Laplacian operators for cell-centered data under ``bc``."""
    return laplacian_matrix_w_boundaries(grid, offset=grid.cell_center, bc=bc)


def gradient_tensor(v):
    """Cell-centered gradient tensor of a variable (or a vector of them)."""
    if not isinstance(v, GridVariable):
        return GridArrayTensor(
            np.stack([np.asarray(gradient_tensor(u), dtype=object) for u in v], axis=-1)
        )
    grad = []
    for axis in range(v.grid.ndim):
        offset = v.offset[axis]
        if offset == 0:
            derivative = forward_difference(v, axis)
        elif offset == 1:
            derivative = backward_difference(v, axis)
        elif offset == 0.5:
            from tpu_cfd.ops import interpolation

            v_centered = interpolation.linear(v, v.grid.cell_center)
            derivative = central_difference(v_centered, axis)
        else:
            raise ValueError(f"expected offset values in {{0, 0.5, 1}}, got {offset}")
        grad.append(derivative)
    return GridArrayTensor(grad)


def curl_2d(v: Sequence[GridVariable]) -> GridArray:
    """2-D curl ∂v/∂x - ∂u/∂y using forward differences."""
    if len(v) != 2:
        raise ValueError(f"Length of `v` is not 2: {len(v)}")
    grid = grids.consistent_grid_arrays(*v)
    if grid.ndim != 2:
        raise ValueError(f"Grid dimensionality is not 2: {grid.ndim}")
    return forward_difference(v[1], axis=0) - forward_difference(v[0], axis=1)
