"""Boundary conditions for grid variables (periodic / Dirichlet / Neumann).

TPU-native counterpart of the reference's ``torch_cfd/boundaries.py``
(BCType: boundaries.py:36, ConstantBoundaryConditions: :48 with
shift/pad/trim/impose_bc: :77,141,228,383, HomogeneousBoundaryConditions:
:403, inference utilities: :425-625). Ghost-cell math preserved:

  - periodic: circular pad (hot path: ``jnp.roll`` — shape preserved),
  - Dirichlet @ cell center: ghost = 2*bc - mirror(interior)
    (boundaries.py:182-189),
  - Dirichlet @ cell edge: ghost = bc,
  - Neumann: ghost = edge - step*bc (boundaries.py:197-221, the jax-cfd
    per-side-value convention),

All shape changes are static per trace, so every method is jit-safe. Grid
dims are addressed from the end of the data shape, so leading batch dims and
``vmap`` both work.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tpu_cfd import grids

Array = jax.Array
Grid = grids.Grid
GridArray = grids.GridArray
GridVariable = grids.GridVariable
GridVariableVector = grids.GridVariableVector

BoundaryValue = Optional[float]


class BCType:
    PERIODIC = "periodic"
    DIRICHLET = "dirichlet"
    NEUMANN = "neumann"


class Padding:
    MIRROR = "mirror"
    EXTEND = "extend"


def _data_axis(u: GridArray, dim: int) -> int:
    """Maps grid dim -> (possibly batched) data axis, counted from the end."""
    return dim - u.grid.ndim + u.data.ndim


def _pad_width(u_data: Array, axis: int, lo: int, hi: int):
    pw = [(0, 0)] * u_data.ndim
    pw[axis] = (lo, hi)
    return pw


@dataclasses.dataclass(init=False, frozen=True)
class ConstantBoundaryConditions:
    """Constant-in-space-and-time boundary conditions.

    ``types[i]`` is the (lower, upper) BC type for grid dim ``i``;
    ``bc_values[i]`` the corresponding constant values (None for periodic).

    Hashable and array-free, so it rides along as static pytree aux data on
    ``GridVariable``.
    """

    types: Tuple[Tuple[str, str], ...]
    bc_values: Tuple[Tuple[BoundaryValue, BoundaryValue], ...]

    def __init__(
        self,
        types: Sequence[Tuple[str, str]],
        values: Sequence[Tuple[BoundaryValue, BoundaryValue]],
    ):
        types = tuple(tuple(t) for t in types)
        values = tuple(tuple(v) for v in values)
        object.__setattr__(self, "types", types)
        object.__setattr__(self, "bc_values", values)

    # keep the reference's private alias working for parity of the API
    @property
    def _values(self):
        return self.bc_values

    def shift(self, u: GridArray, offset: int, dim: int) -> GridArray:
        """Shifts ``u`` by ``offset`` cells along grid dim ``dim``.

        Returned array has the same shape with offset ``u.offset + offset``;
        out-of-domain values are ghost cells from this BC.
        """
        if offset == 0:
            return u
        if (
            self.types[dim][0] == BCType.PERIODIC
            and self.types[dim][1] == BCType.PERIODIC
        ):
            # hot path: a periodic shift is a roll — no pad/trim round-trip.
            axis = _data_axis(u, dim)
            data = jnp.roll(u.data, -offset, axis=axis)
            new_offset = tuple(
                o + offset if i == dim else o for i, o in enumerate(u.offset)
            )
            return GridArray(data, new_offset, u.grid)
        padded = self._pad(u, offset, dim)
        return self._trim(padded, -offset, dim)

    def _count_bc_components(self) -> int:
        count = 0
        for axis in range(len(self.types)):
            if len(self.types[axis]) != 2:
                raise ValueError(
                    f"Boundary conditions for axis {axis} must have two values "
                    f"got {len(self.types[axis])}."
                )
            count += len(self.types[axis])
        return count

    def _is_aligned(self, u: GridArray, dim: int) -> bool:
        """Checks that ``u`` contains all interior domain information."""
        size_diff = u.shape[_data_axis(u, dim)] - u.grid.shape[dim]
        if self.types[dim][0] == BCType.DIRICHLET and math.isclose(u.offset[dim], 1):
            size_diff += 1
        if self.types[dim][1] == BCType.DIRICHLET and math.isclose(u.offset[dim], 1):
            size_diff += 1
        if self.types[dim][0] == BCType.NEUMANN and math.isclose(u.offset[dim] % 1, 0):
            raise NotImplementedError("Edge-aligned Neumann BCs are not implemented.")
        if size_diff < 0:
            raise ValueError("the GridArray does not contain all interior grid values.")
        return True

    def _pad(self, u: GridArray, width: int, dim: int, mode: Optional[str] = None) -> GridArray:
        """Pads ``u`` by ``width`` ghost cells along grid dim ``dim``.

        Negative width pads the lower boundary, positive the upper. Ghost-cell
        values follow the BC type (see module docstring). Padding past one
        ghost cell is only defined for periodic BCs.
        """
        if width < 0:
            bc_type = self.types[dim][0]
            side = 0
            padding = (-width, 0)
        else:
            bc_type = self.types[dim][1]
            side = 1
            padding = (0, width)

        axis = _data_axis(u, dim)
        pw = _pad_width(u.data, axis, *padding)
        new_offset = tuple(
            o - padding[0] if i == dim else o for i, o in enumerate(u.offset)
        )

        if bc_type != BCType.PERIODIC and abs(width) > 1:
            raise ValueError(
                "Padding past 1 ghost cell is not defined in nonperiodic case."
            )

        value = self.bc_values[dim][side]

        if bc_type == BCType.PERIODIC:
            data = jnp.pad(u.data, pw, mode="wrap")
        elif bc_type == BCType.DIRICHLET:
            if math.isclose(u.offset[dim] % 1, 0.5):  # cell center
                # ghost = 2*bc - first interior (symmetric mirror): the linear
                # interpolation of (ghost, first interior) hits the bc value
                # exactly on the boundary.
                data = 2 * jnp.pad(
                    u.data, pw, mode="constant", constant_values=value
                ) - jnp.pad(u.data, pw, mode="symmetric")
            elif math.isclose(u.offset[dim] % 1, 0):  # cell edge
                if mode == Padding.MIRROR:
                    # mirror flow across the boundary: ghost = 2*bc - mirror
                    data = 2 * jnp.pad(
                        u.data, pw, mode="constant", constant_values=value
                    ) - jnp.pad(u.data, pw, mode="symmetric")
                elif mode == Padding.EXTEND:
                    data = jnp.pad(u.data, pw, mode="edge")
                else:
                    data = jnp.pad(u.data, pw, mode="constant", constant_values=value)
            else:
                raise ValueError(
                    "expected offset to be an edge or cell center, got "
                    f"offset[axis]={u.offset[dim]}"
                )
        elif bc_type == BCType.NEUMANN:
            if not (
                math.isclose(u.offset[dim] % 1, 0)
                or math.isclose(u.offset[dim] % 1, 0.5)
            ):
                raise ValueError(
                    "expected offset to be an edge or cell center, got "
                    f"offset[axis]={u.offset[dim]}"
                )
            # ghost = replicate(edge) - step * bc_value
            # (cell-center: ghost-cell backward difference equals bc value)
            v = 0.0 if value is None else value
            data = (
                jnp.pad(u.data, pw, mode="edge")
                - u.grid.step[dim] * v * _edge_indicator(u.data, pw)
            )
        else:
            raise ValueError("invalid boundary type")
        return GridArray(data, new_offset, u.grid)

    def _trim(self, u: GridArray, width: int, dim: int) -> GridArray:
        """Trims ``width`` cells from the lower (width<0) or upper boundary."""
        if width < 0:
            padding = (-width, 0)
        else:
            padding = (0, width)
        axis = _data_axis(u, dim)
        limit = u.data.shape[axis] - padding[1]
        idx = [slice(None)] * u.data.ndim
        idx[axis] = slice(padding[0], limit)
        data = u.data[tuple(idx)]
        new_offset = tuple(
            o + padding[0] if i == dim else o for i, o in enumerate(u.offset)
        )
        return GridArray(data, new_offset, u.grid)

    # public aliases (reference boundaries.py:400-401)
    pad = _pad
    trim = _trim

    def values(
        self, dim: int, grid: Grid, dtype=jnp.float32
    ) -> Tuple[Optional[Array], Optional[Array]]:
        """Boundary-value arrays (shape = grid minus dim) or (None, None)."""
        if None in self.bc_values[dim]:
            return (None, None)
        shape = grid.shape[:dim] + grid.shape[dim + 1:]
        return tuple(
            jnp.full(shape, self.bc_values[dim][i], dtype=dtype) for i in [0, 1]
        )

    def _trim_padding(self, u: GridArray, dim: int = 0, trim_side: str = "both"):
        """Trims previously added padding, returning (array, padding_removed).

        How much to cut on each side is read off the offset/shape metadata:
        anything left of offset 0 is lower-side padding, anything past the
        grid extent is upper-side padding; on-boundary points of non-periodic
        edge-aligned fields are dependent values and get cut too.
        """
        axis = _data_axis(u, dim)
        lo_cut = 0
        hi_cut = 0
        if u.shape[axis] < u.grid.shape[dim]:
            return u, (0, 0)  # interior-only data carries no padding
        edge_aligned = math.isclose(u.offset[dim] % 1, 0)
        if trim_side in ("both", "left") and u.offset[dim] <= 0:
            # points strictly left of the domain are padding ...
            lo_cut = -math.ceil(-u.offset[dim])
            if self.types[dim][0] == BCType.PERIODIC:
                lo_cut = max(lo_cut, u.grid.shape[dim] - u.shape[axis])
            elif edge_aligned:
                # ... and so is the boundary value itself under
                # Dirichlet/Neumann (it is determined by the BC, not data)
                lo_cut -= 1
            u = self._trim(u, lo_cut, dim)
        if trim_side in ("both", "right"):
            if self.types[dim][1] == BCType.PERIODIC:
                hi_cut = max(u.shape[axis] - u.grid.shape[dim], 0)
            else:
                # index (in offset units) of the last datum vs the far edge
                last = u.shape[axis] + u.offset[dim] - 1
                if last >= u.grid.shape[dim]:
                    hi_cut = math.ceil(last - u.grid.shape[dim])
                    if self.types[dim][1] == BCType.DIRICHLET and edge_aligned:
                        hi_cut += 1
        if hi_cut > 0:
            u = self._trim(u, hi_cut, dim)
        return u, (-lo_cut, hi_cut)

    def trim_boundary(self, u: GridArray) -> GridArray:
        """Removes grid points that coincide with the boundary (plus padding)."""
        for axis in range(u.grid.ndim):
            self._is_aligned(u, axis)
            u, _ = self._trim_padding(u, axis)
        return u

    def pad_and_impose_bc(
        self,
        u: GridArray,
        offset_to_pad_to: Optional[Tuple[float, ...]] = None,
        mode: Optional[str] = None,
    ) -> GridVariable:
        """Wraps interior values into a GridVariable with correct boundaries.

        ``mode=None`` pads edge-aligned Dirichlet data with the constant
        boundary value itself (restoring the boundary point); ``MIRROR`` /
        ``EXTEND`` are alternatives for flow extension past the wall.
        """
        if offset_to_pad_to is None:
            offset_to_pad_to = u.offset
        for axis in range(u.grid.ndim):
            self._is_aligned(u, axis)
            if self.types[axis][0] == BCType.DIRICHLET and math.isclose(
                u.offset[axis], 1.0
            ):
                if math.isclose(offset_to_pad_to[axis], 1.0):
                    u = self._pad(u, 1, axis, mode=mode)
                elif math.isclose(offset_to_pad_to[axis], 0.0):
                    u = self._pad(u, -1, axis, mode=mode)
        return GridVariable(u, self)

    def impose_bc(self, u: GridArray) -> GridVariable:
        """Trims boundary-coincident points, then restores BC-consistent ones."""
        offset = u.offset
        u = self.trim_boundary(u)
        return self.pad_and_impose_bc(u, offset)


def _edge_indicator(data: Array, pad_width) -> Array:
    """1.0 at padded positions, 0.0 in the interior (same padded shape)."""
    ones = jnp.zeros(data.shape, dtype=data.dtype)
    return jnp.pad(ones, pad_width, mode="constant", constant_values=1.0)


class HomogeneousBoundaryConditions(ConstantBoundaryConditions):
    """Zero-valued constant BCs (reference boundaries.py:403)."""

    def __init__(self, types: Sequence[Tuple[str, str]]):
        ndim = len(types)
        values = ((0.0, 0.0),) * ndim
        super().__init__(types, values)


def is_bc_periodic_boundary_conditions(bc, dim: int) -> bool:
    if bc.types[dim][0] != BCType.PERIODIC:
        return False
    if bc.types[dim][0] != bc.types[dim][1]:
        raise ValueError(
            "periodic boundary conditions must be the same on both sides of the axis"
        )
    return True


def is_periodic_boundary_conditions(c: GridVariable, dim: int) -> bool:
    """Returns true if the variable has periodic bc along ``dim``."""
    return is_bc_periodic_boundary_conditions(c.bc, dim)


def periodic_boundary_conditions(ndim: int) -> ConstantBoundaryConditions:
    """Periodic homogeneous BCs for ``ndim`` spatial dimensions."""
    return HomogeneousBoundaryConditions(
        ((BCType.PERIODIC, BCType.PERIODIC),) * ndim
    )


def dirichlet_boundary_conditions(
    ndim: int,
    bc_vals: Optional[Sequence[Tuple[float, float]]] = None,
) -> ConstantBoundaryConditions:
    """Dirichlet BCs on every boundary (homogeneous if no values given)."""
    if bc_vals is None:
        return HomogeneousBoundaryConditions(
            ((BCType.DIRICHLET, BCType.DIRICHLET),) * ndim
        )
    return ConstantBoundaryConditions(
        ((BCType.DIRICHLET, BCType.DIRICHLET),) * ndim, bc_vals
    )


def neumann_boundary_conditions(
    ndim: int,
    bc_vals: Optional[Sequence[Tuple[float, float]]] = None,
) -> ConstantBoundaryConditions:
    """Neumann BCs on every boundary (homogeneous if no values given)."""
    if bc_vals is None:
        return HomogeneousBoundaryConditions(
            ((BCType.NEUMANN, BCType.NEUMANN),) * ndim
        )
    return ConstantBoundaryConditions(
        ((BCType.NEUMANN, BCType.NEUMANN),) * ndim, bc_vals
    )


def channel_flow_boundary_conditions(
    ndim: int,
    bc_vals: Optional[Sequence[Tuple[float, float]]] = None,
) -> ConstantBoundaryConditions:
    """Periodic in x, Dirichlet walls in the remaining dimensions."""
    bc_type = ((BCType.PERIODIC, BCType.PERIODIC),) + (
        (BCType.DIRICHLET, BCType.DIRICHLET),
    ) * (ndim - 1)
    if bc_vals is None:
        return HomogeneousBoundaryConditions(bc_type)
    values = ((None, None),) + tuple(bc_vals)
    return ConstantBoundaryConditions(bc_type, values)


def consistent_boundary_conditions(*arrays: GridVariable) -> Tuple[str, ...]:
    """Returns 'periodic'/'nonperiodic' per axis; raises if mixed."""
    bc_types = []
    for axis in range(arrays[0].grid.ndim):
        bcs = {is_periodic_boundary_conditions(array, axis) for array in arrays}
        if len(bcs) != 1:
            raise Exception(f"arrays do not have consistent bc: {arrays}")
        bc_types.append("periodic" if bcs.pop() else "nonperiodic")
    return tuple(bc_types)


def get_pressure_bc_from_velocity(
    v: GridVariableVector,
) -> HomogeneousBoundaryConditions:
    """Periodic velocity -> periodic pressure; walls -> zero-flux Neumann."""
    velocity_bc_types = consistent_boundary_conditions(*v)
    pressure_bc_types = []
    for bc_type in velocity_bc_types:
        if bc_type == "periodic":
            pressure_bc_types.append((BCType.PERIODIC, BCType.PERIODIC))
        else:
            pressure_bc_types.append((BCType.NEUMANN, BCType.NEUMANN))
    return HomogeneousBoundaryConditions(pressure_bc_types)


def get_pressure_bc_from_velocity_bc(
    bcs: Sequence[ConstantBoundaryConditions],
) -> HomogeneousBoundaryConditions:
    """Same as :func:`get_pressure_bc_from_velocity` but from BCs alone."""
    pressure_bc_types = []
    for velocity_bc in bcs:
        if not isinstance(velocity_bc, HomogeneousBoundaryConditions):
            raise NotImplementedError(
                "Pressure BC inference is only implemented for homogeneous "
                f"velocity BCs, got {velocity_bc}"
            )
        types = velocity_bc.types
        if types[0][0] == BCType.PERIODIC and types[1][0] == BCType.PERIODIC:
            pressure_bc_types.append((BCType.PERIODIC, BCType.PERIODIC))
        else:
            pressure_bc_types.append((BCType.NEUMANN, BCType.NEUMANN))
    return HomogeneousBoundaryConditions(pressure_bc_types)


def has_all_periodic_boundary_conditions(*arrays: GridVariable) -> bool:
    """True iff every array is periodic in every dimension."""
    for array in arrays:
        for axis in range(array.grid.ndim):
            if not is_periodic_boundary_conditions(array, axis):
                return False
    return True


def get_advection_flux_bc_from_velocity_and_scalar(
    u: GridVariable, c: GridVariable, flux_direction: int
) -> ConstantBoundaryConditions:
    """Infers the advection-flux BC of scalar ``c`` carried by velocity ``u``.

    Periodic boundaries give periodic flux; walls give homogeneous Dirichlet
    (non-porous) or homogeneous Neumann (porous constant-flux) — see
    reference boundaries.py:531-623. The flux BC is only valid for taking a
    divergence.
    """
    if not isinstance(u.bc, HomogeneousBoundaryConditions):
        raise NotImplementedError(
            "advection-flux BC inference requires homogeneous velocity BCs;"
            f" got {u.bc}"
        )

    def _side(axis: int, side: int):
        """Flux BC on one face of the flux-direction axis."""
        u_type = u.bc.types[axis][side]
        if u_type == BCType.DIRICHLET and u.bc.bc_values[axis][side] == 0.0:
            # non-porous wall: no flux through it
            return BCType.DIRICHLET, 0.0
        if (
            u_type == BCType.NEUMANN
            and c.bc.types[axis][side] == BCType.NEUMANN
        ):
            if not isinstance(c.bc, ConstantBoundaryConditions) or not (
                math.isclose(c.bc.bc_values[axis][side], 0.0)
            ):
                raise NotImplementedError(
                    "advection-flux BC inference supports only homogeneous"
                    f" Neumann scalars; got {c.bc}"
                )
            return BCType.NEUMANN, 0.0
        raise NotImplementedError(
            "no advection-flux BC rule for velocity/scalar BC pair"
            f" {(u.bc, c.bc)}"
        )

    out_types = []
    out_values = []
    for axis in range(c.grid.ndim):
        if u.bc.types[axis][0] == BCType.PERIODIC:
            out_types.append((BCType.PERIODIC, BCType.PERIODIC))
            out_values.append((None, None))
        elif flux_direction != axis:
            # Boundaries parallel to the flux direction only touch ghost
            # cells, and the divergence is taken on the interior, so
            # homogeneous Dirichlet suffices.
            out_types.append((BCType.DIRICHLET, BCType.DIRICHLET))
            out_values.append((0.0, 0.0))
        else:
            sides = [_side(axis, i) for i in range(2)]
            out_types.append(tuple(t for t, _ in sides))
            out_values.append(tuple(v for _, v in sides))
    return ConstantBoundaryConditions(out_types, out_values)
