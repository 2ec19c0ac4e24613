"""Grid data model: staggered (Arakawa C / MAC) grids as JAX pytrees.

TPU-native counterpart of the reference's ``torch_cfd/grids.py`` (Grid:
grids.py:37, GridArray: :329, GridVariable: :616, vectors: :801,868,
consistency helpers: :1045-1094). Instead of ``torch.Tensor`` subclasses with
``__torch_function__`` machinery, fields here are frozen dataclasses
registered as pytrees: the raw array is the single child leaf while
``offset``/``grid``/``bc`` are static auxiliary data. That makes every field
transparently compatible with ``jit`` / ``vmap`` / ``lax.scan`` / ``pjit``
sharding with no interop shims.

Batch/extra leading dimensions: all grid axes are addressed *from the end*
(grid dim ``d`` maps to array axis ``d - grid.ndim``), so arrays may carry
arbitrary leading batch dimensions, and ``vmap`` over the data leaf works
unchanged.
"""

from __future__ import annotations

import dataclasses
import math
import numbers
import operator
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
# Scalars and raw arrays that GridArray arithmetic broadcasts against.
_HANDLED_TYPES = (numbers.Number, np.ndarray, jax.Array)


@dataclasses.dataclass(init=False, frozen=True)
class Grid:
    """Describes the size, cell width and physical extent of an Arakawa C-grid.

    Along each dimension ``i``:
      - ``shape[i]`` is the number of grid cells,
      - ``step[i]`` is the width of each cell,
      - ``domain[i] = (lower, upper)`` are the physical boundary locations,
        with ``upper - lower == step[i] * shape[i]``.

    ``Grid`` is hashable and contains no arrays, so it can be closed over by
    jitted functions or carried as static pytree aux data; meshes and FFT
    meshes are materialized on demand (and constant-folded by XLA when used
    inside ``jit``).

    Mirrors reference behavior of torch_cfd/grids.py:37-216.
    """

    shape: Tuple[int, ...]
    step: Tuple[float, ...]
    domain: Tuple[Tuple[float, float], ...]

    def __init__(
        self,
        shape: Sequence[int],
        step: Optional[Union[float, Sequence[float]]] = None,
        domain: Optional[Union[float, Sequence[Tuple[float, float]]]] = None,
    ):
        shape = tuple(operator.index(s) for s in shape)
        object.__setattr__(self, "shape", shape)

        if step is not None and domain is not None:
            raise TypeError("cannot provide both step and domain")
        elif domain is not None:
            if isinstance(domain, (int, float)):
                domain = ((0.0, float(domain)),) * len(shape)
            else:
                if len(domain) != len(shape):
                    raise ValueError(
                        "length of domain does not match ndim: "
                        f"{len(domain)} != {len(shape)}"
                    )
                for bounds in domain:
                    if len(bounds) != 2:
                        raise ValueError(
                            f"domain is not sequence of pairs of numbers: {domain}"
                        )
            domain = tuple((float(lo), float(hi)) for lo, hi in domain)
        else:
            if step is None:
                step = 1.0
            if isinstance(step, numbers.Number):
                step = (float(step),) * len(shape)
            elif len(step) != len(shape):
                raise ValueError(
                    f"length of step does not match ndim: {len(step)} != {len(shape)}"
                )
            domain = tuple((0.0, float(s * n)) for s, n in zip(step, shape))

        object.__setattr__(self, "domain", domain)
        step = tuple((hi - lo) / n for (lo, hi), n in zip(domain, shape))
        object.__setattr__(self, "step", step)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def cell_center(self) -> Tuple[float, ...]:
        """Offset at the center of each grid cell."""
        return self.ndim * (0.5,)

    @property
    def cell_faces(self) -> Tuple[Tuple[float, ...], ...]:
        """Offsets at each of the 'forward' cell faces (MAC staggering)."""
        d = self.ndim
        return tuple(
            tuple(1.0 if i == j else 0.5 for j in range(d)) for i in range(d)
        )

    def stagger(self, v: Sequence[Array]) -> Tuple["GridArray", ...]:
        """Places velocity components of ``v`` on this grid's cell faces."""
        return tuple(
            GridArray(u, o, self) for u, o in zip(v, self.cell_faces)
        )

    def center(self, v: Any) -> Any:
        """Places all array leaves of pytree ``v`` at the cell centers."""
        offset = self.cell_center
        return jax.tree_util.tree_map(lambda u: GridArray(u, offset, self), v)

    def axes(
        self, offset: Optional[Sequence[float]] = None, dtype=jnp.float32
    ) -> Tuple[Array, ...]:
        """1-D coordinate arrays per dimension, shifted by ``offset * step``."""
        if offset is None:
            offset = self.cell_center
        if len(offset) != self.ndim:
            raise ValueError(f"unexpected offset length: {len(offset)} vs {self.ndim}")
        return tuple(
            lo + (jnp.arange(n, dtype=dtype) + float(o)) * s
            for (lo, _), o, n, s in zip(self.domain, offset, self.shape, self.step)
        )

    def fft_axes(self, dtype=jnp.float32) -> Tuple[Array, ...]:
        """Ordinal FFT frequencies per axis (multiply by 2π for angular)."""
        return tuple(
            jnp.fft.fftfreq(n, d=s).astype(dtype)
            for n, s in zip(self.shape, self.step)
        )

    def mesh(
        self, offset: Optional[Sequence[float]] = None, dtype=jnp.float32
    ) -> Tuple[Array, ...]:
        """N-D coordinate meshes, each of shape ``self.shape``."""
        axes = self.axes(offset, dtype=dtype)
        return tuple(jnp.meshgrid(*axes, indexing="ij"))

    def fft_mesh(self, dtype=jnp.float32) -> Tuple[Array, ...]:
        """Full-spectrum ordinal frequency meshes."""
        fft_axes = self.fft_axes(dtype=dtype)
        return tuple(jnp.meshgrid(*fft_axes, indexing="ij"))

    def rfft_mesh(self, dtype=jnp.float32) -> Tuple[Array, ...]:
        """Half-spectrum (rfft along the last axis) frequency meshes."""
        mesh = self.fft_mesh(dtype=dtype)
        k_max = self.shape[-1] // 2
        return tuple(m[..., : k_max + 1] for m in mesh)

    def eval_on_mesh(
        self,
        fn: Callable[..., Array],
        offset: Optional[Sequence[float]] = None,
        dtype=jnp.float32,
    ) -> "GridArray":
        """Evaluates ``fn(x, y, ...)`` on the mesh at ``offset``."""
        if offset is None:
            offset = self.cell_center
        return GridArray(fn(*self.mesh(offset, dtype=dtype)), tuple(offset), self)


def _normalize_offset(offset: Sequence[float]) -> Tuple[float, ...]:
    return tuple(float(o) for o in offset)


class GridArrayMixin:
    """Arithmetic mixin for GridArray: offsets/grids must match for binary ops.

    Mirrors the operator semantics of torch_cfd/grids.py:221-325 without any
    tensor-subclass machinery.
    """

    def _binary_op(self, other, op, reflexive=False):
        if isinstance(other, GridVariable):
            return NotImplemented
        if isinstance(other, GridArray):
            if tuple(self.offset) != tuple(other.offset):
                raise ValueError(
                    f"offsets do not match: {self.offset} vs {other.offset}"
                )
            if self.grid != other.grid:
                raise ValueError("grids do not match")
            data = op(other.data, self.data) if reflexive else op(self.data, other.data)
            return GridArray(data, self.offset, self.grid)
        if isinstance(other, _HANDLED_TYPES):
            data = op(other, self.data) if reflexive else op(self.data, other)
            return GridArray(data, self.offset, self.grid)
        return NotImplemented

    def __add__(self, other):
        return self._binary_op(other, operator.add)

    def __radd__(self, other):
        return self._binary_op(other, operator.add, reflexive=True)

    def __sub__(self, other):
        return self._binary_op(other, operator.sub)

    def __rsub__(self, other):
        return self._binary_op(other, operator.sub, reflexive=True)

    def __mul__(self, other):
        return self._binary_op(other, operator.mul)

    def __rmul__(self, other):
        return self._binary_op(other, operator.mul, reflexive=True)

    def __truediv__(self, other):
        return self._binary_op(other, operator.truediv)

    def __rtruediv__(self, other):
        return self._binary_op(other, operator.truediv, reflexive=True)

    def __pow__(self, other):
        return self._binary_op(other, operator.pow)

    def __neg__(self):
        return GridArray(-self.data, self.offset, self.grid)

    def __abs__(self):
        return GridArray(jnp.abs(self.data), self.offset, self.grid)

    def __eq__(self, other):
        if isinstance(other, type(self)):
            return (
                self.offset == other.offset
                and self.grid == other.grid
                and self.data.shape == other.data.shape
                and bool(jnp.all(self.data == other.data))
            )
        return NotImplemented

    def __hash__(self):
        return id(self)


@dataclasses.dataclass(frozen=True)
class GridArray(GridArrayMixin):
    """An array of values defined at a fixed offset on a grid.

    Pytree: ``data`` is the child; ``(offset, grid)`` are static aux data.
    Counterpart of torch_cfd/grids.py:329 (which subclasses torch.Tensor).
    """

    data: Array
    offset: Tuple[float, ...]
    grid: Grid

    def __post_init__(self):
        object.__setattr__(self, "offset", _normalize_offset(self.offset))

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    @property
    def ndim(self) -> int:
        return self.data.ndim

    def astype(self, dtype) -> "GridArray":
        return GridArray(self.data.astype(dtype), self.offset, self.grid)

    def tree_flatten(self):
        return (self.data,), (self.offset, self.grid)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (data,) = children
        offset, grid = aux
        # bypass __post_init__ normalization cost on the hot path
        obj = object.__new__(cls)
        object.__setattr__(obj, "data", data)
        object.__setattr__(obj, "offset", offset)
        object.__setattr__(obj, "grid", grid)
        return obj


jax.tree_util.register_pytree_node(
    GridArray, GridArray.tree_flatten, GridArray.tree_unflatten
)


class GridVariableMixin:
    """Arithmetic for GridVariable: offsets, grids AND bcs must match."""

    def _binary_op(self, other, op, reflexive=False):
        if isinstance(other, GridVariable):
            if tuple(self.offset) != tuple(other.offset):
                raise ValueError(
                    f"offsets do not match: {self.offset} vs {other.offset}"
                )
            if self.grid != other.grid:
                raise ValueError("grids do not match")
            if self.bc != other.bc:
                raise ValueError(
                    f"boundary conditions do not match: {self.bc} vs {other.bc}"
                )
            data = op(other.data, self.data) if reflexive else op(self.data, other.data)
            return GridVariable(GridArray(data, self.offset, self.grid), self.bc)
        if isinstance(other, _HANDLED_TYPES):
            data = op(other, self.data) if reflexive else op(self.data, other)
            return GridVariable(GridArray(data, self.offset, self.grid), self.bc)
        return NotImplemented

    __add__ = lambda self, o: self._binary_op(o, operator.add)
    __radd__ = lambda self, o: self._binary_op(o, operator.add, True)
    __sub__ = lambda self, o: self._binary_op(o, operator.sub)
    __rsub__ = lambda self, o: self._binary_op(o, operator.sub, True)
    __mul__ = lambda self, o: self._binary_op(o, operator.mul)
    __rmul__ = lambda self, o: self._binary_op(o, operator.mul, True)
    __truediv__ = lambda self, o: self._binary_op(o, operator.truediv)
    __rtruediv__ = lambda self, o: self._binary_op(o, operator.truediv, True)
    __pow__ = lambda self, o: self._binary_op(o, operator.pow)

    def __neg__(self):
        return GridVariable(
            GridArray(-self.data, self.offset, self.grid), self.bc
        )

    def __abs__(self):
        return GridVariable(
            GridArray(jnp.abs(self.data), self.offset, self.grid), self.bc
        )

    def __eq__(self, other):
        if isinstance(other, type(self)):
            return (
                self.offset == other.offset
                and self.grid == other.grid
                and self.bc == other.bc
                and self.data.shape == other.data.shape
                and bool(jnp.all(self.data == other.data))
            )
        return NotImplemented

    def __hash__(self):
        return id(self)


@dataclasses.dataclass(frozen=True)
class GridVariable(GridVariableMixin):
    """A ``GridArray`` plus the boundary conditions that complete the field.

    Pytree: the wrapped ``GridArray`` is the child; ``bc`` is static aux data.
    Counterpart of torch_cfd/grids.py:616. BC-aware ``shift`` (grids.py:702)
    delegates to ``bc.shift``.
    """

    array: GridArray
    bc: Any  # BoundaryConditions; Any to avoid circular import

    def __post_init__(self):
        if not isinstance(self.array, GridArray):
            raise ValueError(
                f"Expected array type to be GridArray, got {type(self.array)}"
            )
        if len(self.bc.types) != self.grid.ndim:
            raise ValueError(
                "Incompatible dimension between grid and bc, grid dimension = "
                f"{self.grid.ndim}, bc dimension = {len(self.bc.types)}"
            )

    @property
    def data(self) -> Array:
        return self.array.data

    @property
    def offset(self) -> Tuple[float, ...]:
        return self.array.offset

    @property
    def grid(self) -> Grid:
        return self.array.grid

    @property
    def dtype(self):
        return self.array.dtype

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.array.shape

    def astype(self, dtype) -> "GridVariable":
        return GridVariable(self.array.astype(dtype), self.bc)

    def shift(self, offset: int, dim: int) -> GridArray:
        """Shift this variable by ``offset`` cells along grid dim ``dim``.

        The returned array is padded with values from ``self.bc`` (ghost
        cells), then trimmed so the shape is unchanged.
        """
        return self.bc.shift(self.array, offset, dim)

    def _interior_grid(self) -> Grid:
        """Returns a grid with domain restricted to the variable interior."""
        grid = self.grid
        domain = list(grid.domain)
        shape = list(grid.shape)
        for axis in range(grid.ndim):
            if self.bc.types[axis][1] == "periodic":
                continue
            if math.isclose(self.offset[axis], 1.0):
                shape[axis] -= 1
                domain[axis] = (domain[axis][0], domain[axis][1] - grid.step[axis])
        return Grid(shape, domain=tuple(domain))

    def _interior_array(self) -> Array:
        """Returns the data values of the interior points."""
        data = self.data
        for axis in range(self.grid.ndim):
            if self.bc.types[axis][1] == "periodic":
                continue
            if math.isclose(self.offset[axis], 1.0):
                data_axis = axis - self.grid.ndim  # count from the end
                idx = [slice(None)] * data.ndim
                idx[data_axis] = slice(0, -1)
                data = data[tuple(idx)]
        return data

    def interior(self) -> GridArray:
        """GridArray of interior values (drops upper boundary-aligned points)."""
        return GridArray(self._interior_array(), self.offset, self._interior_grid())

    def enforce_edge_bc(self, *args) -> "GridVariable":
        """Overwrites boundary-aligned points with the Dirichlet BC values."""
        if self.grid.shape != self.data.shape[-self.grid.ndim:]:
            raise ValueError("Stored array and grid have mismatched shapes.")
        data = self.data
        for axis in range(self.grid.ndim):
            if "periodic" not in self.bc.types[axis]:
                values = self.bc.values(axis, self.grid, *args)
                for boundary_side, value in enumerate(values):
                    if value is None:
                        continue
                    if math.isclose(self.offset[axis] % 1, 0):
                        data_axis = axis - self.grid.ndim + data.ndim
                        all_slice = [slice(None)] * data.ndim
                        all_slice[data_axis] = -boundary_side  # 0 or -1
                        data = data.at[tuple(all_slice)].set(value)
        return GridVariable(GridArray(data, self.offset, self.grid), self.bc)

    def tree_flatten(self):
        return (self.array,), (self.bc,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (array,) = children
        (bc,) = aux
        obj = object.__new__(cls)
        object.__setattr__(obj, "array", array)
        object.__setattr__(obj, "bc", bc)
        return obj


jax.tree_util.register_pytree_node(
    GridVariable, GridVariable.tree_flatten, GridVariable.tree_unflatten
)


class GridArrayVector(tuple):
    """A tuple of ``GridArray``\\s with elementwise vector arithmetic.

    Counterpart of torch_cfd/grids.py:801-864.
    """

    def __new__(cls, arrays):
        arrays = tuple(arrays)
        if not all(isinstance(a, GridArray) for a in arrays):
            raise TypeError(
                f"GridArrayVector members must be GridArray, got "
                f"{[type(a) for a in arrays]}"
            )
        return super().__new__(cls, arrays)

    def __add__(self, other):
        if isinstance(other, (GridArrayVector, tuple)):
            if len(self) != len(other):
                raise ValueError("vector lengths do not match")
            return GridArrayVector(a + b for a, b in zip(self, other))
        return GridArrayVector(a + other for a in self)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, (GridArrayVector, tuple)):
            if len(self) != len(other):
                raise ValueError("vector lengths do not match")
            return GridArrayVector(a - b for a, b in zip(self, other))
        return GridArrayVector(a - other for a in self)

    def __rsub__(self, other):
        if isinstance(other, (GridArrayVector, tuple)):
            return GridArrayVector(b - a for a, b in zip(self, other))
        return GridArrayVector(other - a for a in self)

    def __mul__(self, other):
        if isinstance(other, (GridArrayVector, tuple)):
            return GridArrayVector(a * b for a, b in zip(self, other))
        return GridArrayVector(a * other for a in self)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, (GridArrayVector, tuple)):
            return GridArrayVector(a / b for a, b in zip(self, other))
        return GridArrayVector(a / other for a in self)

    def __neg__(self):
        return GridArrayVector(-a for a in self)

    @property
    def dtype(self):
        return self[0].dtype


class GridVariableVector(tuple):
    """A tuple of ``GridVariable``\\s with elementwise vector arithmetic.

    Counterpart of torch_cfd/grids.py:868-926.
    """

    def __new__(cls, variables):
        variables = tuple(variables)
        if not all(isinstance(v, GridVariable) for v in variables):
            raise TypeError(
                f"GridVariableVector members must be GridVariable, got "
                f"{[type(v) for v in variables]}"
            )
        return super().__new__(cls, variables)

    def __add__(self, other):
        if isinstance(other, (GridVariableVector, tuple)):
            if len(self) != len(other):
                raise ValueError("vector lengths do not match")
            return GridVariableVector(a + b for a, b in zip(self, other))
        return GridVariableVector(a + other for a in self)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, (GridVariableVector, tuple)):
            if len(self) != len(other):
                raise ValueError("vector lengths do not match")
            return GridVariableVector(a - b for a, b in zip(self, other))
        return GridVariableVector(a - other for a in self)

    def __rsub__(self, other):
        if isinstance(other, (GridVariableVector, tuple)):
            return GridVariableVector(b - a for a, b in zip(self, other))
        return GridVariableVector(other - a for a in self)

    def __mul__(self, other):
        if isinstance(other, (GridVariableVector, tuple)):
            return GridVariableVector(a * b for a, b in zip(self, other))
        return GridVariableVector(a * other for a in self)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, (GridVariableVector, tuple)):
            return GridVariableVector(a / b for a, b in zip(self, other))
        return GridVariableVector(a / other for a in self)

    def __neg__(self):
        return GridVariableVector(-a for a in self)

    @property
    def arrays(self) -> GridArrayVector:
        return GridArrayVector(v.array for v in self)

    @property
    def dtype(self):
        return self[0].dtype


def _register_tuple_subclass(cls):
    jax.tree_util.register_pytree_node(
        cls,
        lambda v: (tuple(v), None),
        lambda _, children: cls(children),
    )


_register_tuple_subclass(GridArrayVector)
_register_tuple_subclass(GridVariableVector)


# Rank-2 field of GridArrays (e.g. velocity gradient tensor, strain rate).
# Like jax-cfd, represented as a numpy object array so indexing/transpose work.
class GridArrayTensor(np.ndarray):
    """An ndarray of GridArrays (counterpart of torch_cfd/grids.py:975)."""

    def __new__(cls, arrays):
        return np.asarray(arrays, dtype=object).view(cls)


def applied(func: Callable) -> Callable:
    """Lifts a jnp function to act on GridArrays, preserving offsets/grid.

    Counterpart of torch_cfd/grids.py:929-972. All GridArray args must have
    consistent offsets and grids.
    """

    def wrapper(*args, **kwargs):
        offset = consistent_offset_arrays(
            *[a for a in args if isinstance(a, GridArray)],
            *[v for v in kwargs.values() if isinstance(v, GridArray)],
        )
        grid = consistent_grid_arrays(
            *[a for a in args if isinstance(a, GridArray)],
            *[v for v in kwargs.values() if isinstance(v, GridArray)],
        )
        raw_args = [a.data if isinstance(a, GridArray) else a for a in args]
        raw_kwargs = {
            k: (v.data if isinstance(v, GridArray) else v) for k, v in kwargs.items()
        }
        data = func(*raw_args, **raw_kwargs)
        return GridArray(data, offset, grid)

    return wrapper


def where(
    condition: Union[GridArray, Array],
    x: Union[GridArray, Array, float],
    y: Union[GridArray, Array, float],
) -> GridArray:
    """``jnp.where`` over GridArrays (torch_cfd/grids.py:1003)."""
    return applied(jnp.where)(condition, x, y)


def averaged_offset(*offsets: Sequence[float]) -> Tuple[float, ...]:
    """Returns the averaged offset of the given offsets."""
    n = len(offsets)
    return tuple(sum(o) / n for o in zip(*offsets))


def averaged_offset_arrays(*arrays: Union[GridArray, GridVariable]) -> Tuple[float, ...]:
    """Returns the averaged offset of the given arrays."""
    return averaged_offset(*[a.offset for a in arrays])


def control_volume_offsets(c: Union[GridArray, GridVariable]) -> Tuple[Tuple[float, ...], ...]:
    """Offsets of the faces of the control volume centered on ``c``."""
    return tuple(
        tuple(o + 0.5 if i == j else o for i, o in enumerate(c.offset))
        for j in range(len(c.offset))
    )


def consistent_offset_arrays(*arrays: Any) -> Tuple[float, ...]:
    """Returns the single unique offset, raising if inconsistent."""
    offsets = {tuple(a.offset) for a in arrays}
    if len(offsets) != 1:
        raise ValueError(f"arrays do not have a unique offset: {offsets}")
    return offsets.pop()


def consistent_grid(grid: Grid, *arrays: Any):
    """Checks all arrays have the given grid; returns the arrays."""
    grids_ = {a.grid for a in arrays}
    if grids_ != {grid}:
        raise ValueError(
            f"arrays' grids {grids_} are not consistent with the grid {grid}"
        )
    return arrays


def consistent_grid_arrays(*arrays: Any) -> Grid:
    """Returns the single unique grid, raising if inconsistent."""
    grids_ = {a.grid for a in arrays}
    if len(grids_) != 1:
        raise ValueError(f"arrays do not have a unique grid: {grids_}")
    return grids_.pop()
