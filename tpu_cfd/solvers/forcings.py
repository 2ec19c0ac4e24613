"""Forcing functions for the Navier-Stokes solvers.

TPU-native counterpart of the reference's ``torch_cfd/forcings.py``
(ForcingFn: forcings.py:61, KolmogorovForcing: :118, SimpleSolenoidalForcing:
:220, SinCosForcing: :305). Forcings are array-free dataclasses whose
evaluations are pure jnp functions of static grid metadata — under ``jit``
a constant forcing constant-folds into the solver step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from tpu_cfd import grids

Array = jax.Array
Grid = grids.Grid
GridArray = grids.GridArray


@dataclasses.dataclass
class ForcingFn:
    """Base class for forcing terms.

    ``vorticity=False`` forcings evaluate to a velocity-space pair (u, v);
    ``vorticity=True`` forcings evaluate to a scalar vorticity field. The
    solver adds the curl of velocity forcings in the vorticity formulation
    (reference equations.py:429-437).
    """

    grid: Grid
    scale: float = 1.0
    wave_number: int = 1
    diam: float = 1.0
    swap_xy: bool = False
    vorticity: bool = False
    offsets: Optional[Tuple[Tuple[float, ...], ...]] = None

    def __post_init__(self):
        if self.offsets is None:
            self.offsets = self.grid.cell_faces

    def velocity_eval(
        self, grid: Optional[Grid], velocity: Optional[Tuple[Array, Array]],
        dtype=jnp.float32,
    ) -> Tuple[GridArray, GridArray]:
        raise NotImplementedError

    def vorticity_eval(
        self, grid: Optional[Grid], vorticity: Optional[Array],
        dtype=jnp.float32,
    ) -> GridArray:
        raise NotImplementedError

    def __call__(
        self,
        grid: Optional[Grid] = None,
        field: Optional[Union[Tuple[Array, Array], Array]] = None,
        dtype=jnp.float32,
    ):
        """``dtype`` sets the coordinate-mesh/eval precision: fp64 solver
        runs must evaluate the forcing in fp64 — an fp32-evaluated sin/cos
        carries ~1e-8 relative rounding noise across the WHOLE spectrum,
        which the dealiasing filter never touches (it only masks advection)
        and which a 2/3-rule Galerkin truncation would drop, making the
        transform paths visibly disagree."""
        if not self.vorticity:
            return self.velocity_eval(grid, field, dtype=dtype)
        return self.vorticity_eval(grid, field, dtype=dtype)


@dataclasses.dataclass
class KolmogorovForcing(ForcingFn):
    """Sinusoidal stripe forcing u = scale*sin(k·y) (Kochkov et al. 2021).

    Counterpart of reference forcings.py:118-211.
    """

    diam: float = 2 * jnp.pi

    def __post_init__(self):
        if self.offsets is None:
            self.offsets = ((0.0, 0.0), (0.0, 0.0))

    def velocity_eval(
        self, grid: Optional[Grid], velocity=None, dtype=jnp.float32
    ) -> Tuple[GridArray, GridArray]:
        grid = self.grid if grid is None else grid
        offsets = self.offsets
        domain_factor = 2 * jnp.pi / self.diam
        if self.swap_xy:
            x = grid.mesh(offsets[1], dtype=dtype)[0]
            v = GridArray(
                self.scale * jnp.sin(self.wave_number * domain_factor * x),
                offsets[1],
                grid,
            )
            u = GridArray(jnp.zeros_like(v.data), (1, 1 / 2), grid)
        else:
            y = grid.mesh(offsets[0], dtype=dtype)[1]
            u = GridArray(
                self.scale * jnp.sin(self.wave_number * domain_factor * y),
                offsets[0],
                grid,
            )
            v = GridArray(jnp.zeros_like(u.data), (1 / 2, 1), grid)
        return (u, v)

    def vorticity_eval(
        self, grid: Optional[Grid], vorticity=None, dtype=jnp.float32
    ) -> GridArray:
        grid = self.grid if grid is None else grid
        offsets = self.offsets
        domain_factor = 2 * jnp.pi / self.diam
        if self.swap_xy:
            x = grid.mesh(offsets[1], dtype=dtype)[0]
            w = GridArray(
                -self.scale
                * self.wave_number
                * domain_factor
                * jnp.cos(self.wave_number * domain_factor * x),
                offsets[1],
                grid,
            )
        else:
            y = grid.mesh(offsets[0], dtype=dtype)[1]
            w = GridArray(
                -self.scale
                * self.wave_number
                * domain_factor
                * jnp.cos(self.wave_number * domain_factor * y),
                offsets[0],
                grid,
            )
        return w


@dataclasses.dataclass
class SimpleSolenoidalForcing(ForcingFn):
    """Template for solenoidal (divergence-free) forcings F = (ψ, -ψ).

    Counterpart of reference forcings.py:220-302.
    """

    vorticity: bool = True

    def __post_init__(self):
        if self.offsets is None:
            self.offsets = ((0.0, 0.0), (0.0, 0.0))

    @staticmethod
    def potential(x: Array, y: Array, s: float, k: float) -> Array:
        raise NotImplementedError

    @staticmethod
    def vort_potential(x: Array, y: Array, s: float, k: float) -> Array:
        raise NotImplementedError

    def velocity_eval(
        self, grid: Optional[Grid], velocity=None, dtype=jnp.float32
    ) -> Tuple[GridArray, GridArray]:
        grid = self.grid if grid is None else grid
        offsets = self.offsets
        domain_factor = 2 * jnp.pi / self.diam
        k = self.wave_number * domain_factor
        scale = 0.5 * self.scale / (2 * jnp.pi) / self.wave_number
        if self.swap_xy:
            x = grid.mesh(offsets[1], dtype=dtype)[0]
            y = grid.mesh(offsets[0], dtype=dtype)[1]
            rot = self.potential(x, y, scale, k)
            v = GridArray(rot, offsets[1], grid)
            u = GridArray(-rot, (1, 1 / 2), grid)
        else:
            x = grid.mesh(offsets[0], dtype=dtype)[0]
            y = grid.mesh(offsets[1], dtype=dtype)[1]
            rot = self.potential(x, y, scale, k)
            u = GridArray(rot, offsets[0], grid)
            v = GridArray(-rot, (1 / 2, 1), grid)
        return (u, v)

    def vorticity_eval(
        self, grid: Optional[Grid], vorticity=None, dtype=jnp.float32
    ) -> GridArray:
        grid = self.grid if grid is None else grid
        offsets = self.offsets
        domain_factor = 2 * jnp.pi / self.diam
        k = self.wave_number * domain_factor
        if self.swap_xy:
            x = grid.mesh(offsets[1], dtype=dtype)[0]
            y = grid.mesh(offsets[0], dtype=dtype)[1]
        else:
            x = grid.mesh(offsets[0], dtype=dtype)[0]
            y = grid.mesh(offsets[1], dtype=dtype)[1]
        return GridArray(
            self.vort_potential(x, y, self.scale, k), offsets[0], grid
        )


@dataclasses.dataclass
class SinCosForcing(SimpleSolenoidalForcing):
    """The FNO-paper forcing 0.1*(sin(2π(x+y)) + cos(2π(x+y))) (Li et al. 2020).

    In the vorticity formulation the forcing added to ∂ω/∂t is the curl
    (vort_potential); counterpart of reference forcings.py:305-349.
    """

    scale: float = 0.1

    @staticmethod
    def potential(x: Array, y: Array, s: float, k: float) -> Array:
        return s * (jnp.sin(k * (x + y)) - jnp.cos(k * (x + y)))

    @staticmethod
    def vort_potential(x: Array, y: Array, s: float, k: float) -> Array:
        return s * (jnp.cos(k * (x + y)) + jnp.sin(k * (x + y)))
