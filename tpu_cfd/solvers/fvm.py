"""Finite-volume MAC-grid Navier-Stokes with explicit RK + pressure projection.

TPU-native counterpart of the reference's ``torch_cfd/fvm.py``
(_advect_aligned: fvm.py:40, advect_general: :89,
advect_van_leer_using_limiters: :137, convect: :147, diffuse: :151,
ProjectionExplicitODE: :166, RKStepper: :196, NavierStokes2DFVMProjection:
:334). The steppers are plain dataclasses over Butcher tableaus; stages are
unrolled at trace time so the shift/pad-heavy advection fuses into a few
elementwise XLA kernels per stage, with one FFT (or MXU matmul) pair for each
pressure solve.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from tpu_cfd import boundaries, grids
from tpu_cfd.ops import finite_differences as fdm
from tpu_cfd.ops import interpolation
from tpu_cfd.solvers import forcings as forcings_mod
from tpu_cfd.solvers import pressure

Grid = grids.Grid
GridArray = grids.GridArray
GridArrayVector = grids.GridArrayVector
GridVariable = grids.GridVariable
GridVariableVector = grids.GridVariableVector
InterpolationFn = interpolation.InterpolationFn
ForcingFn = forcings_mod.ForcingFn


def _advect_aligned(cs: GridVariableVector, v: GridVariableVector) -> GridArray:
    """Advection as -div(flux) for `cs` already aligned with faces of `v`.

    Per component i: flux_i = c_i·u_i, given the BC inferred from the
    velocity/scalar pair, then the negated divergence sums the face fluxes
    (reference fvm.py:40-86).
    """
    if len(cs) != len(v):
        raise ValueError(
            f"one interpolated scalar per velocity face required: {len(cs)}"
            f" scalars vs {len(v)} faces"
        )
    flux_parts = []
    for axis, (c, u) in enumerate(zip(cs, v)):
        bc = boundaries.get_advection_flux_bc_from_velocity_and_scalar(
            u, c, axis
        )
        flux_parts.append(bc.impose_bc(c.array * u.array))
    return -fdm.divergence(GridVariableVector(tuple(flux_parts)))


def advect_general(
    c: GridVariable,
    v: GridVariableVector,
    u_interpolation_fn: InterpolationFn,
    c_interpolation_fn: InterpolationFn,
    dt: Optional[float] = None,
) -> GridArray:
    """Advection of scalar ``c`` by ``v`` on the control volume of ``c``.

    1. interpolate each velocity component to the control-volume faces,
    2. interpolate ``c`` to the same faces,
    3. flux = c*u with inherited BC, 4. return -divergence
    (reference fvm.py:89-134).
    """
    if not boundaries.has_all_periodic_boundary_conditions(c):
        raise NotImplementedError(
            "Non-periodic boundary conditions are not implemented."
        )
    target_offsets = grids.control_volume_offsets(c)
    aligned_v = GridVariableVector(
        tuple(
            u_interpolation_fn(u, target_offset, v, dt)
            for u, target_offset in zip(v, target_offsets)
        )
    )
    aligned_c = GridVariableVector(
        tuple(
            c_interpolation_fn(c, target_offset, aligned_v, dt)
            for target_offset in target_offsets
        )
    )
    return _advect_aligned(aligned_c, aligned_v)


def advect_linear(c: GridVariable, v: GridVariableVector, dt=None) -> GridArray:
    """Advection using linear interpolation for both velocity and scalar."""
    return advect_general(c, v, interpolation.linear, interpolation.linear, dt)


def advect_upwind(c: GridVariable, v: GridVariableVector, dt=None) -> GridArray:
    """Advection using upwind interpolation of the scalar."""
    return advect_general(c, v, interpolation.linear, interpolation.upwind, dt)


def advect_van_leer_using_limiters(
    c: GridVariable, v: GridVariableVector, dt: float
) -> GridArray:
    """Van Leer advection: TVD limiter applied to Lax-Wendroff (fvm.py:137)."""
    c_interpolation_fn = interpolation.apply_tvd_limiter(
        interpolation.lax_wendroff, limiter=interpolation.van_leer_limiter
    )
    return advect_general(c, v, interpolation.linear, c_interpolation_fn, dt)


def advect_van_leer(
    c: GridVariable, v: GridVariableVector, dt: float
) -> GridArray:
    """Direct Van Leer flux-limited advection (one fused flux assembly).

    Counterpart of reference fvm.py:434-580 (marked "NOT YET IMPLEMENTED in
    Jax_CFD original" and unused there). Periodic BCs only: computes the
    upwind flux plus the Van Leer limiter correction
    ``phi = num*(sign(den)+sign(num))*den/(|den|+|num|)`` directly per face,
    then takes -div. Branchless, division-safe, differentiable.
    """
    if not boundaries.has_all_periodic_boundary_conditions(c):
        raise NotImplementedError("advect_van_leer supports periodic BCs only")
    offsets = grids.control_volume_offsets(c)
    aligned_v = tuple(
        interpolation.linear(u, offset) for u, offset in zip(v, offsets)
    )
    flux_bc = tuple(
        boundaries.get_advection_flux_bc_from_velocity_and_scalar(u, c, d)
        for d, u in enumerate(v)
    )
    fluxes = []
    for axis, (u, h) in enumerate(zip(aligned_v, c.grid.step)):
        c_center = c.data
        c_right = c.shift(+1, axis).data
        c_left = c.shift(-1, axis).data
        c_left_left = c.shift(-2, axis).data
        upwind = jnp.where(u.data > 0, u.data * c_center, u.data * c_right)

        numerator = jnp.where(
            u.data > 0, c_left - c_left_left, c_right - c_center
        )
        denominator = c_center - c_left
        safe_den = jnp.where(
            jnp.abs(denominator) > 0,
            jnp.abs(denominator) + jnp.abs(numerator),
            1.0,
        )
        phi_van_leer = (
            numerator
            * (jnp.sign(denominator) + jnp.sign(numerator))
            * denominator
            / safe_den
        )
        courant = (dt / h) * jnp.abs(u.data)
        flux_correction = 0.5 * (1 - courant) * jnp.abs(u.data) * phi_van_leer
        data = upwind + flux_correction
        fluxes.append(GridArray(data, u.offset, c.grid))
    flux = GridVariableVector(
        tuple(bc.impose_bc(f) for bc, f in zip(flux_bc, fluxes))
    )
    return -fdm.divergence(flux)


def convect(v: GridVariableVector, dt: float) -> GridArrayVector:
    """Self-advection of each velocity component (reference fvm.py:147)."""
    return GridArrayVector(
        tuple(advect_van_leer_using_limiters(u, v, dt) for u in v)
    )


def diffuse(w: GridVariable, nu: float) -> GridArray:
    """Diffusion rate nu * laplacian(w)."""
    return nu * fdm.laplacian(w)


def diffuse_velocity(v: GridVariableVector, nu: float) -> GridArrayVector:
    return GridArrayVector(tuple(diffuse(u, nu) for u in v))


def wrap_field_same_bcs(v, field_ref) -> GridVariableVector:
    return GridVariableVector(
        tuple(GridVariable(a, w.bc) for a, w in zip(v, field_ref))
    )


class ProjectionExplicitODE:
    """∂u/∂t = explicit_terms(u); u ← pressure_projection(u) (fvm.py:166)."""

    def explicit_terms(self, u: GridVariableVector, dt: float) -> GridVariableVector:
        raise NotImplementedError

    def pressure_projection(self, u: GridVariableVector) -> GridVariableVector:
        raise NotImplementedError


_METHOD_MAP: Dict[str, Dict[str, list]] = {
    "forward_euler": {"a": [], "b": [1.0]},
    "midpoint": {"a": [[1 / 2]], "b": [0, 1.0]},
    "heun_rk2": {"a": [[1.0]], "b": [1 / 2, 1 / 2]},
    "classic_rk4": {
        "a": [[1 / 2], [0.0, 1 / 2], [0.0, 0.0, 1.0]],
        "b": [1 / 6, 1 / 3, 1 / 3, 1 / 6],
    },
}


@dataclasses.dataclass
class RKStepper:
    """Explicit Runge-Kutta over a Butcher tableau, projecting between stages.

    Counterpart of reference fvm.py:196-331 (method map :207-215, stage loop
    :302-331). Stages unroll at trace time; zero coefficients are skipped so
    forward Euler traces exactly one explicit-terms + one projection.
    """

    tableau: Optional[Dict[str, list]] = None
    method: Optional[str] = None

    def __post_init__(self):
        if self.tableau is None:
            if self.method is None:
                self.method = "forward_euler"
            if self.method not in _METHOD_MAP:
                raise ValueError(f"Unknown RK method: {self.method}")
            self.tableau = _METHOD_MAP[self.method]
        a, b = self.tableau["a"], self.tableau["b"]
        if len(a) + 1 != len(b):
            raise ValueError("Inconsistent Butcher tableau: len(a) + 1 != len(b)")

    @classmethod
    def from_method(cls, method: str = "forward_euler", **kwargs) -> "RKStepper":
        return cls(method=method, **kwargs)

    def __call__(
        self, u0: GridVariableVector, dt: float, equation: ProjectionExplicitODE
    ) -> GridVariableVector:
        a = self.tableau["a"]
        b = self.tableau["b"]
        num_steps = len(b)

        u = [None] * num_steps
        k = [None] * num_steps

        u[0] = u0
        k[0] = equation.explicit_terms(u0, dt)

        for i in range(1, num_steps):
            u_star = u0
            for j in range(i):
                if a[i - 1][j] != 0:
                    u_star = u_star + dt * a[i - 1][j] * k[j]
            u[i] = equation.pressure_projection(u_star)
            k[i] = equation.explicit_terms(u[i], dt)

        u_star = u0
        for j in range(num_steps):
            if b[j] != 0:
                u_star = u_star + dt * b[j] * k[j]

        return equation.pressure_projection(u_star)


@dataclasses.dataclass
class NavierStokes2DFVMProjection(ProjectionExplicitODE):
    """Incompressible NSE, velocity-pressure MAC-grid formulation.

    Explicit terms = Van Leer convection + diffusion + forcing/ρ - drag;
    pressure projection via fast diagonalization (Chorin). Counterpart of
    reference fvm.py:334-431 ("Fast-Projection Methods for the Incompressible
    Navier-Stokes Equations", Fluids 2020, 5, 222, eqs. 16-21).
    """

    viscosity: float = 1e-3
    grid: Optional[Grid] = None
    bcs: Optional[Sequence[object]] = None
    drag: float = 0.0
    density: float = 1.0
    convect: Callable = convect
    forcing: Optional[ForcingFn] = None
    solver: Optional[RKStepper] = None
    dtype: object = jnp.float32

    def __post_init__(self):
        if self.grid is None:
            raise ValueError("grid is required")
        if self.solver is None:
            self.solver = RKStepper.from_method("heun_rk2")
        if self.bcs is None:
            self.bcs = tuple(
                boundaries.periodic_boundary_conditions(self.grid.ndim)
                for _ in range(self.grid.ndim)
            )
        self.pressure_bc = boundaries.get_pressure_bc_from_velocity_bc(self.bcs)
        self._projection = pressure.PressureProjection(
            grid=self.grid, bc=self.pressure_bc, dtype=self.dtype
        )

    def _explicit_terms(self, v: GridVariableVector, dt: float) -> GridVariableVector:
        dv_dt = self.convect(v, dt)
        dv_dt += diffuse_velocity(v, self.viscosity / self.density)
        if self.forcing is not None:
            # evaluate in the field dtype so fp64 runs get fp64 forcing
            dv_dt += GridArrayVector(tuple(
                self.forcing(self.grid, v, dtype=v[0].dtype)
            )) / self.density
        dv_dt = wrap_field_same_bcs(dv_dt, v)
        if self.drag > 0.0:
            dv_dt += -self.drag * v
        return dv_dt

    def explicit_terms(self, v: GridVariableVector, dt: float) -> GridVariableVector:
        return self._explicit_terms(v, dt)

    def pressure_projection(self, v: GridVariableVector) -> GridVariableVector:
        return self._projection(v)

    def forward(self, u: GridVariableVector, dt: float) -> GridVariableVector:
        """One RK time step with per-stage projection."""
        return self.solver(u, dt, self)

    step = forward
    __call__ = forward
