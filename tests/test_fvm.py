"""Tests for the FVM stack: fast diagonalization, projection, advection, NSE.

Mirrors the reference's numerical contracts: projected velocity divergence
< 1e-12 in fp64 (fno/sfno_pytest.py:129), FVM/spectral agreement on smooth
fields (SURVEY.md §7 phase 3), mass conservation of advection.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_cfd import boundaries, grids
from tpu_cfd.ops import fast_diagonalization as fdiag
from tpu_cfd.ops import finite_differences as fdm
from tpu_cfd.solvers import fvm, initial_conditions as ic, pressure


def periodic_velocity(grid, data_pair):
    bc = boundaries.periodic_boundary_conditions(grid.ndim)
    return grids.GridVariableVector(
        tuple(
            grids.GridVariable(grids.GridArray(d, o, grid), bc)
            for d, o in zip(data_pair, grid.cell_faces)
        )
    )


class TestFastDiagonalization:
    def test_poisson_solve_periodic_analytic(self):
        # solve lap(u) = f with f = -2*sin(x)*sin(y) (kappa=1) -> u = sin x sin y
        n = 64
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        x, y = grid.mesh(dtype=jnp.float64)
        u_exact = jnp.sin(x) * jnp.sin(y)
        laplacians = [
            fdm.laplacian_matrix(n, grid.step[0], dtype=jnp.float64),
            fdm.laplacian_matrix(n, grid.step[1], dtype=jnp.float64),
        ]
        # f = discrete laplacian of u (so the solve must invert it exactly)
        bc = boundaries.periodic_boundary_conditions(2)
        u_var = grids.GridVariable(grids.GridArray(u_exact, (0.5, 0.5), grid), bc)
        f = fdm.laplacian(u_var).data
        for implementation in ["rfft", "fft", "matmul"]:
            solver = fdiag.pseudoinverse_transform(
                laplacians,
                jnp.float64,
                hermitian=True,
                circulant=True,
                implementation=implementation,
            )
            u = solver(f)
            u = u - u.mean()
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(u_exact - u_exact.mean()), atol=1e-8,
                err_msg=implementation,
            )

    def test_matmul_vs_rfft_agree(self):
        n = 32
        step = 0.1
        laplacians = [
            fdm.laplacian_matrix(n, step, dtype=jnp.float64) for _ in range(2)
        ]
        rhs = jax.random.normal(jax.random.PRNGKey(0), (n, n), dtype=jnp.float64)
        rhs = rhs - rhs.mean()
        outs = {}
        for impl in ["rfft", "matmul"]:
            solver = fdiag.pseudoinverse_transform(
                laplacians, jnp.float64, hermitian=True, circulant=True,
                implementation=impl,
            )
            out = solver(rhs)
            outs[impl] = out - out.mean()
        np.testing.assert_allclose(outs["rfft"], outs["matmul"], atol=1e-8)

    def test_batched_rhs(self):
        n = 16
        laplacians = [fdm.laplacian_matrix(n, 0.1, dtype=jnp.float64)] * 2
        rhs = jax.random.normal(jax.random.PRNGKey(1), (3, n, n), dtype=jnp.float64)
        for impl in ["rfft", "matmul"]:
            solver = fdiag.pseudoinverse_transform(
                laplacians, jnp.float64, hermitian=True, circulant=True,
                implementation=impl,
            )
            batched = solver(rhs)
            single = jnp.stack([solver(rhs[i]) for i in range(3)])
            np.testing.assert_allclose(batched, single, atol=1e-10, err_msg=impl)

    def test_outer_sum(self):
        a = jnp.array([1.0, 2.0])
        b = jnp.array([10.0, 20.0, 30.0])
        out = fdiag.outer_sum([a, b])
        assert out.shape == (2, 3)
        assert float(out[1, 2]) == 32.0


class TestPressureProjection:
    @pytest.mark.parametrize("n", [64, 128])
    def test_projection_divergence_free_fp64(self, n):
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        key = jax.random.PRNGKey(42)
        keys = jax.random.split(key, 2)
        v = periodic_velocity(
            grid,
            [jax.random.normal(k, grid.shape, dtype=jnp.float64) for k in keys],
        )
        pressure_bc = boundaries.get_pressure_bc_from_velocity(v)
        proj = pressure.PressureProjection(grid, pressure_bc, dtype=jnp.float64)
        v_proj = proj(v)
        div = fdm.divergence(v_proj)
        assert float(jnp.abs(div.data).max()) < 1e-12

    def test_projection_idempotent(self):
        grid = grids.Grid((32, 32), domain=((0, 1), (0, 1)))
        v = ic.filtered_velocity_field(
            jax.random.PRNGKey(0), grid, iterations=1, dtype=jnp.float64
        )
        pressure_bc = boundaries.get_pressure_bc_from_velocity(v)
        proj = pressure.PressureProjection(grid, pressure_bc, dtype=jnp.float64)
        v1 = proj(v)
        v2 = proj(v1)
        for a, b in zip(v1, v2):
            np.testing.assert_allclose(a.data, b.data, atol=1e-12)


class TestAdvection:
    def test_advection_conserves_mean(self):
        grid = grids.Grid((32, 32), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        x, y = grid.mesh(dtype=jnp.float64)
        bc = boundaries.periodic_boundary_conditions(2)
        c = grids.GridVariable(
            grids.GridArray(jnp.exp(jnp.cos(x) + jnp.sin(y)), (0.5, 0.5), grid), bc
        )
        v = periodic_velocity(
            grid, [jnp.ones(grid.shape, jnp.float64), 0.5 * jnp.ones(grid.shape, jnp.float64)]
        )
        for advect in [fvm.advect_linear, fvm.advect_upwind]:
            dcdt = advect(c, v, dt=1e-3)
            # advection by divergence-free v conserves the total of c
            assert abs(float(dcdt.data.mean())) < 1e-12
        dcdt = fvm.advect_van_leer_using_limiters(c, v, dt=1e-3)
        assert abs(float(dcdt.data.mean())) < 1e-12

    def test_advection_translates_correct_direction(self):
        # a blob advected by u>0 moves right: d/dt c at the leading edge > 0
        grid = grids.Grid((64,) * 2, domain=((0, 2 * np.pi),) * 2)
        x, y = grid.mesh(dtype=jnp.float64)
        bc = boundaries.periodic_boundary_conditions(2)
        c = grids.GridVariable(
            grids.GridArray(jnp.exp(-((x - jnp.pi) ** 2 + (y - jnp.pi) ** 2) * 4),
                            (0.5, 0.5), grid), bc
        )
        v = periodic_velocity(
            grid, [jnp.ones(grid.shape, jnp.float64), jnp.zeros(grid.shape, jnp.float64)]
        )
        dcdt = fvm.advect_van_leer_using_limiters(c, v, dt=1e-3)
        # compare against spectral derivative: dcdt = -dc/dx
        c_hat = jnp.fft.rfft2(c.data)
        kx, ky = grid.rfft_mesh(dtype=jnp.float64)
        dcdx = jnp.fft.irfft2(2j * jnp.pi * kx * c_hat, s=grid.shape)
        # TVD limiting clips extrema (first-order there), so compare in
        # relative L2 rather than pointwise
        rel_l2 = float(
            jnp.linalg.norm(dcdt.data + dcdx) / jnp.linalg.norm(dcdx)
        )
        assert rel_l2 < 0.1, rel_l2


class TestNavierStokesFVM:
    def test_taylor_green_decay(self):
        """TG vortex: u = sin x cos y e^{-2 nu t} is an exact NSE solution."""
        nu = 1e-2
        n = 128
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        xs = grid.mesh(offset=grid.cell_faces[0], dtype=jnp.float64)
        ys = grid.mesh(offset=grid.cell_faces[1], dtype=jnp.float64)
        u0 = jnp.sin(xs[0]) * jnp.cos(xs[1])
        v0 = -jnp.cos(ys[0]) * jnp.sin(ys[1])
        v = periodic_velocity(grid, [u0, v0])

        eqn = fvm.NavierStokes2DFVMProjection(
            viscosity=nu,
            grid=grid,
            dtype=jnp.float64,
            solver=fvm.RKStepper.from_method("classic_rk4"),
        )
        dt, steps = 1e-3, 100

        @jax.jit
        def rollout(v):
            def body(u, _):
                return eqn(u, dt), None

            out, _ = jax.lax.scan(body, v, None, length=steps)
            return out

        v_final = rollout(v)
        decay = np.exp(-2 * nu * dt * steps)
        np.testing.assert_allclose(
            np.asarray(v_final[0].data), np.asarray(u0 * decay), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(v_final[1].data), np.asarray(v0 * decay), atol=2e-4
        )

    def test_step_is_jittable_and_divergence_free(self):
        grid = grids.Grid((64, 64), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        v = ic.filtered_velocity_field(
            jax.random.PRNGKey(0), grid, maximum_velocity=2.0, dtype=jnp.float64
        )
        eqn = fvm.NavierStokes2DFVMProjection(
            viscosity=1e-3, grid=grid, dtype=jnp.float64
        )
        step = jax.jit(lambda u: eqn(u, 1e-3))
        v1 = step(v)
        assert isinstance(v1, grids.GridVariableVector)
        div = fdm.divergence(v1)
        assert float(jnp.abs(div.data).max()) < 1e-12

    def test_rk_methods_agree_small_dt(self):
        grid = grids.Grid((32, 32), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        v = ic.filtered_velocity_field(
            jax.random.PRNGKey(1), grid, dtype=jnp.float64
        )
        results = []
        for method in ["forward_euler", "midpoint", "heun_rk2", "classic_rk4"]:
            eqn = fvm.NavierStokes2DFVMProjection(
                viscosity=1e-3,
                grid=grid,
                dtype=jnp.float64,
                solver=fvm.RKStepper.from_method(method),
            )
            results.append(eqn(v, 1e-4))
        for r in results[1:]:
            np.testing.assert_allclose(r[0].data, results[0][0].data, atol=1e-6)

    def test_fvm_vs_spectral_vorticity(self):
        """FVM and spectral solvers must agree on a smooth field, short time."""
        from tpu_cfd.solvers import equations

        nu = 1e-2
        n = 128
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        # smooth initial velocity
        v = ic.filtered_velocity_field(
            jax.random.PRNGKey(7), grid, maximum_velocity=1.0, peak_wavenumber=2,
            dtype=jnp.float64,
        )
        dt, steps = 5e-4, 40

        eqn = fvm.NavierStokes2DFVMProjection(
            viscosity=nu, grid=grid, dtype=jnp.float64,
            solver=fvm.RKStepper.from_method("classic_rk4"),
        )

        def body(u, _):
            return eqn(u, dt), None

        v_fvm, _ = jax.lax.scan(body, v, None, length=steps)
        w_fvm = fdm.curl_2d(v_fvm).data

        ns = equations.NavierStokes2DSpectral(
            viscosity=nu, grid=grid, dtype=jnp.float64
        )
        w0 = fdm.curl_2d(v).data
        what, _ = ns.forward(jnp.fft.rfft2(w0), dt, steps=steps)
        w_spectral = jnp.fft.irfft2(what, s=grid.shape)

        scale = float(jnp.abs(w_spectral).max())
        assert (
            float(jnp.abs(w_fvm - w_spectral).max()) / scale < 0.05
        ), "FVM and spectral vorticity fields diverged on a smooth flow"


class TestDirectVanLeer:
    def test_matches_limiter_version_on_smooth_field(self):
        grid = grids.Grid((64, 64), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        x, y = grid.mesh(dtype=jnp.float64)
        bc = boundaries.periodic_boundary_conditions(2)
        c = grids.GridVariable(
            grids.GridArray(jnp.sin(x) * jnp.cos(y), (0.5, 0.5), grid), bc
        )
        v = periodic_velocity(
            grid,
            [0.7 * jnp.ones(grid.shape, jnp.float64),
             -0.3 * jnp.ones(grid.shape, jnp.float64)],
        )
        direct = fvm.advect_van_leer(c, v, dt=1e-3)
        limited = fvm.advect_van_leer_using_limiters(c, v, dt=1e-3)
        rel = float(
            jnp.linalg.norm(direct.data - limited.data)
            / jnp.linalg.norm(limited.data)
        )
        assert rel < 0.05, rel

    def test_conserves_mean(self):
        grid = grids.Grid((32, 32), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        x, y = grid.mesh(dtype=jnp.float64)
        bc = boundaries.periodic_boundary_conditions(2)
        c = grids.GridVariable(
            grids.GridArray(jnp.exp(jnp.cos(x + y)), (0.5, 0.5), grid), bc
        )
        v = periodic_velocity(
            grid, [jnp.ones(grid.shape, jnp.float64), jnp.ones(grid.shape, jnp.float64)]
        )
        dcdt = fvm.advect_van_leer(c, v, dt=1e-3)
        assert abs(float(dcdt.data.mean())) < 1e-12
