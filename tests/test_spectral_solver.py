"""Tests for spectral ops, the pseudo-spectral NS solver, and trajectories.

Correctness contracts from the reference (SURVEY.md §4): quantitative
tolerances (analytic Taylor-Green decay, div-free stream-function velocity),
physics checks (enstrophy decay, inverse-cascade spectrum shape), and
jit/vmap/scan compatibility.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_cfd import grids
from tpu_cfd.ops import spectral
from tpu_cfd.solvers import equations, forcings, initial_conditions as ic
from tpu_cfd.solvers import trajectories


def make_grid(n=64, diam=2 * np.pi):
    return grids.Grid((n, n), domain=((0, diam), (0, diam)))


class TestSpectralOps:
    def test_spectral_grad_of_sin(self):
        grid = make_grid(64)
        x, y = grid.mesh(dtype=jnp.float64)
        u = jnp.sin(x)
        u_hat = jnp.fft.rfft2(u)
        kx, ky = grid.rfft_mesh(dtype=jnp.float64)
        ux_hat, uy_hat = spectral.spectral_grad_2d(u_hat, (kx, ky))
        ux = jnp.fft.irfft2(ux_hat, s=grid.shape)
        np.testing.assert_allclose(ux, jnp.cos(x), atol=1e-10)
        uy = jnp.fft.irfft2(uy_hat, s=grid.shape)
        np.testing.assert_allclose(uy, 0.0, atol=1e-10)

    def test_vorticity_to_velocity_consistency(self):
        # velocity from streamfunction must reproduce the vorticity via curl
        grid = make_grid(64)
        key = jax.random.PRNGKey(0)
        w = ic.vorticity_field(key, grid, peak_wavenumber=4, dtype=jnp.float64)
        w_hat = jnp.fft.rfft2(w.data)
        (u_hat, v_hat), psi_hat = spectral.vorticity_to_velocity(grid, w_hat)
        kx, ky = grid.rfft_mesh(dtype=jnp.float64)
        # divergence-free
        div_hat = spectral.spectral_div_2d((u_hat, v_hat), (kx, ky))
        div = jnp.fft.irfft2(div_hat, s=grid.shape)
        assert float(jnp.abs(div).max()) < 1e-10
        # curl reproduces vorticity
        curl_hat = spectral.spectral_curl_2d((u_hat, v_hat), (kx, ky))
        curl = jnp.fft.irfft2(curl_hat, s=grid.shape)
        np.testing.assert_allclose(curl, w.data, atol=1e-8)

    def test_brick_wall_filter(self):
        grid = make_grid(12)
        filt = spectral.brick_wall_filter_2d(grid)
        assert filt.shape == (12, 7)
        assert filt[0, 0] == 1
        # high modes are zeroed
        assert filt[6, 0] == 0
        assert filt[0, 6] == 0


class TestNavierStokesSpectral:
    def test_taylor_green_decay_analytic(self):
        """Taylor-Green vorticity decays exactly as exp(-2 nu t) (kappa=1)."""
        nu = 1e-2
        grid = make_grid(64)
        x, y = grid.mesh(dtype=jnp.float64)
        w0 = 2 * jnp.sin(x) * jnp.sin(y)
        ns = equations.NavierStokes2DSpectral(
            viscosity=nu, grid=grid, dtype=jnp.float64
        )
        dt, steps = 1e-3, 200
        what, _ = ns.forward(jnp.fft.rfft2(w0), dt, steps=steps)
        w = jnp.fft.irfft2(what, s=grid.shape)
        expected = w0 * np.exp(-2 * nu * dt * steps)
        np.testing.assert_allclose(w, expected, atol=2e-6)

    def test_enstrophy_decay_unforced(self):
        grid = make_grid(64)
        key = jax.random.PRNGKey(1)
        w0 = ic.vorticity_field(key, grid, peak_wavenumber=4).data
        ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
        what, _ = ns.forward(jnp.fft.rfft2(w0), 1e-3, steps=100)
        w = jnp.fft.irfft2(what, s=grid.shape)
        assert bool(jnp.isfinite(w).all())
        assert float((w**2).mean()) < float((w0**2).mean())

    def test_kolmogorov_forcing_injects_energy(self):
        grid = make_grid(64)
        forcing = forcings.KolmogorovForcing(
            grid=grid, scale=1.0, wave_number=2, vorticity=False
        )
        ns = equations.NavierStokes2DSpectral(
            viscosity=1e-2, grid=grid, drag=0.1, forcing_fn=forcing
        )
        w0 = jnp.zeros(grid.shape)
        what, _ = ns.forward(jnp.fft.rfft2(w0), 1e-2, steps=50)
        w = jnp.fft.irfft2(what, s=grid.shape)
        assert float((w**2).mean()) > 1e-4  # forcing spun up the flow

    def test_imex_orders_agree(self):
        grid = make_grid(32)
        key = jax.random.PRNGKey(2)
        w0 = ic.vorticity_field(key, grid, peak_wavenumber=3, dtype=jnp.float64).data
        what0 = jnp.fft.rfft2(w0)
        results = []
        for solver in [
            equations.IMEXStepper(order=1),
            equations.IMEXStepper(order=1.5),
            equations.IMEXStepper(order=2),
            equations.RK4CrankNicolsonStepper(),
            equations.RK4CrankNicolsonStepper(low_storage=False),
        ]:
            ns = equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, solver=solver, dtype=jnp.float64
            )
            what, _ = ns.forward(what0, 1e-4, steps=50)
            results.append(jnp.fft.irfft2(what, s=grid.shape))
        for r in results[1:]:
            np.testing.assert_allclose(r, results[0], atol=1e-4)

    def test_vmap_matches_loop(self):
        grid = make_grid(32)
        keys = jax.random.split(jax.random.PRNGKey(3), 3)
        w0 = jnp.stack([ic.vorticity_field(k, grid, 3).data for k in keys])
        ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
        step = functools.partial(ns.forward, dt=1e-3, steps=10)
        batched, _ = step(jnp.fft.rfft2(w0))
        single = jnp.stack([step(jnp.fft.rfft2(w0[i]))[0] for i in range(3)])
        np.testing.assert_allclose(batched, single, rtol=2e-5, atol=1e-6)

    def test_stable_time_step(self):
        dt = equations.stable_time_step(dx=0.1, max_velocity=2.0)
        assert dt == pytest.approx(0.025)


class TestTrajectories:
    def test_get_trajectory_imex_shapes(self):
        grid = make_grid(32)
        ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
        w0 = ic.vorticity_field(jax.random.PRNGKey(0), grid, 3).data
        result = trajectories.get_trajectory_imex(
            ns, jnp.fft.rfft2(w0), dt=1e-3, num_steps=40, record_every_steps=10
        )
        assert set(result) == {"vorticity", "stream", "vort_t", "residual"}
        for v in result.values():
            assert v.shape == (4, 32, 17)
            assert bool(jnp.isfinite(v.real).all())

    def test_trajectory_batched(self):
        grid = make_grid(32)
        ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
        keys = jax.random.split(jax.random.PRNGKey(1), 2)
        w0 = jnp.stack([ic.vorticity_field(k, grid, 3).data for k in keys])
        result = trajectories.get_trajectory_imex(
            ns, jnp.fft.rfft2(w0), dt=1e-3, num_steps=20, record_every_steps=10
        )
        assert result["vorticity"].shape == (2, 2, 32, 17)

    def test_imex_crank_nicolson_step_residual_small(self):
        # the CN residual of its own update should be O(dt) small
        grid = make_grid(64)
        w0 = ic.vorticity_field(
            jax.random.PRNGKey(2), grid, 4, dtype=jnp.float64
        ).data
        f = jnp.zeros_like(w0)
        w_h = jnp.fft.rfft2(w0)
        f_h = jnp.fft.rfft2(f)
        mesh = trajectories.default_rfft_mesh(64, 2 * np.pi, dtype=jnp.float64)
        w_next, dwdt, _, psi, res = trajectories.imex_crank_nicolson_step(
            w_h, f_h, visc=1e-3, delta_t=1e-4, rfftmesh=mesh, dealias=True
        )
        n = 64
        res_norm = float(
            jnp.linalg.norm(jnp.fft.irfft2(res, s=(n, n)), axis=(-2, -1)).mean() / n
        )
        assert res_norm < 1e-2

    def test_legacy_cn_rollout(self):
        n = 32
        grid = grids.Grid((n, n), domain=((0, 1), (0, 1)))
        w0 = ic.vorticity_field(jax.random.PRNGKey(3), grid, 3).data
        f = 0.1 * jnp.ones((n, n))
        out = trajectories.get_trajectory_imex_crank_nicolson(
            w0, f, visc=1e-3, T=0.1, delta_t=1e-3, record_steps=10, diam=1.0
        )
        assert out["vorticity"].shape == (10, n, n)
        assert bool(jnp.isfinite(out["vorticity"]).all())

    def test_backdiff(self):
        x = jnp.arange(10.0) ** 2
        # BDF1 of t^2 at t=9: x[9]-x[8] = 81-64 = 17
        assert float(trajectories.backdiff(x, order=1)) == pytest.approx(17.0)


class TestChunkedTrajectory:
    @pytest.mark.slow
    def test_chunked_equals_single_program(self):
        """Chunked rollout reproduces get_trajectory_imex exactly."""
        n, batch = 32, 2
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        ns = equations.NavierStokes2DSpectral(
            viscosity=1e-3, grid=grid, dtype=jnp.float64
        )
        w0 = jax.random.normal(jax.random.PRNGKey(3), (batch, n, n), jnp.float64)
        what = jnp.fft.rfft2(w0)
        ref = trajectories.get_trajectory_imex(
            ns, what, 1e-3, num_steps=20, record_every_steps=4
        )
        for rpc in (1, 2, 5):
            out, w_final = trajectories.get_trajectory_imex_chunked(
                ns, what, 1e-3, num_steps=20, record_every_steps=4,
                records_per_chunk=rpc,
            )
            assert set(out) == set(ref)
            for k in ref:
                np.testing.assert_allclose(out[k], np.asarray(ref[k]),
                                           rtol=1e-9, atol=1e-9)

    def test_chunked_postprocess_and_fields(self):
        n = 32
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
        w0 = jax.random.normal(jax.random.PRNGKey(4), (2, n, n), jnp.float32)
        post = lambda recs: {
            k: jnp.fft.irfft2(v, s=(n, n)) for k, v in recs.items()
        }
        out, _ = trajectories.get_trajectory_imex_chunked(
            ns, jnp.fft.rfft2(w0), 1e-3, num_steps=12, record_every_steps=3,
            fields=("vorticity",), records_per_chunk=2, postprocess=post,
        )
        assert list(out) == ["vorticity"]
        assert out["vorticity"].shape == (2, 4, n, n)
        assert np.isfinite(out["vorticity"]).all()


class TestLearnableStepperCoeffs:
    def test_gradients_flow_through_coefficients(self):
        """Trainable alpha/beta (reference equations.py:161-172 parity)."""
        n = 16
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        ns = equations.NavierStokes2DSpectral(viscosity=1e-2, grid=grid)
        stepper = equations.IMEXStepper(order=2)
        w0 = jax.random.normal(jax.random.PRNGKey(5), (n, n), jnp.float32)
        what = jnp.fft.rfft2(w0)

        def loss(coeffs):
            out = stepper.with_coeffs(coeffs)(what, 1e-2, ns)
            return (jnp.abs(out) ** 2).mean()

        coeffs = stepper.init_coeffs()
        g = jax.jit(jax.grad(loss))(coeffs)
        assert float(jnp.abs(g["alpha"])) > 0
        assert float(jnp.abs(g["beta"])) > 0
        # and the default coefficients reproduce the plain stepper
        np.testing.assert_allclose(
            stepper.with_coeffs(coeffs)(what, 1e-2, ns),
            stepper(what, 1e-2, ns),
        )


class TestDFTMatmulSolverPath:
    """fft_impl="dft" (ops/dft2d.py MXU matmuls) must reproduce the jnp.fft
    path — the solver's TPU production path is chosen by benchmark, so both
    must stay numerically interchangeable."""

    def test_dft2d_matches_jnp_fft(self):
        from tpu_cfd.ops import dft2d

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 32, 32))
        np.testing.assert_allclose(
            np.asarray(dft2d.rfft2_matmul(jnp.asarray(x))),
            np.fft.rfft2(x), rtol=1e-10, atol=1e-10,
        )
        X = np.fft.rfft2(x)
        np.testing.assert_allclose(
            np.asarray(dft2d.irfft2_matmul(jnp.asarray(X))),
            np.fft.irfft2(X, s=(32, 32)), rtol=1e-10, atol=1e-12,
        )

    @pytest.mark.parametrize("forced", [False, True])
    def test_solver_rollout_parity(self, forced):
        n, batch, steps = 32, 2, 20
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        forcing = (
            forcings.KolmogorovForcing(grid=grid, scale=1.0, wave_number=2,
                                       diam=2 * np.pi, vorticity=False)
            if forced else None
        )
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        w0 = jax.vmap(
            lambda k: ic.vorticity_field(k, grid, 4, dtype=jnp.float64).data
        )(keys)
        what = jnp.fft.rfft2(w0)

        outs = {}
        for impl in ("fft", "dft"):
            ns = equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, drag=0.1 if forced else 0.0,
                forcing_fn=forcing, dtype=jnp.float64, fft_impl=impl,
            )
            outs[impl] = np.asarray(
                jax.jit(lambda w, e=ns: e.forward(w, 1e-3, steps=steps)[0])(what)
            )
        np.testing.assert_allclose(
            outs["dft"], outs["fft"], rtol=1e-9, atol=1e-11,
        )

    def test_solver_gradient_parity(self):
        """Data-gen shares kernels with differentiable fine-tuning — the dft
        path must carry the same gradients."""
        n = 16
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        w0 = jax.random.normal(jax.random.PRNGKey(3), (n, n), jnp.float64)
        what = jnp.fft.rfft2(w0)

        grads = {}
        for impl in ("fft", "dft"):
            ns = equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, dtype=jnp.float64, fft_impl=impl,
            )

            def loss(w, e=ns):
                out = e.forward(w, 1e-3, steps=3)[0]
                return (jnp.abs(out) ** 2).mean()

            grads[impl] = np.asarray(jax.jit(jax.grad(loss))(what))
        np.testing.assert_allclose(grads["dft"], grads["fft"],
                                   rtol=1e-8, atol=1e-12)

    def test_aligned_rollout_parity(self):
        """fft_impl="dft_aligned" steps on the lane-aligned n//2-column
        spectrum. With the (physically-zero-after-warmup) Nyquist column
        zeroed in the IC, it matches the full-width paths to roundoff: the
        2/3 dealias filter keeps advection from regenerating Nyquist
        content and the linear term only decays it."""
        n, batch, steps = 32, 2, 20
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        w0 = jax.vmap(
            lambda k: ic.vorticity_field(k, grid, 4, dtype=jnp.float64).data
        )(keys)
        what = jnp.fft.rfft2(w0).at[..., -1].set(0)

        outs = {}
        for impl in ("fft", "dft_aligned"):
            ns = equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, dtype=jnp.float64, fft_impl=impl,
            )
            out, dwdt = jax.jit(
                lambda w, e=ns: e.forward(w, 1e-3, steps=steps)
            )(what)
            assert out.shape == what.shape  # public width preserved
            outs[impl] = np.asarray(out)
        np.testing.assert_allclose(
            outs["dft_aligned"], outs["fft"], rtol=1e-9, atol=1e-11,
        )

    def test_aligned_interface_accepts_both_widths(self):
        """trajectories.record calls explicit/implicit/residual on FULL-width
        snapshots while forward's scan carries the aligned width — both must
        work and agree on the shared modes."""
        n = 32
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        ns = equations.NavierStokes2DSpectral(
            viscosity=1e-3, grid=grid, dtype=jnp.float64,
            fft_impl="dft_aligned",
        )
        w0 = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float64)
        w_full = jnp.fft.rfft2(w0).at[..., -1].set(0)
        w_aligned = w_full[..., : n // 2]
        for fn in (ns.explicit_terms, ns.implicit_terms,
                   lambda w: ns.implicit_solve(w, 1e-3),
                   lambda w: ns.residual(w, w)):
            full = np.asarray(fn(w_full))
            aligned = np.asarray(fn(w_aligned))
            assert full.shape[-1] == n // 2 + 1
            assert aligned.shape[-1] == n // 2
            np.testing.assert_allclose(full[..., : n // 2], aligned,
                                       rtol=1e-12, atol=1e-14)
            np.testing.assert_allclose(full[..., -1], 0.0, atol=1e-14)

    def test_aligned_realistic_ic_physics_level(self):
        """On a raw McWilliams IC the aligned path differs from the
        reference path by exactly the IC's (tiny) Nyquist-column amplitude:
        the dropped column only ever decays, never feeds back (the 2/3
        filter excludes it from advection). At the production 256² with
        warmup 4.5 the column is decayed to exp(-73) ≈ 1e-32 — aligned is
        bit-equivalent there; this test pins the n=64 no-warmup bound."""
        n, steps = 64, 30
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        w0 = ic.vorticity_field(
            jax.random.PRNGKey(2), grid, 4, dtype=jnp.float64
        ).data
        what = jnp.fft.rfft2(w0)
        ny_rel = float(jnp.abs(what[..., -1]).max() / jnp.abs(what).max())
        outs = {}
        for impl in ("fft", "dft_aligned"):
            ns = equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, dtype=jnp.float64, fft_impl=impl,
            )
            outs[impl] = np.asarray(
                jax.jit(lambda w, e=ns: e.forward(w, 1e-3, steps=steps)[0])(what)
            )
        rel = (np.abs(outs["dft_aligned"] - outs["fft"]).max()
               / np.abs(outs["fft"]).max())
        # the deviation is bounded by (a small multiple of) the dropped
        # column's own relative amplitude — and is far from blowing up
        assert rel < 10 * ny_rel, (rel, ny_rel)
        assert rel < 2e-2, rel


class TestGalerkinSolverPath:
    """fft_impl="dft_galerkin": stepping on exactly the 2/3-rule dealiasing
    support (ops/dft2d.galerkin_block). For a dealiased state this is an
    EXACT restriction of the filtered dynamics — products of in-block modes
    stay below the dense DFT's alias-free band — so parity with the fft
    path is machine precision, not a physics-level bound."""

    def test_block_transform_parity(self):
        """rfft2_block == rfft2_matmul sliced to the block; irfft2_block ==
        irfft2_matmul of the zero-filled spectrum."""
        from tpu_cfd.ops import dft2d

        n = 32
        rows, m = dft2d.galerkin_block(n)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, n, n))
        )
        full = np.asarray(jax.jit(
            lambda x: dft2d.rfft2_matmul(x, "highest"))(x))
        blk = np.asarray(jax.jit(
            lambda x: dft2d.rfft2_block(x, rows, m, "highest"))(x))
        ref = full[:, list(rows), :m]
        np.testing.assert_allclose(blk, ref, rtol=1e-12, atol=1e-13)

        spec = np.zeros_like(full)
        spec[:, list(rows), :m] = ref
        inv_full = np.asarray(jax.jit(
            lambda s: dft2d.irfft2_matmul(s, "highest"))(jnp.asarray(spec)))
        inv_blk = np.asarray(jax.jit(
            lambda b: dft2d.irfft2_block(b, n, rows, "highest"))(
                jnp.asarray(ref)))
        np.testing.assert_allclose(inv_blk, inv_full, rtol=1e-12, atol=1e-13)

    def test_block_matches_filter_support(self):
        """The block is exactly the brick-wall filter support, so the
        per-step filter multiply is an identity (dropped in the solver)."""
        from tpu_cfd.ops import dft2d
        from tpu_cfd.ops.spectral import brick_wall_filter_2d

        for n in (32, 64, 256):
            rows, m = dft2d.galerkin_block(n)
            grid = grids.Grid((n, n), domain=((0, 1.0), (0, 1.0)))
            filt = np.asarray(brick_wall_filter_2d(grid))
            assert filt[list(rows), :m].all()
            assert filt.sum() == len(rows) * m

    def test_galerkin_rollout_parity(self):
        """Pre-filtered (dealiased) state: galerkin == fft to roundoff over
        a 50-step rollout, including the returned dw/dt estimate."""
        from tpu_cfd.ops.spectral import brick_wall_filter_2d

        n, batch, steps = 64, 2, 50
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        w0 = jax.vmap(
            lambda k: ic.vorticity_field(k, grid, 4, dtype=jnp.float64).data
        )(keys)
        what = jnp.fft.rfft2(w0) * brick_wall_filter_2d(grid, jnp.float64)

        outs = {}
        for impl in ("fft", "dft_galerkin"):
            ns = equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, dtype=jnp.float64, fft_impl=impl,
            )
            out, dwdt = jax.jit(
                lambda w, e=ns: e.forward(w, 1e-3, steps=steps)
            )(what)
            assert out.shape == what.shape  # public layout preserved
            outs[impl] = (np.asarray(out), np.asarray(dwdt))
        np.testing.assert_allclose(
            outs["dft_galerkin"][0], outs["fft"][0], rtol=1e-9, atol=1e-12,
        )
        np.testing.assert_allclose(
            outs["dft_galerkin"][1], outs["fft"][1], rtol=1e-9, atol=1e-9,
        )

    def test_galerkin_interface_accepts_both_layouts(self):
        """explicit/implicit/residual accept both the public full layout and
        the internal block layout (the trajectory recorder uses the former,
        the scan carry the latter)."""
        from tpu_cfd.ops import dft2d
        from tpu_cfd.ops.spectral import brick_wall_filter_2d

        n = 32
        rows, m = dft2d.galerkin_block(n)
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        ns = equations.NavierStokes2DSpectral(
            viscosity=1e-3, grid=grid, dtype=jnp.float64,
            fft_impl="dft_galerkin",
        )
        w0 = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float64)
        w_full = jnp.fft.rfft2(w0) * brick_wall_filter_2d(grid, jnp.float64)
        w_block = w_full[jnp.asarray(rows), :m]
        for fn in (ns.explicit_terms, ns.implicit_terms,
                   lambda w: ns.implicit_solve(w, 1e-3),
                   lambda w: ns.residual(w, w)):
            full = np.asarray(fn(w_full))
            block = np.asarray(fn(w_block))
            assert full.shape[-2:] == (n, n // 2 + 1)
            assert block.shape[-2:] == (len(rows), m)
            np.testing.assert_allclose(full[list(rows), :m], block,
                                       rtol=1e-12, atol=1e-13)
            # everything the block drops is exactly zero in the full output
            mask = np.ones_like(full, dtype=bool)
            mask[list(rows), :m] = False
            np.testing.assert_allclose(full[mask], 0.0, atol=1e-14)

    @pytest.mark.slow
    def test_galerkin_256_production_parity(self):
        """Production resolution (256², the data-gen config): galerkin ==
        fft to machine precision over a 30-step fp64 rollout."""
        n = 256
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        w0 = ic.vorticity_field(
            jax.random.PRNGKey(0), grid, 4, dtype=jnp.float64
        ).data
        what = jnp.fft.rfft2(w0) * spectral.brick_wall_filter_2d(
            grid, jnp.float64
        )
        outs = {}
        for impl in ("fft", "dft_galerkin"):
            ns = equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, dtype=jnp.float64, fft_impl=impl,
            )
            out, _ = jax.jit(
                lambda w, e=ns: e.forward(w, 1e-3, steps=30)
            )(what)
            outs[impl] = np.asarray(out)
        scale = np.abs(outs["fft"]).max()
        d = np.abs(outs["dft_galerkin"] - outs["fft"]).max() / scale
        assert d < 1e-12, d

    def test_galerkin_forced_matches_aligned(self):
        """Forced Kolmogorov flow: galerkin == dft_aligned to machine
        precision (the forcing curl lands on low modes, inside the block),
        and both track the fft path to the forcing's own fp32 noise floor —
        the fft path retains the fp32-mesh rounding noise of the forcing
        field at modes outside the dealias band (the brick-wall filter only
        masks advection), which the truncated paths drop by construction."""
        n = 64
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        w0 = ic.vorticity_field(
            jax.random.PRNGKey(0), grid, 4, dtype=jnp.float64
        ).data
        what = jnp.fft.rfft2(w0) * spectral.brick_wall_filter_2d(
            grid, jnp.float64
        )
        f = forcings.KolmogorovForcing(
            grid=grid, scale=1.0, wave_number=4, diam=2 * np.pi
        )
        outs = {}
        for impl in ("fft", "dft_aligned", "dft_galerkin"):
            ns = equations.NavierStokes2DSpectral(
                viscosity=1e-2, grid=grid, drag=0.1, dtype=jnp.float64,
                forcing_fn=f, fft_impl=impl,
            )
            out, _ = jax.jit(
                lambda w, e=ns: e.forward(w, 1e-3, steps=50)
            )(what)
            outs[impl] = np.asarray(out)
        scale = np.abs(outs["fft"]).max()
        d_exact = np.abs(outs["dft_galerkin"] - outs["dft_aligned"]).max()
        d_fft = np.abs(outs["dft_galerkin"] - outs["fft"]).max()
        assert d_exact / scale < 1e-12, d_exact / scale
        assert d_fft / scale < 1e-5, d_fft / scale

    def test_galerkin_gradient_semantics(self):
        """Differentiating through the galerkin rollout: gradient components
        on the block match the fft path to machine precision; components at
        dropped modes are exactly zero (the gradient of the RESTRICTED
        dynamics — the fft path's nonzero out-of-block gradient reflects
        non-physical perturbations the dealiased dynamics never sees)."""
        from tpu_cfd.ops import dft2d

        n = 32
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        w0 = ic.vorticity_field(
            jax.random.PRNGKey(0), grid, 4, dtype=jnp.float64
        ).data
        what = jnp.fft.rfft2(w0) * spectral.brick_wall_filter_2d(
            grid, jnp.float64
        )
        gs = {}
        for impl in ("fft", "dft_galerkin"):
            ns = equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, dtype=jnp.float64, fft_impl=impl,
            )
            f = lambda w, e=ns: jnp.sum(
                jnp.abs(e.forward(w, 1e-3, steps=10)[0]) ** 2
            )
            gs[impl] = np.asarray(jax.jit(jax.grad(f))(what))
        rows, m = dft2d.galerkin_block(n)
        mask = np.zeros((n, n // 2 + 1), bool)
        mask[list(rows), :m] = True
        scale = np.abs(gs["fft"]).max()
        diff = np.abs(gs["dft_galerkin"] - gs["fft"])
        assert diff[mask].max() / scale < 1e-12
        assert np.abs(gs["dft_galerkin"][~mask]).max() == 0.0

    def test_galerkin_requires_smooth(self):
        grid = grids.Grid((32, 32), domain=((0, 1.0), (0, 1.0)))
        with pytest.raises(ValueError):
            equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, smooth=False,
                fft_impl="dft_galerkin",
            )
