"""Tests for SFNO/FNO3d — mirrors the reference's fno/sfno_pytest.py contract.

Shape polymorphism (arbitrary in/out space-time sizes), Helmholtz
divergence-free projection at 1e-5 (fp32) / 1e-12 (fp64) (sfno_pytest.py:97,
129), PE shapes, OutConv arbitrary out_steps, end-to-end SFNO for multiple
grid sizes, plus loss sanity checks.
"""

import os

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_cfd.models import (
    SFNO,
    FNO3d,
    HelmholtzProjection,
    LiftingOperator,
    OutConv,
    SpaceTimePositionalEncoding,
    SpectralConvS,
    SpectralConvT,
)
from tpu_cfd.models.fno3d import add_grid_3d
from tpu_cfd.train import losses


KEY = jax.random.PRNGKey(0)


class TestPositionalEncoding:
    def test_output_shape(self):
        pe = SpaceTimePositionalEncoding(num_channels=16)
        v = jnp.zeros((2, 16, 16, 6, 1))
        params = pe.init(KEY, v)
        out = pe.apply(params, v)
        assert out.shape == (2, 16, 16, 6, 16)

    def test_random_feats_shape(self):
        pe = SpaceTimePositionalEncoding(
            modes_x=4, modes_y=4, modes_t=2, num_channels=16,
            spatial_random_feats=True,
        )
        v = jnp.zeros((2, 16, 16, 6, 1))
        params = pe.init(KEY, v)
        out = pe.apply(params, v)
        assert out.shape == (2, 16, 16, 6, 16)


class TestHelmholtz:
    @pytest.mark.parametrize("n,dtype,tol", [
        (64, jnp.float32, 1e-5),
        (128, jnp.float32, 1e-5),
        (64, jnp.float64, 1e-12),
        (256, jnp.float64, 1e-12),
        # the reference contract covers up to 512² (sfno_pytest.py:97-129)
        pytest.param(512, jnp.float64, 1e-12, marks=pytest.mark.slow),
    ])
    def test_projected_divergence(self, n, dtype, tol):
        """Projected field divergence < 1e-5 fp32 / 1e-12 fp64 (ref :97,129)."""
        proj = HelmholtzProjection(diam=2 * jnp.pi)
        keys = jax.random.split(KEY, 2)
        nt = 4
        # smooth random field in rfft-t space: (b, x, y, kt, 2)
        u = jnp.stack(
            [
                jax.random.normal(k, (2, n, n, nt), dtype=dtype)
                for k in keys
            ],
            axis=-1,
        )
        uhat = jnp.fft.rfft(u, axis=-2)
        what = proj.apply({}, uhat)
        # check spectral divergence of the projected field
        kx, ky = HelmholtzProjection._fft_mesh(n, 2 * jnp.pi, dtype)
        div = HelmholtzProjection.div(what, (kx, ky))
        div_phys = jnp.fft.irfft(div, n=nt, axis=-1)
        scale = float(jnp.abs(u).max())
        assert float(jnp.abs(div_phys).max()) / scale < tol

    def test_resolution_agnostic(self):
        proj = HelmholtzProjection()
        for n in (32, 48):
            uhat = jnp.fft.rfft(jax.random.normal(KEY, (1, n, n, 4, 2)), axis=-2)
            out = proj.apply({}, uhat)
            assert out.shape == uhat.shape


class TestSpectralConvs:
    def test_spectral_conv_s_shape(self):
        conv = SpectralConvS(in_channels=8, out_channels=8, modes=(4, 4, 3))
        v = jax.random.normal(KEY, (2, 16, 16, 6, 8))
        params = conv.init(KEY, v)
        out = conv.apply(params, v)
        assert out.shape == v.shape

    def test_spectral_conv_t_out_steps(self):
        conv = SpectralConvT(
            in_channels=4, out_channels=4, modes=(4, 4, 3), out_steps=9
        )
        v = jax.random.normal(KEY, (2, 16, 16, 5, 4))
        params = conv.init(KEY, v)
        out = conv.apply(params, v)
        assert out.shape == (2, 16, 16, 9, 4)

    def test_spectral_conv_t_temporal_padding(self):
        conv = SpectralConvT(
            in_channels=4, out_channels=4, modes=(4, 4, 3),
            temporal_padding=True, bias=True,
        )
        v = jax.random.normal(KEY, (2, 16, 16, 5, 4))
        params = conv.init(KEY, v, out_steps=7)
        out = conv.apply(params, v, out_steps=7)
        assert out.shape == (2, 16, 16, 7, 4)


class TestLiftingAndOut:
    def test_lifting_shape(self):
        lift = LiftingOperator(
            width=12, modes_x=4, modes_y=4, modes_t=2, latent_steps=6
        )
        v = jax.random.normal(KEY, (2, 16, 16, 8, 1))
        params = lift.init(KEY, v)
        out = lift.apply(params, v)
        assert out.shape == (2, 16, 16, 6, 12)

    @pytest.mark.parametrize("out_steps", [1, 5, 13])
    def test_outconv_arbitrary_steps(self, out_steps):
        oc = OutConv(modes_x=4, modes_y=4, modes_t=2)
        v = jax.random.normal(KEY, (2, 16, 16, 6, 1))
        v_res = jax.random.normal(KEY, (2, 16, 16, 8))
        params = oc.init(KEY, v, v_res, out_steps=out_steps)
        out = oc.apply(params, v, v_res, out_steps=out_steps)
        assert out.shape == (2, 16, 16, out_steps)


class TestSFNO:
    @pytest.mark.parametrize("n", [16, 32])
    @pytest.mark.parametrize("out_steps", [4, 11])
    def test_end_to_end_shapes(self, n, out_steps):
        model = SFNO(
            modes_x=4, modes_y=4, modes_t=2, width=8,
            latent_steps=6, num_spectral_layers=2,
        )
        v = jax.random.normal(KEY, (2, n, n, 8))
        params = model.init(KEY, v)
        out = model.apply(params, v, out_steps=out_steps)
        assert out.shape == (2, n, n, out_steps)
        assert bool(jnp.isfinite(out).all())

    @pytest.mark.slow
    def test_super_resolution_same_params(self):
        """Same params evaluate at a finer grid (mesh-free operator)."""
        model = SFNO(
            modes_x=4, modes_y=4, modes_t=2, width=8,
            latent_steps=6, num_spectral_layers=2,
        )
        v = jax.random.normal(KEY, (1, 16, 16, 8))
        params = model.init(KEY, v)
        out = model.apply(params, jax.random.normal(KEY, (1, 48, 48, 8)), out_steps=3)
        assert out.shape == (1, 48, 48, 3)

    def test_jit_and_grad(self):
        model = SFNO(
            modes_x=4, modes_y=4, modes_t=2, width=8,
            latent_steps=6, num_spectral_layers=2,
        )
        v = jax.random.normal(KEY, (2, 16, 16, 8))
        target = jax.random.normal(KEY, (2, 16, 16, 8))
        params = model.init(KEY, v)

        @jax.jit
        def loss_fn(params):
            out = model.apply(params, v)
            return ((out - target) ** 2).mean()

        g = jax.grad(loss_fn)(params)
        gnorm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)
        )
        assert np.isfinite(gnorm) and gnorm > 0

    def test_bf16_compute_dtype(self):
        """compute_dtype="bfloat16" (activation storage only): identical
        param tree, float32 output within bf16 tolerance of the fp32 path,
        finite nonzero grads. Params/optimizer state stay fp32, so this is
        checkpoint-compatible with the default."""
        kw = dict(modes_x=4, modes_y=4, modes_t=2, width=8,
                  latent_steps=6, num_spectral_layers=2)
        m32 = SFNO(**kw)
        m16 = SFNO(**kw, compute_dtype="bfloat16")
        v = jax.random.normal(KEY, (2, 16, 16, 8)).astype(jnp.float32)
        params = m32.init(KEY, v)
        p16 = m16.init(KEY, v)
        chex.assert_trees_all_equal_shapes_and_dtypes(params, p16)

        o32 = m32.apply(params, v)
        o16 = m16.apply(params, v)
        assert o16.dtype == jnp.float32
        rel = float(jnp.linalg.norm(o16 - o32) / jnp.linalg.norm(o32))
        assert rel < 0.05, rel

        g = jax.grad(
            lambda p: ((m16.apply(p, v) - 1.0) ** 2).mean()
        )(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(x.dtype == leaf.dtype for x, leaf in zip(
            leaves, jax.tree_util.tree_leaves(params)))
        gnorm = sum(float(jnp.abs(x).sum()) for x in leaves)
        assert np.isfinite(gnorm) and gnorm > 0

    def test_remat_identical_params_outputs_grads(self):
        """remat=True (backward-pass rematerialization of the lifting +
        backbone blocks): identical param tree (explicit scope names pin the
        module paths, so checkpoints interchange), bitwise-equal forward,
        and gradients equal to fp32 roundoff — remat changes WHEN
        activations are computed, never what."""
        kw = dict(modes_x=4, modes_y=4, modes_t=2, width=8,
                  latent_steps=6, num_spectral_layers=3)
        m0 = SFNO(**kw)
        m1 = SFNO(**kw, remat=True)
        v = jax.random.normal(KEY, (2, 16, 16, 8)).astype(jnp.float32)
        params = m0.init(KEY, v)
        chex.assert_trees_all_equal_structs(params, m1.init(KEY, v))

        o0 = jax.jit(m0.apply)(params, v)
        o1 = jax.jit(m1.apply)(params, v)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   rtol=1e-6, atol=1e-6)

        def loss(m):
            return lambda p: ((m.apply(p, v) - 1.0) ** 2).mean()

        g0 = jax.jit(jax.grad(loss(m0)))(params)
        g1 = jax.jit(jax.grad(loss(m1)))(params)
        chex.assert_trees_all_close(g0, g1, rtol=1e-5, atol=1e-7)

    def test_fno3d_bf16_compute_dtype(self):
        from tpu_cfd.models.fno3d import FNO3d

        kw = dict(modes1=4, modes2=4, modes3=2, width=8,
                  num_spectral_layers=2, channel_expansion=16)
        m32, m16 = FNO3d(**kw), FNO3d(**kw, compute_dtype="bfloat16")
        x = jax.random.normal(KEY, (2, 16, 16, 6, 13)).astype(jnp.float32)
        params = m32.init(KEY, x)
        chex.assert_trees_all_equal_shapes_and_dtypes(params, m16.init(KEY, x))
        o32, _ = m32.apply(params, x)
        o16, _ = m16.apply(params, x)
        assert o16.dtype == jnp.float32
        rel = float(jnp.linalg.norm(o16 - o32) / jnp.linalg.norm(o32))
        assert rel < 0.05, rel

    def test_fno3d_remat_identical(self):
        from tpu_cfd.models.fno3d import FNO3d

        kw = dict(modes1=4, modes2=4, modes3=2, width=8,
                  num_spectral_layers=2, channel_expansion=16)
        m0, m1 = FNO3d(**kw), FNO3d(**kw, remat=True)
        x = jax.random.normal(KEY, (2, 16, 16, 6, 13)).astype(jnp.float32)
        params = m0.init(KEY, x)
        chex.assert_trees_all_equal_structs(params, m1.init(KEY, x))
        o0, _ = jax.jit(m0.apply)(params, x)
        o1, _ = jax.jit(m1.apply)(params, x)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   rtol=1e-6, atol=1e-6)
        g0 = jax.jit(jax.grad(lambda p: ((m0.apply(p, x)[0]) ** 2).mean()))(params)
        g1 = jax.jit(jax.grad(lambda p: ((m1.apply(p, x)[0]) ** 2).mean()))(params)
        chex.assert_trees_all_close(g0, g1, rtol=1e-5, atol=1e-7)

    def test_vector_output_divergence_free(self):
        """out_dim=2 output is Helmholtz-projected through the full model.

        The architecture guarantees the SPECTRAL part of the output is
        divergence-free; the final skip adds the last input frame broadcast to
        both components (reference sfno.py:326-327), which is not div-free for
        a scalar input. So the contract is div(out - skip) ≈ 0.
        """
        n, diam = 32, 2 * jnp.pi
        model = SFNO(
            modes_x=4, modes_y=4, modes_t=2, width=8, out_dim=2,
            latent_steps=6, num_spectral_layers=2, diam=diam,
        )
        v = jax.random.normal(KEY, (1, n, n, 8), dtype=jnp.float64)
        params = model.init(KEY, v)
        out = model.apply(params, v, out_steps=4)
        assert out.shape == (1, n, n, 4, 2)

        proj = out - v[..., -1:, None]  # strip the broadcast skip
        k = jnp.fft.fftfreq(n, d=diam / n)
        kx = k[:, None, None]
        ky = k[None, :, None]
        uhat = jnp.fft.fft2(proj, axes=(1, 2))
        div_hat = 2j * jnp.pi * (kx * uhat[..., 0] + ky * uhat[..., 1])
        div = jnp.fft.ifft2(div_hat, axes=(1, 2)).real
        scale = float(jnp.abs(proj).max())
        assert float(jnp.abs(div).max()) < 1e-10 * max(scale, 1.0), (
            float(jnp.abs(div).max()), scale,
        )


class TestFNO3d:
    def test_forward_shape(self):
        model = FNO3d(modes1=4, modes2=4, modes3=3, width=8)
        x = jax.random.normal(KEY, (2, 16, 16, 8, 10))
        x = add_grid_3d(x)
        assert x.shape[-1] == 13
        params = model.init(KEY, x)
        out, extra = model.apply(params, x)
        assert out.shape == (2, 16, 16, 8)
        assert extra is None


class TestLosses:
    def test_lp_loss_zero_for_equal(self):
        x = jax.random.normal(KEY, (4, 16, 16))
        loss = losses.LpLoss(relative=True)
        assert float(loss(x, x)) == 0.0

    def test_lp_rel_scale_invariant(self):
        x = jax.random.normal(KEY, (4, 16, 16))
        y = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16))
        loss = losses.LpLoss(relative=True)
        np.testing.assert_allclose(
            float(loss(2 * x, 2 * y)), float(loss(x, y)), rtol=1e-6
        )

    def test_l2loss2d(self):
        x = jax.random.normal(KEY, (4, 1, 16, 16))
        y = x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, 1, 16, 16))
        loss = losses.L2Loss2d()
        val = float(loss(x, y))
        assert 0 < val < 1

    def test_sobolev_order_zero_is_l2(self):
        n = 32
        x = jax.random.normal(KEY, (2, n, n, 4))
        y = jax.random.normal(jax.random.PRNGKey(1), (2, n, n, 4))
        loss = losses.SobolevLoss(
            n_grid=n, norm_order=0, relative=True, time_average=True
        )
        val = float(loss(x, y))
        assert np.isfinite(val) and val > 0

    def test_sobolev_negative_order_smooths(self):
        """H^{-1} norm must weight high frequencies less than L2."""
        n = 32
        # high-frequency error field
        x_axis = jnp.arange(n)
        hf = jnp.cos(jnp.pi * x_axis)[None, :, None, None] * jnp.ones((1, n, n, 1))
        lf = jnp.ones((1, n, n, 1))
        l2 = losses.SobolevLoss(n_grid=n, norm_order=0)
        hm1 = losses.SobolevLoss(n_grid=n, norm_order=-1)
        ratio_hf = float(hm1(hf)) / float(l2(hf))
        ratio_lf = float(hm1(lf)) / float(l2(lf))
        assert ratio_hf < ratio_lf

    def test_bochner_norm(self):
        n = 16
        u = jnp.ones((2, n, n, 5))
        norm = losses.BochnerNorm(n_grid=n, time_last=True, relative=False)
        # ||1||_2 over n^2 grid / n = 1 per time slice -> time avg 1
        np.testing.assert_allclose(float(norm(u)), 1.0, rtol=1e-6)

    def test_residual_loss_small_for_solver_output(self):
        """The NSE residual of an actual solver trajectory must be small."""
        from tpu_cfd import grids
        from tpu_cfd.solvers import equations, initial_conditions as ic
        from tpu_cfd.solvers import trajectories

        n, nt, dt = 64, 32, 1e-3
        grid = grids.Grid((n, n), domain=((0, 1), (0, 1)))
        w0 = ic.vorticity_field(KEY, grid, 4, dtype=jnp.float64).data
        ns = equations.NavierStokes2DSpectral(
            viscosity=1e-3, grid=grid, dtype=jnp.float64
        )
        result = trajectories.get_trajectory_imex(
            ns, jnp.fft.rfft2(w0), dt=dt, num_steps=nt, record_every_steps=1
        )
        w_traj = jnp.fft.irfft2(result["vorticity"], s=(n, n))  # (nt, n, n)
        w_traj = jnp.moveaxis(w_traj, 0, -1)[None]  # (1, n, n, nt)
        loss = losses.ResidualLoss(visc=1e-3, n_grid=n, n_t=nt, delta_t=dt)
        val = float(loss(w_traj))
        # random field residual is orders of magnitude larger
        w_rand = jax.random.normal(KEY, (1, n, n, nt), dtype=jnp.float64)
        val_rand = float(loss(w_rand))
        assert val < 0.1 * val_rand


class TestLatentTapsAndDouble:
    def test_apply_with_latents(self):
        """Latent taps (reference add_latent_hook parity, base.py:330-345)."""
        from tpu_cfd.models import apply_with_latents

        model = SFNO(
            modes_x=4, modes_y=4, modes_t=2, width=8,
            latent_steps=6, num_spectral_layers=3,
        )
        v = jax.random.normal(KEY, (2, 16, 16, 8))
        params = model.init(KEY, v)
        out, latents = apply_with_latents(model, params, v)
        np.testing.assert_allclose(out, model.apply(params, v), rtol=1e-6)
        assert set(latents) == {"lifting", "spectral_0", "spectral_1", "r"}
        assert latents["lifting"].shape == (2, 16, 16, 6, 8)
        assert latents["r"].shape == (2, 16, 16, 6, 1)

    def test_params_to_double(self):
        from tpu_cfd.models import params_to_double

        model = SFNO(modes_x=4, modes_y=4, modes_t=2, width=8,
                     latent_steps=4, num_spectral_layers=2)
        params = model.init(KEY, jnp.zeros((1, 16, 16, 6)))
        p64 = params_to_double(params)
        dtypes = {x.dtype for x in jax.tree_util.tree_leaves(p64)}
        assert dtypes == {jnp.dtype(jnp.float64)}
        out = model.apply(p64, jnp.zeros((1, 16, 16, 6), jnp.float64))
        assert out.dtype == jnp.float64


class TestFNO3dTrainingExample:
    @pytest.mark.slow
    def test_example_trains_and_loss_decreases(self, tmp_path):
        """The FNO3d normalized-training path (reference
        examples/ex2_FNO3d_train_normalized.ipynb) learns on tiny data."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ex2_fno3d_train",
            os.path.join(os.path.dirname(__file__), "..", "examples",
                         "ex2_fno3d_train.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        rng = np.random.default_rng(0)
        n, T, N = 16, 24, 8
        xg, yg = np.meshgrid(
            np.linspace(0, 2 * np.pi, n, endpoint=False),
            np.linspace(0, 2 * np.pi, n, endpoint=False), indexing="ij",
        )
        trajs = np.stack([
            np.stack([
                np.exp(-0.05 * t) * np.sin(xg + 0.3 * t + rng.uniform(0, 6.28))
                * np.cos(yg - 0.2 * t) for t in range(T)
            ]) for _ in range(N)
        ]).astype(np.float32)
        path = tmp_path / "mc_tiny.npz"
        np.savez(path, vorticity=trajs)
        test_l2 = mod.main([
            "--data-file", str(path), "--num-samples", "6",
            "--num-test-samples", "2", "--epochs", "4", "--batch-size", "2",
            "--modes", "4", "--modes-t", "2", "--width", "6",
            "--time-steps", "4", "--t-start", "2", "--res", "16",
        ])
        assert np.isfinite(test_l2) and test_l2 < 1.0
