"""Tests for data generation, datasets, training pipeline, and diagnostics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_cfd.data import data_utils
from tpu_cfd.data.datasets import (
    SpatialGaussianNormalizer,
    SpatioTemporalDataset,
    UnitGaussianNormalizer,
)
from tpu_cfd.data.grf import GRF2d
from tpu_cfd.utils.visualizations import get_enstrophy_spectrum


class TestGRF:
    def test_shapes_and_mean_zero(self):
        grf = GRF2d(n=64, alpha=2.5, tau=7.0)
        out = grf.sample(jax.random.PRNGKey(0), bsz=4)
        assert out.shape == (4, 64, 64)
        # mean-zero by construction (zero mode removed)
        np.testing.assert_allclose(out.mean(axis=(-2, -1)), 0.0, atol=1e-4)

    def test_smoothness_scaling(self):
        """Larger alpha gives smoother fields (less high-frequency energy)."""
        key = jax.random.PRNGKey(0)
        rough = GRF2d(n=64, alpha=1.5, tau=7.0).sample(key)[0]
        smooth = GRF2d(n=64, alpha=3.5, tau=7.0).sample(key)[0]

        def hf_fraction(x):
            xh = np.abs(np.fft.fft2(np.asarray(x))) ** 2
            k = np.fft.fftfreq(64) * 64
            kx, ky = np.meshgrid(k, k, indexing="ij")
            hf = (np.abs(kx) > 16) | (np.abs(ky) > 16)
            return xh[hf].sum() / xh.sum()

        assert hf_fraction(rough) > 10 * hf_fraction(smooth)

    def test_normalize(self):
        grf = GRF2d(n=32, normalize=True)
        out = grf.sample(jax.random.PRNGKey(1), bsz=2)
        norms = jnp.linalg.norm(out / 32, axis=(-2, -1))
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_deterministic_per_key(self):
        key = jax.random.PRNGKey(2)
        grf = GRF2d(n=32, alpha=2.5, tau=7.0)
        a = grf.sample(key)
        b = grf.sample(key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_replicable_init_physical_downsample(self):
        """The reference's replicable-init: sample at a max mesh, downsample
        in PHYSICAL space (data_gen_fno.py:197-204) — resolutions correlate."""
        key = jax.random.PRNGKey(2)
        grf = GRF2d(n=128, alpha=2.5, tau=7.0)
        hi = grf.sample(key, n=128)[0]
        lo = jax.image.resize(hi, (32, 32), method="nearest")
        lo_direct = hi[::4, ::4]
        corr = np.corrcoef(
            np.asarray(lo).ravel(), np.asarray(lo_direct).ravel()
        )[0, 1]
        assert corr > 0.95, corr

    def test_smoothing_mode_shape(self):
        grf = GRF2d(n=32, alpha=2.5, tau=7.0, smoothing=True, max_mesh_size=64)
        out = grf.sample(jax.random.PRNGKey(3), bsz=2)
        assert out.shape == (2, 32, 32)
        assert bool(jnp.isfinite(out).all())


class TestNormalizers:
    def test_unit_gaussian_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.normal(2.0, 3.0, size=(16, 8, 8)).astype(np.float32)
        norm = UnitGaussianNormalizer()
        xt = norm.fit_transform(x)
        assert abs(xt.mean()) < 1e-5
        back = norm.inverse_transform(norm.transform(x))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)

    def test_resolution_alignment(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 8, 8)).astype(np.float32)
        norm = UnitGaussianNormalizer()
        norm.fit_transform(x)
        hi = rng.normal(size=(4, 16, 16)).astype(np.float32)
        out = norm.inverse_transform(hi, align_shapes=True)
        assert out.shape == hi.shape

    def test_spatial_normalizer(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 8, 8, 5)).astype(np.float32)
        norm = SpatialGaussianNormalizer()
        xt = norm.fit_transform(x)
        assert norm.mean.shape == (8, 8, 1)
        assert abs(xt.mean()) < 1e-5

    def test_save_load(self, tmp_path):
        x = np.random.default_rng(0).normal(size=(8, 4, 4)).astype(np.float32)
        norm = UnitGaussianNormalizer()
        norm.fit_transform(x)
        p = tmp_path / "norm.npz"
        norm.save(p)
        norm2 = UnitGaussianNormalizer.load(p)
        np.testing.assert_array_equal(norm.mean, norm2.mean)


def _make_traj_npz(tmp_path, n_samples=6, T=12, n=16):
    rng = np.random.default_rng(0)
    data = {
        "vorticity": rng.normal(size=(n_samples, T, n, n)).astype(np.float32),
        "stream": rng.normal(size=(n_samples, T, n, n)).astype(np.float32),
    }
    path = tmp_path / "traj.npz"
    np.savez(path, **data)
    return path, data


class TestSpatioTemporalDataset:
    def test_window_sampling(self, tmp_path):
        path, data = _make_traj_npz(tmp_path)
        ds = SpatioTemporalDataset(path, n_samples=4, steps=3, out_steps=2)
        inp, out = ds.sample(np.array([0, 1]), np.random.default_rng(0))
        assert inp["vorticity"].shape == (2, 16, 16, 3)
        assert out["vorticity"].shape == (2, 16, 16, 2)
        # output window follows the input window, per sample
        np.testing.assert_array_equal(
            out["time_steps"][:, 0], inp["time_steps"][:, -1] + 1
        )
        # per-sample windows are independent draws (reference semantics)
        many_i, _ = ds.sample(np.arange(4), np.random.default_rng(1))
        assert len(set(many_i["time_steps"][:, 0].tolist())) > 1

    def test_fixed_start(self, tmp_path):
        path, data = _make_traj_npz(tmp_path)
        ds = SpatioTemporalDataset(path, n_samples=4, steps=3, T_start=2)
        inp, _ = ds.sample(np.array([1]))
        np.testing.assert_array_equal(
            inp["vorticity"][0, ..., 0], data["vorticity"][1, 2]
        )
        np.testing.assert_array_equal(inp["time_steps"][0], [2, 3, 4])

    def test_batches_cover_epoch(self, tmp_path):
        path, _ = _make_traj_npz(tmp_path)
        ds = SpatioTemporalDataset(path, n_samples=6, steps=3, out_steps=2)
        batches = list(ds.batches(2, np.random.default_rng(0)))
        assert len(batches) == 3

    def test_empty_auxiliary_fields_dropped(self, tmp_path):
        """Datasets generated without --extra-vars store aux fields as empty
        arrays; the default field list must degrade gracefully."""
        path, data = _make_traj_npz(tmp_path)
        d = dict(np.load(path))
        d["stream"] = np.zeros((4, 0), np.float32)
        ds = SpatioTemporalDataset(d, n_samples=4, steps=3, out_steps=2,
                                   fields=["vorticity", "stream"])
        assert ds.fields == ["vorticity"]
        inp, _ = ds.sample(np.array([0]), np.random.default_rng(0))
        assert inp["vorticity"].shape == (1, 16, 16, 3)
        # a missing PRIMARY field is an error, not silent pruning
        import pytest

        with pytest.raises(KeyError):
            SpatioTemporalDataset(d, n_samples=4, steps=3,
                                  fields=["nope", "vorticity"])

    def test_missing_auxiliary_field_warns(self, tmp_path):
        """A requested field with no key at all (typo, or never recorded) is
        surfaced as a warning — unlike the silent empty-placeholder prune."""
        path, _ = _make_traj_npz(tmp_path)
        d = dict(np.load(path))
        with pytest.warns(UserWarning, match="strem"):
            ds = SpatioTemporalDataset(d, n_samples=4, steps=3, out_steps=2,
                                       fields=["vorticity", "strem"])
        assert ds.fields == ["vorticity"]


def _make_fno_paper_u(n_traj=8, n=16, nt=16, seed=0):
    """Synthetic FNO-paper-format solution tensor u: (N, n, n, T), smooth."""
    rng = np.random.default_rng(seed)
    coarse = rng.normal(size=(n_traj, 4, 4, nt)).astype(np.float32)
    u = np.asarray(
        jax.image.resize(jnp.asarray(coarse), (n_traj, n, n, nt), "cubic")
    )
    return u + 1.5  # nonzero mean so normalization is load-bearing


class TestNavierStokesDataset:
    """Exercises the FNO-paper `.mat`/`.pt` workflow end-to-end (reference
    fno/datasets.py:165-370, fno/fno3d.py:163-166)."""

    def test_mat_scipy_format(self, tmp_path):
        import scipy.io as sio

        from tpu_cfd.data.datasets import NavierStokesDataset

        u = _make_fno_paper_u()
        path = tmp_path / "ns_data.mat"
        sio.savemat(path, {"u": u, "a": u[..., 0]})
        ds = NavierStokesDataset(path, n_samples=6, train=True,
                                 time_steps_input=5, time_steps_output=8)
        assert ds.a.shape == (6, 16, 16, 5)
        assert ds.u.shape == (6, 16, 16, 8)
        # inputs are normalized; targets are raw solution frames
        assert abs(ds.a.mean()) < 1e-4
        np.testing.assert_allclose(ds.u, u[:6, ..., 5:13], rtol=1e-6)

    def test_mat_hdf5_format_matches_scipy(self, tmp_path):
        """MATLAB ≥v7.3 stores column-major HDF5; the loader must transpose
        back so both vintages produce identical datasets."""
        import h5py
        import scipy.io as sio

        from tpu_cfd.data.datasets import NavierStokesDataset

        u = _make_fno_paper_u()
        p_old = tmp_path / "old.mat"
        sio.savemat(p_old, {"u": u})
        p_73 = tmp_path / "v73.mat"
        with h5py.File(p_73, "w") as f:
            f.create_dataset("u", data=u.T)  # column-major on disk
        ds_old = NavierStokesDataset(p_old, n_samples=4, normalize=False)
        ds_73 = NavierStokesDataset(p_73, n_samples=4, normalize=False)
        np.testing.assert_array_equal(ds_old.a, ds_73.a)
        np.testing.assert_array_equal(ds_old.u, ds_73.u)

    def test_pt_format_and_subsample(self, tmp_path):
        import torch

        from tpu_cfd.data.datasets import NavierStokesDataset

        u = _make_fno_paper_u()
        path = tmp_path / "ns_data.pt"
        torch.save({"u": torch.from_numpy(u)}, path)
        ds = NavierStokesDataset(path, n_samples=4, subsample=2,
                                 time_steps_input=5, time_steps_output=8,
                                 normalize=False)
        assert ds.a.shape == (4, 8, 8, 5)
        np.testing.assert_array_equal(ds.a, u[:4, ::2, ::2, :5])

    @pytest.mark.slow
    def test_fno3d_trains_on_mat_data(self, tmp_path):
        """The reference's FNO3d workflow: .mat -> NavierStokesDataset ->
        a broadcast over output steps + grid channels -> FNO3d, loss falls."""
        import optax
        import scipy.io as sio

        from tpu_cfd.data.datasets import NavierStokesDataset
        from tpu_cfd.models.fno3d import FNO3d, add_grid_3d

        u = _make_fno_paper_u(n_traj=8, n=16, nt=16)
        path = tmp_path / "ns_data.mat"
        sio.savemat(path, {"u": u})
        t_in, t_out = 5, 8
        ds = NavierStokesDataset(path, n_samples=8, time_steps_input=t_in,
                                 time_steps_output=t_out)
        model = FNO3d(modes1=4, modes2=4, modes3=3, width=8,
                      input_channel=t_in, num_spectral_layers=2,
                      channel_expansion=16)

        def prep(a):
            # (b, n, n, t_in) input frames broadcast along the output-time
            # axis as channels, + (x,y,t) grid channels (fno3d.py:163-166)
            x = jnp.broadcast_to(
                jnp.asarray(a)[:, :, :, None, :],
                (*a.shape[:3], t_out, t_in),
            )
            return add_grid_3d(x)

        batch = next(iter(ds.batches(4, np.random.default_rng(0))))
        x, y = prep(batch["a"]), jnp.asarray(batch["u"])
        params = model.init(jax.random.PRNGKey(0), x)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, x, y):
            def loss_fn(p):
                pred, _ = model.apply(p, x)
                return jnp.mean((pred - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(8):
            params, opt_state, loss = step(params, opt_state, x, y)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < 0.5 * losses[0]


class TestIncrementalIO:
    def test_parts_roundtrip_and_resume(self, tmp_path):
        path = tmp_path / "data.npz"
        batch = {
            "vorticity": np.ones((2, 3, 4, 4), np.float32),
            "random_states": np.array([0, 1], np.int32),
        }
        data_utils.save_part(batch, path)
        batch2 = {
            "vorticity": 2 * np.ones((2, 3, 4, 4), np.float32),
            "random_states": np.array([2, 3], np.int32),
        }
        data_utils.save_part(batch2, path)
        assert data_utils.count_existing_samples(path) == 4
        data_utils.merge_parts(path)
        with np.load(path) as z:
            assert z["vorticity"].shape == (4, 3, 4, 4)
            np.testing.assert_array_equal(z["random_states"], [0, 1, 2, 3])
        # resume: existing final file + new part must merge without loss
        batch3 = {
            "vorticity": 3 * np.ones((1, 3, 4, 4), np.float32),
            "random_states": np.array([4], np.int32),
        }
        data_utils.save_part(batch3, path)
        assert data_utils.count_existing_samples(path) == 5
        data_utils.merge_parts(path)
        with np.load(path) as z:
            np.testing.assert_array_equal(z["random_states"], [0, 1, 2, 3, 4])

    def test_solver_config_meta_pins_resume(self, tmp_path):
        """A resumable dataset records its solver config in a sidecar meta
        file; resuming WITHOUT --fft-impl adopts the recorded impl instead
        of the (version-dependent) default, so one dataset never silently
        mixes transform implementations."""
        import json

        from tpu_cfd.data import generate

        flags = ["--grid-size", "32", "--time", "0.5", "--time-warmup",
                 "0.2", "--num-steps", "4", "--batch-size", "2",
                 "--filepath", str(tmp_path), "--logpath", str(tmp_path)]
        path = generate.main_mcwilliams(
            flags + ["--num-samples", "2", "--fft-impl", "fft"]
        )
        meta = json.load(open(str(path) + ".meta.json"))
        assert meta["fft_impl"] == "fft"

        path2 = generate.main_mcwilliams(
            flags + ["--num-samples", "4",
                     "--filename", os.path.basename(str(path))]
        )
        with np.load(path2) as z:
            assert z["vorticity"].shape[0] == 4
        # the meta still records the original impl
        meta2 = json.load(open(str(path2) + ".meta.json"))
        assert meta2["fft_impl"] == "fft"

    def test_default_fused_dp_fallback_repins_sidecar(
        self, tmp_path, monkeypatch
    ):
        """Defaulted impl + --data-parallel with a batch that does not
        divide the 8-device data axis must fall back from the fused stepper
        to dft_galerkin AND keep the sidecar pin truthful: a fresh run
        repins to dft_galerkin; a resumed run (earlier samples generated
        fused) additionally records the implementation mix (ADVICE r3).
        The resolution-aware default only picks fused at 256²/b≥32
        (equations.recommended_fft_impl), so pin the default to fused here
        to exercise the fallback on CPU-sized grids."""
        import json

        from tpu_cfd.data import generate
        from tpu_cfd.solvers import equations

        monkeypatch.setattr(
            equations, "recommended_fft_impl",
            lambda *a, **k: "dft_aligned_fused",
        )

        flags = ["--grid-size", "32", "--time", "0.05", "--time-warmup",
                 "0.02", "--num-steps", "2", "--batch-size", "6",
                 "--filepath", str(tmp_path), "--logpath", str(tmp_path)]

        # fresh run: 6 % 8 != 0 -> fallback fires, pin reads dft_galerkin
        path = generate.main_mcwilliams(
            flags + ["--num-samples", "6", "--data-parallel"]
        )
        meta = json.load(open(str(path) + ".meta.json"))
        assert meta["fft_impl"] == "dft_galerkin"
        assert "mixed_fft_impls" not in meta

        # resume-mix: first 6 samples generated with the fused default
        # (no --data-parallel, so no divisibility constraint) ...
        path2 = generate.main_mcwilliams(
            flags + ["--num-samples", "6",
                     "--filename", "mixpin.npz"]
        )
        meta2 = json.load(open(str(path2) + ".meta.json"))
        assert meta2["fft_impl"] == "dft_aligned_fused"
        # ... then resumed under --data-parallel with an indivisible batch:
        # the fallback must warn and record the mix in the sidecar
        path3 = generate.main_mcwilliams(
            flags + ["--num-samples", "12", "--data-parallel",
                     "--filename", "mixpin.npz"]
        )
        with np.load(path3) as z:
            assert z["vorticity"].shape[0] == 12
        meta3 = json.load(open(str(path3) + ".meta.json"))
        assert meta3["fft_impl"] == "dft_galerkin"
        assert meta3["mixed_fft_impls"] == [
            "dft_aligned_fused", "dft_galerkin"
        ]

    def test_fno_cli_incompatible_solver_never_defaults_fused(
        self, tmp_path, monkeypatch
    ):
        """The fno dataset steps with IMEXStepper (reference data_gen
        semantics) which the fused Pallas kernel cannot implement: the
        resolution-aware DEFAULT must quietly fall back to dft_galerkin
        (round-4 regression: the defaulted fused impl crashed the fnodata
        generation stage), while an EXPLICIT --fft-impl dft_aligned_fused
        raises a clear CLI error instead of the solver ctor's message."""
        import json

        import pytest

        from tpu_cfd.data import generate
        from tpu_cfd.solvers import equations

        monkeypatch.setattr(
            equations, "recommended_fft_impl",
            lambda *a, **k: "dft_aligned_fused",
        )
        flags = ["--grid-size", "32", "--time", "0.05", "--time-warmup",
                 "0.02", "--num-steps", "2", "--batch-size", "2",
                 "--num-samples", "2",
                 "--filepath", str(tmp_path), "--logpath", str(tmp_path)]
        path = generate.main_fno(flags)
        meta = json.load(open(str(path) + ".meta.json"))
        assert meta["fft_impl"] == "dft_galerkin"

        with pytest.raises(ValueError, match="IMEXStepper"):
            generate.main_fno(
                flags + ["--fft-impl", "dft_aligned_fused",
                         "--filename", "explicit.npz"]
            )

    def test_recommended_fft_impl_table(self):
        """The resolution-aware solver-impl default encodes the measured
        crossover tables (results/crossover_r4.jsonl,
        results/galerkin_fused_crossover_r5.jsonl)."""
        from tpu_cfd.solvers.equations import recommended_fft_impl

        # fp64 -> CPU -> fft; no dealiasing -> fft (galerkin/fused need it)
        assert recommended_fft_impl(256, 128, double=True) == "fft"
        assert recommended_fft_impl(256, 128, dealias=False) == "fft"
        # galerkin-layout fused kernel at the measured large-batch points
        assert recommended_fft_impl(256, 128) == "dft_galerkin_fused"
        assert recommended_fft_impl(256, 32) == "dft_galerkin_fused"
        assert recommended_fft_impl(512, 64) == "dft_galerkin_fused"
        # ... and at every batch at 1024² (128-column blocked pipeline)
        assert recommended_fft_impl(1024, 8) == "dft_galerkin_fused"
        # galerkin wins small batches and every batch at <=128²
        assert recommended_fft_impl(256, 8) == "dft_galerkin"
        assert recommended_fft_impl(512, 8) == "dft_galerkin"
        assert recommended_fft_impl(128, 128) == "dft_galerkin"
        assert recommended_fft_impl(64, 8) == "dft_galerkin"

    def test_parse_diam(self):
        assert data_utils.parse_diam("2pi") == pytest.approx(2 * np.pi)
        assert data_utils.parse_diam(1.5) == 1.5
        assert data_utils.parse_diam("pi") == pytest.approx(np.pi)
        with pytest.raises(ValueError):
            data_utils.parse_diam("os.system('x')")


class TestEnstrophySpectrum:
    def test_single_mode_lands_in_right_shell(self):
        n = 64
        h = 2 * np.pi / n
        x, y = np.meshgrid(
            np.arange(n) * h, np.arange(n) * h, indexing="ij"
        )
        w = np.sin(5 * x)  # pure k=5 mode
        E = get_enstrophy_spectrum(w, h)
        assert E.argmax() + 1 == 5  # k array starts at 1

    def test_mcwilliams_inverse_cascade_shape(self):
        """Physics contract (SURVEY.md §4): solver output must reproduce the
        decaying-spectrum shape: peak at low k, monotone-ish decay, orders of
        magnitude between peak and tail."""
        from tpu_cfd import grids
        from tpu_cfd.solvers import equations, initial_conditions as ic

        n = 128
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        w0 = ic.vorticity_field(jax.random.PRNGKey(0), grid, peak_wavenumber=4).data
        ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
        what, _ = ns.forward(jnp.fft.rfft2(w0), 1e-3, steps=500)
        w = np.asarray(jnp.fft.irfft2(what, s=(n, n)))
        E = get_enstrophy_spectrum(w, 2 * np.pi / n)
        k_peak = E.argmax() + 1
        assert k_peak <= 8, k_peak  # energy at large scales
        tail = E[40:50].mean()
        assert E.max() > 1e3 * max(tail, 1e-300)


class TestTrainingPipeline:
    @pytest.mark.slow
    def test_train_loop_decreases_loss(self, tmp_path):
        from tpu_cfd.models import SFNO
        from tpu_cfd.train import losses, pipeline

        # learnable data: smoothly decaying traveling waves (noise targets
        # are unlearnable with per-sample random windows)
        n, T = 16, 12
        xg, yg = np.meshgrid(
            np.linspace(0, 2 * np.pi, n, endpoint=False),
            np.linspace(0, 2 * np.pi, n, endpoint=False),
            indexing="ij",
        )
        rng0 = np.random.default_rng(0)
        trajs = []
        for i in range(4):
            phase = rng0.uniform(0, 2 * np.pi)
            trajs.append(
                [
                    np.exp(-0.05 * t)
                    * np.sin(xg + 0.3 * t + phase)
                    * np.cos(yg - 0.2 * t)
                    for t in range(T)
                ]
            )
        data = {"vorticity": np.asarray(trajs, dtype=np.float32)}
        path = tmp_path / "smooth.npz"
        np.savez(path, **data)
        ds = SpatioTemporalDataset(path, n_samples=4, steps=4, out_steps=4,
                                   fields=["vorticity"])
        model = SFNO(
            modes_x=4, modes_y=4, modes_t=2, width=8,
            latent_steps=4, num_spectral_layers=2, output_steps=4,
        )
        rng = np.random.default_rng(0)
        inp, _ = ds.sample(np.arange(2), rng)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(inp["vorticity"]))
        sched = pipeline.onecycle_lr(1e-3, steps_per_epoch=2, epochs=4)
        opt = pipeline.get_optimizer("Adam", sched, grad_clip=1.0)
        opt_state = opt.init(params)
        loss_fn = losses.SobolevLoss(n_grid=16, norm_order=0, relative=True)
        step = pipeline.make_train_step(model, loss_fn, opt)
        epoch_means = []
        for ep in range(6):
            losses_ep = []
            for inp, out in ds.batches(2, rng):
                params, opt_state, l = step(
                    params, opt_state,
                    jnp.asarray(inp["vorticity"]), jnp.asarray(out["vorticity"]),
                )
                losses_ep.append(float(l))
            epoch_means.append(np.mean(losses_ep))
        # per-sample random windows make single-batch losses noisy; the
        # epoch average must still trend down
        assert epoch_means[-1] < epoch_means[0], epoch_means

    def test_train_step_donation_contract(self):
        """make_train_step donates its params/opt-state buffers by default
        (the measured HBM-headroom lever — RESULTS.md round 4); callers
        must reassign. donate=False preserves the inputs for callers that
        need to hold onto them."""
        from tpu_cfd.models import SFNO
        from tpu_cfd.train import losses, pipeline

        n, steps, out_steps = 8, 2, 2
        model = SFNO(modes_x=2, modes_y=2, modes_t=2, width=4,
                     latent_steps=2, num_spectral_layers=2,
                     output_steps=out_steps)
        x = jnp.zeros((2, n, n, steps), jnp.float32)
        y = jnp.zeros((2, n, n, out_steps), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        loss_fn = losses.SobolevLoss(n_grid=n, norm_order=0, relative=True)
        opt = pipeline.get_optimizer("Adam", 1e-3)
        opt_state = opt.init(params)

        keep = pipeline.make_train_step(model, loss_fn, opt, donate=False)
        p1, o1, _ = keep(params, opt_state, x, y)
        # inputs must still be readable after a donate=False step
        np.asarray(jax.tree_util.tree_leaves(params)[0])

        donating = pipeline.make_train_step(model, loss_fn, opt)
        p2, o2, _ = donating(params, opt_state, x, y)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the donated input buffers are consumed
        assert any(a.is_deleted()
                   for a in jax.tree_util.tree_leaves(params))

    def test_scan_epoch_matches_host_loop(self):
        """The device-resident scan-per-epoch path produces the same params,
        losses, and val metric as the host-driven batch loop fed the same
        rng seed — one dispatch per epoch is an execution-strategy change,
        not a semantics change."""
        from tpu_cfd.models import SFNO
        from tpu_cfd.train import losses, pipeline

        n, T, N, steps, out_steps, bsz = 12, 14, 6, 4, 4, 2
        rng0 = np.random.default_rng(3)
        data = {"vorticity": rng0.standard_normal((N, T, n, n)).astype(np.float32)}
        ds = SpatioTemporalDataset(dict(data), n_samples=N, steps=steps,
                                   out_steps=out_steps, fields=["vorticity"])
        model = SFNO(modes_x=3, modes_y=3, modes_t=2, width=4,
                     latent_steps=4, num_spectral_layers=2,
                     output_steps=out_steps)
        loss_fn = losses.SobolevLoss(n_grid=n, norm_order=0, relative=True)
        opt = pipeline.get_optimizer("Adam", 1e-3)

        inp0, _ = ds.sample(np.arange(2), np.random.default_rng(0))
        params0 = model.init(jax.random.PRNGKey(0),
                             jnp.asarray(inp0["vorticity"]))

        # host path — make_train_step donates its params/opt buffers, so
        # each path gets an independent COPY of the shared initial params
        params_h = jax.tree.map(jnp.copy, params0)
        opt_h = opt.init(params_h)
        step = pipeline.make_train_step(model, loss_fn, opt)
        rng_h = np.random.default_rng(7)
        host_losses = []
        for _ in range(2):
            for inp, out in ds.batches(bsz, rng_h):
                params_h, opt_h, l = step(
                    params_h, opt_h,
                    jnp.asarray(inp["vorticity"]),
                    jnp.asarray(out["vorticity"]),
                )
                host_losses.append(float(l))

        # device-resident path, same seed
        run_epoch = pipeline.make_scan_epoch(
            model, loss_fn, opt, jnp.asarray(ds.data["vorticity"]),
            steps, out_steps,
        )
        params_d = jax.tree.map(jnp.copy, params0)
        opt_d = opt.init(params_d)
        rng_d = np.random.default_rng(7)
        dev_losses = []
        for _ in range(2):
            idx, starts = ds.epoch_indices(bsz, rng_d)
            params_d, opt_d, ls = run_epoch(
                params_d, opt_d, jnp.asarray(idx), jnp.asarray(starts)
            )
            dev_losses.extend(np.asarray(ls).tolist())

        np.testing.assert_allclose(dev_losses, host_losses, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(params_h),
                        jax.tree_util.tree_leaves(params_d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

        # eval: scan path == eval_epoch fed the identical (idx, starts)
        eval_step = pipeline.make_eval_step(model, loss_fn, out_steps=out_steps)
        val_host = pipeline.eval_epoch(eval_step, params_h, ds, bsz)
        run_eval = pipeline.make_scan_eval(
            model, loss_fn, jnp.asarray(ds.data["vorticity"]),
            steps, out_steps, model_out_steps=out_steps,
        )
        vidx, vstarts = ds.epoch_indices(bsz, np.random.default_rng(0),
                                         shuffle=False)
        val_dev = float(run_eval(params_d, jnp.asarray(vidx),
                                 jnp.asarray(vstarts)))
        np.testing.assert_allclose(val_dev, val_host, rtol=1e-5)

    def test_epoch_indices_stream_matches_lazy_draw(self):
        """epoch_indices draws the SAME rng stream as a lazy per-batch loop
        (permutation, then one integers() call per batch in order) — the
        contract that keeps host and device paths bitwise-identical."""
        n, T, N, steps, out_steps, bsz = 8, 20, 7, 4, 4, 2
        data = {"vorticity": np.zeros((N, T, n, n), np.float32)}
        ds = SpatioTemporalDataset(dict(data), n_samples=N, steps=steps,
                                   out_steps=out_steps, fields=["vorticity"])
        idx, starts = ds.epoch_indices(bsz, np.random.default_rng(11))

        rng = np.random.default_rng(11)
        order = rng.permutation(N)
        window = steps + out_steps
        for b, (chunk, s) in enumerate(zip(idx, starts)):
            ref_chunk = order[b * bsz:(b + 1) * bsz]
            ref_s = rng.integers(0, T - (window + 1), size=bsz)
            np.testing.assert_array_equal(chunk, ref_chunk)
            np.testing.assert_array_equal(s, ref_s)

    def test_checkpoint_roundtrip(self, tmp_path):
        from tpu_cfd.models import SFNO
        from tpu_cfd.train import pipeline

        model = SFNO(modes_x=4, modes_y=4, modes_t=2, width=8,
                     latent_steps=4, num_spectral_layers=2)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6))
        )
        path = tmp_path / "ckpt"
        pipeline.save_checkpoint(params, path)
        restored = pipeline.load_checkpoint(path, target=params)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
