"""Multi-device tests on the virtual 8-device CPU mesh.

The reference has no distributed code; these tests define the framework's
scale-out contract: sharded execution must equal single-device execution
(SURVEY.md §4 "add multi-device tests the reference lacks").
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpu_cfd import grids
from tpu_cfd.models import SFNO
from tpu_cfd.parallel import make_mesh, replicate, shard_batch, shard_params
from tpu_cfd.solvers import equations
from tpu_cfd.train import losses


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests require the 8-device CPU mesh"
    return make_mesh(model_parallel=2)


class TestMesh:
    def test_mesh_shape(self, mesh):
        assert mesh.shape == {"data": 4, "model": 2}

    def test_shard_batch_layout(self, mesh):
        x = jnp.arange(8.0 * 4).reshape(8, 4)
        xs = shard_batch(x, mesh)
        assert xs.sharding.spec == jax.sharding.PartitionSpec(
            "data", *([None])
        )
        np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


class TestShardedSolver:
    def test_sharded_solver_equals_single_device(self, mesh):
        n, batch = 32, 8
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
        w0 = jax.random.normal(jax.random.PRNGKey(0), (batch, n, n))
        what = jnp.fft.rfft2(w0)

        step = jax.jit(lambda w: ns.forward(w, 1e-3, steps=5)[0])
        ref = step(what)

        what_sharded = shard_batch(what, mesh)
        with mesh:
            out = step(what_sharded)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-8
        )


class TestShardedTraining:
    @pytest.mark.slow
    def test_sharded_train_step_equals_replicated(self, mesh):
        n_grid, batch, width = 16, 8, 8
        model = SFNO(
            modes_x=4, modes_y=4, modes_t=2, width=width,
            latent_steps=4, num_spectral_layers=2,
        )
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(batch, n_grid, n_grid, 6)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(batch, n_grid, n_grid, 6)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), v)
        loss_obj = losses.SobolevLoss(n_grid=n_grid, norm_order=-1, relative=True)
        opt = optax.adam(1e-3)

        @jax.jit
        def train_step(params, opt_state, v, y):
            loss, grads = jax.value_and_grad(
                lambda p: loss_obj(model.apply(p, v), y)
            )(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        # single device reference
        p_ref, _, loss_ref = train_step(params, opt.init(params), v, y)

        # sharded: dp batch + tp channels
        p_sh = shard_params(params, mesh)
        v_sh = shard_batch(v, mesh)
        y_sh = shard_batch(y, mesh)
        with mesh:
            p_out, _, loss_sh = train_step(p_sh, opt.init(p_sh), v_sh, y_sh)
            jax.block_until_ready(p_out)

        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_out), jax.tree_util.tree_leaves(p_ref)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_params_actually_sharded(self, mesh):
        model = SFNO(
            modes_x=4, modes_y=4, modes_t=2, width=8,
            latent_steps=4, num_spectral_layers=2,
        )
        v = jnp.zeros((2, 16, 16, 6))
        params = model.init(jax.random.PRNGKey(0), v)
        sharded = shard_params(params, mesh)
        specs = {
            leaf.sharding.spec
            for leaf in jax.tree_util.tree_leaves(sharded)
        }
        # at least one parameter must actually be partitioned over "model"
        assert any(
            any(s == "model" for s in (spec or ())) for spec in specs
        ), specs


class TestGraftEntry:
    # the driver exercises both entry points every round; slow-marked to keep
    # the core loop under ~5 min (they stay in the full suite)
    @pytest.mark.slow
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (4, 64, 64, 10)

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestTrainCLIDataParallel:
    def _run(self, tmp_path, monkeypatch, extra):
        from tpu_cfd.train import pipeline, train

        for mod in (pipeline, train):
            monkeypatch.setattr(mod, "MODEL_PATH", str(tmp_path / "models"))
            monkeypatch.setattr(mod, "LOG_PATH", str(tmp_path / "logs"))
        monkeypatch.setattr(pipeline, "DATA_PATH", str(tmp_path))
        argv = [
            "--train-file", str(tmp_path / "traj.npz"),
            "--train-only", "--epochs", "2", "--batch-size", "8",
            "--num-samples", "16", "--num-val-samples", "8",
            "--res", "16", "--modes", "4", "--modes-t", "2", "--width", "8",
            "--latent-steps", "4", "--num-layers", "2",
            "--time-steps", "4", "--out-time-steps", "4", "--lr", "1e-3",
        ] + extra
        return train.main(argv)

    @pytest.mark.slow
    def test_data_parallel_cli_equals_single_device(self, tmp_path, monkeypatch):
        """--data-parallel over 8 CPU devices reproduces the 1-device run."""
        n, T = 16, 12
        rng = np.random.default_rng(0)
        xg, yg = np.meshgrid(
            np.linspace(0, 2 * np.pi, n, endpoint=False),
            np.linspace(0, 2 * np.pi, n, endpoint=False),
            indexing="ij",
        )
        trajs = [
            [
                np.sin(xg + 0.3 * t + rng.uniform(0, 2 * np.pi))
                * np.cos(yg - 0.2 * t)
                for t in range(T)
            ]
            for _ in range(16)
        ]
        np.savez(tmp_path / "traj.npz",
                 vorticity=np.asarray(trajs, dtype=np.float32))

        params_1dev = self._run(tmp_path, monkeypatch, [])
        params_dp = self._run(tmp_path, monkeypatch, ["--data-parallel"])
        for a, b in zip(
            jax.tree_util.tree_leaves(params_1dev),
            jax.tree_util.tree_leaves(params_dp),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )


class TestDataGenDataParallel:
    @pytest.mark.slow
    @pytest.mark.parametrize(
        "impl", [None, "dft_aligned_fused", "dft_galerkin_fused"]
    )
    def test_generate_cli_equals_single_device(self, tmp_path, impl):
        """--data-parallel generation over 8 CPU devices stores the same
        dataset as the single-device run (per-sample fold_in seeding).
        Parametrized over the resolution-aware default impl (dft_galerkin
        at this size, sharded by jit's SPMD partitioner) and both fused
        Pallas stepper layouts (sharded via shard_map) — dft_galerkin_fused
        is the adopted large-batch/1024² data-gen default (round 5)."""
        from tpu_cfd.data import generate

        common = [
            "--grid-size", "32", "--num-samples", "8", "--batch-size", "8",
            "--time", "0.03", "--time-warmup", "0.01", "--dt", "1e-3",
            "--num-steps", "2", "--extra-vars",
        ] + ([] if impl is None else ["--fft-impl", impl])
        p1 = generate.main_mcwilliams(
            common + ["--filepath", str(tmp_path / "single")]
        )
        p2 = generate.main_mcwilliams(
            common + ["--filepath", str(tmp_path / "dp"), "--data-parallel"]
        )
        with np.load(p1) as a, np.load(p2) as b:
            assert set(a.files) == set(b.files)
            # Tolerance model (measured over seeds 0-2 at this exact config,
            # round 4): sharding changes the per-program batch (b8 -> b1
            # shards), which reorders fp32 matmul/FFT reductions. That noise
            # enters the vorticity trajectory at ~2e-7 of its scale, and the
            # finite-difference 1/(record_every*dt) amplifies it into vort_t
            # (measured 1.7-2.2e-5 of scale(vort_t)). residual inherits
            # vort_t's ABSOLUTE noise while its own scale is ~30x smaller,
            # so both derivative-family fields are bounded by scale(vort_t):
            # atol = 1e-4*scale(vort_t) is a 5x margin. Direct fields
            # (vorticity/stream) measured <= 2.7e-7 relative; 1e-5 is 40x.
            scale_vt = np.abs(a["vort_t"]).max()
            for k in a.files:
                x, y = a[k], b[k]
                if x.dtype.kind in "iu":
                    np.testing.assert_array_equal(x, y)
                    continue
                if k in ("vort_t", "residual"):
                    atol = 1e-4 * scale_vt
                else:
                    atol = 1e-5 * np.abs(x).max()
                np.testing.assert_allclose(
                    x, y, rtol=0, atol=atol,
                    err_msg=f"field {k} differs under --data-parallel",
                )

    def test_defaulted_fused_indivisible_batch_falls_back(
        self, tmp_path, monkeypatch
    ):
        """When the resolution-aware DEFAULT resolves to the fused Pallas
        stepper but the --data-parallel batch does not divide the device
        axis, generation must fall back to dft_galerkin AND repin the
        sidecar to the impl actually used (generate.py fallback branch) —
        a stale fused pin would let a later resume silently mix impls."""
        import json

        from tpu_cfd.data import generate

        # force the default to pick fused at a CPU-testable size (the real
        # default only selects it at 256²/batch>=32)
        monkeypatch.setattr(
            generate.equations,
            "recommended_fft_impl",
            lambda *a, **k: "dft_aligned_fused",
        )
        p = generate.main_mcwilliams([
            "--grid-size", "32", "--num-samples", "4", "--batch-size", "4",
            "--time", "0.03", "--time-warmup", "0.01", "--dt", "1e-3",
            "--num-steps", "2", "--data-parallel",
            "--filepath", str(tmp_path), "--filename", "fallback.npz",
        ])
        with open(str(p) + ".meta.json") as f:
            meta = json.load(f)
        assert meta["fft_impl"] == "dft_galerkin"
        # fresh run: repinned, not mixed — no sample ever ran fused
        assert "mixed_fft_impls" not in meta
        with np.load(p) as z:
            assert z["vorticity"].shape[0] == 4

    @pytest.mark.slow
    def test_resumed_fused_fallback_records_mixed_impls(self, tmp_path):
        """Resuming a fused-pinned dataset under --data-parallel with an
        indivisible batch warns and records the impl mix in the sidecar
        instead of silently leaving the stale fused pin (ADVICE r3)."""
        import json

        from tpu_cfd.data import generate

        common = [
            "--grid-size", "32", "--batch-size", "4",
            "--time", "0.03", "--time-warmup", "0.01", "--dt", "1e-3",
            "--num-steps", "2",
            "--filepath", str(tmp_path), "--filename", "mixed.npz",
        ]
        # first half: explicit fused, single device (no divisibility rule)
        generate.main_mcwilliams(
            common + ["--num-samples", "4", "--fft-impl", "dft_aligned_fused"]
        )
        # resume with the DEFAULTED impl (adopts the recorded fused pin),
        # data-parallel: batch 4 cannot divide the 8-device axis -> fallback
        p = generate.main_mcwilliams(
            common + ["--num-samples", "8", "--data-parallel"]
        )
        with open(str(p) + ".meta.json") as f:
            meta = json.load(f)
        assert meta["fft_impl"] == "dft_galerkin"
        assert set(meta["mixed_fft_impls"]) == {
            "dft_aligned_fused", "dft_galerkin"
        }
        with np.load(p) as z:
            assert z["vorticity"].shape[0] == 8

    @pytest.mark.slow
    def test_resumed_incompatible_fused_pin_falls_back(self, tmp_path):
        """Resuming a fused-pinned dataset under a configuration the fused
        kernel cannot run (--double is fp32-only) must not crash in the
        solver constructor: the defaulted resume keeps its compatible
        default, warns, and records the impl mix in the sidecar."""
        import json

        from tpu_cfd.data import generate

        common = [
            "--grid-size", "32", "--batch-size", "4",
            "--time", "0.03", "--time-warmup", "0.01", "--dt", "1e-3",
            "--num-steps", "2",
            "--filepath", str(tmp_path), "--filename", "incompat.npz",
        ]
        generate.main_mcwilliams(
            common + ["--num-samples", "4", "--fft-impl", "dft_aligned_fused"]
        )
        # defaulted resume under --double: the fused pin is fp32-only, so
        # adoption must fall back to the run's own default (fft for fp64)
        p = generate.main_mcwilliams(
            common + ["--num-samples", "8", "--double"]
        )
        with open(str(p) + ".meta.json") as f:
            meta = json.load(f)
        assert meta["fft_impl"] == "fft"
        assert set(meta["mixed_fft_impls"]) == {"dft_aligned_fused", "fft"}
        with np.load(p) as z:
            assert z["vorticity"].shape[0] == 8

    @pytest.mark.slow
    def test_resumed_explicit_impl_mix_repins_sidecar(self, tmp_path):
        """An explicit --fft-impl resume over a different recorded pin must
        repin the sidecar to the impl actually used and record the mix —
        a stale pin would misdescribe the newest samples (code review r4)."""
        import json

        from tpu_cfd.data import generate

        common = [
            "--grid-size", "32", "--batch-size", "4",
            "--time", "0.03", "--time-warmup", "0.01", "--dt", "1e-3",
            "--num-steps", "2",
            "--filepath", str(tmp_path), "--filename", "explicit_mix.npz",
        ]
        generate.main_mcwilliams(
            common + ["--num-samples", "4", "--fft-impl", "dft_galerkin"]
        )
        p = generate.main_mcwilliams(
            common + ["--num-samples", "8", "--fft-impl", "dft_aligned"]
        )
        with open(str(p) + ".meta.json") as f:
            meta = json.load(f)
        assert meta["fft_impl"] == "dft_aligned"
        assert set(meta["mixed_fft_impls"]) == {
            "dft_galerkin", "dft_aligned"
        }
        with np.load(p) as z:
            assert z["vorticity"].shape[0] == 8

    @pytest.mark.slow
    def test_resumed_incompatible_galerkin_pin_falls_back(self, tmp_path):
        """Resuming a dft_galerkin-pinned dataset with --no-dealias must not
        crash in the solver constructor (dft_galerkin steps on the 2/3-rule
        support): the defaulted resume keeps its compatible default, warns,
        and records the impl mix (ADVICE r4)."""
        import json

        from tpu_cfd.data import generate

        common = [
            "--grid-size", "32", "--batch-size", "4",
            "--time", "0.03", "--time-warmup", "0.01", "--dt", "1e-3",
            "--num-steps", "2",
            "--filepath", str(tmp_path), "--filename", "galerkin_pin.npz",
        ]
        generate.main_mcwilliams(
            common + ["--num-samples", "4", "--fft-impl", "dft_galerkin"]
        )
        p = generate.main_mcwilliams(
            common + ["--num-samples", "8", "--no-dealias"]
        )
        with open(str(p) + ".meta.json") as f:
            meta = json.load(f)
        assert meta["fft_impl"] != "dft_galerkin"
        assert "dft_galerkin" in meta["mixed_fft_impls"]
        with np.load(p) as z:
            assert z["vorticity"].shape[0] == 8

    @pytest.mark.slow
    def test_aborted_resume_leaves_sidecar_untouched(self, tmp_path):
        """An explicit --fft-impl resume that dies in pre-generation
        validation (fused + --data-parallel divisibility) must leave the
        sidecar exactly as it was: sidecar writes are deferred until a
        sample is actually about to be generated (ADVICE r4)."""
        import json

        from tpu_cfd.data import generate

        common = [
            "--grid-size", "32", "--batch-size", "4",
            "--time", "0.03", "--time-warmup", "0.01", "--dt", "1e-3",
            "--num-steps", "2",
            "--filepath", str(tmp_path), "--filename", "aborted.npz",
        ]
        p = generate.main_mcwilliams(
            common + ["--num-samples", "4", "--fft-impl", "dft_galerkin"]
        )
        with open(str(p) + ".meta.json") as f:
            before = json.load(f)
        # batch 4 cannot divide the 8-device axis: explicit fused raises
        with pytest.raises(ValueError, match="divisible"):
            generate.main_mcwilliams(
                common + [
                    "--num-samples", "8", "--data-parallel",
                    "--fft-impl", "dft_aligned_fused",
                ]
            )
        with open(str(p) + ".meta.json") as f:
            after = json.load(f)
        assert after == before

    @pytest.mark.slow
    def test_legacy_resume_repin_writes_full_schema(self, tmp_path):
        """A repin that CREATES the sidecar (legacy dataset with samples but
        no sidecar file) must record the full schema — dt/visc/seed/double/
        dealias — not a bare fft_impl pin (ADVICE r4)."""
        import json
        import os

        from tpu_cfd.data import generate

        common = [
            "--grid-size", "32", "--batch-size", "4",
            "--time", "0.03", "--time-warmup", "0.01", "--dt", "1e-3",
            "--num-steps", "2",
            "--filepath", str(tmp_path), "--filename", "legacy.npz",
        ]
        p = generate.main_mcwilliams(common + ["--num-samples", "4"])
        os.remove(str(p) + ".meta.json")  # simulate a pre-sidecar dataset
        # defaulted fused resume, data-parallel, indivisible batch -> the
        # fallback branch repins; with no sidecar this CREATES the file
        import unittest.mock as mock

        with mock.patch.object(
            generate.equations,
            "recommended_fft_impl",
            lambda *a, **k: "dft_aligned_fused",
        ):
            p = generate.main_mcwilliams(
                common + ["--num-samples", "8", "--data-parallel"]
            )
        with open(str(p) + ".meta.json") as f:
            meta = json.load(f)
        assert meta["fft_impl"] == "dft_galerkin"
        for key in ("dt", "visc", "seed", "double", "dealias",
                    "mxu_precision"):
            assert key in meta, f"legacy repin sidecar missing {key!r}"


class TestShardedFinetune:
    @pytest.mark.slow
    def test_data_parallel_finetune_equals_single_device(self, mesh):
        """A few OutConvFT adam iterations (differentiating THROUGH the CN
        solver kernel) under data-parallel sharding match the unsharded run
        — the fine-tune pipeline's only multi-device coverage (VERDICT r4
        weak #5; reference counterpart: fno/finetune.py:166-209)."""
        from tpu_cfd.models.base import apply_with_latents
        from tpu_cfd.train import finetune

        n_grid, t_win = 16, 4
        batch = mesh.shape["data"] * 2
        model = SFNO(modes_x=4, modes_y=4, modes_t=2, width=8,
                     latent_steps=t_win, num_spectral_layers=2,
                     output_steps=t_win)
        key = jax.random.PRNGKey(0)
        w_in = jnp.asarray(
            np.random.default_rng(5).normal(
                size=(batch, n_grid, n_grid, t_win)), jnp.float32)
        params = model.init(key, w_in)
        _, latents = apply_with_latents(model, params, w_in, out_steps=t_win)
        v_latent = latents["r"]
        qft, ft_params = finetune.build_finetune_outconv(
            params, (4, 4, 2), (5, 5, 2), jax.random.PRNGKey(7),
            v_latent, w_in, out_steps=t_win,
            visc=1e-3, dt=1e-6, diam=1.0, finetune=True,
        )
        ft_ref, hist_ref = finetune.finetune_steps(
            qft, ft_params, v_latent, w_in, None, out_steps=t_win,
            n_steps=3, lr=1e-3,
        )
        with mesh:
            ft_sh, hist_sh = finetune.finetune_steps(
                qft, replicate(ft_params, mesh),
                shard_batch(v_latent, mesh), shard_batch(w_in, mesh),
                None, out_steps=t_win, n_steps=3, lr=1e-3,
            )
        assert np.isfinite(hist_sh).all()
        np.testing.assert_allclose(hist_ref, hist_sh, rtol=1e-5, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(ft_ref),
                        jax.tree_util.tree_leaves(ft_sh)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


class TestSpatialSharding:
    def test_pencil_sharded_solver_step_equals_replicated(self, mesh):
        """A spectral solver step with one spatial axis sharded over "model"
        (pencil-decomposed FFT: XLA inserts the all_to_all transposes)
        matches the replicated run."""
        from tpu_cfd.parallel import shard_field_spatial

        n, batch = 64, 4
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
        w0 = jax.random.normal(jax.random.PRNGKey(7), (batch, n, n), jnp.float32)
        what = jnp.fft.rfft2(w0)
        step = jax.jit(lambda w: ns.forward(w, 1e-3, steps=10)[0])

        ref = step(what)
        what_sharded = shard_field_spatial(what, mesh, spatial_axis=-2)
        assert any(
            s == "model" for s in (what_sharded.sharding.spec or ()) if s
        )
        with mesh:
            out = step(what_sharded)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestShardedFusedRollout:
    def test_fused_pipeline_sharded_equals_single_device(self, mesh):
        """The fused Pallas rollout cannot be split by XLA's SPMD
        partitioner; the generation pipeline shard_maps it over the "data"
        axis instead (generate.py make_batch_pipeline(mesh=...)). Contract:
        warmup + chunked recording + in-program postprocess produce the
        same dataset sharded as on one device."""
        from tpu_cfd.data.generate import make_batch_pipeline

        n, batch = 32, 8
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        ns2d = equations.NavierStokes2DSpectral(
            viscosity=1e-3, grid=grid, fft_impl="dft_aligned", fused=True
        )
        w0 = jax.random.normal(
            jax.random.PRNGKey(3), (batch, n, n), jnp.float32
        )
        what = jnp.fft.rfft2(w0)
        # warmup 3 steps over 2-step programs and 2 records over 1-record
        # chunks: exercises both shard_map'd program shapes plus the
        # host-side chunk re-feed of the sharded carry
        kw = dict(
            dt=1e-3, warmup_steps=3, total_steps=4, record_every=2, ns=16,
            fields=("vorticity", "vort_t"), max_steps_per_program=2,
        )
        ref = make_batch_pipeline(ns2d, **kw)(what)
        with mesh:
            out = make_batch_pipeline(ns2d, mesh=mesh, **kw)(
                shard_batch(what, mesh)
            )
        assert set(out) == set(ref)
        for k in ref:
            # absolute tolerance scaled per field: fp32 dot-summation order
            # differs between the b8 and per-shard b2 programs, and vort_t
            # divides that noise by steps*dt
            scale = float(np.abs(ref[k]).max())
            np.testing.assert_allclose(
                out[k], ref[k], rtol=0, atol=1e-4 * scale,
                err_msg=f"field {k} differs under the sharded fused rollout",
            )

    def test_sharded_rollout_rejects_ragged_batch(self, mesh):
        from tpu_cfd.solvers import trajectories

        n = 32
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        ns2d = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
        what = jnp.fft.rfft2(
            jax.random.normal(jax.random.PRNGKey(0), (6, n, n), jnp.float32)
        )
        with pytest.raises(ValueError, match="divisible"):
            trajectories.get_trajectory_imex_chunked(
                ns2d, what, 1e-3, num_steps=2, mesh=mesh
            )
