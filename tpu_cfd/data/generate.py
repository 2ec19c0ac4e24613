"""Turbulence dataset generation: McWilliams2d, Kolmogorov2d, and FNO data.

TPU-native counterpart of the reference's three data-gen CLIs
(``fno/data_gen/data_gen_McWilliams2d.py`` main :27,
``data_gen_Kolmogorov2d.py`` main :28, ``data_gen_fno.py`` main :28). The
per-batch pipeline — initial condition → warmup → recorded rollout →
inverse FFT → subsample — is ONE jitted program per batch: the warmup is a
``lax.scan``, the recording rollout is ``trajectories.get_trajectory_imex``,
and subsampling is strided slicing of the spectral reconstruction, so the
host only sees one transfer per batch. NaN/divergence guards run host-side
on the recorded snapshots (the jit-safe equivalent of the reference's raise
in solvers.py:389-391).

Usage (mirrors the reference's flags):
  python -m tpu_cfd.data.generate mcwilliams --grid-size 256 --subsample 4 \
      --num-samples 1152 --batch-size 128 --visc 1e-3 --time 10 \
      --time-warmup 4.5 --dt 1e-3 --num-steps 100
  python -m tpu_cfd.data.generate kolmogorov ...
  python -m tpu_cfd.data.generate fno --alpha 2.5 --tau 7 ...

``--data-parallel`` shards each generation batch over every available device
(mesh + NamedSharding on the sample axis); per-sample ``fold_in`` seeding
keeps the stored dataset device-count-invariant up to fp32 reduction order.
"""

from __future__ import annotations

import functools
import json
import math
import os
import sys
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tpu_cfd import grids
from tpu_cfd.data import data_utils
from tpu_cfd.data.grf import GRF2d
from tpu_cfd.solvers import equations, forcings, initial_conditions as ic
from tpu_cfd.solvers import trajectories
from tpu_cfd.solvers.equations import (
    IMEXStepper,
    NavierStokes2DSpectral,
    RK4CrankNicolsonStepper,
)


def _subsample_field(x: jax.Array, ns: int) -> jax.Array:
    """Bilinear downsample of (..., n, n) fields to (..., ns, ns)."""
    if x.shape[-1] == ns:
        return x
    out_shape = (*x.shape[:-2], ns, ns)
    return jax.image.resize(x, out_shape, method="bilinear")


def make_batch_pipeline(
    ns2d: NavierStokes2DSpectral,
    dt: float,
    warmup_steps: int,
    total_steps: int,
    record_every: int,
    ns: int,
    fields=("vorticity",),
    max_steps_per_program: int = 2000,
    mesh=None,
):
    """Returns a fn: ŵ0 batch -> physical-space records dict (host numpy).

    The warmup and recording rollout are split into compiled programs of at
    most ``max_steps_per_program`` solver steps each: the device tunnel kills
    single programs that run longer than a few minutes, and bounding the
    program also bounds HBM (each program holds one chunk of records, already
    irfft'd and subsampled in-program). ``fields`` limits what the rollout
    records — vorticity-only runs keep 4× less than all four fields.

    ``mesh``: optional ``jax.sharding.Mesh``; warmup and rollout programs are
    then ``shard_map``'d over its "data" axis (batch must divide evenly).
    Required for the fused Pallas stepper under ``--data-parallel`` (SPMD
    cannot split a ``pallas_call``); the plain XLA paths shard equally well
    through jit's partitioner, so they only need this when fused.
    """
    n = ns2d.grid.shape[-1]

    def postprocess(recs):
        return {
            k: _subsample_field(jnp.fft.irfft2(v, s=(n, n)), ns)
            for k, v in recs.items()
        }

    @functools.partial(jax.jit, static_argnums=1)
    def fwd(w, s):
        step = lambda w_: ns2d.forward(w_, dt, steps=s)[0]
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            # check_vma off: the vma check cannot see through a pallas_call
            step = jax.shard_map(
                step, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                check_vma=False,
            )
        return step(w)

    def pipeline(vort_hat: jax.Array) -> Dict[str, np.ndarray]:
        remaining = warmup_steps
        while remaining > 0:  # at most 2 distinct sizes -> 2 compiles
            s = min(max_steps_per_program, remaining)
            vort_hat = fwd(vort_hat, s)
            remaining -= s
        records_per_chunk = max(1, max_steps_per_program // record_every)
        result, _ = trajectories.get_trajectory_imex_chunked(
            ns2d,
            vort_hat,
            dt,
            num_steps=total_steps,
            record_every_steps=record_every,
            fields=fields,
            records_per_chunk=records_per_chunk,
            postprocess=postprocess,
            mesh=mesh,
        )
        return result

    return pipeline


def _read_meta(meta_path: str) -> dict:
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def _write_meta(meta_path: str, meta: dict) -> None:
    with open(meta_path, "w") as f:
        json.dump(meta, f)


def _repin_meta(
    meta_path: str, new_impl: str, *, record_mix: bool, base: dict | None = None
) -> None:
    """Rewrite the sidecar's ``fft_impl`` pin to the impl actually in use.

    With ``record_mix``, a previous, different pin is folded into
    ``mixed_fft_impls`` so later resumes can see the dataset is not pure —
    the sidecar invariant is truthfulness, not purity. Every pin update in
    this module goes through this helper so the semantics live in one place.
    ``base`` seeds the full sidecar schema (dt/visc/seed/double/dealias/...)
    when the file is missing or empty — a legacy resumed dataset has no
    sidecar, and a bare ``{"fft_impl": ...}`` pin would leave later resumes
    a structurally incomplete record.
    """
    meta = _read_meta(meta_path)
    if not meta and base:
        meta = dict(base)
    old = meta.get("fft_impl")
    if record_mix and old and old != new_impl:
        mixed = set(meta.get("mixed_fft_impls", [])) | {old, new_impl}
        meta["mixed_fft_impls"] = sorted(mixed)
    meta["fft_impl"] = new_impl
    _write_meta(meta_path, meta)


def run_generation(
    args,
    make_initial_vorticity,
    forcing_fn=None,
    solver=None,
    logger=None,
    example_name: str = "ns2d",
):
    """Shared batch-generation driver (resume-aware, incremental saves)."""
    if args.boundary != "periodic":
        # the pseudo-spectral solver is periodic-only, as in the reference
        # (README.md:62); the FVM stack supports walls but has no dataset CLI
        raise NotImplementedError(
            f"--boundary {args.boundary}: spectral data generation is periodic-only"
        )
    n = args.grid_size
    subsample = args.subsample
    ns = n // subsample
    diam = data_utils.parse_diam(args.diam)
    visc = args.visc if args.Re is None else 1.0 / args.Re
    T, T_warmup, dt = args.time, args.time_warmup, args.dt
    record_steps = args.num_steps
    warmup_steps = int(T_warmup / dt)
    total_steps = int((T - T_warmup) / dt)
    record_every = max(1, total_steps // record_steps)
    save_dtype = np.float64 if args.double else np.float32
    if args.double:
        # fp64 solves run on CPU: TPUs support neither float64 math nor
        # complex128 FFTs. Mirrors the reference, which generates its 256^2
        # test trajectories in double precision (data_utils.py --double flag,
        # train.py:208-209 fp64 eval defaults).
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_platforms", "cpu")
    compute_dtype = jnp.float64 if args.double else jnp.float32

    filepath = args.filepath or data_utils.DATA_PATH
    os.makedirs(filepath, exist_ok=True)
    if args.filename is None:
        extra = "_extra" if args.extra_vars else ""
        dtype_str = "_fp64" if args.double else ""
        # subsampled runs are named "{n}to{ns}" (solve resolution -> stored
        # resolution) so the train CLI's DATA_FILES registry resolves them
        # out of the box; same-resolution runs keep the "{ns}x{ns}" form
        res = f"{n}to{ns}" if subsample > 1 else f"{ns}x{ns}"
        args.filename = (
            f"{example_name}{extra}{dtype_str}_{res}_N{args.num_samples}"
            f"_v{visc:.0e}_T{int(T)}_steps{record_steps}.npz"
        ).replace("e-0", "e-")
    data_filepath = os.path.join(filepath, args.filename)
    # sidecar metadata pins the solver configuration of a resumable run
    # (see the resume block below)
    meta_path = data_filepath + ".meta.json"

    logger = logger or data_utils.get_logger()
    logger.info(" | ".join(f"{k}={v}" for k, v in vars(args).items()))

    existing = 0
    if os.path.exists(data_filepath) and not args.force_rerun:
        existing = data_utils.count_existing_samples(data_filepath)
        if existing >= args.num_samples:
            logger.info(f"{data_filepath} already has {existing} samples; done.")
            return data_filepath
    elif args.force_rerun and os.path.exists(data_filepath):
        os.remove(data_filepath)
        if os.path.exists(meta_path):  # stale pin from the discarded run
            os.remove(meta_path)
    existing = max(existing, data_utils.count_existing_samples(data_filepath))
    if existing >= args.num_samples:
        data_utils.merge_parts(data_filepath)
        return data_filepath

    grid = grids.Grid((n, n), domain=((0, diam), (0, diam)))
    fft_impl = getattr(args, "fft_impl", None)
    fft_impl_explicit = fft_impl is not None
    # the fused Pallas kernel bakes the low-storage RK4-CN update; dataset
    # CLIs that step with a different integrator (the fno recipe's
    # IMEXStepper, reference data_gen semantics) cannot run it
    fused_ok = solver is None or (
        isinstance(solver, RK4CrankNicolsonStepper)
        and solver.low_storage and solver.order == 4
    )
    if fft_impl is None:
        # resolution- and batch-aware default (round-4 crossover sweep,
        # results/crossover_r4.jsonl): dft_galerkin everywhere except the
        # 256²/large-batch operating point where the fused Pallas stepper
        # measured 1.75× faster; fft for fp64 (CPU) and --no-dealias runs.
        fft_impl = equations.recommended_fft_impl(
            n, args.batch_size, double=args.double,
            dealias=not args.no_dealias,
        )
        if fft_impl.endswith("_fused") and not fused_ok:
            fft_impl = "dft_galerkin"
    elif fft_impl.endswith("_fused") and not fused_ok:
        raise ValueError(
            f"--fft-impl {fft_impl} is incompatible with this "
            f"dataset's time integrator ({type(solver).__name__}); the "
            "fused kernel implements the low-storage RK4-CN stepper only"
        )
    mxu_precision = getattr(args, "mxu_precision", "high")

    def _impl_compatible(impl: str) -> bool:
        """Can ``impl`` run under this invocation's solver configuration?

        Mirrors the constructor constraints in
        ``equations.NavierStokes2DSpectral.__post_init__``: the fused
        stepper bakes the low-storage RK4-CN update, fp32, and the 2/3-rule
        support; ``dft_galerkin`` steps on the dealiasing support and needs
        ``smooth=True``. Adopting an incompatible recorded pin would crash
        in the constructor instead of falling back with a warning.
        """
        if impl.endswith("_fused"):
            return fused_ok and not args.double and not args.no_dealias
        if impl == "dft_galerkin":
            return not args.no_dealias
        return True

    # sidecar metadata pins the solver configuration of a resumable run:
    # different fft_impls agree only to the fp32 noise floor, so parts of
    # one dataset must never mix them silently (the default impl can change
    # between framework versions). All sidecar WRITES are deferred until
    # every pre-generation validation has passed (just before the batch
    # loop): an invocation that dies in an argument check must not leave
    # the pin pointing at an impl that generated zero samples.
    sidecar_needs_repin = False
    if existing > 0 and os.path.exists(meta_path):
        meta = _read_meta(meta_path)
        rec_impl = meta.get("fft_impl")
        rec_prec = meta.get("mxu_precision")
        if rec_impl and rec_impl != fft_impl:
            if fft_impl_explicit:
                logger.warning(
                    f"resuming {data_filepath} with --fft-impl {fft_impl} "
                    f"but existing samples were generated with {rec_impl}; "
                    "the dataset will mix transform implementations"
                )
                # keep the pin truthful: record the mix and repin to the
                # impl the remaining samples will actually use
                sidecar_needs_repin = True
            elif not _impl_compatible(rec_impl):
                # the recorded pin cannot run under this configuration
                # (wrong integrator, --double, or --no-dealias): adopting
                # it blindly would crash in the solver constructor, so
                # keep the already-computed compatible default instead
                logger.warning(
                    f"resume: recorded fft_impl={rec_impl} is incompatible "
                    "with this run's integrator/precision/dealias settings; "
                    f"continuing with {fft_impl} — the dataset will mix "
                    "transform implementations"
                )
                sidecar_needs_repin = True
            else:
                logger.info(
                    f"resume: adopting recorded fft_impl={rec_impl} "
                    f"(current default would be {fft_impl})"
                )
                fft_impl = rec_impl
                if rec_prec:
                    mxu_precision = rec_prec
    fused = fft_impl.endswith("_fused")
    mesh = None
    if getattr(args, "data_parallel", False):
        # shard the sample batch over every available device: each device
        # rolls out batch/n_dev trajectories of the same compiled program.
        # Seeding stays per-sample (fold_in below), so the stored dataset is
        # bit-identical whatever the device count — including 1.
        from tpu_cfd.parallel import make_mesh

        mesh = make_mesh()
        logger.info(
            f"data-parallel over {mesh.shape['data']} device(s): {mesh}"
        )
        if fused:
            # XLA's SPMD partitioner cannot split a pallas_call, so the
            # fused rollout shards via shard_map inside the pipeline —
            # which needs EVERY batch that actually runs (including a
            # ragged final one) to divide evenly over the data axis
            n_dev = mesh.shape["data"]
            todo_now = args.num_samples - existing
            full = min(args.batch_size, todo_now)
            last = todo_now % args.batch_size or full
            if full % n_dev or last % n_dev:
                if fft_impl_explicit:
                    raise ValueError(
                        f"--fft-impl {fft_impl} with --data-parallel "
                        f"needs every generation batch divisible by the "
                        f"{n_dev}-device data axis; got batches of {full} "
                        f"with a final batch of {last} "
                        f"(remaining samples: {todo_now})"
                    )
                # defaulted impl: fall back to the fastest XLA path, which
                # shards through jit's SPMD partitioner with no divisibility
                # constraint (physics agrees to the fp32 noise floor)
                msg = (
                    f"batching ({full}, final {last}) does not divide the "
                    f"{n_dev}-device data axis: falling back from the fused "
                    f"stepper to fft_impl=dft_galerkin"
                )
                if existing > 0:
                    # resumed run: earlier samples were generated with the
                    # recorded (fused) impl, so the finished dataset mixes
                    # transform implementations — warn like the explicit-
                    # impl mix path and record the mix in the sidecar
                    logger.warning(
                        f"resuming {data_filepath}: {msg}; the dataset "
                        "will mix transform implementations"
                    )
                else:
                    logger.info(msg)
                fft_impl = "dft_galerkin"
                fused = False
                # the deferred sidecar flush below pins the impl actually
                # used; for resumed runs it additionally records the mix
                sidecar_needs_repin = existing > 0
    ns2d = NavierStokes2DSpectral(
        viscosity=visc,
        grid=grid,
        drag=args.gamma,
        smooth=not args.no_dealias,
        forcing_fn=forcing_fn,
        solver=solver or RK4CrankNicolsonStepper(),
        dtype=compute_dtype,
        fft_impl=fft_impl[: -len("_fused")] if fused else fft_impl,
        mxu_precision=mxu_precision,
        fused=fused,
    )
    fields = (
        ("vorticity", "stream", "vort_t", "residual")
        if args.extra_vars
        else ("vorticity",)
    )
    pipeline = make_batch_pipeline(
        ns2d, dt, warmup_steps, total_steps, record_every, ns, fields=fields,
        max_steps_per_program=args.max_steps_per_program,
        # the XLA paths shard through jit's SPMD partitioner (sharded inputs
        # below); only the fused pallas_call needs the explicit shard_map
        mesh=mesh if fused else None,
    )
    # jit the IC construction too: eager op chains dispatch one tiny program
    # per op, which is both slow over the device tunnel and flaky
    make_ic_jit = jax.jit(
        lambda keys: make_initial_vorticity(keys, grid, compute_dtype)
    )

    # deferred sidecar flush: every pre-generation validation has passed
    # (argument checks, solver constructor, pipeline construction), so the
    # pin now records an impl that is actually about to generate samples
    meta_now = {
        "fft_impl": fft_impl, "mxu_precision": mxu_precision,
        "dt": dt, "visc": visc, "seed": args.seed,
        "double": bool(args.double), "dealias": not args.no_dealias,
    }
    if existing == 0:
        _write_meta(meta_path, meta_now)
    elif sidecar_needs_repin:
        # base= populates the full schema when a legacy resumed dataset has
        # no sidecar yet; record_mix folds a different prior pin into
        # mixed_fft_impls (no-op when the prior pin is absent or identical)
        _repin_meta(meta_path, fft_impl, record_mix=True, base=meta_now)

    base_key = jax.random.PRNGKey(args.seed)
    batch_size = args.batch_size
    todo = args.num_samples - existing
    num_batches = math.ceil(todo / batch_size)
    logger.info(
        f"Generating {todo} samples in {num_batches} batches "
        f"(resuming from {existing}) -> {data_filepath}"
    )

    def _maybe_shard(batch_array):
        if mesh is None or batch_array.shape[0] % mesh.shape["data"] != 0:
            return batch_array
        from tpu_cfd.parallel import shard_batch

        return shard_batch(batch_array, mesh)

    for b in range(num_batches):
        idx0 = existing + b * batch_size
        sample_ids = np.arange(idx0, min(idx0 + batch_size, args.num_samples))
        keys = jnp.stack([jax.random.fold_in(base_key, int(i)) for i in sample_ids])
        logger.info(
            f"batch [{b + 1}/{num_batches}] samples {sample_ids[0]}..{sample_ids[-1]}"
        )
        vort_init = make_ic_jit(_maybe_shard(keys))
        vort_hat = jnp.fft.rfft2(vort_init)
        result = pipeline(vort_hat)
        result = {k: np.asarray(v, dtype=save_dtype) for k, v in result.items()}

        # divergence guard (host-side, after the compiled rollout)
        w = result["vorticity"]
        if not np.isfinite(w).all():
            raise FloatingPointError(
                f"trajectory diverged in batch {b} (samples {sample_ids[0]}..)"
            )
        vort_norm = np.linalg.norm(w[:, -1], axis=(-2, -1)).mean() / ns
        logger.info(
            f"  final-snapshot vorticity ell2 {vort_norm:.4e} | "
            f"shapes {w.shape}"
        )

        if not args.extra_vars:
            for key in ("vort_t", "stream", "residual"):
                result[key] = np.empty((len(sample_ids), 0), dtype=save_dtype)
        result["random_states"] = np.asarray(sample_ids, dtype=np.int32)
        data_utils.save_part(result, data_filepath)

    data_utils.merge_parts(data_filepath)
    logger.info(f"Done: {data_filepath}")
    if args.demo_plots:
        try:
            out = data_utils.verify_trajectories(
                data_filepath,
                dt=record_every * dt,
                T_warmup=T_warmup,
                n_samples=1,
            )
            logger.info(f"verification plot: {out}")
        except Exception as e:  # plotting must never kill a finished run
            logger.error(f"Error in plotting: {e}")
    return data_filepath


def main_mcwilliams(argv=None):
    """Decaying isotropic turbulence, McWilliams-1984 initial condition.

    Counterpart of reference data_gen_McWilliams2d.py:27-191.
    """
    parser = data_utils.get_args_ns2d(
        "Generate NSE 2d decaying turbulence with McWilliams initial vorticity"
    )
    parser.set_defaults(time=10.0, time_warmup=4.5, dt=1e-3, num_steps=100,
                        diam=2 * math.pi, forcing="none")
    args = parser.parse_args(argv)

    def make_ic(keys, grid, dtype=jnp.float32):
        return jax.vmap(
            lambda k: ic.vorticity_field(
                k, grid, args.peak_wavenumber, dtype=dtype
            ).data
        )(keys)

    return run_generation(
        args, make_ic, forcing_fn=None, example_name="McWilliams2d",
    )


def main_kolmogorov(argv=None):
    """Forced Kolmogorov flow with drag 0.1 (reference data_gen_Kolmogorov2d.py)."""
    parser = data_utils.get_args_ns2d("Generate NSE 2d Kolmogorov flow")
    parser.set_defaults(
        time=10.0, time_warmup=4.5, dt=1e-3, num_steps=100,
        diam=2 * math.pi, gamma=0.1, max_velocity=5.0,
    )
    args = parser.parse_args(argv)
    diam = data_utils.parse_diam(args.diam)
    n = args.grid_size
    grid = grids.Grid((n, n), domain=((0, diam), (0, diam)))
    forcing = forcings.KolmogorovForcing(
        grid=grid, scale=args.scale, wave_number=args.peak_wavenumber,
        diam=diam, vorticity=False,
    )

    def make_ic(keys, grid, dtype=jnp.float32):
        # IC = curl of a filtered divergence-free velocity field
        from tpu_cfd.ops import finite_differences as fdm

        def one(k):
            v = ic.filtered_velocity_field(
                k, grid, maximum_velocity=args.max_velocity,
                peak_wavenumber=args.peak_wavenumber, dtype=dtype,
            )
            return fdm.curl_2d(v).data

        return jax.vmap(one)(keys)

    return run_generation(
        args, make_ic, forcing_fn=forcing, example_name="Kolmogorov2d",
    )


def main_fno(argv=None):
    """FNO-paper dataset: GRF IC + SinCos forcing, IMEX order 2.

    Counterpart of reference data_gen_fno.py:28-273.
    """
    parser = data_utils.get_args_ns2d("Generate the original FNO data for NSE in 2D")
    parser.set_defaults(
        time=50.0, time_warmup=30.0, dt=1e-3, num_steps=100,
        diam=1.0, scale=0.1, alpha=2.5, tau=7.0, peak_wavenumber=1,
    )
    args = parser.parse_args(argv)
    diam = data_utils.parse_diam(args.diam)
    n = args.grid_size
    grid = grids.Grid((n, n), domain=((0, diam), (0, diam)))
    forcing = forcings.SinCosForcing(
        grid=grid, scale=args.scale, diam=diam,
        wave_number=args.peak_wavenumber, vorticity=True,
    )
    grf = GRF2d(
        n=n, alpha=args.alpha, tau=args.tau, normalize=args.normalize,
        smoothing=args.replicable_init,
        dtype=jnp.float64 if args.double else jnp.float32,
    )

    def make_ic(keys, grid, dtype=jnp.float32):
        del dtype  # the GRF sampler above is already built at compute dtype
        samples = jax.vmap(lambda k: grf.sample(k, bsz=1, n=n)[0])(keys)
        return samples

    return run_generation(
        args,
        make_ic,
        forcing_fn=forcing,
        solver=IMEXStepper(order=2),
        example_name="fnodata",
    )


_MAINS = {
    "mcwilliams": main_mcwilliams,
    "kolmogorov": main_kolmogorov,
    "fno": main_fno,
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in _MAINS:
        print(f"usage: python -m tpu_cfd.data.generate {{{'|'.join(_MAINS)}}} [flags]")
        raise SystemExit(2)
    dataset = sys.argv[1]
    return _MAINS[dataset](sys.argv[2:])


if __name__ == "__main__":
    main()
