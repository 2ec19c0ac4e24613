"""SFNO training CLI: trajectory-to-trajectory operator learning.

TPU-native counterpart of the reference's ``fno/train.py`` (main: train.py:47,
DATA_FILES registry: :33-44, OneCycleLR: :145-152, SobolevLoss: :154,
best-validation checkpointing: :197-199, high-resolution eval phase:
:207-252, argparse: :278-313).

The torch epoch loop becomes ONE jitted ``lax.scan`` per epoch over the
device-resident dataset (pipeline.make_scan_epoch; ``--host-data`` falls
back to per-batch host slicing + jitted train_step). Batches can be sharded
over a device mesh with ``--data-parallel`` (the reference is single-device
only).

Example (reproduces the reference's McWilliams run, fno/README.md:72):
  python -m tpu_cfd.train.train --example McWilliams2d --epochs 15 \
      --num-samples 1152 --batch-size 64 --width 10 --modes 32 --modes-t 5
"""

from __future__ import annotations

import argparse
import os
import re
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_cfd.data.data_utils import get_logger
from tpu_cfd.data.datasets import SpatioTemporalDataset
from tpu_cfd.models import SFNO
from tpu_cfd.train import losses, pipeline
from tpu_cfd.train.pipeline import DATA_PATH, LOG_PATH, MODEL_PATH

# Default dataset files as produced by ``python -m tpu_cfd.data.generate``
# (counterpart of the reference's DATA_FILES registry, train.py:33-44; names
# follow generate.py's own convention so the two CLIs compose out of the box)
DATA_FILES = {
    "fno": {
        # 256²-solved → 64²-subsampled, matching the reference's data
        # semantics (fno/README.md:14) — controls zero-shot super-resolution
        "train": "fnodata_extra_256to64_N1280_v1e-3_T50_steps100.npz",
        "valid": "fnodata_extra_256to64_N1280_v1e-3_T50_steps100.npz",
        "test": "fnodata_extra_fp64_256x256_N16_v1e-3_T50_steps100.npz",
    },
    "McWilliams2d": {
        "train": "McWilliams2d_256to64_N1152_v1e-3_T10_steps100.npz",
        "valid": "McWilliams2d_256to64_N1152_v1e-3_T10_steps100.npz",
        "test": "McWilliams2d_fp64_256x256_N16_v1e-3_T10_steps100.npz",
    },
}


def _resolve_data(example: str, split: str, override: str = None) -> str:
    if override:
        return override if os.path.isabs(override) else os.path.join(DATA_PATH, override)
    fname = DATA_FILES[example][split]
    path = os.path.join(DATA_PATH, fname)
    if not os.path.exists(path):
        # legacy generate.py naming: subsampled sets were "{ns}x{ns}" before
        # the "{n}to{ns}" convention — accept files already on disk
        legacy = re.sub(r"_\d+to(\d+)_", r"_\1x\1_", path)
        # the reference's .pt naming (datasets read both)
        for alt in (legacy, path.replace(".npz", ".pt"),
                    legacy.replace(".npz", ".pt")):
            if os.path.exists(alt):
                return alt
    return path


def main(args=None):
    args = get_parser().parse_args(args)
    if args.double:
        # fp64 is a CPU-only path (TPUs have no float64/complex128 — the
        # Sobolev metric's rfft would fail to compile); mirrors the
        # reference's fp64 eval phase (train.py:207-209). Platform forcing
        # must happen before the first backend bind (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    pipeline.ensure_paths()
    current_time = datetime.now().strftime("%d_%b_%Y_%Hh%Mm")
    logger = get_logger(
        os.path.join(LOG_PATH, f"{current_time}_train.log"), name="tpu_cfd.train"
    )
    logger.info("Arguments: " + " | ".join(f"{k}={v}" for k, v in vars(args).items()))

    example = args.example
    n = args.res
    fs = args.field
    time_steps, out_steps = args.time_steps, args.out_time_steps

    train_path = _resolve_data(example, "train", args.train_file)
    val_path = _resolve_data(example, "valid", args.train_file)
    logger.info(f"Training: first {args.num_samples} samples of {train_path}")

    train_dataset = SpatioTemporalDataset(
        data_path=train_path,
        n_samples=args.num_samples,
        fields=[fs],
        steps=time_steps,
        out_steps=out_steps,
    )
    val_dataset = SpatioTemporalDataset(
        data_path=val_path,
        n_samples=args.num_val_samples,
        fields=[fs],
        steps=time_steps,
        out_steps=out_steps,
        train=False,
    )

    model = SFNO(
        modes_x=args.modes,
        modes_y=args.modes,
        modes_t=args.modes_t,
        width=args.width,
        beta=args.beta,
        num_spectral_layers=args.num_layers,
        output_steps=out_steps,
        spatial_padding=args.spatial_padding,
        activation=args.activation,
        spatial_random_feats=args.spatial_random_feats,
        lift_activation=not args.lift_linear,
        latent_steps=args.latent_steps,
        mxu_precision=args.mxu_precision,
        compute_dtype=args.compute_dtype,
        remat=args.remat,
    )
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    sample_inp, _ = train_dataset.sample(np.arange(min(2, len(train_dataset))))
    params = jax.jit(model.init)(key, jnp.asarray(sample_inp[fs]))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logger.info(f"Number of parameters: {n_params}")

    mesh = None
    if args.data_parallel:
        # Pure data parallelism over all local devices: batches shard on the
        # "data" mesh axis, parameters are replicated, and XLA inserts the
        # gradient all-reduce (psum over ICI). No reference counterpart —
        # the reference is single-device only (SURVEY.md §2.4).
        from tpu_cfd.parallel import make_mesh, replicate, shard_batch

        n_dev = len(jax.devices())
        if args.batch_size % n_dev != 0:
            raise ValueError(
                f"--data-parallel: batch size {args.batch_size} must be"
                f" divisible by the device count {n_dev}"
            )
        mesh = make_mesh(model_parallel=1)
        params = replicate(params, mesh)
        logger.info(f"Data-parallel over {n_dev} devices: {mesh}")

    def device_put_batch(x):
        x = jnp.asarray(x)
        if mesh is not None and x.shape[0] % mesh.shape["data"] == 0:
            return shard_batch(x, mesh)
        return x

    steps_per_epoch = max(1, len(train_dataset) // args.batch_size)
    schedule = pipeline.onecycle_lr(args.lr, steps_per_epoch, args.epochs)
    optimizer = pipeline.get_optimizer(args.optimizer, schedule, args.grad_clip)
    opt_state = optimizer.init(params)

    loss_func = losses.SobolevLoss(
        n_grid=n, norm_order=args.norm_order, relative=True
    )
    # auto_layouts stays OFF: the trained params feed the eval jit and the
    # checkpoint writer every epoch, and XLA-chosen layouts are not safely
    # consumable across programs on this backend (see make_train_step)
    train_step = pipeline.make_train_step(model, loss_func, optimizer)
    eval_step = pipeline.make_eval_step(model, loss_func, out_steps=out_steps)

    path_model = os.path.join(
        MODEL_PATH, f"sfno_{example}_{n}x{n}_m{args.modes}_w{args.width}"
    )
    # Device-resident data path: the whole train/val arrays live on device
    # and each epoch runs as ONE jitted lax.scan fed tiny (idx, starts)
    # int32 arrays — removes the per-batch host slicing, the per-batch H2D
    # through the device tunnel, and the per-step blocking loss sync.
    # Batches are bitwise-identical to the host path (epoch_indices draws
    # the same rng stream). Host path remains for --host-data,
    # --data-parallel (batches shard over the mesh there), and datasets too
    # big to keep resident.
    data_bytes = train_dataset.data[fs].nbytes + val_dataset.data[fs].nbytes
    use_device_data = (
        not args.host_data
        and data_bytes <= args.device_data_limit_gb * 2**30
    )
    if use_device_data:
        if mesh is None:
            put_data = jnp.asarray
        else:
            # replicate the dataset; the scan constrains each gathered batch
            # to data-parallel sharding, so compute and the gradient psum
            # distribute exactly as in the host --data-parallel path
            from tpu_cfd.parallel import replicate as _replicate

            put_data = lambda x: _replicate(jnp.asarray(x), mesh)  # noqa: E731
        run_epoch = pipeline.make_scan_epoch(
            model, loss_func, optimizer,
            put_data(train_dataset.data[fs]), time_steps, out_steps,
            mesh=mesh,
        )
        run_eval = pipeline.make_scan_eval(
            model, loss_func, put_data(val_dataset.data[fs]),
            time_steps, out_steps, model_out_steps=out_steps, mesh=mesh,
        )
        logger.info(
            f"Device-resident data path: {data_bytes / 2**20:.0f} MiB on"
            " device, one scan dispatch per epoch"
            + ("" if mesh is None else f" (data-parallel over {mesh})")
        )

    val_l2_min = np.inf
    if not args.eval_only:
        import time as _time

        for ep in range(args.epochs):
            _t0 = _time.perf_counter()
            if use_device_data:
                idx, starts = train_dataset.epoch_indices(args.batch_size, rng)
                params, opt_state, ep_losses = run_epoch(
                    params, opt_state, jnp.asarray(idx), jnp.asarray(starts)
                )
                train_l2 = float(ep_losses.sum())
                count = int(ep_losses.shape[0])
                vidx, vstarts = val_dataset.epoch_indices(
                    args.batch_size, np.random.default_rng(0), shuffle=False
                )
                if vidx.size == 0:
                    raise ValueError(
                        f"val dataset yielded no batches "
                        f"(n={len(val_dataset)}, batch={args.batch_size})"
                    )
                val_l2 = float(run_eval(
                    params, jnp.asarray(vidx), jnp.asarray(vstarts)
                ))
            else:
                train_l2, count = 0.0, 0
                for inp, out in train_dataset.batches(args.batch_size, rng):
                    a = device_put_batch(inp[fs])
                    u = device_put_batch(out[fs])
                    params, opt_state, l2 = train_step(params, opt_state, a, u)
                    train_l2 += float(l2)
                    count += 1
                val_l2 = pipeline.eval_epoch(
                    eval_step, params, val_dataset, args.batch_size, field=fs,
                    device_put=device_put_batch,
                )
            if val_l2 < val_l2_min:
                pipeline.save_checkpoint(params, path_model)
                val_l2_min = val_l2
            logger.info(
                f"Epoch [{ep + 1:3d}/{args.epochs}] "
                f"avg train rel: {train_l2 / max(count, 1):.4e} | "
                f"avg val rel: {val_l2:.4e} | "
                f"{_time.perf_counter() - _t0:.1f}s"
            )
        logger.info(f"Training complete. Best model saved to {path_model}")

    if not args.train_only:
        test_path = _resolve_data(example, "test", args.test_file)
        if not os.path.exists(test_path):
            logger.info(f"No test data at {test_path}; skipping eval phase.")
            return params
        test_n = args.test_res
        # reference eval phase (train.py:207-252): window starts at frame 30,
        # fp64 when --double (the reference always evals in fp64; fp64 here
        # is the CPU path)
        test_dataset = SpatioTemporalDataset(
            data_path=test_path,
            n_samples=args.num_test_samples,
            fields=[fs],
            steps=time_steps,
            out_steps=out_steps,
            T_start=args.test_t_start,
            train=False,
            dtype=np.float64 if args.double else np.float32,
        )
        try:
            params = pipeline.load_checkpoint(path_model, target=params)
        except Exception as e:
            logger.info(f"Could not restore best checkpoint ({e}); using last.")
        metric = losses.SobolevLoss(
            n_grid=test_n, norm_order=args.norm_order, relative=True
        )
        if args.double:
            from tpu_cfd.models.base import params_to_double

            params = params_to_double(params)
        test_step = pipeline.make_eval_step(model, metric, out_steps=out_steps)
        test_l2 = pipeline.eval_epoch(
            test_step, params, test_dataset, args.test_batch_size, field=fs
        )
        logger.info(f"Test rel Sobolev metric at {test_n}x{test_n}: {test_l2:.4e}")
        if args.demo_plots:
            _save_demo_plots(
                model, params, test_dataset, fs, out_steps, args.demo_plots,
                example, test_n, logger,
            )
    return params


def _save_demo_plots(
    model, params, dataset, field, out_steps, n_plots, example, n, logger
):
    """Prediction-vs-truth contour trajectories (reference train.py:254-275)."""
    from tpu_cfd.train.pipeline import FIG_PATH
    from tpu_cfd.utils import visualizations as viz

    inp, out = dataset.sample(np.arange(min(n_plots, len(dataset))))
    # jitted: an eager apply dispatches per-op over the device tunnel, which
    # is slow and can hit transient UNIMPLEMENTED errors (CLAUDE.md)
    apply = jax.jit(lambda p, v: model.apply(p, v, out_steps=out_steps))
    pred = apply(params, jnp.asarray(inp[field]))
    pred = np.asarray(pred)
    truth = np.asarray(out[field])
    for i in range(pred.shape[0]):
        for name, traj in (("pred", pred[i]), ("true", truth[i])):
            # channels-last (x, y, t) -> (t, x, y) frames for the facet plot
            frames = np.moveaxis(traj, -1, 0)
            fig_path = os.path.join(
                FIG_PATH, f"{example}_{n}x{n}_sample{i}_{name}.png"
            )
            try:
                fig, _ = viz.plot_contour_trajectory(frames)
                fig.savefig(fig_path)
                import matplotlib.pyplot as plt

                plt.close(fig)
                logger.info(f"demo plot: {fig_path}")
            except Exception as e:  # plotting must never fail a finished run
                logger.error(f"demo plot failed: {e}")
                return


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train SFNO (reference train.py:278)")
    parser.add_argument("--example", type=str, default="fno")
    parser.add_argument("--num-samples", type=int, default=1024)
    parser.add_argument("--num-val-samples", type=int, default=64)
    parser.add_argument("--num-test-samples", type=int, default=16)
    parser.add_argument("--test-t-start", type=int, default=30,
                        help="high-res eval window start (reference train.py:220)")
    parser.add_argument("--test-batch-size", type=int, default=1)
    parser.add_argument("--res", type=int, default=64)
    parser.add_argument("--test-res", type=int, default=256)
    parser.add_argument("--field", type=str, default="vorticity")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--seed", type=int, default=1127825)
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--optimizer", type=str, default="Adam")
    parser.add_argument("--viscosity", type=float, default=1e-3)
    parser.add_argument("--width", type=int, default=10)
    parser.add_argument("--modes", type=int, default=32)
    parser.add_argument("--modes-t", type=int, default=5)
    parser.add_argument("--num-layers", type=int, default=4)
    parser.add_argument("--latent-steps", type=int, default=10)
    parser.add_argument("--spatial-padding", type=int, default=0)
    parser.add_argument("--time-steps", type=int, default=10)
    parser.add_argument("--out-time-steps", type=int, default=10)
    parser.add_argument("--beta", type=float, default=0.0)
    parser.add_argument("--activation", type=str, default="GELU")
    parser.add_argument("--grad-clip", type=float, default=0.0)
    parser.add_argument("--spatial-random-feats", default=False, action="store_true")
    parser.add_argument("--lift-linear", default=False, action="store_true")
    parser.add_argument("--host-data", default=False, action="store_true",
                        help="force the host-driven batch loop (per-batch"
                             " numpy slicing + H2D) instead of the"
                             " device-resident scan-per-epoch path")
    parser.add_argument("--device-data-limit-gb", type=float, default=6.0,
                        help="fall back to --host-data when train+val arrays"
                             " exceed this size (HBM budget)")
    parser.add_argument("--double", default=False, action="store_true")
    parser.add_argument("--mxu-precision", type=str, default="highest",
                        choices=["highest", "high", "default"],
                        help="MXU precision of the spectral-conv DFT einsums"
                             " (accuracy/throughput ladder; RESULTS.md)")
    parser.add_argument("--compute-dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="activation storage dtype of the SFNO lifting +"
                             " backbone (params/optimizer stay fp32);"
                             " bfloat16 halves the activation HBM traffic"
                             " the train step is bound by")
    parser.add_argument("--remat", default=False, action="store_true",
                        help="rematerialize the SFNO lifting/backbone blocks"
                             " in the backward pass (trades recompute for"
                             " the activation bytes the step is bound by;"
                             " checkpoint-compatible either way)")
    parser.add_argument("--norm-order", type=float, default=0.0)
    parser.add_argument("--eval-only", default=False, action="store_true")
    parser.add_argument("--train-only", default=False, action="store_true")
    parser.add_argument("--train-file", type=str, default=None,
                        help="override train/valid data file")
    parser.add_argument("--test-file", type=str, default=None)
    parser.add_argument("--demo-plots", type=int, default=0,
                        help="save N prediction-vs-truth contour plots after eval")
    parser.add_argument("--data-parallel", default=False, action="store_true",
                        help="shard batches over all local devices (data axis)")
    return parser


if __name__ == "__main__":
    main()
