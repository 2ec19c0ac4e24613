"""Training/eval pipeline: jitted train step, eval loop, checkpoints, paths.

TPU-native counterpart of the reference's ``fno/pipeline.py`` (path
constants: pipeline.py:20-26, train_batch_ns: :38-63, eval_epoch_ns:
:66-103). The torch zero_grad→forward→backward→clip→step sequence becomes
one jitted ``train_step`` (value_and_grad + optax); gradient clipping is an
optax transform chained into the optimizer. Checkpointing uses orbax
(SURVEY.md §5: pytree checkpoints; precomputed spectral operators are
reconstructed from the grid, never serialized).
"""

from __future__ import annotations

import functools
import os
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

SRC_ROOT = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(os.path.dirname(SRC_ROOT))
# Run artifacts default OUTSIDE the importable package (repo-root models/
# and logs/, both gitignored for generated files) so training runs never
# dirty the tree or bloat an sdist/wheel.
MODEL_PATH = os.environ.get("MODEL_PATH", os.path.join(ROOT, "models"))
LOG_PATH = os.environ.get("LOG_PATH", os.path.join(ROOT, "logs"))
DATA_PATH = os.environ.get("DATA_PATH", os.path.join(ROOT, "data"))
FIG_PATH = os.environ.get("FIG_PATH", os.path.join(ROOT, "figures"))


def ensure_paths():
    for p in (MODEL_PATH, LOG_PATH, DATA_PATH, FIG_PATH):
        os.makedirs(p, exist_ok=True)


def get_optimizer(
    name: str = "Adam",
    learning_rate=1e-3,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """Builds the optimizer (+clipping) by the reference's names."""
    name = name.lower()
    opts = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "lion": optax.lion,
    }
    if name not in opts:
        raise ValueError(f"unknown optimizer {name}; available: {sorted(opts)}")
    opt = opts[name](learning_rate)
    if grad_clip and grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


def onecycle_lr(
    max_lr: float,
    steps_per_epoch: int,
    epochs: int,
    div_factor: float = 1e3,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    """OneCycleLR equivalent (reference train.py:145-152)."""
    total = steps_per_epoch * epochs
    if total < 5:
        # cosine_onecycle_schedule produces NaN when the phase boundaries
        # collapse (tiny smoke runs); fall back to a constant lr
        return optax.constant_schedule(max_lr)
    return optax.cosine_onecycle_schedule(
        transition_steps=total,
        peak_value=max_lr,
        pct_start=0.3,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def make_train_step(
    model,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    normalizer=None,
    auto_layouts: bool = False,
    donate: bool = True,
):
    """Returns a jitted train step: (params, opt_state, inp, target) -> ...

    Counterpart of reference pipeline.py:38-63 — forward → (denormalize) →
    loss → grad → clip → update, fused into one XLA program.

    ``donate=True`` (default) donates the params/opt-state buffers: without
    aliasing, a step holds params+opt TWICE (inputs and outputs both live —
    XLA's memory analysis measured 4.25 GiB of the 12.0 GiB w128/b16 peak
    was exactly that; scripts/remat_memory_r4.py). Step time is unchanged
    (round-3 measurement), but the HBM headroom doubles the reachable
    width×batch. Callers must reassign ``params, opt_state = step(...)``
    — every in-repo caller does. Donation is honored on CPU too (the
    donated inputs read as deleted; tests/test_data_train.py's
    donation-contract test asserts it), so the contract is identical on
    every backend.

    ``auto_layouts=True`` lets XLA choose the on-device tile layouts of the
    params/opt-state arguments and results instead of pinning them to the
    row-major jit-boundary default. The step's outputs feed the next step's
    inputs, so the dot-preferred layouts persist across iterations and the
    per-step re-tiling copies of every weight leaf disappear (measured ~6%
    step-time win at the bench config).

    DEFAULT OFF: on the axon (TPU-tunnel) backend, arrays carrying some
    XLA-chosen 6-D tiled layouts are NOT safely consumable outside the
    program that produced them — a default-layout eval jit fed such params
    either raises INVALID_ARGUMENT or silently computes wrong values
    (observed: val metric frozen at 7.8e-2 while train loss converged).
    Only enable where params never cross into other programs.
    """

    def step(params, opt_state, inp, target):
        def loss(p):
            out = model.apply(p, inp)
            if normalizer is not None:
                out = normalizer.inverse_transform(out, align_shapes=False)
                target_ = normalizer.inverse_transform(target, align_shapes=False)
            else:
                target_ = target
            return loss_fn(out, target_)

        loss_val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    donate_argnums = (0, 1) if donate else ()
    if auto_layouts:
        from jax.experimental.layout import Format, Layout

        fmt = Format(Layout.AUTO)
        return jax.jit(
            step,
            in_shardings=(fmt, fmt, None, None),
            out_shardings=(fmt, fmt, None),
            donate_argnums=donate_argnums,
        )
    return jax.jit(step, donate_argnums=donate_argnums)


def _window_gather(steps: int, out_steps: int):
    """Device-side counterpart of ``SpatioTemporalDataset.sample_at``.

    Returns a gather(data, idx, starts) that slices per-sample input/target
    windows on device — the per-batch host-numpy slicing + H2D transfer of
    the host path becomes one gather + dynamic-slice inside the compiled
    program. ``data`` ((N, n, n, T), device-resident) is an ARGUMENT, not a
    closure capture: a closed-over device array becomes a jit CONSTANT that
    is serialized into the program — a multi-GiB dataset embedded that way
    broke the remote compiler on this backend (50-min hang, then transport
    Broken pipe; round-4 stage-7 postmortem, logs/r4_measure.log).
    """
    window = steps + out_steps

    def gather(data, idx, starts):
        batch = jnp.take(data, idx, axis=0)  # (b, n, n, T)
        win = jax.vmap(
            lambda a, s: jax.lax.dynamic_slice_in_dim(a, s, window, axis=-1)
        )(batch, starts)
        return win[..., :steps], win[..., steps:]

    return gather


def _batch_constraint(mesh):
    """Shards gathered (b, ...) batches over the mesh's data axis.

    The data array is replicated (gathers are cheap and local); the batch
    produced from it is constrained to data-parallel sharding, so the model
    compute and the gradient psum distribute exactly as in the host
    ``--data-parallel`` path.
    """
    if mesh is None:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec as P

    def constrain(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return constrain


def make_scan_epoch(
    model,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    data,
    steps: int,
    out_steps: int,
    normalizer=None,
    mesh=None,
):
    """One WHOLE training epoch as a single jitted ``lax.scan``.

    The host training loop (one ``train_step`` dispatch per batch) spends
    most of its wall clock outside the device: numpy window slicing, H2D of
    every batch through the device tunnel, and a blocking ``float(loss)``
    sync per step. With the dataset resident on device, an epoch becomes ONE
    dispatch fed only the epoch's (n_batches, batch) int32 index arrays; the
    per-step losses come back as one array. No reference counterpart (the
    torch loop is host-driven by construction, reference pipeline.py:38-63);
    batch semantics are bitwise-identical to the host path via
    ``SpatioTemporalDataset.epoch_indices`` (tests/test_data_train.py).

    Returns ``run_epoch(params, opt_state, idx, starts) ->
    (params, opt_state, losses)``; params/opt_state buffers are donated.
    ``data`` is device_put once here and threaded into the jitted program as
    an argument on every call (zero-copy for a committed array) — see
    ``_window_gather`` for why it must never be a closure constant.
    """
    data = jnp.asarray(data)
    gather = _window_gather(steps, out_steps)
    constrain = _batch_constraint(mesh)

    def one_step(data, carry, xs):
        params, opt_state = carry
        idx, starts = xs
        inp, target = gather(data, idx, starts)
        inp, target = constrain(inp), constrain(target)

        def loss(p):
            out = model.apply(p, inp)
            if normalizer is not None:
                out = normalizer.inverse_transform(out, align_shapes=False)
                target_ = normalizer.inverse_transform(
                    target, align_shapes=False)
            else:
                target_ = target
            return loss_fn(out, target_)

        loss_val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss_val

    def run_epoch(data, params, opt_state, idx, starts):
        (params, opt_state), losses = jax.lax.scan(
            functools.partial(one_step, data), (params, opt_state),
            (idx, starts)
        )
        return params, opt_state, losses

    jitted = jax.jit(run_epoch, donate_argnums=(1, 2))

    def run(params, opt_state, idx, starts):
        return jitted(data, params, opt_state, idx, starts)

    return run


def make_scan_eval(
    model,
    metric_fn: Callable,
    data,
    steps: int,
    out_steps: int,
    model_out_steps: Optional[int] = None,
    mesh=None,
):
    """Whole-val-set eval as one jitted scan over device-resident data.

    Returns ``run_eval(params, idx, starts) -> mean metric`` matching
    ``eval_epoch`` fed the same (idx, starts). ``data`` is threaded as a
    jit argument, never a closure constant (see ``_window_gather``).
    """
    data = jnp.asarray(data)
    gather = _window_gather(steps, out_steps)
    constrain = _batch_constraint(mesh)

    def run_eval(data, params, idx, starts):
        def one(_, xs):
            i, s = xs
            inp, target = gather(data, i, s)
            inp, target = constrain(inp), constrain(target)
            out = model.apply(params, inp, out_steps=model_out_steps)
            return None, metric_fn(out, target)

        _, metrics = jax.lax.scan(one, None, (idx, starts))
        return metrics.mean()

    jitted = jax.jit(run_eval)

    def run(params, idx, starts):
        return jitted(data, params, idx, starts)

    return run


def make_eval_step(model, metric_fn: Callable, out_steps: Optional[int] = None):
    """Jitted eval step returning the metric for one batch."""

    def step(params, inp, target):
        out = model.apply(params, inp, out_steps=out_steps)
        return metric_fn(out, target)

    return jax.jit(step)


def eval_epoch(
    eval_step,
    params,
    dataset,
    batch_size: int,
    field: str = "vorticity",
    rng: Optional[np.random.Generator] = None,
    device_put: Callable = jnp.asarray,
) -> float:
    """No-grad eval over a dataset (reference pipeline.py:66-103).

    ``device_put`` lets the caller shard eval batches over a mesh (the
    train CLI passes its data-parallel placement function here).
    """
    rng = np.random.default_rng(0) if rng is None else rng
    metrics = []
    for inp, out in dataset.batches(batch_size, rng, shuffle=False):
        a = device_put(inp[field])
        u = device_put(out[field])
        metrics.append(float(eval_step(params, a, u)))
    if not metrics:
        raise ValueError(
            f"eval dataset yielded no batches (n={len(dataset)}, "
            f"batch_size={batch_size})"
        )
    return float(np.mean(metrics))


# ---------------------------------------------------------------------------
# checkpointing (orbax)
# ---------------------------------------------------------------------------


def save_checkpoint(params, path: os.PathLike):
    """Saves a params pytree with orbax (falls back to npz if unavailable)."""
    path = Path(path).absolute()
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        if path.exists():
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, params)
    except ImportError:
        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        np.savez(
            str(path) + ".npz",
            **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        )


def load_checkpoint(path: os.PathLike, target=None):
    """Restores a params pytree saved by :func:`save_checkpoint`.

    Arrays are restored as host numpy so a checkpoint written on one
    backend (e.g. the TPU training run) loads on any other (e.g. the fp64
    CPU fine-tune/eval phase) — the caller's first jit puts them on device.
    """
    path = Path(path).absolute()
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target
        )
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(
                item=target, restore_args=restore_args
            ),
        )
        # match the target's leaf dtypes (e.g. keep fp32 params fp32)
        return jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r, dtype=getattr(t, "dtype", None)),
            target, restored,
        )
    return ckptr.restore(path)
