"""FNO3d baseline training on McWilliams2d with dataset normalization.

Counterpart of the reference's examples/ex2_FNO3d_train_normalized.ipynb:
SpatioTemporalDatasetFixedTime (T_start=10, spatial Gaussian normalizer) +
FNO3d(modes=32, modes_t=5, width=10, input_channel=10) + rel-Sobolev loss +
OneCycle Adam (lr 1e-3, div 1e4/1e3), 10 epochs, batch 4. The reference
reaches test rel L2 ≈ 1.56e-1 — FNO3d is the fixed-time-grid baseline the
SFNO beats by ~2.5× on the same data.

The FNO3d input is the 10 input frames broadcast along the output time axis
plus (x, y, t) grid channels (reference fno3d.py:163-166); loss is computed
on denormalized fields (reference pipeline.py train_batch_ns normalizer arg).

Run (after generating the McWilliams dataset):
  python examples/ex2_fno3d_train.py --epochs 10 --num-samples 1024
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_cfd.data.datasets import SpatioTemporalDatasetFixedTime
from tpu_cfd.models import FNO3d
from tpu_cfd.models.fno3d import add_grid_3d
from tpu_cfd.train import losses, pipeline


def make_fno3d_input(a: jax.Array, out_steps: int) -> jax.Array:
    """(b, n, n, T_in) input frames -> (b, n, n, out_steps, T_in + 3)."""
    b, nx, ny, t_in = a.shape
    x = jnp.broadcast_to(a[..., None, :], (b, nx, ny, out_steps, t_in))
    return add_grid_3d(x)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-file", type=str, default=None)
    p.add_argument("--mat-file", type=str, default=None,
                   help="train on an FNO-paper-format .mat/.pt file (field "
                        "'u', shape (N, n, n, T)) via NavierStokesDataset "
                        "instead of the torch-cfd trajectory format")
    p.add_argument("--num-samples", type=int, default=1024)
    p.add_argument("--num-test-samples", type=int, default=32)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--modes", type=int, default=32)
    p.add_argument("--modes-t", type=int, default=5)
    p.add_argument("--width", type=int, default=10)
    p.add_argument("--time-steps", type=int, default=10)
    p.add_argument("--t-start", type=int, default=10)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    T = args.time_steps
    if args.mat_file:
        # FNO-paper workflow (reference fno3d.py:163-166, datasets.py:165):
        # inputs normalized with the TRAIN normalizer, targets raw frames
        from tpu_cfd.data.datasets import NavierStokesDataset

        train_ds = NavierStokesDataset(
            args.mat_file, n_samples=args.num_samples,
            time_steps_input=T, time_steps_output=T, normalize=True,
        )
        test_ds = NavierStokesDataset(
            args.mat_file, n_samples=args.num_test_samples, train=False,
            time_steps_input=T, time_steps_output=T, normalize=False,
        )
        test_ds.a = train_ds.normalizer.transform(test_ds.a)
        normalizer = None

        def batch_iter(ds, bs, rng, shuffle=True):
            for b in ds.batches(bs, rng, shuffle):
                yield b["a"], b["u"]
    else:
        data_path = args.data_file or os.path.join(
            pipeline.DATA_PATH, "McWilliams2d_64x64_N1152_v1e-3_T10_steps100.npz"
        )
        train_ds = SpatioTemporalDatasetFixedTime(
            data_path, n_samples=args.num_samples, fields=["vorticity"],
            steps=T, out_steps=T, T_start=args.t_start,
        )
        test_ds = SpatioTemporalDatasetFixedTime(
            data_path, n_samples=args.num_test_samples, fields=["vorticity"],
            steps=T, out_steps=T, T_start=args.t_start, train=False,
        )
        normalizer = train_ds.normalizers["vorticity"]
        # eval uses the TRAIN statistics (reference passes
        # inp_normalizer=train_dataset.inp_normalizer to the test set)
        test_ds.normalizers["vorticity"] = normalizer

        def batch_iter(ds, bs, rng, shuffle=True):
            for inp, out in ds.batches(bs, rng, shuffle):
                yield inp["vorticity"], out["vorticity"]

    model = FNO3d(
        modes1=args.modes, modes2=args.modes, modes3=args.modes_t,
        width=args.width, input_channel=T,
    )
    key = jax.random.PRNGKey(args.seed)
    rng = np.random.default_rng(args.seed)
    a0, _ = next(batch_iter(train_ds, 2, rng, shuffle=False))
    x0 = make_fno3d_input(jnp.asarray(a0), T)
    params = jax.jit(model.init)(key, x0)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"FNO3d parameters: {n_params}")

    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    total = steps_per_epoch * args.epochs
    schedule = (
        optax.cosine_onecycle_schedule(
            transition_steps=total, peak_value=args.lr, pct_start=0.3,
            div_factor=1e4, final_div_factor=1e3,
        )
        if total >= 5
        else optax.constant_schedule(args.lr)
    )
    opt = optax.adam(schedule)
    opt_state = opt.init(params)
    loss_fn = losses.SobolevLoss(n_grid=args.res, norm_order=0, relative=True)

    if normalizer is not None:
        mean = jnp.asarray(normalizer.mean)
        std = jnp.asarray(normalizer.std)

        def denorm(u):
            # SpatialGaussianNormalizer stats are per (x, y, t) location
            return u * (std + normalizer.eps) + mean
    else:
        def denorm(u):  # .mat targets are raw solution frames
            return u

    # Both dataset kinds have STATIC windows (fixed T_start / fixed input-
    # output split), so all windows are materialized once and kept
    # device-resident; each epoch is ONE jitted lax.scan fed a permutation
    # array — no per-batch host slicing, H2D, or loss syncs (same design as
    # pipeline.make_scan_epoch; the host loop measured ~110 s/epoch at the
    # reference recipe, dominated by off-device time).
    if args.mat_file:
        a_np, u_np = train_ds.a, train_ds.u
        at_np, ut_np = test_ds.a, test_ds.u
    else:
        inp, out = train_ds.sample(np.arange(len(train_ds)))
        a_np, u_np = inp["vorticity"], out["vorticity"]
        inp, out = test_ds.sample(np.arange(len(test_ds)))
        at_np, ut_np = inp["vorticity"], out["vorticity"]
    # The dataset arrays are jit ARGUMENTS, never closed over: a closed-over
    # device array becomes a constant serialized into the HLO, and a ~1 GiB
    # constant overflows the remote-compile transport (HTTP 413) — see
    # pipeline.make_scan_epoch, which threads the dataset the same way.
    A, U = jnp.asarray(a_np), jnp.asarray(u_np)
    At, Ut = jnp.asarray(at_np), jnp.asarray(ut_np)

    @jax.jit
    def run_epoch(params, opt_state, order, A, U):
        def one(carry, idx):
            params, opt_state = carry
            a, u = jnp.take(A, idx, axis=0), jnp.take(U, idx, axis=0)

            def loss(p):
                out, _ = model.apply(p, make_fno3d_input(a, T))
                return loss_fn(denorm(out), denorm(u))

            l, grads = jax.value_and_grad(loss)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), l

        (params, opt_state), ls = jax.lax.scan(one, (params, opt_state), order)
        return params, opt_state, ls

    @jax.jit
    def run_eval(params, At, Ut):
        def one(_, au):
            a, u = au
            out, _ = model.apply(params, make_fno3d_input(a[None], T))
            return None, loss_fn(denorm(out), denorm(u[None]))

        _, ms = jax.lax.scan(one, None, (At, Ut))
        return ms.mean()

    nb = max(1, len(train_ds) // args.batch_size)
    for ep in range(args.epochs):
        # same rng stream as the old host loop: one permutation per epoch
        order = rng.permutation(len(train_ds))
        order = order[: nb * args.batch_size].reshape(nb, args.batch_size)
        params, opt_state, ls = run_epoch(
            params, opt_state, jnp.asarray(order.astype(np.int32)), A, U
        )
        test_l2 = float(run_eval(params, At, Ut))
        print(
            f"Epoch {ep + 1:2d}/{args.epochs} | train rel L2:"
            f" {float(ls.mean()):.5e} | test rel L2: {test_l2:.5e}"
        )
    return test_l2


if __name__ == "__main__":
    main()
