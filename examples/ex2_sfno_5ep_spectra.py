"""SFNO trained 5 epochs reproduces the McWilliams inverse-cascade spectrum.

Counterpart of the reference's ``examples/ex2_SFNO_5ep_spectra.ipynb``
(the README.md:51 claim: a 5-epoch SFNO's predicted enstrophy spectra match
the inverse-cascade shape of the simulated flow). Trains the reference
McWilliams recipe (modes 32/32/5, width 10, beta=-1e-2, OneCycle Adam 1e-2)
for 5 epochs on the generated 64² dataset, then compares radially-binned
enstrophy spectra E(k) = 0.5|ŵ(k)|² of predictions vs. ground truth on
held-out samples and saves the overlay figure with a k^(-5/3)-style guide
(reference fno/visualizations.py:114-191).

Run: PYTHONPATH=. python examples/ex2_sfno_5ep_spectra.py [--epochs 5]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_cfd.data.datasets import SpatioTemporalDataset
from tpu_cfd.models import SFNO
from tpu_cfd.train import losses, pipeline
from tpu_cfd.train.train import _resolve_data
from tpu_cfd.utils import visualizations as viz


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--num-samples", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--out", type=str, default=None,
                   help="figure path (default FIG_PATH/mcwilliams_5ep_spectra.png)")
    args = p.parse_args(argv)

    n, T, T_out = 64, 10, 10
    data_path = _resolve_data("McWilliams2d", "train", None)
    train_ds = SpatioTemporalDataset(
        data_path, n_samples=args.num_samples, steps=T, out_steps=T_out)
    val_ds = SpatioTemporalDataset(
        data_path, n_samples=64, steps=T, out_steps=T_out, train=False)

    model = SFNO(modes_x=32, modes_y=32, modes_t=5, width=10, beta=-1e-2,
                 output_steps=T_out)
    rng = np.random.default_rng(1127825)
    inp, _ = train_ds.sample(np.arange(2), rng)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(inp["vorticity"]))

    steps_per_epoch = len(train_ds) // args.batch_size
    sched = pipeline.onecycle_lr(1e-2, steps_per_epoch=steps_per_epoch,
                                 epochs=args.epochs)
    opt = pipeline.get_optimizer("Adam", sched)
    opt_state = opt.init(params)
    loss_fn = losses.SobolevLoss(n_grid=n, norm_order=0, relative=True)
    step = pipeline.make_train_step(model, loss_fn, opt)
    for ep in range(args.epochs):
        ep_loss, k = 0.0, 0
        for bi, bo in train_ds.batches(args.batch_size, rng):
            params, opt_state, l = step(
                params, opt_state,
                jnp.asarray(bi["vorticity"]), jnp.asarray(bo["vorticity"]))
            ep_loss += float(l)
            k += 1
        print(f"epoch {ep + 1}/{args.epochs}: train rel Sobolev {ep_loss / k:.4e}")

    # spectra on held-out windows: predictions vs ground truth
    inp, out = val_ds.sample(np.arange(8))
    pred = jax.jit(lambda p, v: model.apply(p, v, out_steps=T_out))(
        params, jnp.asarray(inp["vorticity"]))
    pred = np.asarray(pred)                      # (b, x, y, t)
    truth = np.asarray(out["vorticity"])
    h = 2 * np.pi / n
    # average E(k) over held-out samples at the last (most-rolled-out)
    # predicted frame, like the reference notebook's spectra cells
    spec_pred = np.mean(
        [viz.get_enstrophy_spectrum(pred[i, ..., -1], h) for i in range(len(pred))],
        axis=0)
    spec_true = np.mean(
        [viz.get_enstrophy_spectrum(truth[i, ..., -1], h) for i in range(len(truth))],
        axis=0)

    # spectrum index i corresponds to wavenumber k = i + 1
    ks = np.arange(2, 21)
    gap = np.abs(np.log10(spec_pred[ks - 1]) - np.log10(spec_true[ks - 1])).mean()
    print(f"mean |log10 E_pred - log10 E_true| over k=2..20: {gap:.3f}")

    out_path = args.out or os.path.join(
        pipeline.FIG_PATH, "mcwilliams_5ep_spectra.png")
    pipeline.ensure_paths()
    fig, _ = viz.plot_enstrophy_spectrum(
        [truth[0, ..., -1], pred[0, ..., -1]], h=h,
        labels=["simulation", f"SFNO {args.epochs}ep"],
        title="McWilliams2d enstrophy spectra")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    print(f"figure: {out_path}")
    return gap


if __name__ == "__main__":
    main()
