"""End-to-end demo: generate data → train SFNO → a-posteriori fine-tune.

Counterpart of the reference's training/fine-tuning notebooks
(examples/ex2*, README.md:42-52), shrunk to run in minutes. Mirrors the full
Spectral-Refiner workflow: the operator learns trajectory-to-trajectory on
coarse data, then the output layer is refined at evaluation resolution
against the PDE residual, differentiating through the spectral solver.

Run: PYTHONPATH=. python examples/ex2_train_and_finetune.py
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_cfd.data.datasets import SpatioTemporalDataset
from tpu_cfd.data.generate import main_mcwilliams
from tpu_cfd.models import SFNO
from tpu_cfd.train import finetune, losses, pipeline


def main():
    workdir = tempfile.mkdtemp(prefix="tpu_cfd_demo_")
    os.environ["DATA_PATH"] = workdir

    # 1) generate a small McWilliams dataset
    data_path = main_mcwilliams([
        "--grid-size", "128", "--subsample", "2", "--num-samples", "8",
        "--batch-size", "4", "--time", "1.0", "--time-warmup", "0.5",
        "--dt", "1e-3", "--num-steps", "24", "--filepath", workdir,
    ])
    print(f"dataset: {data_path}")

    # 2) train a small SFNO
    ds = SpatioTemporalDataset(data_path, n_samples=6, steps=8, out_steps=8)
    model = SFNO(modes_x=12, modes_y=12, modes_t=4, width=10,
                 latent_steps=8, num_spectral_layers=3, output_steps=8)
    rng = np.random.default_rng(0)
    inp, _ = ds.sample(np.arange(2), rng)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(inp["vorticity"]))
    sched = pipeline.onecycle_lr(5e-3, steps_per_epoch=3, epochs=5)
    opt = pipeline.get_optimizer("Adam", sched)
    opt_state = opt.init(params)
    loss_fn = losses.SobolevLoss(n_grid=64, norm_order=0, relative=True)
    step = pipeline.make_train_step(model, loss_fn, opt)
    for ep in range(5):
        ep_loss, k = 0.0, 0
        for bi, bo in ds.batches(2, rng):
            params, opt_state, l = step(
                params, opt_state,
                jnp.asarray(bi["vorticity"]), jnp.asarray(bo["vorticity"]),
            )
            ep_loss += float(l)
            k += 1
        print(f"epoch {ep + 1}: train rel Sobolev {ep_loss / k:.4e}")

    # 3) fine-tune the output layer against the PDE residual
    inp, out = ds.sample(np.arange(1), rng)
    w_in = jnp.asarray(inp["vorticity"])
    pred = jax.jit(lambda p, v: model.apply(p, v))(params, w_in)
    ft = finetune.OutConvFT(
        modes_x=24, modes_y=24, modes_t=4, out_steps=8,
        visc=1e-3, dt=1e-6, diam=2 * jnp.pi, delta=5e-2,
    )
    v_latent = pred[..., None]
    ft_params = jax.jit(
        lambda k, vl, vr: ft.init(k, vl, vr, None, out_steps=8, original=True)
    )(jax.random.PRNGKey(1), v_latent, w_in)
    ft_params = jax.tree_util.tree_map(lambda x: x * 1e-2, ft_params)
    ft_params, hist = finetune.finetune_steps(
        ft, ft_params, v_latent, w_in, None, out_steps=8, n_steps=30, lr=1e-2
    )
    print(f"fine-tune Bochner residual: {hist[0]:.3e} -> {hist[-1]:.3e}")


if __name__ == "__main__":
    main()
