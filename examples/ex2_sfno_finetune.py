"""A-posteriori fine-tuning of a trained SFNO at 256² in fp64.

Counterpart of the reference's two fine-tune notebooks
(examples/ex2_SFNO_finetune_fnodata.ipynb — the README.md:20 "≤1e-6
residual in the functional norm in 50 ADAM iterations" headline, measured
2.679e-6 there — and examples/ex2_SFNO_finetune_McWilliams2d.ipynb,
measured 6.63e-6 in 100 iterations):

1. load an SFNO trained at 64² (``python -m tpu_cfd.train.train``),
2. run it zero-shot on one fp64 256² test trajectory, tapping the reduced
   latent "r" that feeds the output conv,
3. enlarge the output spectral conv to eval modes (64, 64, 6) with the
   trained low-mode corners transplanted in,
4. refine ONLY that conv with two-group Adam (bias fast, weight slow)
   against the PDE residual in the α-weighted H⁻¹ dual norm, where the
   residual is computed by differentiating through the spectral CN-IMEX
   solver kernel itself.

fp64 runs on CPU (TPUs have no complex128); the refinement is a jitted
value_and_grad loop.

Run:
  python examples/ex2_sfno_finetune.py --example fno
  python examples/ex2_sfno_finetune.py --example McWilliams2d
"""

from __future__ import annotations

import argparse
import math
import os
import sys

# fp64 end-to-end: must win over the axon sitecustomize before first use
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_cfd.data.datasets import SpatioTemporalDataset
from tpu_cfd.models import SFNO
from tpu_cfd.models.base import apply_with_latents, params_to_double
from tpu_cfd.train import finetune, losses, pipeline
from tpu_cfd.train.train import DATA_FILES, _resolve_data

# per-example settings mirroring the two reference notebooks' cells 1/6-8
CONFIGS = {
    "fno": dict(
        modes=12, modes_t=5, width=20, beta=1e-2,
        steps=10, out_steps=40, t_start=30,
        diam=1.0, lr_bias=2e-1, iters=50, forcing="sincos",
    ),
    "McWilliams2d": dict(
        modes=32, modes_t=5, width=10, beta=-1e-2,
        steps=10, out_steps=10, t_start=50,
        diam=2 * math.pi, lr_bias=1e-2, iters=100, forcing="none",
    ),
}


def make_forcing(kind: str, n: int, dtype) -> jnp.ndarray:
    """The data-generation forcing on the eval grid (notebook cell 5)."""
    if kind == "none":
        return jnp.zeros((1, n, n), dtype=dtype)
    x = np.linspace(0, 1, n + 1)[:-1]
    X, Y = np.meshgrid(x, x, indexing="ij")
    f = 0.1 * (np.sin(2 * np.pi * (X + Y)) + np.cos(2 * np.pi * (X + Y)))
    return jnp.asarray(f[None], dtype=dtype)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--example", choices=list(CONFIGS), default="fno")
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--idx", type=int, default=1,
                   help="test-sample index (notebook cell 4/5 uses idx=1/2)")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--lr-bias", type=float, default=None)
    p.add_argument("--lr-weight", type=float, default=1e-4)
    p.add_argument("--modes-ft", type=int, nargs=3, default=(64, 64, 6))
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--test-file", type=str, default=None)
    p.add_argument("--t-start", type=int, default=None)
    p.add_argument("--lr-decay", type=float, default=None,
                   help="exponential lr decay over the run (end/start ratio, "
                        "e.g. 0.1); default: constant lrs as in the notebook")
    p.add_argument("--gt-floor", action="store_true",
                   help="also report the residual norm of the GROUND-TRUTH "
                        "trajectory through the same ±dt CN solves — the "
                        "discretization floor of the metric itself")
    args = p.parse_args(argv)

    cfg = CONFIGS[args.example]
    n = args.res
    iters = args.iters if args.iters is not None else cfg["iters"]
    lr_bias = args.lr_bias if args.lr_bias is not None else cfg["lr_bias"]
    t_start = args.t_start if args.t_start is not None else cfg["t_start"]
    T, T_out, diam = cfg["steps"], cfg["out_steps"], cfg["diam"]
    dtype = jnp.float64

    test_path = _resolve_data(args.example, "test", args.test_file)
    ds = SpatioTemporalDataset(
        test_path, n_samples=16, fields=["vorticity"], steps=T,
        out_steps=T_out, T_start=t_start, train=False, dtype=np.float64,
    )
    inp, out = ds.sample(np.array([args.idx]))
    w_in = jnp.asarray(inp["vorticity"], dtype)     # (1, n, n, T)
    w_gt = jnp.asarray(out["vorticity"], dtype)     # (1, n, n, T_out)

    model = SFNO(
        modes_x=cfg["modes"], modes_y=cfg["modes"], modes_t=cfg["modes_t"],
        width=cfg["width"], beta=cfg["beta"], output_steps=T_out,
    )
    params = jax.jit(
        lambda k, v: model.init(k, v, out_steps=T_out)
    )(jax.random.PRNGKey(0), w_in[:, :64, :64].astype(jnp.float32))
    ckpt = args.ckpt or os.path.join(
        pipeline.MODEL_PATH,
        f"sfno_{args.example}_64x64_m{cfg['modes']}_w{cfg['width']}",
    )
    params = pipeline.load_checkpoint(ckpt, target=params)
    params = params_to_double(params)

    # zero-shot super-resolution pass, tapping the reduced latent "r"
    l2_rel = losses.SobolevLoss(
        n_grid=n, norm_order=0, time_average=True, relative=True, diam=diam,
        freq_cutoff=n // 2 + 1,
    )
    pred_no, latents = apply_with_latents(model, params, w_in, out_steps=T_out)
    v_latent = latents["r"]
    print(f"zero-shot rel L2 at {n}x{n}: {float(l2_rel(pred_no, w_gt)):.5e}")

    # enlarged output conv, trained corners transplanted (notebook cell 6)
    ft_kws = dict(
        delta=1.0, diam=diam, visc=1e-3, dt=1e-6, bdf_weight=(0.5, 0.5),
        temporal_padding=True, finetune=True,
    )
    qft, ft_params = finetune.build_finetune_outconv(
        params, (cfg["modes"], cfg["modes"], cfg["modes_t"]),
        tuple(args.modes_ft), jax.random.PRNGKey(1),
        v_latent, w_in, out_steps=T_out, **ft_kws,
    )

    res_hm1 = losses.SobolevLoss(
        n_grid=n, norm_order=-1, relative=False, time_average=True,
        alpha=10 ** (-3 / 2), freq_cutoff=n // 2 + 1, diam=diam,
    )
    f = make_forcing(cfg["forcing"], n, dtype)

    if args.gt_floor:
        # residual of the exact solver trajectory itself under the SAME
        # ±dt CN derivative estimate and norm: the metric's discretization
        # floor — no predicted trajectory can be expected below it
        gt_out = finetune.fine_tune_post(
            w_gt, f, visc=ft_kws["visc"], dt=ft_kws["dt"],
            diam=diam, bdf_weight=ft_kws["bdf_weight"],
        )
        print(
            "GT-trajectory residual (discretization floor): "
            f"{float(res_hm1(gt_out['residual'])):.3e}"
        )
        if iters == 0:
            return None

    lr_weight = args.lr_weight
    if args.lr_decay is not None:
        import optax

        lr_weight = optax.exponential_decay(args.lr_weight, iters, args.lr_decay)
        lr_bias = optax.exponential_decay(lr_bias, iters, args.lr_decay)

    track = lambda o: {
        "l2_vs_gt": l2_rel(o["w"], w_gt),
        "l2_vs_noft": l2_rel(o["w"], pred_no),
    }
    ft_params, hist = finetune.finetune_steps(
        qft, ft_params, v_latent, w_in, f, out_steps=T_out,
        n_steps=iters, lr=lr_weight, lr_bias=lr_bias,
        residual_norm=res_hm1, track=track,
    )
    for i, h in enumerate(hist):
        if i % 10 == 0 or i == len(hist) - 1:
            print(
                f"iter {i:3d} | Res Hm1 {h['residual']:.3e} | "
                f"|ft-gt| {h['l2_vs_gt']:.3e} | |ft-noft| {h['l2_vs_noft']:.3e}"
            )
    # finetune_steps returns the best-residual iterate (the adam tail is
    # non-monotonic at the discretization floor) — report what it achieves
    residuals = [h["residual"] for h in hist]
    best_i = int(np.argmin(residuals))
    best = residuals[best_i]
    print(f"last-iterate residual: {hist[-1]['residual']:.3e}")
    # history index i = residual of the params after i Adam updates, so
    # "at iter N" attributes the best number to an exact iteration budget
    print(f"best residual (alpha-weighted H^-1, {iters} iters): "
          f"{best:.3e} at iter {best_i}")
    return best


if __name__ == "__main__":
    main()
