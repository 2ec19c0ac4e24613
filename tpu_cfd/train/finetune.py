"""A-posteriori fine-tuning (Spectral-Refiner): hybrid neural/solver output.

TPU-native counterpart of the reference's ``fno/finetune.py`` (OutConvFT:
finetune.py:23, weight transplant _update_spectral_conv_weights: :95-139,
get_temporal_derivative via ±dt Crank-Nicolson solves: :141-164, _fine_tune
returning {w, w_t, residual}: :166-209).

The architectural key (SURVEY.md §3.4): fine-tuning differentiates through
the SAME spectral CN-IMEX kernel used for data generation
(``tpu_cfd.solvers.trajectories``), so the functional-norm residual is an
exact PDE loss. The reference's in-place weight enlargement becomes pure
pytree surgery (:func:`transplant_spectral_weights`), and the refinement
loop is a jitted adam loop on ONLY the output-conv parameters — FLOPs on par
with a single forward eval per step (reference README.md:20).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_cfd.models.sfno import OutConv, SpectralConvT
from tpu_cfd.solvers import trajectories

Array = jax.Array


class OutConvFT(nn.Module):
    """OutConv + differentiable solver post-process (finetune.py:23-209).

    ``__call__(v, v_res, f, out_steps)`` runs the neural super-resolution
    output conv, then (unless ``original=True``) computes the temporal
    derivative by ±dt Crank-Nicolson solves and the spectral NSE residual,
    returning ``{"w", "w_t", "residual"}`` — all (b, x, y, t), time last.
    """

    modes_x: int
    modes_y: int
    modes_t: int
    delta: float = 5e-2
    diam: float = 1.0
    out_steps: Optional[int] = None
    spatial_padding: int = 0
    temporal_padding: bool = True
    norm: str = "backward"
    finetune: bool = True
    dealias: bool = True
    visc: float = 1e-3
    dt: float = 1e-6  # solver marching step for the derivative
    bdf_weight: Tuple[float, float] = (0.0, 1.0)

    @nn.compact
    def __call__(
        self,
        v: Array,
        v_res: Array,
        f: Optional[Array] = None,
        out_steps: Optional[int] = None,
        original: bool = False,
    ):
        out_steps = out_steps if out_steps is not None else self.out_steps
        v = OutConv(
            modes_x=self.modes_x,
            modes_y=self.modes_y,
            modes_t=self.modes_t,
            delta=self.delta,
            out_steps=self.out_steps,
            spatial_padding=self.spatial_padding,
            temporal_padding=self.temporal_padding,
            norm=self.norm,
            diam=self.diam,
        )(v, v_res, out_steps=out_steps)
        if not self.finetune or original:
            return v
        return fine_tune_post(
            v,
            f,
            visc=self.visc,
            dt=self.dt,
            diam=self.diam,
            bdf_weight=self.bdf_weight,
            dealias=self.dealias,
            norm=self.norm,
        )


def get_temporal_derivative(
    w_h: Array,
    f_h: Array,
    dt: float,
    weight: Tuple[float, float] = (0.0, 1.0),
    **solver_kws,
) -> Tuple[Array, Array]:
    """BDF-weighted ∂w/∂t from CN-IMEX solves at ±dt (finetune.py:141-164)."""
    ws, w_ts = [], []
    for dt_ in (-dt, dt):
        w_, w_t_, *_ = trajectories.imex_crank_nicolson_step(
            w_h, f_h, delta_t=dt_, **solver_kws
        )
        ws.append(w_)
        w_ts.append(w_t_)
    w = weight[0] * ws[0] + weight[1] * ws[1]
    w_t = weight[0] * w_ts[0] + weight[1] * w_ts[1]
    return w, w_t


def fine_tune_post(
    w: Array,
    f: Optional[Array],
    visc: float = 1e-3,
    dt: float = 1e-6,
    diam: float = 1.0,
    bdf_weight: Tuple[float, float] = (0.0, 1.0),
    dealias: bool = True,
    norm: str = "backward",
) -> Dict[str, Array]:
    """Solver-through pass: {w, w_t, residual} from a predicted trajectory.

    Counterpart of finetune.py:166-209: spatial rfft2 per time slice (time
    moved to a batch dim), one CN step for the derivative, spectral residual,
    all differentiable.
    """
    b, nx, ny, nt = w.shape
    dtype = w.dtype
    w_tfirst = jnp.moveaxis(w, -1, 1)  # (b, t, x, y)
    if f is None:
        f = jnp.zeros((b, nx, ny), dtype=dtype)
    w_h = jnp.fft.rfftn(w_tfirst, s=(nx, ny), axes=(-2, -1), norm=norm)
    f_h = jnp.fft.rfftn(f, s=(nx, ny), axes=(-2, -1), norm=norm)
    f_h = f_h[:, None]  # broadcast over time

    rfftmesh = trajectories.default_rfft_mesh(nx, diam, dtype=dtype)
    laplacian = trajectories.spectral_laplacian_guarded(rfftmesh)
    dealias_filter = trajectories.default_dealias_filter(*rfftmesh, nx)
    solver_kws = dict(
        visc=visc,
        rfftmesh=rfftmesh,
        laplacian=laplacian,
        dealias_filter=dealias_filter,
        dealias=dealias,
    )

    w_h, w_h_t = get_temporal_derivative(
        w_h, f_h, dt, weight=bdf_weight, **solver_kws
    )
    res_h = trajectories.update_residual(
        w_h, w_h_t, f_h,
        visc=visc, rfftmesh=rfftmesh, laplacian=laplacian,
        dealias_filter=dealias_filter, dealias=dealias,
    )
    irfft = partial(jnp.fft.irfftn, s=(nx, ny), axes=(-2, -1), norm=norm)
    w_out, w_t, res = (jnp.moveaxis(irfft(z), 1, -1) for z in (w_h, w_h_t, res_h))
    return dict(w=w_out, w_t=w_t, residual=res)


def transplant_spectral_weights(
    old_conv_params: Dict,
    new_conv_params: Dict,
    old_modes: Tuple[int, int, int],
) -> Dict:
    """Embeds trained low-mode corner blocks into a larger-mode conv.

    Pure-pytree version of the reference's in-place
    ``_update_spectral_conv_weights`` (finetune.py:95-139): for each of the
    4 corner blocks, the old (mx,my,mt) modes land in the matching corner of
    the new block; the rest keeps its (near-zero) fresh init.
    """
    mx, my, mt = old_modes
    slice_x = [slice(0, mx), slice(-mx, None)]
    slice_y = [slice(0, my), slice(-my, None)]
    st = slice(0, mt)
    new = jax.tree_util.tree_map(lambda x: x, new_conv_params)  # copy
    for ix, sx in enumerate(slice_x):
        for iy, sy in enumerate(slice_y):
            i = ix + 2 * iy
            for name in (f"weight_{i}", f"bias_{i}"):
                if name in old_conv_params and name in new:
                    old_w = old_conv_params[name]
                    new_w = new[name]
                    new[name] = new_w.at[sx, sy, st, ...].set(old_w)
    return new


def _find_outconv_scope(params: Dict) -> Tuple[Dict, str]:
    """Locates the OutConv/SpectralConvT param subtree in SFNO params."""
    p = params["params"] if "params" in params else params
    for k in p:
        if k.startswith("OutConv"):
            sub = p[k]
            for kk in sub:
                if kk.startswith("SpectralConvT"):
                    return sub[kk], f"{k}/{kk}"
    raise KeyError("no OutConv/SpectralConvT scope found in params")


def build_finetune_outconv(
    trained_sfno_params: Dict,
    old_modes: Tuple[int, int, int],
    new_modes: Tuple[int, int, int],
    key: jax.Array,
    example_latent: Array,
    example_res: Array,
    out_steps: int,
    **ft_kwargs,
) -> Tuple[OutConvFT, Dict]:
    """Creates an OutConvFT at eval modes seeded from a trained SFNO.

    Counterpart of the reference's setup step: enlarge the last spectral
    conv to eval-resolution modes and copy the trained low-mode weights in.
    """
    model = OutConvFT(
        modes_x=new_modes[0], modes_y=new_modes[1], modes_t=new_modes[2],
        out_steps=out_steps, **ft_kwargs,
    )
    params = model.init(
        key, example_latent, example_res, out_steps=out_steps, original=True
    )
    # fresh init matching the reference's conv._reset_parameters(gain=1e-6)
    # (base.py:169-174): biases exactly zero, weights ~1e-6-scale — the
    # transplanted low-mode corners below carry all the signal. Params adopt
    # the input dtype so the fp64 fine-tune path stays fp64 end to end.
    dtype = example_latent.dtype
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.zeros_like(x, dtype=dtype)
        if any("bias" in str(getattr(p, "key", "")) for p in path)
        else (x * 1e-6).astype(dtype),
        params,
    )

    old_conv, _ = _find_outconv_scope(trained_sfno_params)
    p = params["params"]
    oc_key = next(k for k in p if k.startswith("OutConv"))
    sc_key = next(k for k in p[oc_key] if k.startswith("SpectralConvT"))
    p[oc_key][sc_key] = transplant_spectral_weights(
        old_conv, p[oc_key][sc_key], old_modes
    )
    return model, params


def groupwise_adam(lr_weight: float, lr_bias: float, params: Dict):
    """Adam with separate weight/bias learning rates.

    Counterpart of the reference fine-tune optimizer (examples/
    ex2_SFNO_finetune_fnodata.ipynb: Adam param groups with
    ``conv.bias`` lr 2e-1 and ``conv.weight`` lr 1e-4 — the bias IS the
    learnable spectral correction, so it moves fast while the transplanted
    weights barely drift).
    """
    def label(path, _):
        is_bias = any("bias" in str(getattr(p, "key", "")) for p in path)
        return "bias" if is_bias else "weight"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {"weight": optax.adam(lr_weight), "bias": optax.adam(lr_bias)}, labels
    )


def finetune_steps(
    model: OutConvFT,
    params: Dict,
    v_latent: Array,
    v_res: Array,
    f: Optional[Array],
    out_steps: int,
    n_steps: int = 50,
    lr: float = 1e-3,
    lr_bias: Optional[float] = None,
    residual_norm=None,
    track=None,
    keep_best: bool = True,
):
    """Adam refinement of the output conv against the PDE residual norm.

    The reference reaches ≤1e-6 residual in the α-weighted H⁻¹ dual norm
    within ~50 ADAM iterations at 256² (README.md:20,49-50; measured
    2.68e-6 in examples/ex2_SFNO_finetune_fnodata.ipynb cell 8); cost per
    step ≈ one forward eval. ``lr_bias`` enables the reference's two-group
    optimizer. ``track(out)->dict`` computes extra per-step metrics from the
    forward output (e.g. L2 vs ground truth). Returns (params, history) —
    history entries are dicts when ``track`` is given, else floats.

    ``keep_best`` returns the best-residual iterate instead of the last one:
    the adam tail is non-monotonic at the discretization floor (round-2 run:
    2.89e-6 at iter 30 → 3.57e-6 at 40), so last-iterate reporting throws
    away converged solutions the loop already visited. The loop evaluates
    the post-update params once more so the final point also competes.
    """
    if residual_norm is None:
        from tpu_cfd.train.losses import BochnerNorm

        residual_norm = BochnerNorm(
            n_grid=v_res.shape[1], relative=False, time_last=True,
            mesh_weighted=True,
        )
    opt = (
        groupwise_adam(lr, lr_bias, params) if lr_bias is not None
        else optax.adam(lr)
    )
    opt_state = opt.init(params)

    def loss_fn(p):
        out = model.apply(p, v_latent, v_res, f, out_steps=out_steps)
        return residual_norm(out["residual"]), out

    @jax.jit
    def step(params, opt_state):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        extras = track(out) if track is not None else {}
        return optax.apply_updates(params, updates), opt_state, loss, extras

    @jax.jit
    def eval_only(p):
        loss, out = loss_fn(p)
        return loss, (track(out) if track is not None else {})

    history = []
    best_loss, best_params = np.inf, params
    for _ in range(n_steps):
        new_params, opt_state, loss, extras = step(params, opt_state)
        loss = float(loss)  # loss is evaluated at the PRE-update params
        if keep_best and loss < best_loss:
            best_loss, best_params = loss, params
        params = new_params
        if track is not None:
            history.append({"residual": loss,
                            **{k: float(v) for k, v in extras.items()}})
        else:
            history.append(loss)
    if keep_best:
        final_loss, extras = eval_only(params)
        final_loss = float(final_loss)
        if track is not None:
            history.append({"residual": final_loss,
                            **{k: float(v) for k, v in extras.items()}})
        else:
            history.append(final_loss)
        if final_loss < best_loss:
            best_loss, best_params = final_loss, params
        return best_params, history
    return params, history
