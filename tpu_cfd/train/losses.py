"""Functional-norm losses: L2/Lp, Sobolev, Bochner, and the NSE residual.

TPU-native counterpart of the reference's ``fno/losses.py`` (central_diff:
losses.py:10, L2Loss2d: :50, LpLoss: :140, SobolevLoss: :199, BochnerNorm:
:318, ResidualLoss: :367). The torch ``_WeightedLoss`` modules become plain
dataclasses with a pure ``__call__``; frequency meshes/weights are numpy
host constants built once at construction, so they embed as constants into
the jitted train step and the FFT-pointwise chains fuse.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def central_diff(
    u: Array, h: Optional[float] = None, mode: str = "constant"
) -> Tuple[Array, Array]:
    """Central-difference spatial gradients with 1-cell padding (losses.py:10-47).

    ``u``: (..., n, n) with the two spatial dims last.
    """
    n = u.shape[-1]
    h = 1 / n if h is None else h
    pad = [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)]
    u = jnp.pad(u, pad, mode=mode)
    d, s = 2, 1
    gradx = (u[..., d:, s:-s] - u[..., :-d, s:-s]) / d
    grady = (u[..., s:-s, d:] - u[..., s:-s, :-d]) / d
    return gradx / h, grady / h


@dataclasses.dataclass
class L2Loss2d:
    """Relative L2 with optional H¹-seminorm regularizer (losses.py:50-137)."""

    regularizer: bool = False
    h: float = 1 / 512
    beta: float = 1.0
    gamma: float = 1e-1
    metric_reduction: str = "L1"
    eps: float = 1e-3
    weighted: bool = False

    def __call__(
        self,
        preds: Array,
        targets: Array,
        targets_grad: Optional[Array] = None,
        K: Optional[Array] = None,
        weights: Optional[Array] = None,
    ) -> Array:
        K = 1.0 if K is None else K**0.5
        sum_dims = tuple(range(1, preds.ndim))
        target_norm = (targets**2).sum(axis=sum_dims) + self.eps

        if weights is None and self.weighted:
            inv_l2 = 1 / jnp.sqrt(target_norm)
            weights = inv_l2 / inv_l2.mean()
        elif not self.weighted:
            weights = 1.0

        loss = (
            self.beta
            * weights
            * ((preds - targets) ** 2).sum(axis=sum_dims)
            / target_norm
        )

        if targets_grad is not None and self.gamma > 0:
            grad_dims = tuple(range(1, targets_grad.ndim))
            targets_prime_norm = (
                2 * (K * targets_grad**2).mean(axis=grad_dims) + self.eps
            )
            preds_grad = jnp.concatenate(central_diff(preds), axis=1)
            grad_diff = (K * (preds_grad - targets_grad)) ** 2
            loss = loss + (
                self.gamma * grad_diff.mean(axis=grad_dims) / targets_prime_norm
            )

        if self.metric_reduction == "L2":
            return jnp.sqrt(loss.mean())
        elif self.metric_reduction == "L1":
            return jnp.sqrt(loss).mean()
        elif self.metric_reduction == "Linf":
            return jnp.sqrt(loss).max()
        raise ValueError(f"unknown metric_reduction: {self.metric_reduction}")


@dataclasses.dataclass
class LpLoss:
    """The original FNO rel/abs Lp loss (losses.py:140-196)."""

    d: int = 2
    p: int = 2
    h: Optional[float] = None
    size_average: bool = True
    reduction: bool = True
    relative: bool = False

    def abs(self, x: Array, y: Array) -> Array:
        bsz = x.shape[0]
        h = 1.0 / (x.shape[1] - 1.0) if self.h is None else self.h
        diff_norms = jnp.linalg.norm(
            (x - y).reshape(bsz, -1), ord=self.p, axis=1
        )
        all_norms = (h ** (self.d / self.p)) * diff_norms
        if self.reduction:
            return all_norms.mean() if self.size_average else all_norms.sum()
        return all_norms

    def rel(self, x: Array, y: Array) -> Array:
        bsz = x.shape[0]
        diff_norms = jnp.linalg.norm((x - y).reshape(bsz, -1), ord=self.p, axis=1)
        y_norms = jnp.linalg.norm(y.reshape(bsz, -1), ord=self.p, axis=1)
        rel = diff_norms / y_norms
        if self.reduction:
            return rel.mean() if self.size_average else rel.sum()
        return rel

    def __call__(self, x: Array, y: Array) -> Array:
        return self.rel(x, y) if self.relative else self.abs(x, y)


class SobolevLoss:
    """Fractional Sobolev norm ‖(α-Δ)^{s/2}(u-v)‖ in the Fourier domain.

    Counterpart of losses.py:199-315: fractional order ``norm_order`` (s),
    frequency cutoff, relative Bochner-style time aggregation
    (∫_T ‖·‖² dt)^{1/2}. Inputs are ``(b, n, n, T)`` (time last by default).
    """

    def __init__(
        self,
        n_grid: int = 256,
        time_average: bool = True,
        reduction: bool = True,
        mesh_weighted: bool = True,
        relative: bool = False,
        inp_time_last: bool = True,
        freq_cutoff: Optional[int] = None,
        norm_order: float = -1,
        alpha: float = 0.1,
        fft_norm: str = "backward",
        diam: float = 1.0,
    ):
        self.relative = relative
        self.time_average = time_average
        self.reduction = reduction
        self.mesh_weighted = mesh_weighted
        self.norm_order = norm_order
        self.alpha = alpha
        self.fft_norm = fft_norm
        self.inp_time_last = inp_time_last
        self.n_grid = n_grid
        self._set_weight(n_grid, diam, norm_order, freq_cutoff)

    def _set_weight(self, n, diam, norm_order, freq_cutoff):
        k = np.fft.fftfreq(n, d=diam / n)
        kx, ky = np.meshgrid(k, k, indexing="ij")
        kx = kx[None, :, :, None]
        ky = ky[None, :, :, None]
        if freq_cutoff is None:
            freq_cutoff = n // 2 + 1
        freq_cutoff = freq_cutoff / diam
        # cutoff: negative orders send high frequencies to zero weight
        # (1/inf), positive orders zero them directly
        cutoff_val = np.inf if norm_order < 0 else 0.0
        kx = np.where(np.abs(kx) > freq_cutoff, cutoff_val, kx)
        ky = np.where(np.abs(ky) > freq_cutoff, cutoff_val, ky)
        weight = self.alpha + 4 * np.pi**2 * (kx**2 + ky**2)
        # stays float64 host-side; cast to the input's real dtype at call
        # time so fp64 fine-tune residuals keep full precision
        self.weight = np.sqrt(weight)

    def __call__(self, x: Array, y: Optional[Array] = None) -> Array:
        bsz = x.shape[0]
        n = self.n_grid
        if not self.inp_time_last:
            x = jnp.moveaxis(x, 1, -1)
            if y is not None:
                y = jnp.moveaxis(y, 1, -1)
        nt = x.shape[-1]

        x = jnp.fft.fftn(x, axes=(1, 2), norm=self.fft_norm)
        x = x.reshape(bsz, n, n, -1)
        if y is None:
            y = jnp.zeros_like(x)
        else:
            y = jnp.fft.fftn(y, axes=(1, 2), norm=self.fft_norm)
            y = y.reshape(bsz, n, n, -1)

        weight = jnp.asarray(self.weight, dtype=jnp.real(x).dtype)
        w = weight ** (self.norm_order / 2) if self.norm_order != 0 else weight
        # guard 1/inf -> 0 for the cutoff modes with negative orders
        w = jnp.where(jnp.isfinite(w), w, 0.0)
        x = x * w
        y = y * w
        diff_freq = jnp.linalg.norm(x - y, axis=(1, 2))  # (bsz, T)
        if self.relative:
            y2_norms = jnp.linalg.norm(y, axis=(1, 2))
            y2_norms = jnp.sqrt((y2_norms**2).sum(axis=-1))
        else:
            y2_norms = jnp.ones((bsz,), dtype=diff_freq.dtype)

        loss = jnp.sqrt((diff_freq**2).sum(axis=-1))
        y2_norms = y2_norms / n if self.mesh_weighted else y2_norms
        loss = loss / y2_norms
        loss = loss / math.sqrt(nt) if self.time_average else loss
        loss = loss.mean(0) if self.reduction else loss.sum(0)
        loss = loss / n if self.mesh_weighted else loss
        return loss


class BochnerNorm(SobolevLoss):
    """(∫_T ‖u‖_p² dt)^{1/2} (losses.py:318-364)."""

    def __init__(
        self,
        n_grid: int = 256,
        dt: Optional[float] = None,
        p: int = 2,
        relative: bool = True,
        mesh_weighted: bool = True,
        reduction: bool = True,
        time_average: bool = False,
        time_last: bool = False,
    ):
        super().__init__(
            n_grid=n_grid,
            relative=relative,
            inp_time_last=time_last,
            reduction=reduction,
            mesh_weighted=mesh_weighted,
            time_average=time_average,
        )
        self.dt = dt
        self.p = p
        self.time_last = time_last

    def __call__(self, u: Array) -> Array:
        n = self.n_grid
        if u.ndim == 3:
            u = u[None]
        if not self.time_last:
            u = jnp.moveaxis(u, 1, -1)
        norm_space = (jnp.abs(u) ** self.p).sum(axis=(1, 2)) ** (1 / self.p)
        norm_space = norm_space / n if self.mesh_weighted else norm_space
        if self.dt is not None:
            norm = jnp.sqrt((norm_space**2).sum(axis=-1) * self.dt)
        else:
            norm = jnp.sqrt((norm_space**2).mean(axis=-1))
        return norm.mean() if self.reduction else norm.sum()


class ResidualLoss:
    """Full NSE residual in the space-time Fourier domain (losses.py:367-467).

    The time derivative is computed spectrally (2πi k_t multiplication), so
    the loss measures how well a predicted trajectory satisfies the vorticity
    equation — the fine-tuning objective.
    """

    def __init__(
        self,
        alpha: float = 1e-1,
        visc: float = 1e-3,
        n_grid: int = 64,
        n_t: int = 40,
        delta_t: float = 1e-2,
        norm: str = "ortho",
    ):
        self.alpha = alpha
        self.visc = visc
        self.n_grid = n_grid
        self.n_t = n_t
        self.delta_t = delta_t
        self.norm = norm
        n = n_grid
        kx = np.fft.fftfreq(n, d=1 / n)
        ky = np.fft.fftfreq(n, d=1 / n)
        kt = np.fft.fftfreq(n_t, d=delta_t)
        kx, ky, kt = np.meshgrid(kx, ky, kt, indexing="ij")
        lap = -4 * np.pi**2 * (kx**2 + ky**2)
        lap[0, 0, :] = 1.0
        self.kx = kx.astype(np.float32)
        self.ky = ky.astype(np.float32)
        self.kt = kt.astype(np.float32)
        self.lap = lap.astype(np.float32)

    def __call__(
        self,
        w: Array,
        psi: Optional[Array] = None,
        f: Optional[Array] = None,
    ) -> Array:
        """w: (b, n, n, T) physical-space vorticity trajectory."""
        size = w.shape[1:]
        n = size[0]
        axes = (1, 2, 3)
        norm = self.norm
        fftn = lambda z: jnp.fft.fftn(z, axes=axes, norm=norm)
        ifftn = lambda z: jnp.fft.ifftn(z, axes=axes, norm=norm)

        w_h = fftn(w)
        w_h_t = fftn(ifftn(2 * jnp.pi * self.kt * 1j * w_h))

        if psi is not None:
            psi_h = fftn(psi)
        else:
            psi_h = -w_h / self.lap

        q = ifftn(2 * jnp.pi * self.ky * 1j * psi_h)
        v = ifftn(-2.0 * jnp.pi * self.kx * 1j * psi_h)
        w_x = ifftn(2.0 * jnp.pi * self.kx * 1j * w_h)
        w_y = ifftn(2.0 * jnp.pi * self.ky * 1j * w_h)
        convection = fftn(q * w_x + v * w_y)

        lap_w = self.lap * w_h
        if f is None:
            ff = jnp.zeros_like(w_h)
        else:
            ff = fftn(f)

        residual = (w_h_t + convection - self.visc * lap_w - ff).real
        return jnp.linalg.norm(residual, axis=(-1, -2)).mean() / n
