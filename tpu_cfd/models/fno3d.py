"""FNO3d — the Li et al. Fourier Neural Operator baseline in flax.

TPU-native counterpart of the reference's ``fno/fno3d.py`` (SpectralConv3d:
fno3d.py:19-116 with 4 complex corner blocks, MLP: :119, FNO3d: :132 with the
fixed 13-channel input — 10 solution steps + (x, y, t) grid channels — and
``(out, None)`` return :236).

Channels-last layout ``(b, x, y, t, c)`` matches the reference's INPUT layout
(fno3d.py:163-166 documents (b, x, y, t, 13)); internally there is no
channels-first transpose — 1×1 convs are Dense matmuls on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_cfd.models.base import SpectralConv, view_as_complex

Array = jax.Array


class SpectralConv3d(SpectralConv):
    """3-D Fourier layer: 4 (x,y)-corner blocks × low t modes (fno3d.py:19)."""

    def spectral_conv(self, vh: Array, kx: int, ky: int, kt: int) -> Array:
        b = vh.shape[0]
        modes1, modes2, modes3 = self.modes
        out = jnp.zeros((b, kx, ky, kt, self.out_channels), dtype=vh.dtype)
        slice_x = [slice(0, modes1), slice(-modes1, None)]
        slice_y = [slice(0, modes2), slice(-modes2, None)]
        st = slice(0, modes3)
        for ix, sx in enumerate(slice_x):
            for iy, sy in enumerate(slice_y):
                w = view_as_complex(self.weight[ix + 2 * iy])
                out = out.at[:, sx, sy, st, :].set(
                    self.complex_matmul(vh[:, sx, sy, st, :], w)
                )
        return out


class MLP3d(nn.Module):
    """Pointwise 2-layer MLP (fno3d.py:119).

    ``dtype`` is the flax computation dtype (params stay float32; None =
    promote from inputs) — see SFNO.compute_dtype."""

    out_channels: int
    mid_channels: int
    activation: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.mid_channels, dtype=self.dtype)(x)
        if self.activation:
            x = nn.gelu(x)
        return nn.Dense(self.out_channels, dtype=self.dtype)(x)


class FNO3d(nn.Module):
    """Baseline FNO-3D (fno3d.py:132).

    __call__: (b, x, y, t, input_channel + 3) -> ((b, x, y, t), None)
    The input carries ``input_channel`` solution steps broadcast in time plus
    the (x, y, t) coordinate channels.
    """

    modes1: int
    modes2: int
    modes3: int
    width: int
    dim: int = 3
    input_channel: int = 10
    num_spectral_layers: int = 4
    last_activation: bool = False
    padding: int = 0
    channel_expansion: int = 128
    # activation storage dtype of the backbone ("bfloat16" halves activation
    # HBM traffic; params/optimizer and the output head stay in the input
    # dtype) — see SFNO.compute_dtype
    compute_dtype: Optional[str] = None
    # rematerialize backbone blocks in the backward pass — see SFNO.remat
    # (explicit scope names keep the param tree checkpoint-compatible)
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, None]:
        in_dtype = x.dtype
        cd = None if self.compute_dtype is None else jnp.dtype(self.compute_dtype)
        Conv3d = nn.remat(SpectralConv3d) if self.remat else SpectralConv3d
        MLP = nn.remat(MLP3d) if self.remat else MLP3d
        x = nn.Dense(self.width, dtype=cd)(x)  # lifting p (fno3d.py:178)

        if self.padding != 0:
            p = self.padding
            # circular pad on the spatial dims for non-periodic domains
            x = jnp.pad(
                x, [(0, 0), (p, p), (p, p), (0, 0), (0, 0)], mode="wrap"
            )

        for layer in range(self.num_spectral_layers):
            x1 = Conv3d(
                in_channels=self.width,
                out_channels=self.width,
                modes=(self.modes1, self.modes2, self.modes3),
                name=f"SpectralConv3d_{layer}",
            )(x)
            x1 = MLP(self.width, self.width, dtype=cd,
                     name=f"MLP3d_{layer}")(x1)
            x2 = nn.Dense(self.width, dtype=cd)(x)
            x = x1 + x2
            if layer < self.num_spectral_layers - 1 or self.last_activation:
                x = nn.gelu(x)

        if self.padding != 0:
            p = self.padding
            x = x[:, p:-p, p:-p, :, :]

        # output head in the input dtype regardless of compute_dtype (named
        # explicitly: the remat-wrapped loop MLPs pin MLP3d_0..n-1, so the
        # head must pin the continuation of that sequence either way)
        x = MLP3d(1, self.channel_expansion, activation=self.last_activation,
                  name=f"MLP3d_{self.num_spectral_layers}")(
            x.astype(in_dtype)
        )
        return x[..., 0], None


def add_grid_3d(x: Array) -> Array:
    """Appends normalized (x, y, t) coordinate channels (datasets.py:124)."""
    b, nx, ny, nt, _ = x.shape
    gx = jnp.linspace(0, 1, nx, dtype=x.dtype)
    gy = jnp.linspace(0, 1, ny, dtype=x.dtype)
    gt = jnp.linspace(0, 1, nt + 1, dtype=x.dtype)[1:]
    gx, gy, gt = jnp.meshgrid(gx, gy, gt, indexing="ij")
    grid = jnp.stack([gx, gy, gt], axis=-1)[None]
    grid = jnp.broadcast_to(grid, (b, nx, ny, nt, 3))
    return jnp.concatenate([x, grid], axis=-1)
