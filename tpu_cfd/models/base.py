"""FNO building blocks as flax.linen modules (channels-last, TPU layout).

TPU-native counterpart of the reference's ``fno/base.py`` (LayerNormnd:
base.py:61, PointwiseFFN: :86, SpectralConv: :114 with the corner-block
weight layout :146-167 and complex einsum :176-221, FNOBase: :240).

Design deltas from the torch reference, chosen for the TPU/XLA:
  - channels-LAST layout ``(b, x, y, t, c)``: 1×1 convs become plain Dense
    matmuls with M = b·x·y·t on the MXU, and XLA fuses the activation;
  - complex weights stored as real ``(..., 2)`` pairs (as the reference does,
    base.py:139) so optax treats them as ordinary floats;
  - the per-mode complex contraction is an einsum with the mode axes as
    batch dims — one batched MXU matmul per corner block;
  - no ``__torch_function__``/hook machinery: latent taps use flax's
    ``capture_intermediates`` / ``Module.sow`` instead.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_ACTIVATIONS = {
    "ReLU": nn.relu,
    "GELU": nn.gelu,
    "SiLU": nn.silu,
    "ELU": nn.elu,
    "CELU": nn.celu,
    "LeakyReLU": nn.leaky_relu,
    "Sigmoid": nn.sigmoid,
    "Tanh": nn.tanh,
    "SoftPlus": nn.softplus,
    "Mish": lambda x: x * nn.tanh(nn.softplus(x)),
    "Identity": lambda x: x,
}


def get_activation(name: str) -> Callable[[Array], Array]:
    """Maps the reference's nn.<Name> activation strings to jax functions."""
    if name not in _ACTIVATIONS:
        raise ValueError(
            f"Unsupported activation {name!r}; available: {sorted(_ACTIVATIONS)}"
        )
    return _ACTIVATIONS[name]


class LayerNormnd(nn.Module):
    """GroupNorm(1, C): shape-agnostic LayerNorm over (spatial..., C).

    Counterpart of reference base.py:61 — normalizing over all non-batch dims
    keeps the model input-steps agnostic (unlike FNO3d's global dataset
    normalization).
    """

    epsilon: float = 1e-7

    @nn.compact
    def __call__(self, v: Array) -> Array:
        return nn.GroupNorm(num_groups=1, epsilon=self.epsilon)(v)


class PointwiseFFN(nn.Module):
    """2-layer pointwise (1×1 conv) FFN with channel expansion (base.py:86)."""

    out_channels: int
    mid_channels: int
    activation: str = "ReLU"

    @nn.compact
    def __call__(self, v: Array) -> Array:
        act = get_activation(self.activation)
        v = nn.Dense(self.mid_channels)(v)
        v = act(v)
        return nn.Dense(self.out_channels)(v)


def spectral_weight_init(gain: float):
    """Uniform [0, gain) init matching reference base.py:146-152."""

    def init(key, shape, dtype=jnp.float32):
        return gain * jax.random.uniform(key, shape, dtype)

    return init


def view_as_complex(w: Array) -> Array:
    """(..., 2) real pairs -> complex (reference uses torch.view_as_complex)."""
    return jax.lax.complex(w[..., 0], w[..., 1])


class SpectralConv(nn.Module):
    """N-D Fourier layer template: rfftn → mode-truncated matmul → irfftn.

    Weights are ``2**(dim-1)`` corner blocks (counterpart of base.py:114-237;
    for dim=3 that is the 4 (x,y)-corner blocks of reference sfno.py:374).
    Subclasses implement ``spectral_conv`` on the channels-last half-spectrum
    ``(b, kx, ky, kt, c)``.
    """

    in_channels: int
    out_channels: int
    modes: Tuple[int, ...]
    bias: bool = False
    norm: str = "backward"
    delta: float = 1.0

    @property
    def dim(self) -> int:
        return len(self.modes)

    @property
    def num_blocks(self) -> int:
        return 2 ** (self.dim - 1)

    def setup(self):
        gain = 0.5 / (self.in_channels * self.out_channels)
        shape = (*self.modes, self.in_channels, self.out_channels, 2)
        self.weight = [
            self.param(f"weight_{i}", spectral_weight_init(gain), shape)
            for i in range(self.num_blocks)
        ]
        if self.bias:
            self.bias_param = [
                self.param(f"bias_{i}", nn.initializers.zeros, (*self.modes, 2))
                for i in range(self.num_blocks)
            ]

    @staticmethod
    def complex_matmul(x: Array, w: Array) -> Array:
        """(b, *modes, c_i) × (*modes, c_i, c_o) → (b, *modes, c_o).

        The mode axes act as batch dims of an MXU matmul with M=b, K=c_i,
        N=c_o (channels-last version of reference base.py:176-189).
        """
        return jnp.einsum(
            "b...i,...io->b...o", x, w, precision=jax.lax.Precision.HIGHEST
        )

    def spectral_conv(self, vhat: Array, *fft_mesh_size: int) -> Array:
        raise NotImplementedError

    def _fft_axes(self, v: Array) -> Tuple[int, ...]:
        # transform the mesh dims; channels-last means axes (-dim-1, ..., -2)
        return tuple(range(-self.dim - 1, -1))

    def __call__(self, v: Array, out_mesh_size: Optional[Sequence[int]] = None) -> Array:
        *_, c = v.shape
        mesh_size = v.shape[-self.dim - 1: -1]
        out_mesh_size = tuple(mesh_size) if out_mesh_size is None else tuple(out_mesh_size)
        fft_mesh_size = list(mesh_size)
        fft_mesh_size[-1] = mesh_size[-1] // 2 + 1
        axes = self._fft_axes(v)
        v_hat = jnp.fft.rfftn(v, axes=axes, norm=self.norm)
        v_hat = self.spectral_conv(v_hat, *fft_mesh_size)
        return jnp.fft.irfftn(v_hat, s=out_mesh_size, axes=axes, norm=self.norm)
