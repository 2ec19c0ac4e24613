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

from typing import Callable, Optional, Sequence, Tuple

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
        # hand-rolled GroupNorm(1, C): one fused mean/var pass over all
        # non-batch dims + per-channel affine. flax's GroupNorm reshape
        # lowering costs ~3x more on TPU for these 5-D layouts.
        axes = tuple(range(1, v.ndim))
        mean = v.mean(axis=axes, keepdims=True)
        var = ((v - mean) ** 2).mean(axis=axes, keepdims=True)
        y = (v - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (v.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (v.shape[-1],))
        return y * scale + bias


class PointwiseFFN(nn.Module):
    """2-layer pointwise (1×1 conv) FFN with channel expansion (base.py:86).

    ``dtype`` is the flax computation dtype (params stay float32): bfloat16
    halves the HBM traffic of the expanded mid-channel activations — the
    measured bottleneck of the SFNO train step — at unchanged param/optimizer
    precision. None keeps flax's promote-from-inputs default (float32).
    """

    out_channels: int
    mid_channels: int
    activation: str = "ReLU"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, v: Array) -> Array:
        act = get_activation(self.activation)
        v = nn.Dense(self.mid_channels, dtype=self.dtype)(v)
        v = act(v)
        return nn.Dense(self.out_channels, dtype=self.dtype)(v)


import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_fwd_c2c(n: int, m: int, t_offset: int = 0, length: int = None,
                 cdtype: str = "complex64"):
    """(2m, n) DFT rows for modes [0..m-1, -m..-1] sampled at positions
    t_offset..t_offset+n-1 of a length-`length` transform (host constant)."""
    length = n if length is None else length
    k = np.concatenate([np.arange(m), -np.arange(m, 0, -1)])
    x = t_offset + np.arange(n)
    return np.exp(-2j * np.pi * np.outer(k, x) / length).astype(cdtype)


@functools.lru_cache(maxsize=None)
def _dft_fwd_low(n: int, m: int, t_offset: int = 0, length: int = None,
                 cdtype: str = "complex64"):
    """(m, n) DFT rows for low modes 0..m-1 (the rfft'd axis)."""
    length = n if length is None else length
    k = np.arange(m)
    x = t_offset + np.arange(n)
    return np.exp(-2j * np.pi * np.outer(k, x) / length).astype(cdtype)


@functools.lru_cache(maxsize=None)
def _dft_inv_c2c(n_out: int, m: int, cdtype: str = "complex64"):
    """(n_out, 2m) inverse-DFT columns for signed modes [0..m-1, -m..-1]."""
    k = np.concatenate([np.arange(m), -np.arange(m, 0, -1)])
    x = np.arange(n_out)
    return np.exp(2j * np.pi * np.outer(x, k) / n_out).astype(cdtype)


@functools.lru_cache(maxsize=None)
def _dft_inv_low(length: int, m: int, keep_last: int, cdtype: str = "complex64"):
    """(keep_last, m) inverse rows reconstructing the LAST ``keep_last``
    positions of a length-`length` irfft from low modes 0..m-1, including the
    Hermitian multiplicities (1 at DC/Nyquist, 2 inside; 0 past Nyquist —
    matching irfftn's spectral truncation for short outputs)."""
    k = np.arange(m)
    c = np.full((m,), 2.0)
    c[0] = 1.0
    if length % 2 == 0 and m - 1 >= length // 2:
        c[length // 2] = 1.0
    c[k > length // 2] = 0.0
    t = np.arange(length - keep_last, length)
    return (c * np.exp(2j * np.pi * np.outer(t, k) / length)).astype(cdtype)


def spectral_weight_init(gain: float):
    """Uniform [0, gain) init matching reference base.py:146-152."""

    def init(key, shape, dtype=jnp.float32):
        return gain * jax.random.uniform(key, shape, dtype)

    return init


def view_as_complex(w: Array) -> Array:
    """(..., 2) real pairs -> complex (reference uses torch.view_as_complex)."""
    return jax.lax.complex(w[..., 0], w[..., 1])


def apply_with_latents(model, params, *args, **kwargs):
    """Runs ``model.apply`` and returns (output, {name: latent}).

    Functional counterpart of the reference's forward hooks
    (``FNOBase.add_latent_hook``, base.py:330-345): models ``sow`` their
    latent tensors under the "intermediates" collection ("lifting",
    "spectral_{i}", and "r" — the reduced latent the fine-tuning pipeline
    taps). No hook registration: every apply can ask for them.
    """
    out, state = model.apply(
        params, *args, mutable=["intermediates"], **kwargs
    )
    latents = {}

    def _collect(path, leaf):
        # sow stores tuples under module-scoped paths; key by the sow name
        name = None
        for p in path:
            name = getattr(p, "key", getattr(p, "name", None)) or name
        latents[str(name)] = leaf

    jax.tree_util.tree_map_with_path(
        _collect, state.get("intermediates", {}),
        is_leaf=lambda x: isinstance(x, tuple),
    )
    latents = {k: v[0] if isinstance(v, tuple) else v for k, v in latents.items()}
    return out, latents


def params_to_double(params):
    """fp64-promotes a parameter pytree (reference ``FNOBase.double``,
    base.py:345-356, which also promotes complex64 → complex128; complex
    weights here are stored as real pairs so one float cast covers both)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        params,
    )


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
    # "dft": mode-truncated transform as compact MXU matmuls (small DFT
    # matrices contract only the kept modes — no full-spectrum zero-fill,
    # scatter, or FFT); "fft": the reference's rfftn/scatter/irfftn flow.
    impl: str = "dft"
    # MXU precision of the dft-path einsums: "highest" = full fp32 (matches
    # the fft path bit-for-bit tolerance), "high"/"default" trade precision
    # for throughput (bf16-based passes)
    mxu_precision: str = "highest"

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

    def compact_weight(self) -> Array:
        """Concatenates the 4 corner blocks into (2mx, 2my, mt, ci, co).

        Mode order matches the compact DFT matrices: x/y modes
        [0..m-1, -m..-1]; block index is ix + 2*iy (reference sfno.py:374).
        """
        w = [view_as_complex(self.weight[i]) for i in range(self.num_blocks)]
        low_x = jnp.concatenate([w[0], w[2]], axis=1)
        high_x = jnp.concatenate([w[1], w[3]], axis=1)
        return jnp.concatenate([low_x, high_x], axis=0)

    def compact_bias(self) -> Array:
        b = [view_as_complex(self.bias_param[i]) for i in range(self.num_blocks)]
        low_x = jnp.concatenate([b[0], b[2]], axis=1)
        high_x = jnp.concatenate([b[1], b[3]], axis=1)
        return jnp.concatenate([low_x, high_x], axis=0)

    def _dft_apply(
        self,
        v: Array,
        out_mesh_size: Optional[Sequence[int]] = None,
        t_pad: int = 0,
        keep_last: Optional[int] = None,
        postprocess=None,
        postprocess_mesh=None,
    ) -> Array:
        """Mode-truncated spectral conv as compact DFT matmuls (MXU path).

        Equivalent to rfftn → corner matmul (+bias) → (postprocess) → irfftn
        with the zero modes never materialized: the forward/inverse DFT
        matrices only span the kept modes, the temporal zero-padding against
        aliasing folds into sample positions of the t matrices, and the
        output sizes implement the FFT-native super-resolution directly
        (reference sfno.py:364-457 semantics, validated to the FFT path).

        Contraction order is x→t→y forward and t→y→x inverse, with the norm
        scale folded into the inverse-t matrix: measured fastest on TPU over
        a full train step (round-3 trace-guided sweep — the order controls
        which relayouts XLA must insert around each batched matmul; this
        combination plus XLA-chosen carry layouts is ~21% faster than the
        round-2 t→x→y chain at the bench configuration).
        """
        b, nx, ny, nt, ci = v.shape
        mx, my, mt = self.modes
        L_fwd = nt + t_pad
        # the FFT path can only touch modes that exist in the forward
        # half-spectrum (slice(0, mt) of kt = L_fwd//2+1)
        mt = min(mt, L_fwd // 2 + 1)
        if out_mesh_size is None:
            nx_out, ny_out, L_out = nx, ny, L_fwd
        else:
            nx_out, ny_out, L_out = out_mesh_size
        keep_last = L_out if keep_last is None else keep_last

        n_fwd = nx * ny * L_fwd
        n_out = nx_out * ny_out * L_out
        if self.norm == "backward":
            scale = 1.0 / n_out
        elif self.norm == "ortho":
            scale = 1.0 / (np.sqrt(n_fwd) * np.sqrt(n_out))
        elif self.norm == "forward":
            scale = 1.0 / n_fwd
        else:
            raise ValueError(f"unknown norm {self.norm}")

        P = getattr(jax.lax.Precision, self.mxu_precision.upper())
        cdtype = "complex128" if v.dtype == jnp.float64 else "complex64"
        Ft = jnp.asarray(_dft_fwd_low(nt, mt, t_offset=t_pad, length=L_fwd, cdtype=cdtype))
        Fx = jnp.asarray(_dft_fwd_c2c(nx, mx, cdtype=cdtype))
        Fy = jnp.asarray(_dft_fwd_c2c(ny, my, cdtype=cdtype))
        h = jnp.einsum("bxytc,Xx->bXytc", v.astype(Ft.dtype), Fx, precision=P)
        h = jnp.einsum("bXytc,Tt->bXyTc", h, Ft, precision=P)
        h = jnp.einsum("bXyTc,Yy->bXYTc", h, Fy, precision=P)

        w = self.compact_weight()[:, :, :mt]
        out_h = jnp.einsum("bXYTi,XYTio->bXYTo", h, w, precision=P)
        if self.bias:
            out_h = out_h + self.delta * self.compact_bias()[:, :, :mt, None]
        if postprocess is not None:
            out_h = postprocess(out_h, postprocess_mesh)

        Gx = jnp.asarray(_dft_inv_c2c(nx_out, mx, cdtype=cdtype))
        Gy = jnp.asarray(_dft_inv_c2c(ny_out, my, cdtype=cdtype))
        Gt = jnp.asarray(
            np.asarray(_dft_inv_low(L_out, mt, keep_last, cdtype=cdtype)) * scale
        )
        out = jnp.einsum("bXYTo,tT->bXYto", out_h, Gt, precision=P)
        out = jnp.einsum("bXYto,yY->bXyto", out, Gy, precision=P)
        out = jnp.einsum("bXyto,xX->bxyto", out, Gx, precision=P)
        return out.real.astype(v.dtype)

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
        # rfftn accepts only fp32/fp64 — bf16 activations (compute_dtype)
        # transform in fp32 and return in the activation dtype
        in_dtype = v.dtype
        if in_dtype == jnp.bfloat16:
            v = v.astype(jnp.float32)
        v_hat = jnp.fft.rfftn(v, axes=axes, norm=self.norm)
        v_hat = self.spectral_conv(v_hat, *fft_mesh_size)
        out = jnp.fft.irfftn(v_hat, s=out_mesh_size, axes=axes, norm=self.norm)
        return out.astype(in_dtype)
