"""SFNO — spatiotemporal Fourier Neural Operator (Spectral-Refiner).

TPU-native counterpart of the reference's ``fno/sfno.py``
(SpaceTimePositionalEncoding: sfno.py:25, HelmholtzProjection: :116,
LiftingOperator: :196, OutConv: :263, SpectralConvS: :331, SpectralConvT:
:397, SFNO: :460; hyperparameters documented sfno.py:495-536).

Layout is channels-last ``(b, x, y, t, c)`` (see models/base.py). The input/
output API matches the reference semantically: ``SFNO.__call__`` takes
``(b, x, y, t_in)`` vorticity and returns ``(b, x, y, out_steps)`` (scalar
fields) — arbitrary in/out space-time discretizations, with FFT-based
temporal super-resolution and left temporal zero-padding against aliasing
(reference sfno.py:440-444).

Shape polymorphism under jit: positional encodings and Helmholtz fft meshes
are recomputed from static trace-time shapes (no buffers to rebuild —
XLA constant-folds them); a new spatial size is simply a new trace.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_cfd.models.base import (
    LayerNormnd,
    PointwiseFFN,
    SpectralConv,
    get_activation,
    view_as_complex,
)

Array = jax.Array


class SpaceTimePositionalEncoding(nn.Module):
    """Sinusoidal space-time PE with NSE-motivated exponential time scaling.

    Counterpart of reference sfno.py:25-113: channels are (x, y, t)
    coordinates plus ``num_channels - 3`` temporal bases
    ``exp(beta*t) * sin/cos(pi*(k+1)*t)``; the optional random-feature variant
    uses the ``modes_x*modes_y*modes_t`` product basis projected to
    ``num_channels`` with a pointwise Dense. Adding the PE to a single-channel
    input broadcasts it up to ``num_channels`` (reference sfno.py:109-113).
    """

    modes_x: int = 16
    modes_y: int = 16
    modes_t: int = 5
    num_channels: int = 20
    spatial_random_feats: bool = False
    max_time_steps: int = 100
    time_exponential_scale: float = 1e-2

    def _coords(self, nx: int, ny: int, nt: int, dtype):
        gridx = jnp.linspace(0, 1, nx, dtype=dtype)
        gridy = jnp.linspace(0, 1, ny, dtype=dtype)
        gridt = jnp.linspace(0, 1, self.max_time_steps + 1, dtype=dtype)[1: nt + 1]
        return jnp.meshgrid(gridx, gridy, gridt, indexing="ij")

    def _pe(self, nx: int, ny: int, nt: int, dtype) -> Array:
        gridx, gridy, gridt = self._coords(nx, ny, nt, dtype)
        pe = [gridx, gridy, gridt]
        t = gridt[0, 0, :]  # time profile, broadcast over space
        for k in range(self.num_channels - 3):
            basis = jnp.sin if k % 2 == 0 else jnp.cos
            profile = jnp.exp(self.time_exponential_scale * t) * basis(
                jnp.pi * (k + 1) * t
            )
            pe.append(jnp.broadcast_to(profile[None, None, :], (nx, ny, nt)))
        return jnp.stack(pe, axis=-1)[None]  # (1, x, y, t, C)

    def _pe_expanded(self, nx: int, ny: int, nt: int, dtype) -> Array:
        gridx, gridy, gridt = self._coords(nx, ny, nt, dtype)
        pe = [gridx, gridy, gridt]
        for i in range(1, self.modes_x + 1):
            basis_x = jnp.sin if i % 2 == 0 else jnp.cos
            for j in range(1, self.modes_y + 1):
                basis_y = jnp.sin if j % 2 == 0 else jnp.cos
                for k in range(1, self.modes_t + 1):
                    basis_t = jnp.sin if k % 2 == 0 else jnp.cos
                    pe.append(
                        1
                        / (i * j * k)
                        * jnp.exp(self.time_exponential_scale * gridt)
                        * basis_x(jnp.pi * i * gridx)
                        * basis_y(jnp.pi * j * gridy)
                        * basis_t(jnp.pi * k * gridt)
                    )
        return jnp.stack(pe, axis=-1)[None]

    @nn.compact
    def __call__(self, v: Array) -> Array:
        """(b, x, y, t, 1) -> (b, x, y, t, num_channels)."""
        _, nx, ny, nt, _ = v.shape
        if self.spatial_random_feats:
            pe = self._pe_expanded(nx, ny, nt, v.dtype)
            pe = nn.Dense(self.num_channels)(pe)
        else:
            pe = self._pe(nx, ny, nt, v.dtype)
        return v + pe


class HelmholtzProjection(nn.Module):
    """Frequency-domain Leray projection: wardhat = û - ∇(∇·û)/Δ̂.

    Makes a predicted velocity field divergence-free (reference
    sfno.py:116-193). Operates on the channels-last half spectrum
    ``(b, x, y, kt, 2)``; the (full) x/y frequency meshes are recomputed from
    the trace-time shape, so evaluation resolution is arbitrary.
    """

    diam: float = 2 * jnp.pi

    @staticmethod
    def _fft_mesh(nx: int, diam: float, dtype):
        k = jnp.fft.fftfreq(nx, d=diam / nx).astype(dtype)
        kx, ky = jnp.meshgrid(k, k, indexing="ij")
        # broadcast over the (rfft'd) time axis
        return kx[..., None], ky[..., None]

    @staticmethod
    def div(uhat: Array, fft_mesh) -> Array:
        kx, ky = fft_mesh
        return 2j * jnp.pi * (uhat[..., 0] * kx + uhat[..., 1] * ky)

    @staticmethod
    def grad(uhat: Array, fft_mesh) -> Array:
        kx, ky = fft_mesh
        return jnp.stack(
            [2j * jnp.pi * kx * uhat, 2j * jnp.pi * ky * uhat], axis=-1
        )

    def __call__(self, uhat: Array, fft_mesh=None) -> Array:
        _, nx, ny, nt, d = uhat.shape
        assert d == 2, "Helmholtz projection expects a 2-component field"
        dtype = jnp.real(uhat).dtype
        if fft_mesh is not None:
            kx, ky = fft_mesh  # compact-mode meshes (broadcastable)
        else:
            kx, ky = self._fft_mesh(nx, self.diam, dtype)
        lap = -4 * (jnp.pi**2) * (kx**2 + ky**2)
        lap = lap.at[0, 0].set(1.0)
        div_u = self.div(uhat, (kx, ky))
        grad_div_u = self.grad(div_u, (kx, ky))
        return uhat - grad_div_u / lap[..., None]


class SpectralConvS(SpectralConv):
    """Space-focused 3-D spectral conv: 4 (x,y)-corner blocks, low t modes.

    Counterpart of reference sfno.py:331-394 (zeros-init output then
    block-assign :364-391; optional spectral bias scaled by delta :388-390).
    """

    def __call__(self, v: Array, out_mesh_size=None) -> Array:
        if self.impl == "dft":
            return self._dft_apply(v, out_mesh_size=out_mesh_size)
        return super().__call__(v, out_mesh_size=out_mesh_size)

    def spectral_conv(self, vh: Array, kx: int, ky: int, kt: int) -> Array:
        b = vh.shape[0]
        modes_x, modes_y, modes_t = self.modes
        out = jnp.zeros(
            (b, kx, ky, kt, self.out_channels), dtype=vh.dtype
        )
        slice_x = [slice(0, modes_x), slice(-modes_x, None)]
        slice_y = [slice(0, modes_y), slice(-modes_y, None)]
        st = slice(0, modes_t)
        for ix, sx in enumerate(slice_x):
            for iy, sy in enumerate(slice_y):
                w = view_as_complex(self.weight[ix + 2 * iy])
                block = self.complex_matmul(vh[:, sx, sy, st, :], w)
                if self.bias:
                    bias = view_as_complex(self.bias_param[ix + 2 * iy])
                    block = block + self.delta * bias[..., None]
                out = out.at[:, sx, sy, st, :].set(block)
        return out


class SpectralConvT(SpectralConvS):
    """Time-focused spectral conv with output-steps resampling.

    The irfft output length sets the temporal resolution (FFT-native
    super-resolution); left temporal zero-padding suppresses aliasing from
    the non-periodic time axis (reference sfno.py:397-457).
    """

    out_steps: Optional[int] = None
    temporal_padding: bool = False
    postprocess: Optional[nn.Module] = None

    def _compact_helmholtz(self, dtype):
        """Adapter: Helmholtz postprocess on the compact mode spectrum."""
        mx, my, _ = self.modes
        diam = getattr(self.postprocess, "diam", 2 * np.pi)
        rdtype = np.float64 if dtype == jnp.float64 else np.float32
        k_signed = lambda m: np.concatenate(
            [np.arange(m), -np.arange(m, 0, -1)]
        ) / diam
        kx = jnp.asarray(k_signed(mx).astype(rdtype))[:, None, None]
        ky = jnp.asarray(k_signed(my).astype(rdtype))[None, :, None]
        post = lambda uhat, mesh: self.postprocess(uhat, fft_mesh=mesh)
        return post, (kx, ky)

    @nn.compact
    def __call__(self, v: Array, out_steps: Optional[int] = None) -> Array:
        if out_steps is None and self.out_steps is not None:
            out_steps = self.out_steps
        if self.impl == "dft":
            _, nx, ny, nt, _ = v.shape
            t_pad = nt if self.temporal_padding else 0
            if out_steps is None:
                out_steps = nt
            post = mesh = None
            if self.postprocess is not None:
                post, mesh = self._compact_helmholtz(v.dtype)
            return self._dft_apply(
                v,
                out_mesh_size=(nx, ny, out_steps + t_pad),
                t_pad=t_pad,
                keep_last=out_steps,
                postprocess=post,
                postprocess_mesh=mesh,
            )
        if self.temporal_padding:
            t_pad = v.shape[-2]
            v = jnp.pad(v, [(0, 0)] * 3 + [(t_pad, 0)] + [(0, 0)])
        else:
            t_pad = 0
        _, nx, ny, ntp, _ = v.shape
        axes = (-4, -3, -2)
        v_hat = jnp.fft.rfftn(v, axes=axes, norm=self.norm)
        v_hat = self.spectral_conv(v_hat, nx, ny, ntp // 2 + 1)
        if self.postprocess is not None:
            v_hat = self.postprocess(v_hat)
        v = jnp.fft.irfftn(
            v_hat, s=(nx, ny, out_steps + t_pad), axes=axes, norm=self.norm
        )
        if self.temporal_padding:
            v = v[..., -out_steps:, :]
        return v


class LiftingOperator(nn.Module):
    """PE → LayerNorm → Dense → SpectralConvT to latent_steps (+FFN residual).

    Counterpart of reference sfno.py:196-260: the channel lifting is global
    spectral (not per-time-step channels), so arbitrary input steps work; the
    residual connection is on the last input frame.
    """

    width: int
    modes_x: int
    modes_y: int
    modes_t: int
    latent_steps: int = 10
    norm: str = "backward"
    activation: str = "GELU"
    beta: float = 0.1
    spatial_random_feats: bool = False
    channel_expansion: int = 4
    nonlinear: bool = True
    mxu_precision: str = "highest"
    impl: str = "dft"
    # activation storage/compute dtype from the channel lifting onward
    # (params and mode-space complex math keep their own dtype) — see
    # SFNO.compute_dtype; None = flax promote-from-inputs (fp32/fp64 follow
    # the input dtype, the historical behavior)
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, v: Array) -> Array:
        """(b, x, y, t_in, 1) -> (b, x, y, latent_steps, width)."""
        assert self.latent_steps <= v.shape[-2], (
            "latent_steps must be <= input time steps"
        )
        pe_modes_t = self.modes_t - 1 if self.modes_t % 2 != 0 else self.modes_t
        v = SpaceTimePositionalEncoding(
            modes_x=self.modes_x // 2,
            modes_y=self.modes_y // 2,
            modes_t=pe_modes_t // 2,
            num_channels=self.width,
            time_exponential_scale=self.beta,
            spatial_random_feats=self.spatial_random_feats,
        )(v)
        v = LayerNormnd()(v)
        cd = None if self.compute_dtype is None else jnp.dtype(self.compute_dtype)
        v = nn.Dense(self.width, dtype=cd)(v)
        sconv = SpectralConvT(
            in_channels=self.width,
            out_channels=self.width,
            modes=(self.modes_x, self.modes_y, self.modes_t),
            out_steps=self.latent_steps,
            norm=self.norm,
            bias=False,
            mxu_precision=self.mxu_precision,
            impl=self.impl,
        )
        w = sconv(v)
        if self.nonlinear:
            w = PointwiseFFN(
                self.width, self.channel_expansion * self.width,
                self.activation, dtype=cd,
            )(w)
            act = get_activation(self.activation)
        else:
            w = nn.Dense(self.width, dtype=cd)(w)
            act = get_activation("Identity")
        # residual on the last input time step (reference sfno.py:258-259)
        return act(v[..., -1:, :] + w)


class OutConv(nn.Module):
    """Latent steps → arbitrary out_steps via temporally padded SpectralConvT.

    Skip connection from the last input frame; optional Helmholtz
    postprocessing for vector (out_dim=2) outputs (reference sfno.py:263-328).
    """

    modes_x: int
    modes_y: int
    modes_t: int
    delta: float = 0.1
    out_dim: int = 1
    diam: float = 1.0
    out_steps: Optional[int] = None
    spatial_padding: int = 0
    temporal_padding: bool = True
    norm: str = "backward"
    mxu_precision: str = "highest"
    impl: str = "dft"

    @nn.compact
    def __call__(self, v: Array, v_res: Array, out_steps: int) -> Array:
        """v: (b,x,y,t_latent,d), v_res: (b,x,y,t_in) → (b,x,y,out_steps[,d])."""
        postprocess = (
            HelmholtzProjection(diam=self.diam) if self.out_dim == 2 else None
        )
        conv = SpectralConvT(
            in_channels=self.out_dim,
            out_channels=self.out_dim,
            modes=(self.modes_x, self.modes_y, self.modes_t),
            norm=self.norm,
            delta=self.delta,
            out_steps=self.out_steps,
            bias=True,
            temporal_padding=self.temporal_padding,
            postprocess=postprocess,
            mxu_precision=self.mxu_precision,
            impl=self.impl,
        )
        d = v.shape[-1]
        v_res = jnp.broadcast_to(v_res[..., None], (*v_res.shape, d))
        v = jnp.concatenate([v_res[..., -1:, :], v], axis=-2)
        sp = self.spatial_padding
        if sp > 0:
            v = jnp.pad(v, [(0, 0), (sp, sp), (sp, sp), (0, 0), (0, 0)])
        v = conv(v, out_steps=out_steps + 1)
        if sp > 0:
            v = v[:, sp:-sp, sp:-sp, :, :]
        v = v_res[..., -1:, :] + v[..., -out_steps:, :]
        return v[..., 0] if d == 1 else v


class SFNO(nn.Module):
    """Spatiotemporal FNO: lifting → (n-1)×[SpectralConvS + FFN + 1×1] → out.

    Counterpart of reference sfno.py:460-620. Key hyperparameters
    (sfno.py:495-536): ``beta`` — PE exponential time scale matched to the
    NSE a-priori energy estimate; ``delta`` — strength of the spectral bias/
    final skip; ``latent_steps`` — hidden temporal resolution (≥ 3/2 input
    length acts as anti-aliasing zero padding).

    __call__: (b, x, y, t_in) -> (b, x, y, out_steps)
    (or (..., 2) for out_dim=2 velocity output, Helmholtz-projected).
    """

    modes_x: int
    modes_y: int
    modes_t: int
    width: int
    out_dim: int = 1
    beta: float = -1e-2
    delta: float = 1e-1
    num_spectral_layers: int = 4
    fft_norm: str = "backward"
    activation: str = "ReLU"
    spatial_padding: int = 0
    temporal_padding: bool = True
    channel_expansion: int = 4
    spatial_random_feats: bool = False
    lift_activation: bool = True
    latent_steps: int = 10
    output_steps: Optional[int] = None
    diam: float = 1.0
    # precision of the spectral-conv MXU matmuls. The round-3 training
    # ladder (RESULTS.md) measured throughput FLAT across the ladder (the
    # step is activation-traffic-bound, not MXU-bound) while lower
    # precisions cost accuracy (bf16 "default": +32% val rel-L2), so the
    # adopted default is "highest" — there is no speed to buy.
    mxu_precision: str = "highest"
    # spectral-conv implementation: "dft" (compact MXU matmuls, the fast
    # path) or "fft" (rfftn/scatter/irfftn, the bit-parity reference path)
    impl: str = "dft"
    # activation storage dtype for the lifting + backbone ("bfloat16" halves
    # the HBM traffic the train step is bound by). Params, optimizer state,
    # the mode-space complex weights/matmuls, and OutConv (the final skip +
    # Helmholtz output head) are untouched; the output keeps the input
    # dtype. None = flax promote-from-inputs (fp32/fp64 follow the input).
    compute_dtype: Optional[str] = None
    # rematerialize the lifting + backbone blocks in the backward pass
    # (flax lifted ``nn.remat``): the train step is activation-HBM-traffic
    # bound (RESULTS.md), so not storing the FFN's 4x-expanded hidden and the
    # spectral-conv intermediates trades cheap recompute for the dominant
    # bytes. Param tree is unchanged (explicit names pin the module scopes),
    # so checkpoints are interchangeable with remat off.
    remat: bool = False

    @nn.compact
    def __call__(self, v: Array, out_steps: Optional[int] = None) -> Array:
        if out_steps is None:
            out_steps = (
                self.output_steps if self.output_steps is not None else v.shape[-1]
            )
        v_res = v
        v = v[..., None]  # (b, x, y, t, 1)

        # lifted remat wrappers rename module scopes (Checkpoint<cls>_N), so
        # every wrapped instance carries an explicit name matching flax's
        # auto-assigned one — param trees are identical with remat on or off
        Lift = nn.remat(LiftingOperator) if self.remat else LiftingOperator
        ConvS = nn.remat(SpectralConvS) if self.remat else SpectralConvS
        FFN = nn.remat(PointwiseFFN) if self.remat else PointwiseFFN

        v = Lift(
            width=self.width,
            modes_x=self.modes_x,
            modes_y=self.modes_y,
            modes_t=self.modes_t,
            latent_steps=self.latent_steps,
            norm=self.fft_norm,
            beta=self.beta,
            activation=self.activation,
            spatial_random_feats=self.spatial_random_feats,
            channel_expansion=self.channel_expansion,
            nonlinear=self.lift_activation,
            mxu_precision=self.mxu_precision,
            impl=self.impl,
            compute_dtype=self.compute_dtype,
            name="LiftingOperator_0",
        )(v)
        self.sow("intermediates", "lifting", v)

        act = get_activation(self.activation)
        cd = None if self.compute_dtype is None else jnp.dtype(self.compute_dtype)
        for i in range(self.num_spectral_layers - 1):
            x1 = ConvS(
                in_channels=self.width,
                out_channels=self.width,
                modes=(self.modes_x, self.modes_y, self.modes_t),
                norm=self.fft_norm,
                mxu_precision=self.mxu_precision,
                impl=self.impl,
                name=f"SpectralConvS_{i}",
            )(v)
            x1 = FFN(
                self.width, self.channel_expansion * self.width,
                self.activation, dtype=cd,
                name=f"PointwiseFFN_{i}",
            )(x1)
            x2 = nn.Dense(self.width, dtype=cd)(v)
            v = act(x1 + x2)
            self.sow("intermediates", f"spectral_{i}", v)

        # channel reduction (reference: width→1); the head and everything
        # after runs in the input dtype regardless of compute_dtype (fp64
        # fine-tune runs stay fp64 end-to-end)
        v = nn.Dense(self.out_dim)(v.astype(v_res.dtype))
        # "r": the reduced latent fed to OutConv — the tap the reference's
        # ``add_latent_hook("r")`` exposes for a-posteriori fine-tuning
        self.sow("intermediates", "r", v)
        v = OutConv(
            modes_x=self.modes_x,
            modes_y=self.modes_y,
            modes_t=self.modes_t,
            out_dim=self.out_dim,
            delta=self.delta,
            out_steps=self.output_steps,
            spatial_padding=self.spatial_padding,
            temporal_padding=self.temporal_padding,
            norm=self.fft_norm,
            diam=self.diam,
            mxu_precision=self.mxu_precision,
            impl=self.impl,
        )(v, v_res, out_steps=out_steps)
        return v
