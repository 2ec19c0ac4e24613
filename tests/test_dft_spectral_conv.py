"""DFT-matmul spectral conv must match the FFT reference path exactly.

The "dft" implementation replaces rfftn → corner scatter → irfftn with
compact MXU matmuls over only the kept modes (models/base.py:_dft_apply).
These tests pin its numerics to the "fft" implementation for every feature:
bias, temporal padding, out_steps resampling, Helmholtz postprocess, norms.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_cfd.models.sfno import (
    SFNO,
    HelmholtzProjection,
    SpectralConvS,
    SpectralConvT,
)

KEY = jax.random.PRNGKey(0)


def both_impls(module):
    return module, dataclasses.replace(module, impl="fft")


class TestSpectralConvSParity:
    @pytest.mark.parametrize("norm", ["backward", "ortho"])
    @pytest.mark.parametrize("shape", [(2, 16, 16, 8, 6), (1, 24, 16, 7, 4)])
    def test_matches_fft(self, norm, shape):
        modes = (4, 4, 3)
        conv_dft = SpectralConvS(
            in_channels=shape[-1], out_channels=5, modes=modes, norm=norm
        )
        conv_fft = dataclasses.replace(conv_dft, impl="fft")
        v = jax.random.normal(KEY, shape, dtype=jnp.float64)
        params = conv_fft.init(KEY, v)
        out_fft = conv_fft.apply(params, v)
        out_dft = conv_dft.apply(params, v)
        np.testing.assert_allclose(out_dft, out_fft, atol=1e-10)

    def test_bias_and_delta(self):
        conv_dft = SpectralConvS(
            in_channels=4, out_channels=4, modes=(3, 3, 2), bias=True, delta=0.3
        )
        conv_fft = dataclasses.replace(conv_dft, impl="fft")
        v = jax.random.normal(KEY, (2, 12, 12, 6, 4), dtype=jnp.float64)
        params = conv_fft.init(KEY, v)
        np.testing.assert_allclose(
            conv_dft.apply(params, v), conv_fft.apply(params, v), atol=1e-10
        )

    def test_modes_exceeding_kt(self):
        """modes_t > available half-spectrum: the fft path (like the torch
        reference) errors on the einsum shape; the dft path clamps cleanly."""
        conv_dft = SpectralConvS(in_channels=3, out_channels=3, modes=(3, 3, 6))
        v = jax.random.normal(KEY, (1, 12, 12, 6, 3), dtype=jnp.float64)
        params = conv_dft.init(KEY, v)
        out = conv_dft.apply(params, v)
        assert out.shape == v.shape[:-1] + (3,)
        assert bool(jnp.isfinite(out).all())


class TestSpectralConvTParity:
    @pytest.mark.parametrize("out_steps", [4, 9, 16])
    @pytest.mark.parametrize("temporal_padding", [True, False])
    def test_resampling(self, out_steps, temporal_padding):
        conv_dft = SpectralConvT(
            in_channels=4, out_channels=4, modes=(4, 4, 3), bias=True,
            temporal_padding=temporal_padding,
        )
        conv_fft = dataclasses.replace(conv_dft, impl="fft")
        v = jax.random.normal(KEY, (2, 16, 16, 8, 4), dtype=jnp.float64)
        params = conv_fft.init(KEY, v, out_steps=out_steps)
        np.testing.assert_allclose(
            conv_dft.apply(params, v, out_steps=out_steps),
            conv_fft.apply(params, v, out_steps=out_steps),
            atol=1e-10,
        )

    def test_helmholtz_postprocess(self):
        post = HelmholtzProjection(diam=2 * jnp.pi)
        conv_dft = SpectralConvT(
            in_channels=2, out_channels=2, modes=(4, 4, 3), bias=True,
            temporal_padding=True, postprocess=post,
        )
        conv_fft = dataclasses.replace(conv_dft, impl="fft")
        v = jax.random.normal(KEY, (1, 16, 16, 6, 2), dtype=jnp.float64)
        params = conv_fft.init(KEY, v, out_steps=6)
        np.testing.assert_allclose(
            conv_dft.apply(params, v, out_steps=6),
            conv_fft.apply(params, v, out_steps=6),
            atol=1e-10,
        )


class TestSFNOEndToEndParity:
    @pytest.mark.parametrize("out_dim", [1, 2])
    def test_full_model_matches(self, out_dim):
        """Same params through SFNO(impl="dft") and SFNO(impl="fft") agree."""
        kwargs = dict(
            modes_x=4, modes_y=4, modes_t=2, width=8,
            latent_steps=6, num_spectral_layers=2, out_dim=out_dim,
            mxu_precision="highest",
        )
        v = jax.random.normal(KEY, (2, 16, 16, 8), dtype=jnp.float64)
        model_dft = SFNO(**kwargs, impl="dft")
        model_fft = SFNO(**kwargs, impl="fft")
        params = model_fft.init(KEY, v)
        out_fft = model_fft.apply(params, v)
        out_dft = model_dft.apply(params, v)
        np.testing.assert_allclose(out_dft, out_fft, atol=1e-9)

    @pytest.mark.slow
    def test_gradients_match(self):
        """The two paths also agree through the backward pass."""
        kwargs = dict(
            modes_x=4, modes_y=4, modes_t=2, width=8,
            latent_steps=6, num_spectral_layers=2, mxu_precision="highest",
        )
        v = jax.random.normal(KEY, (2, 16, 16, 8), dtype=jnp.float64)
        model_dft = SFNO(**kwargs, impl="dft")
        model_fft = SFNO(**kwargs, impl="fft")
        params = model_fft.init(KEY, v)
        g_fft = jax.grad(lambda p: (model_fft.apply(p, v) ** 2).mean())(params)
        g_dft = jax.grad(lambda p: (model_dft.apply(p, v) ** 2).mean())(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_dft), jax.tree_util.tree_leaves(g_fft)
        ):
            np.testing.assert_allclose(a, b, atol=1e-9)
