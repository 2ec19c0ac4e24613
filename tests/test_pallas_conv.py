"""Parity of the fused Pallas spectral conv against the einsum DFT path.

The Pallas kernel (models/pallas_conv.py) runs in interpreter mode on CPU,
so these tests pin numerics without TPU hardware; the TPU go/no-go timing
lives in RESULTS.md.
"""

import jax
import jax.numpy as jnp
import pytest

from tpu_cfd.models.pallas_conv import fused_spectral_conv_s
from tpu_cfd.models.sfno import SpectralConvS

KEY = jax.random.PRNGKey(0)


def _mk(b=2, n=16, nt=6, ci=4, co=5, m=4, mt=3, bias=True):
    conv = SpectralConvS(
        in_channels=ci, out_channels=co, modes=(m, m, mt), bias=bias,
        impl="dft",
    )
    v = jax.random.normal(KEY, (b, n, n, nt, ci), jnp.float32)
    params = conv.init(KEY, v)
    return conv, params, v


def _compact(conv, params, bias):
    w = conv.apply(params, method=lambda m_: m_.compact_weight())
    bc = conv.apply(params, method=lambda m_: m_.compact_bias()) if bias else None
    return w, bc


@pytest.mark.parametrize("bias", [True, False])
def test_fused_matches_dft_path(bias):
    conv, params, v = _mk(bias=bias)
    ref = conv.apply(params, v)
    w, bc = _compact(conv, params, bias)
    out = fused_spectral_conv_s(
        v, w, bc, conv.modes, delta=conv.delta, interpret=True
    )
    assert out.shape == ref.shape
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(out - ref).max()) / scale < 1e-5


def test_fused_unequal_channels_and_clipped_mt():
    # mt beyond the half-spectrum must clip exactly like the einsum path
    conv, params, v = _mk(ci=3, co=7, nt=4, mt=5)
    ref = conv.apply(params, v)
    w, bc = _compact(conv, params, True)
    out = fused_spectral_conv_s(
        v, w, bc, conv.modes, delta=conv.delta, interpret=True
    )
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(out - ref).max()) / scale < 1e-5


def test_fused_grads_match():
    """grads wrt v AND the real-pair params == the einsum path's grads.

    Differentiates through ``compact_weight()`` exactly as a model using the
    fused conv would, so the complex-cotangent convention is exercised the
    same way in both paths.
    """
    conv, params, v = _mk(bias=True)

    def loss_einsum(v_, params_):
        return (conv.apply(params_, v_) ** 2).sum()

    def loss_pallas(v_, params_):
        w = conv.apply(params_, method=lambda m_: m_.compact_weight())
        bc = conv.apply(params_, method=lambda m_: m_.compact_bias())
        out = fused_spectral_conv_s(
            v_, w, bc, conv.modes, delta=conv.delta, interpret=True
        )
        return (out ** 2).sum()

    g_v_ref, g_p_ref = jax.grad(loss_einsum, argnums=(0, 1))(v, params)
    g_v, g_p = jax.grad(loss_pallas, argnums=(0, 1))(v, params)

    assert float(jnp.abs(g_v - g_v_ref).max()) / (
        float(jnp.abs(g_v_ref).max()) + 1e-30) < 1e-4

    flat_ref = jax.tree_util.tree_leaves_with_path(g_p_ref)
    flat = dict(jax.tree_util.tree_leaves_with_path(g_p))
    for path, leaf_ref in flat_ref:
        leaf = flat[path]
        scale = float(jnp.abs(leaf_ref).max()) + 1e-30
        err = float(jnp.abs(leaf - leaf_ref).max()) / scale
        assert err < 1e-4, (path, err)
