"""Correctness tests for Pallas kernels (interpret mode on the CPU mesh)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl

from tpu_cfd.ops.pallas import ffn as pffn


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    # run the kernel through the Pallas interpreter on CPU
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    yield


class TestFusedFFN:
    def test_matches_xla(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 8, 8, 4, 16), dtype=jnp.float32)
        w1 = jax.random.normal(key, (16, 64), dtype=jnp.float32) * 0.1
        b1 = jnp.ones((64,)) * 0.1
        w2 = jax.random.normal(key, (64, 16), dtype=jnp.float32) * 0.1
        b2 = jnp.zeros((16,))
        ref = jnp.maximum(x @ w1 + b1, 0) @ w2 + b2
        out = pffn.fused_pointwise_ffn(x, w1, b1, w2, b2, block_m=256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_non_divisible_rows(self):
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (3, 7, 16), dtype=jnp.float32)  # M=21
        w1 = jax.random.normal(key, (16, 32)) * 0.1
        w2 = jax.random.normal(key, (32, 16)) * 0.1
        ref = jnp.maximum(x @ w1, 0) @ w2
        out = pffn.fused_pointwise_ffn(
            x, w1, jnp.zeros((32,)), w2, jnp.zeros((16,)), block_m=8
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grad_matches_xla(self):
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (4, 8, 16), dtype=jnp.float32)
        w1 = jax.random.normal(key, (16, 32)) * 0.1
        b1 = jnp.zeros((32,))
        w2 = jax.random.normal(key, (32, 16)) * 0.1
        b2 = jnp.zeros((16,))

        def loss_ref(w1, x):
            return ((jnp.maximum(x @ w1 + b1, 0) @ w2 + b2) ** 2).sum()

        def loss_pallas(w1, x):
            return (pffn.fused_pointwise_ffn(x, w1, b1, w2, b2, block_m=32) ** 2).sum()

        g_ref = jax.grad(loss_ref)(w1, x)
        g_pls = jax.grad(loss_pallas)(w1, x)
        np.testing.assert_allclose(np.asarray(g_pls), np.asarray(g_ref), rtol=1e-4, atol=1e-4)
        gx_ref = jax.grad(loss_ref, argnums=1)(w1, x)
        gx_pls = jax.grad(loss_pallas, argnums=1)(w1, x)
        np.testing.assert_allclose(np.asarray(gx_pls), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
