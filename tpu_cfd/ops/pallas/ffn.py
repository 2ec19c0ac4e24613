"""Fused pointwise-FFN Pallas kernel (dense → activation → dense in VMEM).

The SFNO pointwise FFN (models/base.py PointwiseFFN) expands channels 4×;
this kernel tiles the fused row dimension M = b·x·y·t, keeps both weight
matrices and the expanded intermediate in VMEM, and runs both matmuls
back-to-back on the MXU — one read of x, one write of the output.

Backward is a custom VJP in plain XLA (the backward pass has a different
data-flow shape and XLA handles it well); only the forward is a kernel.

MEASUREMENT (TPU v5e, (8,64,64,10,20) fp32, chained-scan timing): XLA
0.75 ms vs this kernel 3.25 ms — at SFNO's small channel widths the op is
bound by the lane-padding tax of the (…, 20) layout, which a kernel reading
the same HBM layout cannot avoid, while the MXU sits idle either way. The
kernel is therefore NOT wired into PointwiseFFN; it is kept as an opt-in
building block for wide-channel configurations (width ≥ 128), where the
fusion removes a genuine intermediate round trip.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act):
    h = (
        jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    h = act(h)
    o_ref[:] = (
        jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _ffn_forward(x2d: Array, w1, b1, w2, b2, act: Callable, block_m: int) -> Array:
    m, k = x2d.shape
    h = w1.shape[1]
    out_k = w2.shape[1]
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // block_m,)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((m_pad, out_k), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, out_k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((out_k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, out_k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(x2d, w1, b1, w2, b2)
    return out[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_pointwise_ffn(
    x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
    act: Callable = jax.nn.relu, block_m: int = 1024,
) -> Array:
    """act(x @ w1 + b1) @ w2 + b2 with the intermediate kept in VMEM.

    x: (..., K); w1: (K, H); w2: (H, K_out). Any leading dims are flattened
    into the kernel's row dimension.
    """
    shape = x.shape
    out = _ffn_forward(x.reshape(-1, shape[-1]), w1, b1, w2, b2, act, block_m)
    return out.reshape(*shape[:-1], w2.shape[1])


def _ffn_fwd(x, w1, b1, w2, b2, act, block_m):
    return fused_pointwise_ffn(x, w1, b1, w2, b2, act, block_m), (x, w1, b1, w2, b2)


def _ffn_bwd(act, block_m, res, g):
    x, w1, b1, w2, b2 = res
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    pre = x2 @ w1 + b1
    h = act(pre)
    # d act via jvp (exact for any activation)
    _, dact = jax.vjp(act, pre)
    gh = g2 @ w2.T
    (gpre,) = dact(gh)
    gx = (gpre @ w1.T).reshape(shape)
    gw1 = x2.T @ gpre
    gb1 = gpre.sum(0)
    gw2 = h.T @ g2
    gb2 = g2.sum(0)
    return gx, gw1, gb1, gw2, gb2


fused_pointwise_ffn.defvjp(_ffn_fwd, _ffn_bwd)
