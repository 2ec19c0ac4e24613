"""Fused Pallas TPU kernels for the compact-DFT spectral convolution.

The XLA lowering of ``SpectralConv._dft_apply`` (models/base.py) is a chain
of ~6 complex einsums; each complex contraction decomposes into 4 real GEMMs
plus transposes, so one spectral conv becomes ~25-30 small HLO ops that each
round-trip HBM (measured 4-8 ms at the fnodata recipe, b=8). The heavy ops
are the four SPATIAL contractions on full-resolution data; the temporal DFT
and per-mode weight contraction touch only the truncated mode tensor
(~100x smaller).

So the fused design is two small Pallas primitives plus an XLA middle:

  ``dft2d_modes``    (b, P, nx, ny) real    -> (b, P, 2my, 2mx) complex
  ``dft2d_inverse``  (b, P, 2my, 2mx) cplx  -> (b, P, nx, ny) real

Each runs the two spatial contractions of one sample-chunk entirely in VMEM
(right-GEMMs with the contracted dim in lanes + one minor-pair transpose),
gridded over (batch, P-chunks). The temporal DFTs and the weight/bias
contraction stay as XLA einsums on the mode tensor. Each primitive's custom
VJP is THE OTHER primitive with conjugate-transposed matrices (the operators
are real-linear adjoints of each other), so the whole conv differentiates
end-to-end with no hand-written weight-gradient math.

Mosaic layout rules shape the kernels (no lane-crossing reshapes): only
leading-dim reshapes, minor-pair ``swapaxes(-1, -2)``, and 2-D dots.

MEASURED GO/NO-GO (TPU v5e-1, chained-scan timing): at the reference model
configurations the fused kernels DO NOT beat the XLA einsum path — fnodata
recipe (b=8, 64², t10, c20, m12/5): XLA 3.8 ms vs Pallas 3.8 ms (tie);
McWilliams recipe (m32, c10): XLA 8.4 ms vs Pallas 19.8 ms (0.42x); and the
Pallas numbers were taken at default MXU precision — fp32-exact passes
(needed to match the einsum path's Precision.HIGHEST, rel err 7e-3
otherwise) would slow them further. Root cause per the split-cost probe:
the conv is dominated by mode-space op overhead (the t/weight einsums on
~24²-sized tensors) and per-grid-step overhead, not by the spatial GEMMs
this kernel fuses; lane padding of the small mode dims (24 -> 128) also
caps usable chunk sizes. Verdict: NOT wired into SpectralConvS — the
einsum DFT path (already 2.2x over the FFT formulation, RESULTS.md) stays
the production path. The kernels remain here as a correct, differentiable,
CPU-testable Pallas implementation (and the ``dft2d_modes``/
``dft2d_inverse`` primitives are reusable where larger P amortizes the
overheads).

Semantics match ``_dft_apply`` with ``t_pad=0, out_mesh == in_mesh`` (the
SpectralConvS configuration, reference sfno.py:331-394); parity and grads
are pinned by tests/test_pallas_conv.py against the einsum path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_cfd.models.base import (
    _dft_fwd_c2c,
    _dft_fwd_low,
    _dft_inv_c2c,
    _dft_inv_low,
)

_f32 = jnp.float32
# fp32-exact MXU passes: matches the einsum path's Precision.HIGHEST
_PREC = jax.lax.Precision.HIGHEST


def _chunk(P: int, target: int = 64) -> int:
    """Largest divisor of P not exceeding ``target`` (VMEM sizing)."""
    for c in range(min(target, P), 0, -1):
        if P % c == 0:
            return c
    return 1


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _modes_kernel(v_ref, FxRT_ref, FxIT_ref, FyRT_ref, FyIT_ref,
                  outR_ref, outI_ref, *, nx, ny, mx2, my2, ch):
    """(1, ch, nx, ny) real -> (1, ch, my2, mx2) complex (as R/I pair)."""
    v = v_ref[0]
    a = v.reshape(ch * nx, ny)
    # y-contraction (lanes ny -> my2)
    hyR = jnp.dot(a, FyRT_ref[...], preferred_element_type=_f32, precision=_PREC)
    hyI = jnp.dot(a, FyIT_ref[...], preferred_element_type=_f32, precision=_PREC)
    hyR = jnp.swapaxes(hyR.reshape(ch, nx, my2), -1, -2)
    hyI = jnp.swapaxes(hyI.reshape(ch, nx, my2), -1, -2)
    # x-contraction (lanes nx -> mx2)
    aR = hyR.reshape(ch * my2, nx)
    aI = hyI.reshape(ch * my2, nx)
    FxRT, FxIT = FxRT_ref[...], FxIT_ref[...]
    gR = (jnp.dot(aR, FxRT, preferred_element_type=_f32, precision=_PREC)
          - jnp.dot(aI, FxIT, preferred_element_type=_f32, precision=_PREC))
    gI = (jnp.dot(aR, FxIT, preferred_element_type=_f32, precision=_PREC)
          + jnp.dot(aI, FxRT, preferred_element_type=_f32, precision=_PREC))
    outR_ref[0] = gR.reshape(ch, my2, mx2)
    outI_ref[0] = gI.reshape(ch, my2, mx2)


def _inverse_kernel(gR_ref, gI_ref, GxRT_ref, GxIT_ref, GyRT_ref, GyIT_ref,
                    out_ref, *, nx, ny, mx2, my2, ch, scale):
    """(1, ch, my2, mx2) complex -> (1, ch, nx, ny) real (Re part)."""
    gR = gR_ref[0].reshape(ch * my2, mx2)
    gI = gI_ref[0].reshape(ch * my2, mx2)
    # inverse x (lanes mx2 -> nx)
    GxRT, GxIT = GxRT_ref[...], GxIT_ref[...]
    xR = (jnp.dot(gR, GxRT, preferred_element_type=_f32, precision=_PREC)
          - jnp.dot(gI, GxIT, preferred_element_type=_f32, precision=_PREC))
    xI = (jnp.dot(gR, GxIT, preferred_element_type=_f32, precision=_PREC)
          + jnp.dot(gI, GxRT, preferred_element_type=_f32, precision=_PREC))
    xR = jnp.swapaxes(xR.reshape(ch, my2, nx), -1, -2).reshape(ch * nx, my2)
    xI = jnp.swapaxes(xI.reshape(ch, my2, nx), -1, -2).reshape(ch * nx, my2)
    # inverse y (lanes my2 -> ny), real output
    out = (jnp.dot(xR, GyRT_ref[...], preferred_element_type=_f32, precision=_PREC)
           - jnp.dot(xI, GyIT_ref[...], preferred_element_type=_f32, precision=_PREC))
    out_ref[0] = (out * scale).reshape(ch, nx, ny)


# ---------------------------------------------------------------------------
# primitives (factory closes over host-side numpy DFT matrices)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def make_dft2d_ops(nx: int, ny: int, mx: int, my: int,
                   interpret: bool = False):
    """Returns (modes, inverse): the truncated 2-D spatial DFT pair.

    modes:   (b, P, nx, ny) float32 -> (b, P, 2my, 2mx) complex64
    inverse: (b, P, 2my, 2mx) complex64, scale -> (b, P, nx, ny) float32

    Both are custom-VJP'd against each other (real-linear adjoints), so they
    compose with arbitrary XLA math in between under jax.grad.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mx2, my2 = 2 * mx, 2 * my
    Fx = _dft_fwd_c2c(nx, mx)     # (mx2, nx)
    Fy = _dft_fwd_c2c(ny, my)     # (my2, ny)
    Gx = _dft_inv_c2c(nx, mx)     # (nx, mx2)
    Gy = _dft_inv_c2c(ny, my)     # (ny, my2)

    def ri_T(m):  # transposed, contiguous, f32 pair (host constants)
        mt_ = np.ascontiguousarray(m.T)
        return (mt_.real.astype(np.float32), mt_.imag.astype(np.float32))

    FxRT, FxIT = ri_T(Fx)         # (nx, mx2)
    FyRT, FyIT = ri_T(Fy)         # (ny, my2)
    GxRT, GxIT = ri_T(Gx)         # (mx2, nx)
    GyRT, GyIT = ri_T(Gy)         # (my2, ny)

    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)

    def _modes_impl(v, fxrt, fxit, fyrt, fyit):
        b, P = v.shape[:2]
        ch = _chunk(P)
        kern = functools.partial(_modes_kernel, nx=nx, ny=ny, mx2=mx2,
                                 my2=my2, ch=ch)
        outR, outI = pl.pallas_call(
            kern,
            grid=(b, P // ch),
            in_specs=[
                pl.BlockSpec((1, ch, nx, ny), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                full(fxrt.shape), full(fxit.shape),
                full(fyrt.shape), full(fyit.shape),
            ],
            out_specs=[
                pl.BlockSpec((1, ch, my2, mx2), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ch, my2, mx2), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, P, my2, mx2), _f32),
                jax.ShapeDtypeStruct((b, P, my2, mx2), _f32),
            ],
            interpret=interpret,
        )(v, fxrt, fxit, fyrt, fyit)
        return jax.lax.complex(outR, outI)

    def _inverse_impl(g, scale, gxrt, gxit, gyrt, gyit):
        b, P = g.shape[:2]
        ch = _chunk(P)
        kern = functools.partial(_inverse_kernel, nx=nx, ny=ny, mx2=mx2,
                                 my2=my2, ch=ch, scale=scale)
        gR = jnp.real(g).astype(_f32)
        gI = jnp.imag(g).astype(_f32)
        return pl.pallas_call(
            kern,
            grid=(b, P // ch),
            in_specs=[
                pl.BlockSpec((1, ch, my2, mx2), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ch, my2, mx2), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                full(gxrt.shape), full(gxit.shape),
                full(gyrt.shape), full(gyit.shape),
            ],
            out_specs=pl.BlockSpec((1, ch, nx, ny),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, P, nx, ny), _f32),
            interpret=interpret,
        )(gR, gI, gxrt, gxit, gyrt, gyit)

    # --- custom VJPs: each primitive's TRANSPOSE is the other's structure.
    # JAX's complex-cotangent convention is the plain (unconjugated)
    # transpose, verified against jax.vjp of the einsum formulation: the
    # "matrix.T"-shaped slot arrays of the partner kernel are then just the
    # untransposed matrices themselves.
    def ri(m):
        m = np.ascontiguousarray(m)
        return (m.real.astype(np.float32), m.imag.astype(np.float32))

    FxR_, FxI_ = ri(Fx)           # (mx2, nx): "Gx^T" slot of inverse
    FyR_, FyI_ = ri(Fy)           # (my2, ny): "Gy^T" slot
    GxR_, GxI_ = ri(Gx)           # (nx, mx2): "Fx^T" slot of modes
    GyR_, GyI_ = ri(Gy)           # (ny, my2): "Fy^T" slot

    @jax.custom_vjp
    def modes(v):
        return _modes_impl(v, FxRT, FxIT, FyRT, FyIT)

    def modes_fwd(v):
        return modes(v), None

    def modes_bwd(_, gbar):
        # transpose of (real -> F modes) = Re(F^T gbar): the inverse
        # structure with Gx' = Fx^T, Gy' = Fy^T and no scaling
        dv = _inverse_impl(gbar, 1.0, FxR_, FxI_, FyR_, FyI_)
        return (dv,)

    modes.defvjp(modes_fwd, modes_bwd)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def inverse(g, scale):
        return _inverse_impl(g, scale, GxRT, GxIT, GyRT, GyIT)

    def inverse_fwd(g, scale):
        return inverse(g, scale), None

    def inverse_bwd(scale, _, xbar):
        # transpose of (modes -> scale * Re(G modes)) embeds the real
        # cotangent and applies scale * G^T: the modes structure with
        # Fx' = Gx^T, Fy' = Gy^T
        gbar = _modes_impl(xbar.astype(_f32) * scale,
                           GxR_, GxI_, GyR_, GyI_)
        return (gbar,)

    inverse.defvjp(inverse_fwd, inverse_bwd)
    return modes, inverse


# ---------------------------------------------------------------------------
# the fused spectral conv: Pallas spatial + XLA temporal/weight middle
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _t_mats(nt: int, mt: int):
    mt = min(mt, nt // 2 + 1)
    Ft = _dft_fwd_low(nt, mt).astype(np.complex64)       # (mt, nt)
    Gt = _dft_inv_low(nt, mt, nt).astype(np.complex64)   # (nt, mt)
    return Ft, Gt, mt


def _scale_for(norm: str, n_mesh: int) -> float:
    # Only "backward" is supported: the unnormalized forward DFT pairs with
    # a 1/n_mesh inverse. Other fft norms would need the factor folded into
    # dft_modes AND a consistently-scaled bias (the bias is added pre-inverse),
    # which no caller exercises — reject rather than return a wrong scale.
    if norm == "backward":
        return 1.0 / n_mesh
    raise NotImplementedError(
        f"fused_spectral_conv_s supports norm='backward' only, got {norm!r}"
    )


def fused_spectral_conv_s(
    v: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array],
    modes: Tuple[int, int, int],
    delta: float = 1.0,
    norm: str = "backward",
    interpret: bool = False,
) -> jax.Array:
    """Fused TPU spectral conv (SpectralConvS semantics, same-mesh output).

    v: (b, nx, ny, nt, ci) float32 (channels-last, the model layout);
    weight: compact complex (2mx, 2my, mt_w, ci, co)
    (``SpectralConv.compact_weight()``); bias: compact complex
    (2mx, 2my, mt_w) or None. Returns (b, nx, ny, nt, co) float32.
    Differentiable end-to-end (the Pallas primitives carry custom VJPs).
    """
    b, nx, ny, nt, ci = v.shape
    mx, my, mt_req = modes
    Ft, Gt, mt = _t_mats(nt, mt_req)
    dft_modes, dft_inverse = make_dft2d_ops(nx, ny, mx, my, interpret)
    scale = _scale_for(norm, nx * ny * nt)

    # spatial transform on (b, nt*ci, nx, ny)
    vk = jnp.transpose(v, (0, 3, 4, 1, 2)).reshape(b, nt * ci, nx, ny)
    g = dft_modes(vk).reshape(b, nt, ci, 2 * my, 2 * mx)

    # temporal DFT + weight/bias contraction + inverse temporal (XLA; the
    # mode tensor is ~(nx*ny)/(4*mx*my) times smaller than the field)
    Ftc = jnp.asarray(Ft)
    Gtc = jnp.asarray(Gt)
    g = jnp.einsum("btiyx,Tt->bTiyx", g, Ftc)
    # weight: (2mx, 2my, mt_w, ci, co) -> (mt, ci, co, 2my, 2mx)
    w = jnp.transpose(weight[:, :, :mt], (2, 3, 4, 1, 0))
    o = jnp.einsum("bTiyx,Tioyx->bToyx", g, w)
    if bias is not None:
        bc = jnp.transpose(bias[:, :, :mt], (2, 1, 0))    # (mt, 2my, 2mx)
        o = o + delta * bc[None, :, None]
    o = jnp.einsum("bToyx,tT->btoyx", o, Gtc)

    out = dft_inverse(o.reshape(b, nt * weight.shape[-1], 2 * my, 2 * mx),
                      scale)
    co = weight.shape[-1]
    return jnp.transpose(out.reshape(b, nt, co, nx, ny), (0, 3, 4, 1, 2))


# differentiable by construction; kept as an alias so call sites that want
# to be explicit about gradient support read naturally
fused_spectral_conv_s_vjp = fused_spectral_conv_s
