"""rfft2/irfft2 as dense DFT matmuls — the MXU path for the spectral solver.

XLA's TPU FFT lowering leaves the MXU idle (BENCH_r02: the RK4-CN solver ran
at 0.12% MFU and scaled INVERSELY with batch). A 256² transform is small
enough that the O(n³) dense-DFT formulation is a win on a systolic array:
each transform becomes two ``(n, n)``-by-``(n, m)`` matmuls that tile
perfectly onto the MXU, batch-parallel over all leading dims, with the
real/half-complex structure exploited so no flops are spent multiplying
explicit zeros.

Matches ``jnp.fft.rfft2`` / ``jnp.fft.irfft2`` semantics on square trailing
axes (norm="backward"). Matrices are host-side numpy constants (CLAUDE.md
invariant: device arrays closed over by jit fail to embed on this backend);
``jnp.asarray`` at trace time folds them into the program.

The optional ``m`` parameter truncates the half-spectrum axis to the first
``m`` columns (default n//2+1, the full rfft width). ``m = n//2`` drops only
the Nyquist column and makes every array lane-aligned on TPU (129 pads to
256 lanes — 2× wasted vector throughput on every elementwise op touching
the spectrum) while keeping the matmul N-dimension an exact tile multiple.
For spectrally-filtered turbulence states the Nyquist column is zero to
fp32 after any warmup (viscous decay exp(-ν k² t) at k = n/2), so the
truncation is exact in practice; the irfft treats missing columns as zeros,
exactly like ``jnp.fft.irfft2`` of a zero-padded spectrum.

``rfft2_block``/``irfft2_block`` go further: they restrict BOTH spectral
axes to the 2/3-rule dealiasing support (``galerkin_block``) — the signed
x-mode rows and the low y columns the brick-wall filter keeps. A dealiased
solver state provably lives on that block, so stepping on it is an exact
Galerkin restriction of the filtered dynamics that cuts ~55% of the
transform FLOPs and ~55% of the spectral elementwise/HBM traffic, and turns
the per-step filter multiply into an identity.

No reference counterpart — the reference's hot loop calls torch.fft
(equations.py:413-438); this module is the TPU-native redesign of that load.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _mats(n: int, m: int, dtype_str: str):
    """Host-side DFT matrices for an n-point axis, m spectrum columns kept.

    Returns dict of float arrays:
      fwd_last_re/im:  (n, m)  real input -> half spectrum (last axis)
      fwd_first_re/im: (n, n)  full DFT along the first (row) axis
      inv_first_re/im: (n, n)  inverse full DFT (rows), 1/n normalized
      inv_last_re/im:  (m, n)  half spectrum -> real output, Hermitian
                               multiplicities folded in, 1/n normalized
    """
    f = np.float64 if dtype_str == "float64" else np.float32
    j = np.arange(n)
    k = np.arange(m)
    ang_last = 2 * np.pi * np.outer(j, k) / n          # (n, m)
    ang_first = 2 * np.pi * np.outer(j, j) / n         # (n, n)
    # Hermitian multiplicities for the inverse last axis: DC (and Nyquist,
    # when kept) count once, interior modes twice (conjugates are implicit)
    w = np.full((m,), 2.0)
    w[0] = 1.0
    if n % 2 == 0 and m == n // 2 + 1:
        w[-1] = 1.0
    return {
        "fwd_last_re": np.cos(ang_last).astype(f),
        "fwd_last_im": (-np.sin(ang_last)).astype(f),
        "fwd_first_re": np.cos(ang_first).astype(f),
        "fwd_first_im": (-np.sin(ang_first)).astype(f),
        "inv_first_re": (np.cos(ang_first) / n).astype(f),
        "inv_first_im": (np.sin(ang_first) / n).astype(f),
        "inv_last_re": ((w[:, None] * np.cos(ang_last.T)) / n).astype(f),
        "inv_last_im": ((-w[:, None] * np.sin(ang_last.T)) / n).astype(f),
    }


def _precision(p):
    if isinstance(p, str):
        return getattr(jax.lax.Precision, p.upper())
    return p


@functools.lru_cache(maxsize=None)
def _mats_rows(n: int, rows: tuple, dtype_str: str):
    """First-axis DFT matrices restricted to a subset of signed modes.

    ``rows`` are full-spectrum row indices (fft ordering) of the kept x
    modes. Returns fwd (len(rows), n) and inv (n, len(rows)) re/im pairs;
    the inverse carries the 1/n normalization.
    """
    f = np.float64 if dtype_str == "float64" else np.float32
    j = np.arange(n)
    k = np.asarray(rows)  # row index == mode number mod n in fft ordering
    ang = 2 * np.pi * np.outer(k, j) / n  # (rows, n)
    return {
        "fwd_re": np.cos(ang).astype(f),
        "fwd_im": (-np.sin(ang)).astype(f),
        "inv_re": (np.cos(ang.T) / n).astype(f),
        "inv_im": (np.sin(ang.T) / n).astype(f),
    }


def galerkin_block(n: int):
    """(rows, m) of the 2/3-rule dealiasing support on an n×n rfft2 spectrum.

    Matches ``ops.spectral.brick_wall_filter_2d`` exactly: signed x modes
    -kmax ≤ kx < kmax with kmax = (2n/3)//2, and the low
    ``int(2/3*(n//2+1))`` y columns — so a state restricted to this block
    renders the per-step brick-wall filter an identity.
    """
    kmax_x = int(2 / 3 * n) // 2
    rows = tuple(range(kmax_x)) + tuple(range(n - kmax_x, n))
    m = int(2 / 3 * (n // 2 + 1))
    return rows, m


def rfft2_block(x: Array, rows: tuple, m: int, precision="highest") -> Array:
    """rfft2 restricted to the (rows, m) mode block (Galerkin truncation).

    x: real ``(..., n, n)`` -> complex ``(..., len(rows), m)`` holding the
    kept signed-x rows (fft ordering compacted) and low y columns. Equal to
    ``rfft2_matmul(x)[..., rows, :m]`` to roundoff, at ~2/3 the matmul cost.
    """
    n = x.shape[-1]
    assert x.shape[-2] == n, "square trailing axes required"
    M = _mats(n, m, str(x.dtype))
    R = _mats_rows(n, rows, str(x.dtype))
    P = _precision(precision)
    dot = functools.partial(jnp.einsum, precision=P)
    yre = dot("...xj,jk->...xk", x, jnp.asarray(M["fwd_last_re"]))
    yim = dot("...xj,jk->...xk", x, jnp.asarray(M["fwd_last_im"]))
    Fre = jnp.asarray(R["fwd_re"])
    Fim = jnp.asarray(R["fwd_im"])
    zre = dot("Xx,...xk->...Xk", Fre, yre) - dot("Xx,...xk->...Xk", Fim, yim)
    zim = dot("Xx,...xk->...Xk", Fre, yim) + dot("Xx,...xk->...Xk", Fim, yre)
    return jax.lax.complex(zre, zim)


def irfft2_block(x: Array, n: int, rows: tuple, precision="highest") -> Array:
    """irfft2 of a (rows, m) mode block back to the full ``(..., n, n)`` grid.

    Modes outside the block are treated as zero — exactly
    ``irfft2_matmul`` of the zero-filled spectrum.
    """
    m = x.shape[-1]
    assert x.shape[-2] == len(rows), "block row count mismatch"
    dtype_str = "float64" if x.dtype == jnp.complex128 else "float32"
    M = _mats(n, m, dtype_str)
    R = _mats_rows(n, rows, dtype_str)
    P = _precision(precision)
    dot = functools.partial(jnp.einsum, precision=P)
    xre, xim = jnp.real(x), jnp.imag(x)
    Gre = jnp.asarray(R["inv_re"])
    Gim = jnp.asarray(R["inv_im"])
    yre = dot("xX,...Xk->...xk", Gre, xre) - dot("xX,...Xk->...xk", Gim, xim)
    yim = dot("xX,...Xk->...xk", Gre, xim) + dot("xX,...Xk->...xk", Gim, xre)
    out = dot("...xk,kj->...xj", yre, jnp.asarray(M["inv_last_re"]))
    out = out + dot("...xk,kj->...xj", yim, jnp.asarray(M["inv_last_im"]))
    return out


def rfft2_matmul(x: Array, precision="highest", m: int | None = None) -> Array:
    """``jnp.fft.rfft2`` over the last two axes via MXU matmuls.

    x: real ``(..., n, n)`` -> complex ``(..., n, m)`` (m defaults to the
    full half-spectrum n//2+1).
    """
    n = x.shape[-1]
    assert x.shape[-2] == n, "square trailing axes required"
    m = n // 2 + 1 if m is None else m
    M = _mats(n, m, str(x.dtype))
    P = _precision(precision)
    dot = functools.partial(jnp.einsum, precision=P)
    # last axis: real -> half complex (2 real matmuls, no zero-imag flops)
    yre = dot("...xj,jk->...xk", x, jnp.asarray(M["fwd_last_re"]))
    yim = dot("...xj,jk->...xk", x, jnp.asarray(M["fwd_last_im"]))
    # first axis: full complex DFT (4 real matmuls)
    Fre = jnp.asarray(M["fwd_first_re"])
    Fim = jnp.asarray(M["fwd_first_im"])
    zre = dot("Xx,...xk->...Xk", Fre, yre) - dot("Xx,...xk->...Xk", Fim, yim)
    zim = dot("Xx,...xk->...Xk", Fre, yim) + dot("Xx,...xk->...Xk", Fim, yre)
    return jax.lax.complex(zre, zim)


def irfft2_matmul(x: Array, precision="highest") -> Array:
    """``jnp.fft.irfft2`` over the last two axes via MXU matmuls.

    x: complex ``(..., n, m)`` with m ≤ n//2+1 -> real ``(..., n, n)``.
    Columns beyond m are treated as zero (spectral zero-padding), matching
    ``jnp.fft.irfft2`` of the zero-filled full half-spectrum.
    """
    n = x.shape[-2]
    m = x.shape[-1]
    assert m <= n // 2 + 1, "spectrum axis wider than the half spectrum"
    dtype_str = "float64" if x.dtype == jnp.complex128 else "float32"
    M = _mats(n, m, dtype_str)
    P = _precision(precision)
    dot = functools.partial(jnp.einsum, precision=P)
    xre, xim = jnp.real(x), jnp.imag(x)
    # first axis: inverse full DFT (4 real matmuls)
    Gre = jnp.asarray(M["inv_first_re"])
    Gim = jnp.asarray(M["inv_first_im"])
    yre = dot("xX,...Xk->...xk", Gre, xre) - dot("xX,...Xk->...xk", Gim, xim)
    yim = dot("xX,...Xk->...xk", Gre, xim) + dot("xX,...Xk->...xk", Gim, xre)
    # last axis: half complex -> real with Hermitian weights (2 real
    # matmuls): x[j] = (1/n) Σ_k w_k (Yre cosθ - Yim sinθ), θ = 2πjk/n —
    # inv_last_im already carries the -sin, so both terms ADD
    out = dot("...xk,kj->...xj", yre, jnp.asarray(M["inv_last_re"]))
    out = out + dot("...xk,kj->...xj", yim, jnp.asarray(M["inv_last_im"]))
    return out
