"""2-D Fourier calculus helpers for the pseudo-spectral solver and SFNO.

TPU-native counterpart of the reference's ``torch_cfd/spectral.py``
(fft_mesh_2d: :29, spectral_laplacian_2d: :41, spectral curl/div/grad/rot:
:49-75, brick_wall_filter_2d: :78, vorticity_to_velocity: :87). Frequencies
are *ordinal* (cycles per unit length, ``jnp.fft.fftfreq``); multiply by 2π
for angular wavenumbers — derivative factors are therefore ``2j*pi*k``.

All helpers are pure jnp, so frequency meshes computed from a static ``Grid``
constant-fold under ``jit`` and the pointwise factors fuse with the
surrounding FFTs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_cfd import grids

Array = jax.Array
Grid = grids.Grid


def fft_mesh_2d(n: int, diam: float, dtype=jnp.float32) -> Tuple[Array, Array]:
    """Full-spectrum ordinal frequency meshes for an n×n grid of extent diam."""
    k = jnp.fft.fftfreq(n, d=diam / n).astype(dtype)
    kx, ky = jnp.meshgrid(k, k, indexing="ij")
    return kx, ky


def rfft_mesh_2d(n: int, diam: float, dtype=jnp.float32) -> Tuple[Array, Array]:
    """Half-spectrum (rfft2) ordinal frequency meshes."""
    kx, ky = fft_mesh_2d(n, diam, dtype)
    k_max = n // 2
    return kx[..., : k_max + 1], ky[..., : k_max + 1]


def fft_expand_dims(
    fft_mesh: Tuple[Array, Array], batch_size: int
) -> Tuple[Array, Array]:
    """Expands (x, y) meshes to (b, x, y, 1) for broadcasting over batches."""
    kx, ky = fft_mesh
    expand = lambda z: jnp.broadcast_to(
        z[None, :, :, None], (batch_size, *z.shape, 1)
    )
    return expand(kx), expand(ky)


def spectral_laplacian_2d(fft_mesh: Tuple[Array, Array]) -> Array:
    """Fourier symbol of the Laplacian: -4π²(kx²+ky²), with lap[0,0]=1.

    The zero-mode is set to 1 so the inverse Laplacian (stream-function solve)
    never divides by zero; the zero mode of vorticity is zero for mean-free
    fields (reference spectral.py:41-46).
    """
    kx, ky = fft_mesh
    lap = -4 * (jnp.pi**2) * (jnp.abs(kx) ** 2 + jnp.abs(ky) ** 2)
    lap = lap.at[..., 0, 0].set(1.0)
    return lap


def spectral_curl_2d(
    vhat: Tuple[Array, Array], rfft_mesh: Tuple[Array, Array]
) -> Array:
    """2-D curl in the Fourier basis: 2πi (kx v̂ - ky û)."""
    uhat, vhat_ = vhat
    kx, ky = rfft_mesh
    return 2j * jnp.pi * (vhat_ * kx - uhat * ky)


def spectral_div_2d(
    vhat: Tuple[Array, Array], rfft_mesh: Tuple[Array, Array]
) -> Array:
    """2-D divergence in the Fourier basis: 2πi (kx û + ky v̂)."""
    uhat, vhat_ = vhat
    kx, ky = rfft_mesh
    return 2j * jnp.pi * (uhat * kx + vhat_ * ky)


def spectral_grad_2d(
    vhat: Array, rfft_mesh: Tuple[Array, Array]
) -> Tuple[Array, Array]:
    """Fourier-domain gradient (∂x, ∂y)."""
    kx, ky = rfft_mesh
    return 2j * jnp.pi * kx * vhat, 2j * jnp.pi * ky * vhat


def spectral_rot_2d(
    vhat: Array, rfft_mesh: Tuple[Array, Array]
) -> Tuple[Array, Array]:
    """Perpendicular gradient (∂y, -∂x): velocity from a stream function."""
    vgradx, vgrady = spectral_grad_2d(vhat, rfft_mesh)
    return vgrady, -vgradx


def brick_wall_filter_2d(grid: Grid, dtype=jnp.float32) -> Array:
    """2/3-rule dealiasing mask on the rfft2 spectrum (reference spectral.py:78)."""
    n, _ = grid.shape
    filter_ = jnp.zeros((n, n // 2 + 1), dtype=dtype)
    nx_keep = int(2 / 3 * n) // 2
    ny_keep = int(2 / 3 * (n // 2 + 1))
    filter_ = filter_.at[:nx_keep, :ny_keep].set(1)
    filter_ = filter_.at[-nx_keep:, :ny_keep].set(1)
    return filter_


def vorticity_to_velocity(
    grid: Grid,
    w_hat: Array,
    rfft_mesh: Optional[Tuple[Array, Array]] = None,
) -> Tuple[Tuple[Array, Array], Array]:
    """Solves the stream function ψ̂ = -ŵ/Δ̂ and returns (û, v̂), ψ̂.

    Reference spectral.py:87-118 (Yin, Clercx & Montgomery 2004 approach).
    """
    if rfft_mesh is not None:
        kx, ky = rfft_mesh
    else:
        kx, ky = grid.rfft_mesh(dtype=jnp.real(w_hat).dtype)
    assert kx.shape[-2:] == w_hat.shape[-2:]
    laplace = spectral_laplacian_2d((kx, ky))
    psi_hat = -1 / laplace * w_hat
    u_hat, v_hat = spectral_rot_2d(psi_hat, (kx, ky))
    return (u_hat, v_hat), psi_hat
