"""Gaussian random fields with covariance (-Δ + τ²)^(-α).

TPU-native counterpart of the reference's ``fno/data_gen/grf.py`` (GRF2d:
grf.py:13-125; sqrt_eig precompute :71-77; per-sample seeding :88-89;
2048²-reference "replicable init" smoothing :91-101). The sampler is a pure
function of a ``jax.random`` key: per-sample determinism and resumability
come from ``fold_in(key, sample_index)`` instead of the reference's
``seed + idx`` formula.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass
class GRF2d:
    """2-D mean-zero GRF sampler on [0,1]² (periodic spectral construction).

    alpha controls smoothness (needs alpha > d/2 = 1); tau damps/boosts high
    frequencies. ``sqrt_eig`` is the square-root of the covariance spectrum,
    computed once per grid size and constant-folded under jit.
    """

    dim: int = 2
    n: int = 128
    alpha: float = 2.0
    tau: float = 3.0
    normalize: bool = False
    smoothing: bool = False
    max_mesh_size: int = 2048
    dtype: object = jnp.float32

    def sqrt_eig(self, n: Optional[int] = None) -> Array:
        n = self.n if n is None else n
        sigma = self.tau ** (0.5 * (2 * self.alpha - self.dim))
        h = 1.0 / n
        k = jnp.fft.fftfreq(n, d=h).astype(self.dtype)  # = fftfreq(n)*n
        kx, ky = jnp.meshgrid(k, k, indexing="ij")
        sqrt_eig = (
            (n**self.dim)
            * math.sqrt(2.0)
            * sigma
            * ((4 * (jnp.pi**2) * (kx**2 + ky**2) + self.tau**2) ** (-self.alpha / 2.0))
        )
        return sqrt_eig.at[0, 0].set(0.0)

    def sample(
        self,
        key: jax.Array,
        bsz: int = 1,
        n: Optional[int] = None,
    ) -> Array:
        """Samples ``(bsz, n, n)`` fields.

        With ``smoothing=True`` the white noise is drawn at
        ``max_mesh_size²`` and bilinearly resized to n² so different target
        resolutions share the same underlying realization (the reference's
        replicable-init path, grf.py:91-101).
        """
        n = self.n if n is None else n
        if self.smoothing:
            n0 = self.max_mesh_size
            coeff = jax.random.normal(key, (bsz, 2, n0, n0), dtype=self.dtype)
            coeff = jax.image.resize(coeff, (bsz, 2, n, n), method="bilinear")
        else:
            coeff = jax.random.normal(key, (bsz, 2, n, n), dtype=self.dtype)
        coeff = coeff[:, 0] + 1j * coeff[:, 1]
        coeff = self.sqrt_eig(n) * coeff
        s = jnp.fft.ifftn(coeff, axes=(-2, -1)).real
        if self.normalize:
            s = s / jnp.linalg.norm(s / n, axis=(-2, -1), keepdims=True)
        return s

    def __call__(self, key: jax.Array, bsz: int = 1, n: Optional[int] = None):
        return self.sample(key, bsz, n)
