"""Fast diagonalization of separable linear operators (A⊗I + I⊗B + ...).

TPU-native counterpart of the reference's ``torch_cfd/fast_diagonalization.py``
(outer_sum: :29, transform: :43, hermitian matmul path: :146, circulant
fft/rfft paths: :186,212, pseudoinverse: :245). Computes matrix functions
F(A ⊗ I + I ⊗ B) = (X_A ⊗ X_B) F(Λ_A ⊕ Λ_B) (X_Aᵀ ⊗ X_Bᵀ) via
eigendecomposition (Lynch, Rice & Thomas 1964).

TPU notes:
  - the ``matmul`` implementation maps the per-axis eigenvector rotations onto
    the MXU via ``tensordot`` with HIGHEST precision — this is the path the
    original jax-cfd recommended on TPU;
  - the ``fft``/``rfft`` paths are one XLA FFT + pointwise multiply and win at
    large grid sizes;
  - eigendecompositions happen once at setup on host-sized matrices and are
    closed over by the returned jitted-ready apply function.

Functions accept an rhs whose *trailing* ``ndim`` axes match the operator
shape, so a leading batch dimension (or ``vmap``) works unchanged.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def outer_sum(x: Sequence[Array]) -> Array:
    """Outer sum of 1-D arrays: out[i,j,k] = a[i] + b[j] + c[k]."""

    def _sum(a, b):
        return a[..., None] + b

    return functools.reduce(_sum, x)


def _narrow_diagonals(diagonals, dtype) -> np.ndarray:
    """Narrows setup-time eigenvalue diagonals to the working precision.

    Hermitian (symmetric circulant) operators have real eigenvalues, so the
    ~0 imaginary part from the numpy fft is dropped — real constants also
    embed into TPU programs where complex constants are not supported.
    """
    diagonals = np.asarray(diagonals)
    if np.iscomplexobj(diagonals):
        scale = max(float(np.abs(diagonals).max()), 1e-30)
        if float(np.abs(diagonals.imag).max()) <= 1e-10 * scale:
            diagonals = diagonals.real
    if np.iscomplexobj(diagonals):
        return diagonals.astype(np.result_type(dtype, np.complex64))
    return diagonals.astype(np.finfo(dtype).dtype)


def transform(
    func: Callable[[Array], Array],
    operators: Sequence[Array],
    dtype,
    *,
    hermitian: bool = False,
    circulant: bool = False,
    implementation: Optional[str] = None,
) -> Callable[[Array], Array]:
    """Returns a function applying F(⊕ᵢ opᵢ) to an rhs.

    Args:
      func: applied to the N-D array of summed eigenvalues.
      operators: square matrices, one per grid axis.
      dtype: dtype of the right-hand side.
      hermitian: all operators are Hermitian (required for 'matmul').
      circulant: all operators are circulant (required for 'fft'/'rfft').
      implementation: 'matmul' | 'fft' | 'rfft'. Default 'rfft' (falls back to
        'matmul' for odd last axis, mirroring reference :126-128).
    """
    if any(op.ndim != 2 or op.shape[0] != op.shape[1] for op in operators):
        raise ValueError(
            "operators are not all square matrices. Shapes are "
            + ", ".join(str(op.shape) for op in operators)
        )

    if implementation is None:
        implementation = "rfft"
    if implementation == "rfft" and operators[-1].shape[0] % 2:
        implementation = "matmul"

    if implementation == "matmul":
        if not hermitian:
            raise ValueError(
                'non-hermitian operators not yet supported with implementation="matmul"'
            )
        return _hermitian_matmul_transform(func, operators, dtype)
    elif implementation == "fft":
        if not circulant:
            raise ValueError(
                'non-circulant operators not yet supported with implementation="fft"'
            )
        return _circulant_fft_transform(func, operators, dtype)
    elif implementation == "rfft":
        if not circulant:
            raise ValueError(
                'non-circulant operators not yet supported with implementation="rfft"'
            )
        return _circulant_rfft_transform(func, operators, dtype)
    else:
        raise ValueError(f"invalid implementation: {implementation}")


def _hermitian_matmul_transform(
    func: Callable[[Array], Array],
    operators: Sequence[Array],
    dtype,
) -> Callable[[Array], Array]:
    """Fast diagonalization by per-axis eigenvector matmuls (MXU path)."""
    # Setup runs host-side in numpy: these are small matrices whose
    # eigendecomposition happens once, and host constants embed directly into
    # the jitted apply (a device array closed over by jit would need a
    # device->host copy at lowering time).
    eigenvalues, eigenvectors = zip(
        *(np.linalg.eigh(np.asarray(op)) for op in operators)
    )
    summed_eigenvalues = outer_sum(eigenvalues)
    diagonals = np.asarray(func(summed_eigenvalues), dtype)
    eigenvectors = [np.asarray(vec, dtype) for vec in eigenvectors]

    shape = summed_eigenvalues.shape
    if diagonals.shape != shape:
        raise ValueError(
            "output shape from func() does not match input shape: "
            f"{diagonals.shape} vs {shape}"
        )
    ndim = len(operators)

    def _contract(x: Array, mat: Array, axis: int, back: bool) -> Array:
        # contract x's (negative) `axis` with mat's rows (forward: Vᵀx) or
        # columns (back: Vx); tensordot appends the result axis, move it home.
        x = jnp.tensordot(
            x,
            mat,
            axes=((axis,), (1 if back else 0,)),
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(x, -1, axis)

    def apply(rhs: Array) -> Array:
        if rhs.shape[-ndim:] != shape:
            raise ValueError(
                f"rhs.shape={rhs.shape} does not end with operator shape={shape}"
            )
        # Rotate into the eigenbasis, scale, rotate back. The contractions run
        # on the MXU; HIGHEST precision is required for reference tolerances
        # in fp32. Trailing-axis contraction keeps leading batch dims free.
        out = rhs
        for i, vectors in enumerate(eigenvectors):
            out = _contract(out, vectors, i - ndim, back=False)
        out = out * diagonals
        for i, vectors in enumerate(eigenvectors):
            out = _contract(out, vectors, i - ndim, back=True)
        return out.astype(dtype)

    return apply


def _circulant_fft_transform(
    func: Callable[[Array], Array],
    operators: Sequence[Array],
    dtype,
) -> Callable[[Array], Array]:
    """Fast diagonalization by N-D FFT (circulant operators)."""
    eigenvalues = [np.fft.fft(np.asarray(op)[:, 0]) for op in operators]
    summed_eigenvalues = outer_sum(eigenvalues)
    diagonals = _narrow_diagonals(func(summed_eigenvalues), dtype)

    shape = tuple(op.shape[0] for op in operators)
    if diagonals.shape != shape:
        raise ValueError(
            "output shape from func() does not match input shape: "
            f"{diagonals.shape} vs {shape}"
        )
    ndim = len(operators)
    axes = tuple(range(-ndim, 0))

    def apply(rhs: Array) -> Array:
        if rhs.shape[-ndim:] != shape:
            raise ValueError(
                f"rhs.shape={rhs.shape} does not end with operator shape={shape}"
            )
        out = jnp.fft.ifftn(diagonals * jnp.fft.fftn(rhs, axes=axes), axes=axes)
        return out.real.astype(dtype) if not jnp.iscomplexobj(rhs) else out.astype(dtype)

    return apply


def _circulant_rfft_transform(
    func: Callable[[Array], Array],
    operators: Sequence[Array],
    dtype,
) -> Callable[[Array], Array]:
    """Fast diagonalization by N-D real FFT (even last axis required)."""
    if operators[-1].shape[0] % 2:
        raise ValueError(
            'implementation="rfft" currently requires an even size for the last axis'
        )
    eigenvalues = [np.fft.fft(np.asarray(op)[:, 0]) for op in operators[:-1]] + [
        np.fft.rfft(np.asarray(operators[-1])[:, 0])
    ]
    summed_eigenvalues = outer_sum(eigenvalues)
    diagonals = _narrow_diagonals(func(summed_eigenvalues), dtype)
    if diagonals.shape != summed_eigenvalues.shape:
        raise ValueError(
            "output shape from func() does not match input shape: "
            f"{diagonals.shape} vs {summed_eigenvalues.shape}"
        )
    ndim = len(operators)
    axes = tuple(range(-ndim, 0))
    last_size = operators[-1].shape[0]

    def apply(rhs: Array) -> Array:
        out = jnp.fft.irfftn(
            diagonals * jnp.fft.rfftn(rhs, axes=axes), axes=axes,
            s=tuple(op.shape[0] for op in operators),
        )
        return out.astype(dtype)

    return apply


def pseudoinverse_transform(
    operators: Sequence[Array],
    dtype,
    *,
    hermitian: bool = False,
    circulant: bool = False,
    implementation: Optional[str] = None,
    cutoff: Optional[float] = None,
) -> Callable[[Array], Array]:
    """Returns an apply function for the pseudoinverse of ⊕ᵢ opᵢ.

    Eigenvalues with |λ| < cutoff are zeroed instead of inverted (handles the
    Poisson null space). Setup (eigendecomposition) happens once here; the
    returned closure is pure and jit-safe.
    """
    if cutoff is None:
        cutoff = 10 * jnp.finfo(dtype).eps

    def func(eigs):
        # numpy on purpose: runs once at setup on host constants
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(np.abs(eigs) > cutoff, 1 / eigs, 0)

    return transform(
        func,
        operators,
        dtype,
        hermitian=hermitian,
        circulant=circulant,
        implementation=implementation,
    )


def pseudoinverse(
    v: Array,
    operators: Sequence[Array],
    dtype,
    *,
    hermitian: bool = False,
    circulant: bool = False,
    implementation: Optional[str] = None,
    cutoff: Optional[float] = None,
) -> Array:
    """Applies the pseudoinverse of ⊕ᵢ opᵢ to ``v``.

    Eigenvalues with |λ| < cutoff are zeroed instead of inverted (handles the
    Poisson null space). Reference fast_diagonalization.py:245-289.
    """
    if cutoff is None:
        cutoff = 10 * jnp.finfo(dtype).eps

    def func(eigs):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(np.abs(eigs) > cutoff, 1 / eigs, 0)

    t = transform(
        func,
        operators,
        dtype,
        hermitian=hermitian,
        circulant=circulant,
        implementation=implementation,
    )
    return t(v)
