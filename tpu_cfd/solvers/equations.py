"""Pseudo-spectral Navier-Stokes equations and IMEX time steppers.

TPU-native counterpart of the reference's ``torch_cfd/equations.py``
(ImplicitExplicitODE: equations.py:67, stable_time_step: :35, IMEXStepper:
:110, RK4CrankNicolsonStepper: :249, NavierStokes2DSpectral: :361). The
reference's ``nn.Module``s with registered buffers become plain dataclasses
whose precomputed spectral operators (rfft meshes, Laplacian symbol, 2/3-rule
mask, linear term) are ordinary arrays computed once at construction and
closed over by the jitted step — XLA constant-folds and fuses them with the
surrounding FFTs.

Everything operates on the rfft2 half-spectrum of vorticity with arbitrary
leading batch dims, so ``vmap``/``pjit`` batch sharding applies directly, and
``forward(..., steps=n)`` lowers to one fused ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_cfd import grids
from tpu_cfd.ops.spectral import (
    brick_wall_filter_2d,
    spectral_curl_2d,
    vorticity_to_velocity,
)

Array = jax.Array
Grid = grids.Grid


def stable_time_step(
    dx: Optional[float] = None,
    dt: Optional[float] = None,
    max_velocity: float = 1.0,
    max_courant_number: float = 0.5,
    viscosity: float = 1e-3,
    implicit_diffusion: bool = True,
    ndim: int = 2,
) -> float:
    """CFL + (explicit) diffusion bound on the time step (equations.py:35)."""
    dt_diffusion = dx
    if not implicit_diffusion:
        dt_diffusion = dx**2 / (viscosity * 2 ** (ndim))
    dt_advection = max_courant_number * dx / max_velocity
    dt = dt_advection if dt is None else dt
    return min(dt_diffusion, dt_advection, dt)


class ImplicitExplicitODE:
    """∂u/∂t = explicit_terms(u) + implicit_terms(u) (equations.py:67).

    ``explicit_terms`` is the (nonlinear) part integrated explicitly;
    ``implicit_terms`` the (linear) part integrated implicitly;
    ``implicit_solve(f, eta)`` solves u - eta*implicit_terms(u) = f.
    """

    def explicit_terms(self, u: Array) -> Array:
        raise NotImplementedError

    def implicit_terms(self, u: Array) -> Array:
        raise NotImplementedError

    def implicit_solve(self, f: Array, step_size: float) -> Array:
        raise NotImplementedError

    def residual(self, u: Array, u_t: Array) -> Array:
        """PDE residual u_t - N(u) - L(u)."""
        return u_t - self.explicit_terms(u) - self.implicit_terms(u)


@dataclasses.dataclass
class IMEXStepper:
    """IMEX time stepping with configurable order (equations.py:110).

    order=1: forward-backward Euler (alpha=1); order=1.5: Crank-Nicolson
    IMEX (alpha=0.5); order=2: RK2 Crank-Nicolson (alpha=0.5 Heun,
    alpha=2/3 Ralston).

    Trainable coefficients (the reference optionally registers alpha/beta as
    nn.Parameters, equations.py:161-172): the functional equivalent is to
    pass TRACED arrays instead of floats — ``init_coeffs()`` gives the
    coefficient pytree, ``with_coeffs(c)`` rebinds it, and gradients flow
    through the step:

        coeffs = stepper.init_coeffs()
        loss = lambda c: f(stepper.with_coeffs(c)(u, dt, eq))
        grads = jax.grad(loss)(coeffs)
    """

    order: float = 2
    alpha: float = 0.5
    beta: float = 0.5

    def init_coeffs(self):
        """Coefficients as a pytree of arrays (for optax/jax.grad)."""
        import jax.numpy as jnp

        return {"alpha": jnp.asarray(self.alpha), "beta": jnp.asarray(self.beta)}

    def with_coeffs(self, coeffs) -> "IMEXStepper":
        """Rebinds (possibly traced) coefficients; jit/grad-safe."""
        return dataclasses.replace(
            self, alpha=coeffs["alpha"], beta=coeffs["beta"]
        )

    def __call__(self, u: Array, dt: float, equation: ImplicitExplicitODE) -> Array:
        if self.order in (1, 1.5):
            return self._imex(u, dt, equation)
        elif self.order == 2:
            return self._rk2_crank_nicolson(u, dt, equation)
        raise ValueError(f"unsupported IMEX order: {self.order}")

    def _imex(self, u: Array, dt: float, equation: ImplicitExplicitODE) -> Array:
        alpha = 1.0 if self.order == 1 else self.alpha
        F = equation.explicit_terms
        G = equation.implicit_terms
        G_inv = equation.implicit_solve
        g = u + dt * F(u) + (1 - alpha) * dt * G(u)
        return G_inv(g, alpha * dt)

    def _rk2_crank_nicolson(
        self, u: Array, dt: float, equation: ImplicitExplicitODE
    ) -> Array:
        """RK2-CN (Chandler & Kerswell 2013, §3; equations.py:193-247)."""
        alpha, beta = self.alpha, self.beta
        F = equation.explicit_terms
        G = equation.implicit_terms
        G_inv = equation.implicit_solve
        g = u + beta * dt * G(u)
        h = F(u)
        u = G_inv(g + dt * h, beta * dt)
        h = alpha * F(u) + (1 - alpha) * h
        return G_inv(g + dt * h, beta * dt)


# Carpenter-Kennedy low-storage coefficients (equations.py:294-318)
_CARPENTER_KENNEDY = dict(
    alphas=(
        0.0,
        0.1496590219993,
        0.3704009573644,
        0.6222557631345,
        0.9582821306748,
        1.0,
    ),
    betas=(0.0, -0.4178904745, -1.192151694643, -1.697784692471, -1.514183444257),
    gammas=(0.1496590219993, 0.3792103129999, 0.8229550293869, 0.6994504559488, 0.1530572479681),
)

# classic 4-stage RK4 (equations.py:320-326)
_CLASSIC_RK4 = dict(
    alphas=(0.0, 0.5, 0.5, 1.0, 1.0),
    betas=(0.0, 0.0, 0.0, 0.0),
    gammas=(1 / 6, 1 / 3, 1 / 3, 1 / 6),
)


@dataclasses.dataclass
class RK4CrankNicolsonStepper(IMEXStepper):
    """Low-storage RK4 (Carpenter-Kennedy) with Crank-Nicolson implicit part.

    Second-order accurate for the implicit terms, up to fourth-order for the
    explicit terms — the standard pseudo-spectral turbulence stepper (Canuto
    et al. 2007, App. D.3; reference equations.py:249-358). The 5-stage loop
    is unrolled at trace time so XLA fuses each stage's pointwise updates
    with the FFTs inside ``explicit_terms``.
    """

    order: float = 4
    low_storage: bool = True

    def __call__(self, u: Array, dt: float, equation: ImplicitExplicitODE) -> Array:
        w = _CARPENTER_KENNEDY if self.low_storage else _CLASSIC_RK4
        alphas, betas, gammas = w["alphas"], w["betas"], w["gammas"]
        if len(alphas) - 1 != len(betas) or len(betas) != len(gammas):
            raise ValueError("number of RK coefficients does not match")
        F = equation.explicit_terms
        G = equation.implicit_terms
        G_inv = equation.implicit_solve
        h = 0
        for k in range(len(betas)):
            h = F(u) + betas[k] * h
            mu = 0.5 * dt * (alphas[k + 1] - alphas[k])
            u = G_inv(u + gammas[k] * dt * h + mu * G(u), mu)
        return u


def recommended_fft_impl(
    grid_size: int,
    batch_size: int = 8,
    double: bool = False,
    dealias: bool = True,
) -> str:
    """Measured-fastest solver transform for (resolution, batch) on TPU v5e.

    Encodes the round-4 resolution-crossover sweep
    (results/crossover_r4.jsonl, real chip, per-step device time from a
    2-point scaling fit):

    - The dense-DFT Galerkin block (``dft_galerkin``) beats XLA's TPU FFT
      lowering at EVERY measured n — 3.0× at 128², 4.3× at 256², 5.4× at
      512², 4.2× at 1024² (b8) — so the O(n³)-vs-O(n² log n) crossover sits
      beyond the supported resolution range; there is no n at which ``fft``
      is the right fp32 TPU default.
    - The fused Pallas stepper on the Galerkin-block layout
      (``dft_galerkin_fused``, round-5 sweep
      results/galerkin_fused_crossover_r5.jsonl) supersedes the aligned
      layout (``dft_aligned_fused``) everywhere the kernel wins: at 256² it
      beats both the aligned-fused kernel (26,621 vs 25,348 sample-steps/s
      at b128) and galerkin's degraded large-batch throughput, at 512² it
      overtakes galerkin above the same b32 threshold (3,823 vs 3,121 at
      b64; galerkin still wins b8: 4,556 vs 3,822), and at 1024² the
      column-blocked stage pipeline (128-column tiles — 256 misses the
      scoped-VMEM limit by 368 KiB) makes it the first fused config that
      compiles at all and it wins outright at every batch (648 vs 583 at
      b8). Small-batch 256² stays galerkin (30,208 vs 26,284 at b8): the
      batch-32 threshold interpolates the round-3 per-sample-step curves —
      galerkin degrades 33→69 µs/sample-step from b8→b128 while the fused
      kernels stay flat, crossing between b16 and b32.
    - fp64 runs solve on CPU (no TPU f64/c128) where jnp.fft wins; runs
      without dealiasing need ``fft`` (galerkin steps on the 2/3-rule block
      and the fused kernel hard-codes the filter).
    """
    if double or not dealias:
        return "fft"
    if grid_size >= 1024:
        return "dft_galerkin_fused"
    if grid_size >= 256 and batch_size >= 32:
        return "dft_galerkin_fused"
    return "dft_galerkin"


@dataclasses.dataclass
class NavierStokes2DSpectral(ImplicitExplicitODE):
    """2-D incompressible NSE in vorticity form, pseudo-spectral (rfft2).

    Explicit part: dealiased advection -(v·∇)ω (+ forcing); implicit part:
    viscous diffusion + drag, solved in closed form per mode. Counterpart of
    reference equations.py:361-463.

    State is the rfft2 half-spectrum ``vort_hat`` with shape
    ``(..., n, n//2+1)``; any leading dims are batch.
    """

    viscosity: float
    grid: Grid
    drag: float = 0.0
    smooth: bool = True
    forcing_fn: Optional[object] = None
    solver: Optional[IMEXStepper] = None
    dtype: object = jnp.float32
    # "dft" runs the rfft2/irfft2 pairs as dense DFT matmuls on the MXU
    # (ops/dft2d.py) — XLA's TPU FFT lowering leaves the chip ~99% idle and
    # scales inversely with batch; "fft" is the jnp.fft reference path.
    # "dft_aligned" additionally steps on the first n//2 spectrum columns
    # (Nyquist dropped): every array in the hot loop becomes lane-aligned on
    # TPU (the n//2+1 width pads to 2x lanes) and every transform matmul an
    # exact tile multiple. For spectrally-filtered turbulence states the
    # Nyquist column is zero to fp32 after warmup (viscous decay at k=n/2),
    # so results agree with the full paths to fp32 roundoff; public
    # inputs/outputs stay full-width (n//2+1) — conversion happens once per
    # ``forward`` call, not per step.
    # "dft_galerkin" (smooth=True only) steps on exactly the 2/3-rule
    # dealiasing support (signed |kx| < 2n/3/2, low 2/3 y columns): the
    # dealiased state provably stays on that block, so the per-step filter
    # multiply becomes an identity (dropped) and every transform matmul
    # contracts/produces only ~2/3 of each spectral axis. Products of
    # in-block modes reach at most |k| ≤ 2·kmax < n − kmax, so the dense
    # DFT of the advection term is alias-free on the kept modes — this is
    # an exact Galerkin restriction of the filtered dynamics, not an
    # approximation (entry restriction drops only modes the filter would
    # have killed; they are zero to fp32 after any warmup, as for
    # dft_aligned's Nyquist column). Gradients: on-block components match
    # the fft path to machine precision; components at dropped modes are
    # exactly zero (the gradient of the restricted dynamics — tested in
    # tests/test_spectral_solver.py::test_galerkin_gradient_semantics).
    fft_impl: str = "fft"
    # MXU precision for the dft paths ("highest" = full fp32)
    mxu_precision: str = "highest"
    # Run ``forward`` rollouts through the fused Pallas stepper
    # (ops/pallas/spectral_step.py): the whole multi-step chunk stays
    # VMEM-resident — one HBM read + write of the state per chunk instead of
    # per-matmul round trips. Requires fft_impl="dft_aligned", fp32 state,
    # and the default RK4CrankNicolson stepper; forward-only (data
    # generation / benchmarking — differentiating through it raises).
    fused: bool = False
    # Physical-column tile width for the fused kernel's blocked stage
    # pipeline ("auto" = resident ≤256², 256-column tiles above — the
    # resident layout's (n, n) physical fields exceed VMEM at 1024²);
    # None forces resident, an int forces that tile width. Ignored unless
    # fused=True.
    fused_block_cols: object = "auto"

    def _irfft2(self, x: Array) -> Array:
        if self.fft_impl == "dft_galerkin":
            from tpu_cfd.ops import dft2d

            return dft2d.irfft2_block(
                x, self.grid.shape[-1], self._rows, self.mxu_precision
            )
        if self.fft_impl in ("dft", "dft_aligned"):
            from tpu_cfd.ops import dft2d

            return dft2d.irfft2_matmul(x, self.mxu_precision)
        return jnp.fft.irfft2(x, s=self.grid.shape)

    def _rfft2(self, x: Array) -> Array:
        if self.fft_impl == "dft_galerkin":
            from tpu_cfd.ops import dft2d

            return dft2d.rfft2_block(x, self._rows, self._m, self.mxu_precision)
        if self.fft_impl in ("dft", "dft_aligned"):
            from tpu_cfd.ops import dft2d

            return dft2d.rfft2_matmul(x, self.mxu_precision, m=self._m)
        return jnp.fft.rfft2(x)

    def _align(self, w: Array) -> Array:
        """Public full-layout spectrum -> internal (truncated) layout.

        Runs once per ``forward`` call, never inside the step loop. For the
        galerkin block this gathers the kept signed-x rows (positive block
        then negative block, fft ordering compacted).
        """
        if self._rows is not None and w.shape[-2] != len(self._rows):
            w = w[..., jnp.asarray(self._rows), :]
        return w[..., : self._m] if w.shape[-1] > self._m else w

    def _unalign(self, w: Array, shape_in: Tuple[int, int]) -> Array:
        """Internal layout -> the caller's spectral shape (zero-fill dropped).

        ``shape_in`` is the trailing (rows, width) of the caller's input, so
        block-shaped callers (the step loop) get the block back with no
        scatter, and full-shape callers (the public API, the trajectory
        recorder) get the zero-filled full layout.
        """
        height, width = shape_in
        if w.shape[-2] != height:
            npos = len(self._rows) - len(self._rows) // 2
            gap = jnp.zeros(
                (*w.shape[:-2], height - len(self._rows), w.shape[-1]), w.dtype
            )
            w = jnp.concatenate([w[..., :npos, :], gap, w[..., npos:, :]], axis=-2)
        if w.shape[-1] == width:
            return w
        pad = [(0, 0)] * (w.ndim - 1) + [(0, width - w.shape[-1])]
        return jnp.pad(w, pad)

    def __post_init__(self):
        if self.solver is None:
            self.solver = RK4CrankNicolsonStepper()
        if self.fused:
            if self.fft_impl not in ("dft_aligned", "dft_galerkin"):
                raise ValueError(
                    "fused=True requires fft_impl='dft_aligned' or "
                    "'dft_galerkin' (the fused kernel bakes the truncated "
                    "spectrum layout)"
                )
            if not self.smooth:
                raise ValueError("fused=True requires smooth=True")
            if jnp.dtype(self.dtype) != jnp.float32:
                raise ValueError("fused=True is fp32-only")
            if not (
                isinstance(self.solver, RK4CrankNicolsonStepper)
                and self.solver.low_storage
                and self.solver.order == 4
            ):
                raise ValueError(
                    "fused=True implements the low-storage RK4-CN stepper "
                    "only; pass solver=None"
                )
        n = self.grid.shape[-1]
        self._m_full = n // 2 + 1
        self._rows = None
        if self.fft_impl not in ("fft", "dft", "dft_aligned", "dft_galerkin"):
            raise ValueError(
                f"unknown fft_impl {self.fft_impl!r}; expected one of "
                "'fft', 'dft', 'dft_aligned', 'dft_galerkin'"
            )
        if self.fft_impl == "dft_galerkin":
            from tpu_cfd.ops import dft2d

            if not self.smooth:
                raise ValueError(
                    "fft_impl='dft_galerkin' steps on the 2/3-rule dealiasing "
                    "support and requires smooth=True"
                )
            self._rows, self._m = dft2d.galerkin_block(n)
        else:
            self._m = n // 2 if self.fft_impl == "dft_aligned" else self._m_full
        kx, ky = self.grid.rfft_mesh(dtype=self.dtype)
        kx, ky = kx[..., : self._m], ky[..., : self._m]
        if self._rows is not None:
            rows = jnp.asarray(self._rows)
            kx, ky = kx[rows, :], ky[rows, :]
        self.kx, self.ky = kx, ky
        # Laplacian symbol WITHOUT the zero-mode guard (equations.py:398):
        # the guard only matters for the stream-function inversion, which
        # vorticity_to_velocity applies internally.
        self.laplace = -4 * (jnp.pi**2) * (
            jnp.abs(self.kx) ** 2 + jnp.abs(self.ky) ** 2
        )
        self.linear_term = self.viscosity * self.laplace - self.drag
        if self._rows is not None:
            # the internal state IS the filter support: the brick-wall mask
            # restricted to the block is identically 1 (asserted), so the
            # per-step multiply is dropped in _explicit_terms
            # host-side numpy check (no eager device dispatch at init —
            # CLAUDE.md: eager op chains are slow/fragile on this backend);
            # mask construction mirrors ops.spectral.brick_wall_filter_2d
            import numpy as np

            n_chk = self.grid.shape[-1]
            kx_ord = np.round(np.fft.fftfreq(n_chk) * n_chk).astype(int)
            kmax_x = int(2 / 3 * n_chk) // 2
            full = np.outer(
                (-kmax_x <= kx_ord) & (kx_ord < kmax_x),
                np.arange(n_chk // 2 + 1) < int(2 / 3 * (n_chk // 2 + 1)),
            )
            blk = full[np.asarray(self._rows), : self._m]
            assert blk.all() and int(full.sum()) == blk.size, (
                "galerkin block does not match the brick-wall filter support"
            )
            self.filter = None
        else:
            self.filter = brick_wall_filter_2d(self.grid, dtype=self.dtype)[
                ..., : self._m
            ]

    def _explicit_terms(self, vort_hat: Array) -> Array:
        vhat, _ = vorticity_to_velocity(self.grid, vort_hat, (self.kx, self.ky))
        grad_x_hat = 2j * jnp.pi * self.kx * vort_hat
        grad_y_hat = 2j * jnp.pi * self.ky * vort_hat
        # one batched inverse transform instead of four: ~17% faster per
        # stage on TPU (XLA dispatches a single FFT kernel over the stack);
        # on the dft path the stack is one big batched MXU matmul
        specs = jnp.stack([vhat[0], vhat[1], grad_x_hat, grad_y_hat])
        phys = self._irfft2(specs)
        vx, vy, grad_x, grad_y = phys

        advection = -(grad_x * vx + grad_y * vy)
        advection_hat = self._rfft2(advection)

        if self.smooth and self.filter is not None:
            # (the galerkin block IS the filter support — nothing to mask)
            advection_hat = advection_hat * self.filter

        terms = advection_hat
        if self.forcing_fn is not None:
            # evaluate the forcing in the solver dtype: an fp32-evaluated
            # sin/cos carries ~1e-8 rounding noise across the whole
            # spectrum, which fp64 runs would otherwise inherit (the
            # dealias filter only masks advection)
            if not self.forcing_fn.vorticity:
                fx, fy = self.forcing_fn(self.grid, (vx, vy), dtype=vx.dtype)
                fx_hat = self._rfft2(fx.data.astype(vx.dtype))
                fy_hat = self._rfft2(fy.data.astype(vx.dtype))
                terms = terms + spectral_curl_2d((fx_hat, fy_hat), (self.kx, self.ky))
            else:
                f = self.forcing_fn(self.grid, vort_hat, dtype=vx.dtype)
                f_hat = self._rfft2(f.data.astype(vx.dtype))
                terms = terms + f_hat
        return terms

    def explicit_terms(self, vort_hat: Array) -> Array:
        # accept both the public full layout and the internal aligned layout
        # (trajectories.record calls these on full-width snapshots)
        shape_in = vort_hat.shape[-2:]
        out = self._explicit_terms(self._align(vort_hat))
        return self._unalign(out, shape_in)

    def implicit_terms(self, vort_hat: Array) -> Array:
        shape_in = vort_hat.shape[-2:]
        out = self.linear_term * self._align(vort_hat)
        return self._unalign(out, shape_in)

    def implicit_solve(self, vort_hat: Array, dt: float) -> Array:
        # closed form per-mode solve: (1 - dt L)^{-1} (equations.py:446)
        shape_in = vort_hat.shape[-2:]
        out = 1 / (1 - dt * self.linear_term) * self._align(vort_hat)
        return self._unalign(out, shape_in)

    def step(self, vort_hat: Array, dt: float, steps: int = 1):
        return self.forward(vort_hat, dt, steps)

    def forward(
        self, vort_hat: Array, dt: float, steps: int = 1
    ) -> Tuple[Array, Array]:
        """Marches ``steps`` steps; returns (ŵ_new, ∂ŵ/∂t estimate).

        ``steps`` is static; the loop lowers to one ``lax.scan`` so the whole
        rollout is a single compiled kernel sequence.
        """
        shape_in = vort_hat.shape[-2:]
        vort_hat = self._align(vort_hat)  # scan carries the aligned layout
        vort_old = vort_hat
        if self.fused:
            from tpu_cfd.ops.pallas import spectral_step

            f_hat = None
            if self.forcing_fn is not None:
                # every ForcingFn is state-independent, so the forcing term
                # is exactly the explicit terms of the zero state — evaluated
                # once per chunk, folded into the kernel as a constant
                f_hat = self._explicit_terms(
                    jnp.zeros(vort_hat.shape[-2:], vort_hat.dtype)
                )
            rollout = (
                spectral_step.fused_rollout_galerkin
                if self.fft_impl == "dft_galerkin"
                else spectral_step.fused_rollout_aligned
            )
            vort_hat = rollout(
                vort_hat,
                grid=self.grid,
                viscosity=self.viscosity,
                drag=self.drag,
                dt=dt,
                steps=steps,
                forcing_hat=f_hat,
                precision=self.mxu_precision,
                block_cols=self.fused_block_cols,
            )
        elif steps == 1:
            vort_hat = self.solver(vort_hat, dt, self)
        else:
            def body(w, _):
                return self.solver(w, dt, self), None

            vort_hat, _ = jax.lax.scan(body, vort_hat, None, length=steps)
        dvortdt_hat = 1 / (steps * dt) * (vort_hat - vort_old)
        return (
            self._unalign(vort_hat, shape_in),
            self._unalign(dvortdt_hat, shape_in),
        )

    __call__ = forward
