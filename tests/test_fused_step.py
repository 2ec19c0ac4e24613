"""Fused Pallas RK4-CN stepper (ops/pallas/spectral_step.py) parity tests.

Runs in interpret mode on CPU (conftest forces the CPU backend; the module
auto-selects interpret off-TPU). The contract: ``fused=True`` reproduces the
XLA ``fft_impl="dft_aligned"`` solver bit-for-bit up to matmul summation
order, for decaying and forced flows, batched and unbatched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_cfd import grids
from tpu_cfd.solvers import equations, forcings, initial_conditions as ic

N = 64
STEPS = 8
DT = 1e-3


@pytest.fixture(scope="module")
def state():
    grid = grids.Grid((N, N), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    w0 = jax.vmap(lambda k: ic.vorticity_field(k, grid, 4).data)(keys)
    return grid, jnp.fft.rfft2(w0)


def _mk(grid, fused, **kw):
    kw.setdefault("viscosity", 1e-3)
    kw.setdefault("mxu_precision", "highest")
    return equations.NavierStokes2DSpectral(
        grid=grid, fft_impl="dft_aligned", fused=fused, **kw
    )


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


class TestFusedRolloutParity:
    def test_decaying_matches_xla_solver(self, state):
        grid, what0 = state
        w_ref, d_ref = jax.jit(
            lambda w: _mk(grid, False).forward(w, DT, STEPS)
        )(what0)
        w_fus, d_fus = jax.jit(
            lambda w: _mk(grid, True).forward(w, DT, STEPS)
        )(what0)
        assert _rel(w_fus, w_ref) < 5e-6
        # dwdt is a difference of near-equal states: absolute agreement only
        assert _rel(d_fus, d_ref) < 1e-3

    def test_forced_with_drag(self, state):
        grid, what0 = state
        f = forcings.KolmogorovForcing(grid=grid, wave_number=2)
        kw = dict(viscosity=1e-2, forcing_fn=f, drag=0.1)
        w_ref, _ = jax.jit(lambda w: _mk(grid, False, **kw).forward(w, DT, STEPS))(what0)
        w_fus, _ = jax.jit(lambda w: _mk(grid, True, **kw).forward(w, DT, STEPS))(what0)
        assert _rel(w_fus, w_ref) < 5e-6

    def test_unbatched_equals_batched_row(self, state):
        grid, what0 = state
        ns = _mk(grid, True)
        wb, _ = jax.jit(lambda w: ns.forward(w, DT, STEPS))(what0)
        w1, _ = jax.jit(lambda w: ns.forward(w, DT, STEPS))(what0[0])
        assert _rel(w1, wb[0]) < 1e-6

    def test_precision_ladder_consistency(self, state):
        grid, what0 = state
        w_hi, _ = jax.jit(lambda w: _mk(grid, True).forward(w, DT, STEPS))(what0)
        w_h, _ = jax.jit(
            lambda w: _mk(grid, True, mxu_precision="high").forward(w, DT, STEPS)
        )(what0)
        w_d, _ = jax.jit(
            lambda w: _mk(grid, True, mxu_precision="default").forward(w, DT, STEPS)
        )(what0)
        assert _rel(w_h, w_hi) < 1e-3
        # single-pass bf16 is coarser but must stay in the same flow regime
        assert _rel(w_d, w_hi) < 5e-2

    def test_full_width_public_layout_roundtrip(self, state):
        """Public (n//2+1)-wide spectra convert once per forward, as for
        the unfused aligned path — outputs keep the caller's width."""
        grid, what0 = state
        assert what0.shape[-1] == N // 2 + 1
        w_fus, _ = jax.jit(lambda w: _mk(grid, True).forward(w, DT, 2))(what0)
        assert w_fus.shape == what0.shape
        assert bool(jnp.all(w_fus[..., -1] == 0))  # Nyquist column dropped

    @pytest.mark.slow
    def test_fused_256_production_parity(self):
        """Production resolution (256², the data-gen config): fused ==
        XLA aligned solver at fp32 roundoff over a 10-step rollout."""
        n = 256
        grid = grids.Grid((n, n), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        w0 = ic.vorticity_field(jax.random.PRNGKey(0), grid, 4).data
        what = jnp.fft.rfft2(w0)
        w_ref, _ = jax.jit(lambda w: _mk(grid, False).forward(w, DT, 10))(what)
        w_fus, _ = jax.jit(lambda w: _mk(grid, True).forward(w, DT, 10))(what)
        assert _rel(w_fus, w_ref) < 5e-6

    def test_blocked_layout_matches_resident(self, state):
        """The grid-blocked stage pipeline (physical-column tiles, VMEM
        never holds a full physical field) is numerically the resident
        kernel up to block-major summation order of the forward DFT."""
        from tpu_cfd.ops.pallas import spectral_step

        grid, what0 = state
        ns = _mk(grid, True)
        wa = ns._align(what0)
        kw = dict(grid=grid, viscosity=1e-3, drag=0.0, dt=DT, steps=STEPS,
                  precision="highest")
        res = spectral_step.fused_rollout_aligned(wa, block_cols=None, **kw)
        for bc in (16, 32):
            blk = spectral_step.fused_rollout_aligned(wa, block_cols=bc, **kw)
            assert _rel(blk, res) < 1e-6
        with pytest.raises(ValueError, match="divide"):
            spectral_step.fused_rollout_aligned(wa, block_cols=48, **kw)

    def test_galerkin_layout_matches_xla_galerkin(self, state):
        """fused=True with fft_impl='dft_galerkin' (the 2/3-rule-block
        fused stepper: ~55% fewer transform FLOPs than aligned) reproduces
        the XLA dft_galerkin solver, decaying and forced, resident and
        column-blocked."""
        grid, what0 = state
        from tpu_cfd.solvers import forcings

        for kw in (
            dict(viscosity=1e-3),
            dict(viscosity=1e-2, drag=0.1,
                 forcing_fn=forcings.KolmogorovForcing(grid=grid,
                                                       wave_number=2)),
        ):
            ns_ref = equations.NavierStokes2DSpectral(
                grid=grid, fft_impl="dft_galerkin",
                mxu_precision="highest", **kw)
            w_ref, _ = jax.jit(lambda w, ns=ns_ref: ns.forward(w, DT, STEPS))(
                what0)
            for bc in (None, 16):
                ns_f = equations.NavierStokes2DSpectral(
                    grid=grid, fft_impl="dft_galerkin", fused=True,
                    mxu_precision="highest", fused_block_cols=bc, **kw)
                w_f, _ = jax.jit(
                    lambda w, ns=ns_f: ns.forward(w, DT, STEPS))(what0)
                assert _rel(w_f, w_ref) < 5e-6

    def test_constructor_validation(self, state):
        grid, _ = state
        with pytest.raises(ValueError, match="dft_aligned"):
            equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, fused=True, fft_impl="fft"
            )
        with pytest.raises(ValueError, match="fp32"):
            equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, fused=True,
                fft_impl="dft_aligned", dtype=jnp.float64,
            )
        with pytest.raises(ValueError, match="smooth"):
            equations.NavierStokes2DSpectral(
                viscosity=1e-3, grid=grid, fused=True,
                fft_impl="dft_aligned", smooth=False,
            )
