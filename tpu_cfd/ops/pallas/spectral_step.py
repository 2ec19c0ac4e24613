"""Fused RK4-CN pseudo-spectral vorticity stepper — whole steps in VMEM.

The production solver (solvers/equations.py NavierStokes2DSpectral with
``fft_impl="dft_aligned"``) runs each Carpenter-Kennedy stage as a chain of
XLA ops: ~30 DFT matmuls plus elementwise updates, every matmul output
round-tripping through HBM. The chip is traffic-bound: at batch 128 / 256²
the step measured ~11 ms against a ~4 ms MXU-compute bound (RESULTS.md).

This kernel keeps the ENTIRE rollout chunk resident in VMEM: the (n, n/2)
half-spectrum state, the four DFT matrices, the per-mode linear-solve
constants, and every intermediate of every stage. HBM traffic per chunk
drops to one read + one write of the state per sample, regardless of the
number of steps fused. One grid program per sample; ``steps`` unrolls as a
``fori_loop`` whose body is the exact 5-stage RK4-CN update of
``RK4CrankNicolsonStepper`` (solvers/equations.py:177-190, reference hot
loop torch_cfd/equations.py:413-438 — redesigned, not translated: the
reference steps torch.fft tensors through autograd; this is a
single-program VMEM-resident systolic formulation).

Why the ALIGNED (n, n/2) layout and not the 2/3-rule Galerkin block: MXU
tiles are 128×128, so a 170-row × 86-lane block pads to the same hardware
cycles as the full 256×128 spectrum — the Galerkin FLOP saving is an
illusion inside a matmul unit, while the aligned layout tiles perfectly.
Dealiasing happens the aligned way: a brick-wall mask multiply per stage
(one VPU pass in VMEM).

Numerics: fp32 state; matmul precision selectable exactly like the XLA
path's ``mxu_precision`` —
  "highest": 6-pass 3-way bf16 split (XLA's BF16_6X fp32 emulation) —
             Mosaic has no native fp32 MXU mode and demotes a plain fp32
             jnp.dot to ONE bf16 pass, so true fp32 numerics must be
             emulated explicitly (caught by the round-4 physics ladder),
  "high":    3-pass bf16 split (hi·hi + hi·lo + lo·hi), jax HIGH semantics;
             transform matrices are pre-split once per chunk,
  "default": single bf16 pass.
Forcing is a constant spectral field added per stage (every ForcingFn in
solvers/forcings.py is state-independent; the caller evaluates
``explicit_terms(0)`` once, which is exactly the forcing term).

No VJP is defined: the fused path is for data generation and benchmarking
(the differentiable fine-tune path keeps the XLA solver). Differentiating
through it raises.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_cfd.ops import dft2d

Array = jax.Array

# Carpenter-Kennedy low-storage RK4 tables (solvers/equations.py:142-153)
_ALPHAS = (0.0, 0.1496590219993, 0.3704009573644, 0.6222557631345,
           0.9582821306748, 1.0)
_BETAS = (0.0, -0.4178904745, -1.192151694643, -1.697784692471,
          -1.514183444257)
_GAMMAS = (0.1496590219993, 0.3792103129999, 0.8229550293869,
           0.6994504559488, 0.1530572479681)


@functools.lru_cache(maxsize=None)
def _host_constants(n: int, step: Tuple[float, float], viscosity: float,
                    drag: float, dt: float):
    """All per-mode constants, pure host numpy (CLAUDE.md invariant)."""
    m = n // 2
    fx = np.fft.fftfreq(n, d=step[0]).astype(np.float64)
    fy = np.fft.fftfreq(n, d=step[1])[:m].astype(np.float64)
    kx = np.broadcast_to(fx[:, None], (n, m)).copy()
    ky = np.broadcast_to(fy[None, :], (n, m)).copy()
    lap = -4 * np.pi**2 * (kx**2 + ky**2)
    lap_g = lap.copy()
    lap_g[0, 0] = 1.0
    lin = viscosity * lap - drag
    # 2/3-rule brick-wall mask on the aligned (Nyquist-dropped) spectrum,
    # mirroring ops/spectral.brick_wall_filter_2d
    kx_ord = np.round(fx * n * step[0]).astype(int)
    kmax_x = int(2 / 3 * n) // 2
    keep_x = (-kmax_x <= kx_ord) & (kx_ord < kmax_x)
    keep_y = np.arange(m) < int(2 / 3 * (n // 2 + 1))
    filt = np.outer(keep_x, keep_y)
    mus = tuple(0.5 * dt * (_ALPHAS[k + 1] - _ALPHAS[k]) for k in range(5))
    dens = np.stack([1.0 / (1.0 - mu * lin) for mu in mus])
    f32 = np.float32
    return {
        "tkx": (2 * np.pi * kx).astype(f32),
        "tky": (2 * np.pi * ky).astype(f32),
        "ilap": (1.0 / lap_g).astype(f32),
        "filt": filt.astype(f32),
        "lin": lin.astype(f32),
        "dens": dens.astype(f32),
        "mus": mus,
    }


def _make_kernel(steps: int, mus, precision: str,
                 block_cols: Optional[int] = None):
    highest = precision == "highest"
    three = precision == "high"

    def split(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def split3(a):
        hi = a.astype(jnp.bfloat16)
        r = a - hi.astype(jnp.float32)
        mid = r.astype(jnp.bfloat16)
        lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, mid, lo

    def prep(a):
        if highest:
            return split3(a)
        if three:
            return split(a)
        return (a.astype(jnp.bfloat16),)

    def mm(pa, pb):
        # Mosaic demotes an fp32×fp32 jnp.dot to ONE bf16 MXU pass (there
        # is no native f32 MXU mode), so fp32 operands must be explicitly
        # multi-passed: "high" = 3-pass hi/lo (drops only the ~2^-16 lo·lo
        # term), "highest" = 6-pass 3-way split (XLA's BF16_6X algorithm).
        # Round-4 physics ladder caught the old single-fp32-dot "highest"
        # silently computing bf16-level numerics (results/
        # physics_ladder_r4.jsonl vs the fixed rows).
        o = jnp.dot(pa[0], pb[0], preferred_element_type=jnp.float32)
        if three or highest:
            o = o + jnp.dot(pa[0], pb[1], preferred_element_type=jnp.float32)
            o = o + jnp.dot(pa[1], pb[0], preferred_element_type=jnp.float32)
        if highest:
            o = o + jnp.dot(pa[0], pb[2], preferred_element_type=jnp.float32)
            o = o + jnp.dot(pa[2], pb[0], preferred_element_type=jnp.float32)
            o = o + jnp.dot(pa[1], pb[1], preferred_element_type=jnp.float32)
        return o

    # transform matrices arrive PRE-SPLIT from the host (bf16 hi/lo pairs
    # for "high", hi/mid/lo triples for "highest", single bf16 for
    # "default"): the split would otherwise re-run on the VPU in every grid
    # program (per sample)
    per_mat = 3 if highest else (2 if three else 1)

    def kernel(dt_gammas, w_re_ref, w_im_ref, *rest):
        mats = rest[: 8 * per_mat]
        (tkx_ref, tky_ref, ilap_ref, filt_ref, lin_ref, dens_ref,
         f_re_ref, f_im_ref, o_re_ref, o_im_ref) = rest[8 * per_mat:]
        (p_gf_re, p_gf_im, p_il_re, p_il_im,
         p_fl_re, p_fl_im, p_ff_re, p_ff_im) = (
            tuple(r[:] for r in mats[i * per_mat: (i + 1) * per_mat])
            for i in range(8)
        )
        tkx, tky = tkx_ref[:], tky_ref[:]
        ilap, filt, lin = ilap_ref[:], filt_ref[:], lin_ref[:]
        f_re, f_im = f_re_ref[:], f_im_ref[:]

        def inv2x4(fields):
            """Four (n, m) spectra -> four (n, n) physical fields, batched.

            The first-axis DFT contracts rows, so the 4 fields column-stack
            into ONE (n, 4m) right operand; the last-axis DFT contracts the
            spectrum axis, so the stage-1 outputs row-stack into ONE (4n, m)
            left operand — same FLOPs as 4 separate irfft2s in 6 wide
            matmuls instead of 24 narrow ones (VMEM-local relayouts only).

            The row-restack slices the (n, 4m) stage-1 output at lane
            offsets i*m, which Mosaic can only re-concatenate when m is a
            multiple of the 128-lane vreg ("result/input offset mismatch on
            non-concat dimension" otherwise) — sub-128² grids (m = n/2 <
            128) take the unbatched per-field path instead, where the FLOP
            count is too small to matter.
            """
            m = fields[0][0].shape[-1]
            if m % 128:
                out = []
                for fre, fim in fields:
                    pre_, pim_ = prep(fre), prep(fim)
                    ar = mm(p_gf_re, pre_) - mm(p_gf_im, pim_)   # (n, m)
                    ai = mm(p_gf_re, pim_) + mm(p_gf_im, pre_)
                    out.append(mm(prep(ar), p_il_re)
                               + mm(prep(ai), p_il_im))          # (n, n)
                return out
            xre = jnp.concatenate([f[0] for f in fields], axis=1)
            xim = jnp.concatenate([f[1] for f in fields], axis=1)
            pxre, pxim = prep(xre), prep(xim)
            are = mm(p_gf_re, pxre) - mm(p_gf_im, pxim)     # (n, 4m)
            aim = mm(p_gf_re, pxim) + mm(p_gf_im, pxre)
            are4 = jnp.concatenate(
                [are[:, i * m:(i + 1) * m] for i in range(4)], axis=0
            )
            aim4 = jnp.concatenate(
                [aim[:, i * m:(i + 1) * m] for i in range(4)], axis=0
            )
            phys = mm(prep(are4), p_il_re) + mm(prep(aim4), p_il_im)  # (4n, n)
            npts = phys.shape[-1]
            return [phys[i * npts:(i + 1) * npts] for i in range(4)]

        def explicit(wre, wim):
            """Dealiased advection + forcing (equations.py _explicit_terms)."""
            pre, pim = -wre * ilap, -wim * ilap          # stream function
            vx, vy, gx, gy = inv2x4([
                (-tky * pim, tky * pre),                 # u = 2πi ky ψ
                (tkx * pim, -tkx * pre),                 # v = -2πi kx ψ
                (-tkx * wim, tkx * wre),                 # ∂ω/∂x
                (-tky * wim, tky * wre),                 # ∂ω/∂y
            ])
            adv = -(gx * vx + gy * vy)
            padv = prep(adv)
            t_re, t_im = mm(padv, p_fl_re), mm(padv, p_fl_im)
            pt_re, pt_im = prep(t_re), prep(t_im)
            z_re = mm(p_ff_re, pt_re) - mm(p_ff_im, pt_im)
            z_im = mm(p_ff_re, pt_im) + mm(p_ff_im, pt_re)
            return z_re * filt + f_re, z_im * filt + f_im

        def explicit_blocked(wre, wim):
            """Same stage, tiled over physical-space COLUMN blocks.

            The resident ``explicit`` materializes four full (n, n) physical
            fields — the VMEM item that scales quadratically and kills the
            kernel above 512² (191.8 MiB program at 1024², round-4
            crossover log). But the advection product is pointwise in
            physical space, so the last-axis inverse DFT, the product, and
            the last-axis forward DFT fuse PER COLUMN BLOCK: for each block
            J of ``block_cols`` physical columns, form the four (n, |J|)
            field blocks, multiply, and accumulate
            ``adv[:, J] @ fwd_last[J, :]`` into the advection spectrum. The
            full physical fields never exist; peak VMEM holds the state,
            the transform matrices, the four PRE-SPLIT first-axis outputs
            (bf16 passes, (n, m) each), and one block of intermediates.
            FLOPs are identical to ``explicit``; only the summation order
            of the forward transform differs (block-major instead of one
            long contraction).
            """
            pre, pim = -wre * ilap, -wim * ilap
            stage1 = []
            for fre, fim in (
                (-tky * pim, tky * pre),                 # u = 2πi ky ψ
                (tkx * pim, -tkx * pre),                 # v = -2πi kx ψ
                (-tkx * wim, tkx * wre),                 # ∂ω/∂x
                (-tky * wim, tky * wre),                 # ∂ω/∂y
            ):
                pfre, pfim = prep(fre), prep(fim)
                ar = mm(p_gf_re, pfre) - mm(p_gf_im, pfim)   # (n, m)
                ai = mm(p_gf_re, pfim) + mm(p_gf_im, pfre)
                stage1.append((prep(ar), prep(ai)))          # bf16 passes only
            (vx_s, vy_s, gx_s, gy_s) = stage1
            n_phys = p_il_re[0].shape[1]
            t_re = t_im = None
            for j0 in range(0, n_phys, block_cols):
                sl = slice(j0, j0 + block_cols)
                il_re_b = tuple(p[:, sl] for p in p_il_re)
                il_im_b = tuple(p[:, sl] for p in p_il_im)
                vx_b = mm(vx_s[0], il_re_b) + mm(vx_s[1], il_im_b)
                vy_b = mm(vy_s[0], il_re_b) + mm(vy_s[1], il_im_b)
                gx_b = mm(gx_s[0], il_re_b) + mm(gx_s[1], il_im_b)
                gy_b = mm(gy_s[0], il_re_b) + mm(gy_s[1], il_im_b)
                padv = prep(-(gx_b * vx_b + gy_b * vy_b))    # (n, |J|)
                fl_re_b = tuple(p[sl, :] for p in p_fl_re)
                fl_im_b = tuple(p[sl, :] for p in p_fl_im)
                c_re, c_im = mm(padv, fl_re_b), mm(padv, fl_im_b)
                t_re = c_re if t_re is None else t_re + c_re
                t_im = c_im if t_im is None else t_im + c_im
            pt_re, pt_im = prep(t_re), prep(t_im)
            z_re = mm(p_ff_re, pt_re) - mm(p_ff_im, pt_im)
            z_im = mm(p_ff_re, pt_im) + mm(p_ff_im, pt_re)
            return z_re * filt + f_re, z_im * filt + f_im

        explicit_fn = explicit if block_cols is None else explicit_blocked

        def one_step(_, carry):
            wre, wim = carry
            hre = jnp.zeros_like(wre)
            him = jnp.zeros_like(wim)
            for k in range(5):
                e_re, e_im = explicit_fn(wre, wim)
                hre = e_re + _BETAS[k] * hre
                him = e_im + _BETAS[k] * him
                den = dens_ref[k]
                mu = mus[k]
                wre = (wre + dt_gammas[k] * hre + mu * (lin * wre)) * den
                wim = (wim + dt_gammas[k] * him + mu * (lin * wim)) * den
            return wre, wim

        wre, wim = jax.lax.fori_loop(
            0, steps, one_step, (w_re_ref[0], w_im_ref[0])
        )
        o_re_ref[0] = wre
        o_im_ref[0] = wim

    return kernel


def fused_rollout_aligned(
    w_hat: Array,
    *,
    grid,
    viscosity: float,
    drag: float,
    dt: float,
    steps: int,
    forcing_hat: Optional[Array] = None,
    precision: str = "high",
    interpret: Optional[bool] = None,
    block_cols="auto",
) -> Array:
    """March an aligned ``(..., n, n//2)`` complex64 spectrum ``steps`` steps.

    Bit-for-bit the same update rule as ``NavierStokes2DSpectral`` with
    ``fft_impl="dft_aligned"`` and the matching ``mxu_precision`` (up to
    matmul summation order). Forward-only (no VJP).

    ``block_cols``: physical-column tile width for the blocked stage
    pipeline (``_make_kernel`` explicit_blocked) — removes the full
    (n, n) physical fields from VMEM, which is what caps the resident
    kernel at 512². ``"auto"`` keeps the measured-fastest resident layout
    through 256² and tiles 256 columns above; ``None`` forces resident;
    an int forces that tile width (must divide n, lane-tile multiples of
    128 perform best).
    """
    n = grid.shape[-1]
    m = n // 2
    if w_hat.shape[-2:] != (n, m):
        raise ValueError(
            f"expected aligned spectrum (..., {n}, {m}), got {w_hat.shape}"
        )
    consts = _host_constants(n, tuple(float(s) for s in grid.step),
                             float(viscosity), float(drag), float(dt))
    mats = dft2d._mats(n, m, "float32")
    # ~30 real matmuls of 2·n·n·m flops per stage, 5 stages, per step
    flops_per_sample = 30 * (2 * n * n * m) * 5 * steps
    return _fused_rollout(
        w_hat, mats=mats, consts=consts, n=n, rows=n, m=m,
        dt=dt, steps=steps, forcing_hat=forcing_hat, precision=precision,
        interpret=interpret, block_cols=block_cols,
        flops_per_sample=flops_per_sample,
    )


@functools.lru_cache(maxsize=None)
def _host_constants_galerkin(n: int, step: Tuple[float, float],
                             viscosity: float, drag: float, dt: float):
    """Per-mode constants restricted to the 2/3-rule Galerkin block.

    Same formulas as :func:`_host_constants` on the (rows, m) block of
    ``dft2d.galerkin_block`` — the block IS the brick-wall filter support,
    so the dealias mask is identically 1 and the per-stage filter multiply
    is a no-op (passed as ones to keep the kernel signature uniform).
    """
    rows, m = dft2d.galerkin_block(n)
    ridx = np.asarray(rows)
    fx = np.fft.fftfreq(n, d=step[0]).astype(np.float64)[ridx]
    fy = np.fft.fftfreq(n, d=step[1])[:m].astype(np.float64)
    kx = np.broadcast_to(fx[:, None], (len(rows), m)).copy()
    ky = np.broadcast_to(fy[None, :], (len(rows), m)).copy()
    lap = -4 * np.pi**2 * (kx**2 + ky**2)
    lap_g = lap.copy()
    lap_g[0, 0] = 1.0  # rows[0] is mode 0 (galerkin_block keeps it first)
    lin = viscosity * lap - drag
    mus = tuple(0.5 * dt * (_ALPHAS[k + 1] - _ALPHAS[k]) for k in range(5))
    dens = np.stack([1.0 / (1.0 - mu * lin) for mu in mus])
    f32 = np.float32
    return {
        "tkx": (2 * np.pi * kx).astype(f32),
        "tky": (2 * np.pi * ky).astype(f32),
        "ilap": (1.0 / lap_g).astype(f32),
        "filt": np.ones((len(rows), m), f32),
        "lin": lin.astype(f32),
        "dens": dens.astype(f32),
        "mus": mus,
    }


def fused_rollout_galerkin(
    w_block: Array,
    *,
    grid,
    viscosity: float,
    drag: float,
    dt: float,
    steps: int,
    forcing_hat: Optional[Array] = None,
    precision: str = "high",
    interpret: Optional[bool] = None,
    block_cols="auto",
) -> Array:
    """March a Galerkin-block ``(..., R, m)`` complex64 spectrum.

    The fused stepper on exactly the 2/3-rule dealiasing support (the
    layout of ``fft_impl="dft_galerkin"``): ~55% fewer transform FLOPs
    than the aligned layout, a no-op dealias mask, and a (R, m) state —
    the aligned layout's tile-padding argument against the block (170x86
    pads to the same 256x128 MXU tiles at 256²) fades at large n, where
    the aligned kernel is FLOP-capped below the XLA galerkin path (the
    1024² aligned ceiling is 197T/483G ≈ 408 sample-steps/s vs galerkin's
    measured 583 — results/blocked_crossover_r5.jsonl). Same update rule
    as ``NavierStokes2DSpectral(fft_impl="dft_galerkin")`` up to matmul
    summation order. Forward-only (no VJP).
    """
    n = grid.shape[-1]
    rows, m = dft2d.galerkin_block(n)
    R = len(rows)
    if w_block.shape[-2:] != (R, m):
        raise ValueError(
            f"expected galerkin-block spectrum (..., {R}, {m}), "
            f"got {w_block.shape}"
        )
    consts = _host_constants_galerkin(
        n, tuple(float(s) for s in grid.step),
        float(viscosity), float(drag), float(dt))
    M = dft2d._mats(n, m, "float32")
    Rm = dft2d._mats_rows(n, rows, "float32")
    mats = {
        "inv_first_re": Rm["inv_re"], "inv_first_im": Rm["inv_im"],
        "inv_last_re": M["inv_last_re"], "inv_last_im": M["inv_last_im"],
        "fwd_last_re": M["fwd_last_re"], "fwd_last_im": M["fwd_last_im"],
        "fwd_first_re": Rm["fwd_re"], "fwd_first_im": Rm["fwd_im"],
    }
    # per stage: 4 inverse (8nRm + 4n²m flops) + 1 forward (4n²m + 8Rnm)
    flops_per_sample = 5 * (40 * n * R * m + 20 * n * n * m) * steps
    return _fused_rollout(
        w_block, mats=mats, consts=consts, n=n, rows=R, m=m,
        dt=dt, steps=steps, forcing_hat=forcing_hat, precision=precision,
        interpret=interpret, block_cols=block_cols,
        flops_per_sample=flops_per_sample,
    )


def _fused_rollout(
    w_hat: Array,
    *,
    mats: dict,
    consts: dict,
    n: int,
    rows: int,
    m: int,
    dt: float,
    steps: int,
    forcing_hat: Optional[Array],
    precision: str,
    interpret: Optional[bool],
    block_cols,
    flops_per_sample: int,
) -> Array:
    """Layout-agnostic core: state is ``(rows, m)``, physical grid ``n²``."""
    if w_hat.dtype != jnp.complex64:
        raise ValueError("fused rollout is fp32-only (complex64 state)")
    if precision not in ("highest", "high", "default"):
        raise ValueError(f"unknown precision {precision!r}")
    if interpret is None:
        # the container's TPU binds through the experimental "axon" platform
        # (CLAUDE.md) — both names are real Mosaic-compiling TPU backends
        interpret = jax.default_backend() not in ("tpu", "axon")

    lead = w_hat.shape[:-2]
    b = math.prod(lead) if lead else 1
    w = w_hat.reshape((b, rows, m))

    if block_cols == "auto":
        # Measured (results/galerkin_fused_crossover_r5.jsonl): the resident
        # layout fits and edges out 256-column tiles at 512² (3,822 vs 3,763
        # sample-steps/s b8); at 1024² only 128-column tiles fit the scoped
        # VMEM budget (256-column misses by 368 KiB) and they beat the
        # unfused galerkin path (648 vs 583 sample-steps/s b8).
        block_cols = None if n <= 512 else 128
    if block_cols is not None and n % block_cols:
        raise ValueError(f"block_cols={block_cols} must divide n={n}")

    dt_gammas = tuple(g * dt for g in _GAMMAS)
    kernel = functools.partial(
        _make_kernel(steps, consts["mus"], precision, block_cols), dt_gammas
    )

    # transform matrices, host-side pre-split to the kernel's precision
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16

    def _mat_args(mname):
        a = mats[mname]
        hi = a.astype(bf16)
        if precision == "default":
            return [jnp.asarray(hi)]
        r = a - hi.astype(np.float32)
        if precision == "highest":
            mid = r.astype(bf16)
            lo = (r - mid.astype(np.float32)).astype(bf16)
            return [jnp.asarray(hi), jnp.asarray(mid), jnp.asarray(lo)]
        lo = r.astype(bf16)
        return [jnp.asarray(hi), jnp.asarray(lo)]

    mat_inputs = [
        arr
        for name in ("inv_first_re", "inv_first_im", "inv_last_re",
                     "inv_last_im", "fwd_last_re", "fwd_last_im",
                     "fwd_first_re", "fwd_first_im")
        for arr in _mat_args(name)
    ]

    if forcing_hat is None:
        f_re = jnp.zeros((rows, m), jnp.float32)
        f_im = jnp.zeros((rows, m), jnp.float32)
    else:
        f_re = jnp.real(forcing_hat).astype(jnp.float32)
        f_im = jnp.imag(forcing_hat).astype(jnp.float32)

    sample = pl.BlockSpec((1, rows, m), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(  # noqa: E731 — local spec factory
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    # Mosaic's default scoped-VMEM (kernel stack) limit is 16 MiB — enough
    # for the ≤256² working set but not the 30.3 MiB the batched transforms
    # need at 512² (results/crossover_r4.jsonl.log). v5e has 128 MiB VMEM;
    # raising the limit for n>256 makes 512² compile without touching the
    # measured ≤256² operating points. The ALIGNED layout at 1024²
    # genuinely exceeds capacity even column-blocked (188 MiB with every
    # input window double-buffered) — and is FLOP-capped below the XLA
    # galerkin path there anyway; the galerkin-block layout is the 1024²
    # candidate.
    compiler_params = None
    if n > 256:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=(116 if n >= 1024 else 100) * 1024 * 1024
        )

    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[sample, sample]
        + [const2(a.shape) for a in mat_inputs]
        + [
            const2((rows, m)), const2((rows, m)),      # 2πkx, 2πky
            const2((rows, m)), const2((rows, m)), const2((rows, m)),
            const2((5, rows, m)),                      # stage denominators
            const2((rows, m)), const2((rows, m)),      # forcing re/im
        ],
        out_specs=(sample, sample),
        out_shape=(
            jax.ShapeDtypeStruct((b, rows, m), jnp.float32),
            jax.ShapeDtypeStruct((b, rows, m), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_sample,
            bytes_accessed=b * (4 * rows * m * 4),
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(
        jnp.real(w), jnp.imag(w), *mat_inputs,
        jnp.asarray(consts["tkx"]), jnp.asarray(consts["tky"]),
        jnp.asarray(consts["ilap"]), jnp.asarray(consts["filt"]),
        jnp.asarray(consts["lin"]), jnp.asarray(consts["dens"]),
        f_re, f_im,
    )
    out = jax.lax.complex(out_re, out_im)
    return out.reshape(lead + (rows, m)) if lead else out[0]
