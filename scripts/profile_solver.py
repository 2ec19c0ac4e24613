"""Component-level microbenchmark of the RK4-CN spectral solver hot loop.

Diagnoses VERDICT.md round-2 weak #2: the data-gen operating point (batch
128) measured 38% SLOWER per sample-step than batch 8. Times each candidate
bottleneck at both batch sizes by chaining iterations inside ONE jitted
``lax.scan`` (the device tunnel memoizes identical dispatches and
``block_until_ready`` under-reports — CLAUDE.md timing rule), and optionally
captures a ``jax.profiler`` trace of the full step.

Usage (real TPU):
  python scripts/profile_solver.py [--batches 8,128] [--trace]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_cfd import grids
from tpu_cfd.solvers import equations, initial_conditions as ic
from tpu_cfd.utils import profiling


def chain_scan(body, w0, iters):
    """Times ``iters`` chained applications of body inside one lax.scan."""

    @jax.jit
    def run(w):
        def f(carry, _):
            return body(carry), None

        out, _ = jax.lax.scan(f, w, None, length=iters)
        return out

    out = run(w0)  # compile + warmup
    chk = float(jnp.abs(out).max())
    assert np.isfinite(chk), "diverged during warmup"
    t0 = time.perf_counter()
    out = run(w0)
    chk = float(jnp.abs(out).max())  # host fetch forces completion
    dt = time.perf_counter() - t0
    assert np.isfinite(chk)
    print(f"  [{time.strftime('%H:%M:%S')}] {dt/iters*1e3:9.3f} ms/op",
          flush=True)
    return dt / iters


def make_state(n, batch):
    grid = grids.Grid((n, n), domain=((0, 2 * jnp.pi), (0, 2 * jnp.pi)))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    w0 = jax.vmap(lambda k: ic.vorticity_field(k, grid, 4).data)(keys)
    ns = equations.NavierStokes2DSpectral(viscosity=1e-3, grid=grid)
    return grid, ns, jnp.fft.rfft2(w0)


def scaling_mode(n, batch, impl="fft", precision="highest",
                 block_cols="auto"):
    """Separates per-CALL dispatch latency from per-ITERATION device time by
    timing scan programs of several lengths: t(call) = a + len * b."""
    grid, ns, what = make_state(n, batch)
    fused = impl.endswith("_fused")
    if impl != "fft":
        ns = equations.NavierStokes2DSpectral(
            viscosity=1e-3, grid=grid,
            fft_impl=impl[: -len("_fused")] if fused else impl,
            mxu_precision=precision, fused=fused,
            fused_block_cols=block_cols,
        )
        what = ns._align(what)
    dt = 1e-3

    def timed_call(length, reps=4):
        if fused:
            # the fused kernel IS the steps loop (one pallas_call per chunk);
            # forward on an aligned input returns the aligned layout, so
            # calls chain exactly like the scan below
            @jax.jit
            def run(w):
                return ns.forward(w, dt, steps=length)[0]
        else:
            @jax.jit
            def run(w):
                out, _ = jax.lax.scan(
                    lambda c, _: (ns.solver(c, dt, ns), None), w, None,
                    length=length,
                )
                return out

        out = run(what)
        _ = float(jnp.abs(out).max())
        t0 = time.perf_counter()
        w = what
        for _ in range(reps):
            w = run(w)
        _ = float(jnp.abs(w).max())
        return (time.perf_counter() - t0) / reps

    # two lengths = exact 2-point fit; keeps remote compiles to a minimum
    lengths = [16, 128]
    times = [timed_call(L) for L in lengths]
    # least-squares fit t = a + L*b
    A = np.stack([np.ones(len(lengths)), np.asarray(lengths)], 1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(times), rcond=None)
    a, b = coef
    print(json.dumps({
        "impl": impl, "n": n, "batch": batch, "precision": precision,
        **({"block_cols": block_cols} if fused and block_cols != "auto"
           else {}),
        "per_call_overhead_ms": round(a * 1e3, 2),
        "per_step_device_ms": round(b * 1e3, 3),
        "sample_steps_per_s_device": round(batch / b, 0),
        "raw": {str(L): round(t * 1e3, 2) for L, t in zip(lengths, times)},
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,128")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--trace", action="store_true",
                    help="capture a jax.profiler trace of the full step")
    ap.add_argument("--scaling", action="store_true",
                    help="fit per-call overhead vs per-step device time")
    ap.add_argument("--impl", default="fft",
                    choices=["fft", "dft", "dft_aligned", "dft_galerkin",
                             "dft_aligned_fused", "dft_galerkin_fused"])
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--block-cols", default="auto",
                    help="fused kernel physical-column tile width: 'auto', "
                         "'none' (resident), or an int")
    args = ap.parse_args()
    bc = args.block_cols
    if bc not in ("auto",):
        bc = None if bc.lower() == "none" else int(bc)

    if args.scaling:
        for batch in [int(b) for b in args.batches.split(",")]:
            scaling_mode(args.n, batch, args.impl, args.precision, bc)
        return

    n = args.n
    results = {}
    for batch in [int(b) for b in args.batches.split(",")]:
        grid, ns, what = make_state(n, batch)
        dt = 1e-3
        iters = max(10, args.iters // (batch // 8 if batch > 8 else 1))
        row = {}

        # full RK4-CN step (5 stages)
        row["full_step"] = chain_scan(lambda w: ns.solver(w, dt, ns), what, iters)

        # one explicit_terms evaluation (4 irfft2 + 1 rfft2 + pointwise)
        row["explicit_terms"] = chain_scan(
            lambda w: ns.explicit_terms(w) * (dt * 0.1) + w, what, iters
        )

        # the stacked 4-field irfft2 + rfft2 round trip exactly as the
        # solver issues it
        def roundtrip_stack4(w):
            specs = jnp.stack([w, w * 0.5, w * 0.25, w * 0.125])
            phys = jnp.fft.irfft2(specs, s=grid.shape)
            back = jnp.fft.rfft2(phys[0] * phys[1] + phys[2] * phys[3])
            return w + 0.0 * back

        row["stack4_roundtrip"] = chain_scan(roundtrip_stack4, what, iters)

        # single-field round trip (no stacking)
        def roundtrip1(w):
            phys = jnp.fft.irfft2(w, s=grid.shape)
            return w + 0.0 * jnp.fft.rfft2(phys * phys)

        row["single_roundtrip"] = chain_scan(roundtrip1, what, iters)

        # 4 separate irfft2 calls instead of one stacked call
        def roundtrip_sep4(w):
            a = jnp.fft.irfft2(w, s=grid.shape)
            b = jnp.fft.irfft2(w * 0.5, s=grid.shape)
            c = jnp.fft.irfft2(w * 0.25, s=grid.shape)
            d = jnp.fft.irfft2(w * 0.125, s=grid.shape)
            return w + 0.0 * jnp.fft.rfft2(a * b + c * d)

        row["sep4_roundtrip"] = chain_scan(roundtrip_sep4, what, iters)

        # full-spectrum complex fft2/ifft2 round trip (lane-aligned 256,
        # no rfft half-spectrum padding) for comparison
        wfull = jnp.fft.fft2(jnp.fft.irfft2(what, s=grid.shape))

        def roundtrip_full(w):
            phys = jnp.real(jnp.fft.ifft2(w))
            return w + 0.0 * jnp.fft.fft2(phys * phys)

        row["fullfft_roundtrip"] = chain_scan(roundtrip_full, wfull, iters)

        # pointwise-only (implicit solve shape)
        row["pointwise"] = chain_scan(
            lambda w: 1.0 / (1 - dt * ns.linear_term) * w, what, iters
        )

        # dense-DFT MXU path (ops/dft2d.py): the same stack-4 round trip
        # and the full step with fft_impl="dft"
        from tpu_cfd.ops import dft2d

        def dft_roundtrip_stack4(w):
            specs = jnp.stack([w, w * 0.5, w * 0.25, w * 0.125])
            phys = dft2d.irfft2_matmul(specs)
            back = dft2d.rfft2_matmul(phys[0] * phys[1] + phys[2] * phys[3])
            return w + 0.0 * back

        row["dft_stack4_roundtrip"] = chain_scan(dft_roundtrip_stack4, what, iters)

        ns_dft = equations.NavierStokes2DSpectral(
            viscosity=1e-3, grid=grid, fft_impl="dft"
        )
        row["full_step_dft"] = chain_scan(
            lambda w: ns_dft.solver(w, dt, ns_dft), what, iters
        )

        results[f"b{batch}"] = {k: round(v * 1e3, 3) for k, v in row.items()}
        for key, src in (("sample_steps_per_s", "full_step"),
                         ("sample_steps_per_s_dft", "full_step_dft")):
            results[f"b{batch}"][key] = round(batch / row[src], 0)

        if args.trace:
            step = jax.jit(lambda w: ns.solver(w, dt, ns))
            _ = jax.block_until_ready(step(what))
            with profiling.profile_to(f"/tmp/tpu_cfd_trace_b{batch}") as d:
                out = step(what)
                for _ in range(4):
                    out = step(out)
                jax.block_until_ready(out)
            print(f"trace for b{batch} written to {d}")

    print(json.dumps({"n": n, "units": "ms per op (full_step = ms/solver-step)",
                      **results}, indent=1))


if __name__ == "__main__":
    main()
