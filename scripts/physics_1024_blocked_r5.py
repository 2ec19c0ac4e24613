"""On-chip physics check for the column-blocked Galerkin fused stepper at
1024² (round 5). `recommended_fft_impl` makes `dft_galerkin_fused` with
128-column tiles the DEFAULT at n≥1024 — this validates the Mosaic-compiled
blocked stage pipeline against the fp32 jnp.fft solver on the real chip,
the same warmed-state/100-step protocol that caught the round-4 silent
bf16-demotion bug in the fused "highest" path (RESULTS.md physics ladder).

The interpret-mode parity tests (tests/test_fused_step.py) already prove
the blocked math; this proves the Mosaic lowering of it, at the exact
(n, block_cols) the defaults ship.

Usage: python scripts/physics_1024_blocked_r5.py [--n 1024] [--batch 2]
Writes one JSON line per config to results/physics_1024_blocked_r5.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_cfd import grids
from tpu_cfd.solvers import equations, initial_conditions as ic

DT = 1e-4  # stable_time_step scale at 1024² (4x finer grid than 256²)
WARMUP = 200
STEPS = 100


def rel_l2(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def enstrophy(w):
    return float(0.5 * np.mean(np.asarray(w) ** 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--block-cols", type=int, default=128)
    args = ap.parse_args()

    grid = grids.Grid(
        (args.n, args.n), domain=((0, 2 * jnp.pi), (0, 2 * jnp.pi))
    )
    keys = jax.random.split(jax.random.PRNGKey(7), args.batch)
    w0 = jax.vmap(lambda k: ic.vorticity_field(k, grid, 4).data)(keys)

    def solver(impl, precision="high", fused=False, block_cols=None):
        return equations.NavierStokes2DSpectral(
            viscosity=1e-3, grid=grid, drag=0.1, fft_impl=impl,
            mxu_precision=precision, fused=fused,
            fused_block_cols=block_cols,
        )

    # warm the state with the fp32 fft reference so energy sits on the
    # resolved (post-2/3-rule) support and the comparison is physical
    ns_ref = solver("fft")
    warm = jax.jit(lambda w: ns_ref.forward(w, DT, steps=WARMUP)[0])
    fwd_ref = jax.jit(lambda w: ns_ref.forward(w, DT, steps=STEPS)[0])
    what0 = warm(jnp.fft.rfft2(w0))
    out_ref = np.asarray(jnp.fft.irfft2(fwd_ref(what0)))
    ens0 = enstrophy(np.asarray(jnp.fft.irfft2(what0)))
    ens_ref = enstrophy(out_ref)
    print(f"fft fp32 reference: enstrophy {ens0:.4e} -> {ens_ref:.4e}")

    out_path = "results/physics_1024_blocked_r5.jsonl"
    os.makedirs("results", exist_ok=True)
    configs = [
        ("dft_galerkin", "high", False, None),
        ("dft_galerkin", "high", True, args.block_cols),
        ("dft_galerkin", "highest", True, args.block_cols),
    ]
    # vs-fft measures Galerkin-truncation semantics (grows as n shrinks:
    # the fft path's state keeps viscously-decaying tail modes the Galerkin
    # block drops); vs the XLA galerkin solver is the kernel-correctness
    # signal — same math, Mosaic vs XLA lowering, roundoff-level expected
    out_gal = None
    with open(out_path, "a") as f:
        for impl, prec, fused, bc in configs:
            ns = solver(impl, prec, fused, bc)
            fwd = jax.jit(lambda w, ns=ns: ns.forward(w, DT, steps=STEPS)[0])
            out = np.asarray(jnp.fft.irfft2(fwd(what0)))
            if not fused:
                out_gal = out
            row = {
                "n": args.n, "impl": impl, "fused": fused,
                "precision": prec, "block_cols": bc if fused else None,
                "steps": STEPS, "finite": bool(np.isfinite(out).all()),
                "rel_l2_vs_fft": rel_l2(out, out_ref),
                "rel_l2_vs_xla_galerkin": (
                    rel_l2(out, out_gal) if fused else None),
                "enstrophy": enstrophy(out),
                "enstrophy_decayed": enstrophy(out) < ens0,
            }
            print(json.dumps(row))
            f.write(json.dumps(row) + "\n")
            f.flush()
    print(f"done -> {out_path}")


if __name__ == "__main__":
    main()
