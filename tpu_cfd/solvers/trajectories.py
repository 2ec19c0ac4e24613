"""Trajectory rollout and standalone spectral kernels (CN-IMEX, residual).

TPU-native counterpart of the reference's ``fno/data_gen/solvers.py``
(backdiff: solvers.py:19, update_residual: :49, imex_crank_nicolson_step:
:91, get_trajectory_imex: :191, get_trajectory_imex_crank_nicolson: :268).

The reference's Python recording loop becomes a single ``lax.scan`` whose
carry is the spectral state and whose outputs are the thinned records
(vorticity/stream/∂t-vorticity/residual), so an entire batched trajectory is
one compiled program. These kernels are also differentiable and are reused by
the fine-tuning pipeline (SURVEY.md §3.4: fine-tuning differentiates through
the same CN solver used for data generation).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_cfd.ops.spectral import vorticity_to_velocity
from tpu_cfd.solvers.equations import ImplicitExplicitODE

Array = jax.Array

_BDF_WEIGHTS = {
    1: [1, -1],
    2: [3 / 2, -2, 0.5],
    3: [11 / 6, -3, 3 / 2, -1 / 3],
    4: [25 / 12, -4, 3, -4 / 3, 1 / 4],
    5: [137 / 60, -5, 5, -10 / 3, 5 / 4, -1 / 5],
}


def backdiff(x: Array, order: int = 3) -> Array:
    """BDF(order) backward difference over the last axis (solvers.py:19)."""
    if order > 5:
        raise NotImplementedError("only bdf order <= 5 is implemented")
    weights = jnp.asarray(_BDF_WEIGHTS[order], dtype=x.real.dtype)
    x_t = jnp.flip(x[..., -(order + 1):], axis=-1) * weights
    return x_t.sum(-1)


def default_rfft_mesh(n: int, diam: float = 1.0, dtype=jnp.float32):
    k = jnp.fft.fftfreq(n, d=diam / n).astype(dtype)
    kx, ky = jnp.meshgrid(k, k, indexing="ij")
    k_max = n // 2
    return kx[..., : k_max + 1], ky[..., : k_max + 1]


def spectral_laplacian_guarded(rfftmesh) -> Array:
    kx, ky = rfftmesh
    lap = -4 * (jnp.pi**2) * (kx**2 + ky**2)
    return lap.at[..., 0, 0].set(1.0)


def default_dealias_filter(kx: Array, ky: Array, n: int) -> Array:
    """Boolean 2/3-rule mask used by the CN kernels (solvers.py:143-147)."""
    k_max = n // 2
    return jnp.logical_and(
        jnp.abs(ky) <= (2.0 / 3.0) * k_max,
        jnp.abs(kx) <= (2.0 / 3.0) * k_max,
    )


def update_residual(
    w_h: Array,
    w_h_t: Array,
    f_h: Array,
    visc: float,
    rfftmesh: Tuple[Array, Array],
    laplacian: Array,
    dealias_filter: Optional[Array] = None,
    dealias: bool = True,
) -> Array:
    """NSE residual in rfft2 space: ŵ_t + (v·∇w)^ - ν Δ̂ ŵ - f̂ (solvers.py:49).

    Shapes: (..., n, n//2+1); differentiable (used as a fine-tuning loss term).
    """
    n = w_h.shape[-2]
    kx, ky = rfftmesh
    psi_h = -w_h / laplacian

    specs = jnp.stack(
        [
            2 * jnp.pi * ky * 1j * psi_h,
            -2.0 * jnp.pi * kx * 1j * psi_h,
            2.0 * jnp.pi * kx * 1j * w_h,
            2.0 * jnp.pi * ky * 1j * w_h,
        ]
    )
    u, v, w_x, w_y = jnp.fft.irfft2(specs, s=(n, n))
    convection_h = jnp.fft.rfft2(u * w_x + v * w_y)
    if dealias and dealias_filter is not None:
        convection_h = dealias_filter * convection_h
    return w_h_t + convection_h - visc * laplacian * w_h - f_h


def imex_crank_nicolson_step(
    w: Array,
    f: Array,
    visc: float,
    delta_t: float,
    diam: float = 1.0,
    rfftmesh: Optional[Tuple[Array, Array]] = None,
    laplacian: Optional[Array] = None,
    dealias_filter: Optional[Array] = None,
    dealias: bool = False,
) -> Tuple[Array, Array, Array, Array, Array]:
    """One Crank-Nicolson IMEX update in rfft2 space (solvers.py:91-188).

    Inputs/outputs in the frequency domain, shapes (..., n, n//2+1).

    Returns (w_next, dw/dt, w, ψ̂, residual).
    """
    size = w.shape
    assert (size[-1] - 1) * 2 == size[-2], "input must be an rfft2 spectrum"
    n = size[-2]

    if rfftmesh is None:
        rfftmesh = default_rfft_mesh(n, diam, dtype=w.real.dtype)
    kx, ky = rfftmesh

    if laplacian is None:
        laplacian = spectral_laplacian_guarded((kx, ky))
    if dealias_filter is None:
        dealias_filter = default_dealias_filter(kx, ky, n)

    psi_h = -w / laplacian
    specs = jnp.stack(
        [
            2 * jnp.pi * ky * 1j * psi_h,
            -2.0 * jnp.pi * kx * 1j * psi_h,
            2.0 * jnp.pi * kx * 1j * w,
            2.0 * jnp.pi * ky * 1j * w,
        ]
    )
    u, v, w_x, w_y = jnp.fft.irfft2(specs, s=(n, n))
    convection_h = jnp.fft.rfft2(u * w_x + v * w_y)
    if dealias:
        convection_h = dealias_filter * convection_h

    w_next = (
        -delta_t * convection_h
        + delta_t * f
        + (1.0 + 0.5 * delta_t * visc * laplacian) * w
    ) / (1.0 - 0.5 * delta_t * visc * laplacian)

    dwdt = (w_next - w) / delta_t
    res_h = dwdt + convection_h - visc * laplacian * w - f
    return w_next, dwdt, w, psi_h, res_h


_ALL_TRAJECTORY_FIELDS = ("vorticity", "stream", "vort_t", "residual")


def get_trajectory_imex(
    equation: ImplicitExplicitODE,
    w0: Array,
    dt: float,
    num_steps: int = 1,
    record_every_steps: int = 1,
    fields: Tuple[str, ...] = _ALL_TRAJECTORY_FIELDS,
) -> Dict[str, Array]:
    """Rolls out ``equation`` from ŵ0 and records thinned spectral snapshots.

    Counterpart of reference solvers.py:191-265, with the Python loop replaced
    by one ``lax.scan``: the first record lands after 1 step and subsequent
    records land every ``record_every_steps`` (matching the reference's
    ``t_step % record_every_steps == 0`` schedule). All inputs/outputs stay in
    the frequency domain; time is stacked on axis -3.

    ``fields`` selects which of (vorticity, stream, vort_t, residual) the
    scan carries — unselected fields are neither computed nor buffered, which
    matters on HBM: a 256² batch-128 rollout records 3.4 GB PER FIELD.

    Returns a dict with one ``(..., n_records, kx, ky)`` entry per field.
    """
    num_records = -(-num_steps // record_every_steps)  # ceil
    unknown = set(fields) - set(_ALL_TRAJECTORY_FIELDS)
    if unknown:
        raise ValueError(f"unknown trajectory fields {sorted(unknown)}")

    def record(w, dwdt):
        rec = {}
        if "vorticity" in fields:
            rec["vorticity"] = w
        if "stream" in fields:
            _, psi = vorticity_to_velocity(equation.grid, w)
            rec["stream"] = psi
        if "vort_t" in fields:
            rec["vort_t"] = dwdt
        if "residual" in fields:
            rec["residual"] = equation.residual(w, dwdt)
        return rec

    # first record: one step in
    w1, dwdt1 = equation.forward(w0, dt, steps=1)
    rec0 = record(w1, dwdt1)

    def chunk(w, _):
        w_next, dwdt = equation.forward(w, dt, steps=record_every_steps)
        return w_next, record(w_next, dwdt)

    if num_records > 1:
        _, recs = jax.lax.scan(chunk, w1, None, length=num_records - 1)
        stacked = {
            k: jnp.concatenate([rec0[k][None], recs[k]], axis=0) for k in rec0
        }
    else:
        stacked = {k: v[None] for k, v in rec0.items()}

    # scan stacks time on the leading axis; move it to -3 (reference layout)
    return {k: jnp.moveaxis(s, 0, -3) for k, s in stacked.items()}


def get_trajectory_imex_chunked(
    equation: ImplicitExplicitODE,
    w0: Array,
    dt: float,
    num_steps: int,
    record_every_steps: int = 1,
    fields: Tuple[str, ...] = _ALL_TRAJECTORY_FIELDS,
    records_per_chunk: Optional[int] = None,
    postprocess=None,
    mesh=None,
):
    """:func:`get_trajectory_imex` split into bounded device programs.

    Produces the exact same record schedule (first record 1 step in, then
    every ``record_every_steps``), but runs at most ``records_per_chunk``
    records per compiled program and host-syncs between chunks. Two reasons:
    (a) this environment's device tunnel kills single programs running more
    than a few minutes, and a full 256² warmup+rollout is ~10⁴ steps;
    (b) ``postprocess`` (e.g. irfft2 + spatial subsample) runs INSIDE each
    chunk program, so full-resolution spectral records never accumulate on
    the device — HBM holds one chunk instead of the whole trajectory.

    ``mesh``: optional ``jax.sharding.Mesh``; when given, each chunk program
    is wrapped in ``shard_map`` over the mesh's "data" axis (the leading
    batch dim of ``w0``, which must be divisible by the axis size). This is
    REQUIRED to scale rollouts whose step is a ``pallas_call`` — XLA's SPMD
    partitioner cannot split one, so a fused stepper under plain jit would
    gather the whole batch to one device — and harmless for XLA steps
    (every per-chunk op is batch-elementwise; no cross-sample collectives).

    Returns (records dict as stacked host numpy arrays, final ŵ).
    """
    import numpy as np

    num_records = -(-num_steps // record_every_steps)
    rpc = num_records if records_per_chunk is None else records_per_chunk

    if mesh is not None:
        n_dev = mesh.shape["data"]
        if w0.ndim < 3 or w0.shape[0] % n_dev != 0:
            raise ValueError(
                f"sharded rollout needs a leading batch divisible by the "
                f"data axis ({n_dev}); got state shape {w0.shape}"
            )

    def chunk_body(w, n_recs, lead_steps):
        # first record lands ``lead_steps`` in (1 for the first chunk, else
        # record_every_steps), the remaining n_recs-1 every record_every_steps
        w, dwdt = equation.forward(w, dt, steps=lead_steps)

        def body(w, _):
            w2, dwdt2 = equation.forward(w, dt, steps=record_every_steps)
            return w2, (w2, dwdt2)

        if n_recs > 1:
            w_final, (ws, dwdts) = jax.lax.scan(body, w, None, length=n_recs - 1)
            ws = jnp.concatenate([w[None], ws], axis=0)
            dwdts = jnp.concatenate([dwdt[None], dwdts], axis=0)
        else:
            w_final, ws, dwdts = w, w[None], dwdt[None]
        traj = _stack_records(equation, ws, dwdts, fields)
        if postprocess is not None:
            traj = postprocess(traj)
        return w_final, traj

    @partial(jax.jit, static_argnums=(1, 2))
    def run_chunk(w, n_recs, lead_steps):
        if mesh is None:
            return chunk_body(w, n_recs, lead_steps)
        from jax.sharding import PartitionSpec as P

        # every output (final state AND records) keeps batch at axis 0:
        # _stack_records moves time to -3 before returning. check_vma off:
        # pallas_call out_shapes carry no varying-mesh-axes annotation, so
        # the vma check cannot see through a fused kernel (same pattern as
        # __graft_entry__'s fused step)
        return jax.shard_map(
            lambda w_: chunk_body(w_, n_recs, lead_steps),
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P("data"),
            check_vma=False,
        )(w)

    chunks = []
    w = w0
    remaining = num_records
    first = True
    while remaining > 0:
        n = min(rpc, remaining)
        w, recs = run_chunk(w, n, 1 if first else record_every_steps)
        chunks.append(jax.device_get(recs))
        first = False
        remaining -= n
    out = {
        k: np.concatenate([c[k] for c in chunks], axis=-3) for k in chunks[0]
    }
    return out, w


def _stack_records(equation, ws, dwdts, fields):
    """Time-major (t, ..., kx, ky) scan outputs -> records dict, time at -3."""
    rec = {}
    if "vorticity" in fields:
        rec["vorticity"] = ws
    if "stream" in fields:
        _, psi = vorticity_to_velocity(equation.grid, ws)
        rec["stream"] = psi
    if "vort_t" in fields:
        rec["vort_t"] = dwdts
    if "residual" in fields:
        rec["residual"] = equation.residual(ws, dwdts)
    return {k: jnp.moveaxis(v, 0, -3) for k, v in rec.items()}


def get_trajectory_imex_crank_nicolson(
    w0: Array,
    f: Array,
    visc: float = 1e-3,
    T: float = 10.0,
    delta_t: float = 1e-3,
    record_steps: int = 100,
    diam: float = 1.0,
    dealias: bool = True,
    subsample: int = 1,
) -> Dict[str, Array]:
    """Self-contained CN-IMEX rollout (legacy path, solvers.py:268-448).

    ``w0``/``f`` are physical-space fields (..., n, n); outputs are
    physical-space records with time on axis -3.
    """
    n = w0.shape[-1]
    total_steps = math.ceil(T / delta_t)
    record_every = max(1, total_steps // record_steps)

    w_h = jnp.fft.rfft2(w0)
    f_h = jnp.fft.rfft2(f.astype(w0.dtype))
    rfftmesh = default_rfft_mesh(n, diam, dtype=w0.dtype)
    laplacian = spectral_laplacian_guarded(rfftmesh)
    dealias_filter = default_dealias_filter(*rfftmesh, n)

    step_fn = partial(
        imex_crank_nicolson_step,
        f=f_h,
        visc=visc,
        delta_t=delta_t,
        rfftmesh=rfftmesh,
        laplacian=laplacian,
        dealias_filter=dealias_filter,
        dealias=dealias,
    )

    def inner(w, _):
        w_next, *_ = step_fn(w)
        return w_next, None

    def chunk(w, _):
        w, _ = jax.lax.scan(inner, w, None, length=record_every - 1)
        w_next, dwdt, _, psi_h, res_h = step_fn(w)
        sl = (Ellipsis, slice(None, None, subsample), slice(None, None, subsample))
        rec = (
            jnp.fft.irfft2(w_next, s=(n, n))[sl],
            jnp.fft.irfft2(psi_h, s=(n, n))[sl],
            jnp.fft.irfft2(dwdt, s=(n, n))[sl],
            jnp.fft.irfft2(res_h, s=(n, n))[sl],
        )
        return w_next, rec

    _, recs = jax.lax.scan(chunk, w_h, None, length=record_steps)
    out = tuple(jnp.moveaxis(r, 0, -3) for r in recs)
    return dict(zip(["vorticity", "stream", "vort_t", "residual"], out))
