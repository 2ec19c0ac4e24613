"""Device meshes and sharding rules for data/tensor-parallel training.

There is no counterpart in the reference — it has no distributed code at all
(SURVEY.md §2.4: only ``.to(device)`` with a single device). This module is
the TPU-native design: a (data, model) mesh over ICI; batches shard on
``data`` (pure data parallelism — gradient psum inserted by XLA), and the
wide channel dimensions of SFNO/FNO weights shard on ``model`` (tensor
parallelism for large widths). Solver fields can additionally shard a
spatial axis on ``model`` for very large grids (pencil-decomposed FFTs via
XLA's all_to_all) — see ``shard_field_spatial``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Builds a (data, model) mesh over the available devices.

    ``model_parallel`` devices are grouped on the fast (adjacent) axis so
    tensor-parallel collectives ride neighboring ICI links; the rest is data
    parallel.
    """
    devices = jax.devices() if devices is None else list(devices)
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested n_devices={n_devices} but only {len(devices)}"
                f" device(s) are available: {devices}"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} does not divide {n} devices"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def shard_batch(batch: PyTree, mesh: Mesh, axis: str = "data") -> PyTree:
    """Device-puts a host batch with the leading dim sharded over ``axis``."""

    def _put(x):
        x = jnp.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree: PyTree, mesh: Mesh) -> PyTree:
    """Fully replicates a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree
    )


def sfno_param_spec(path: Tuple, leaf, mesh: Mesh) -> P:
    """Tensor-parallel partition spec for SFNO/FNO parameters.

    Shards the output-channel dimension of spectral corner blocks
    ``(*modes, c_i, c_o, 2)`` and of Dense kernels ``(c_i, c_o)`` over the
    ``model`` axis when divisible; everything else is replicated.
    """
    n_model = mesh.shape["model"]
    if n_model == 1:
        return P()
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    name = names[-1] if names else ""
    shape = leaf.shape
    if str(name).startswith("weight_") and len(shape) >= 3:
        # spectral block (*modes, c_i, c_o, 2): shard c_o
        if shape[-2] % n_model == 0:
            spec = [None] * len(shape)
            spec[-2] = "model"
            return P(*spec)
    if str(name) == "kernel" and len(shape) == 2 and shape[-1] % n_model == 0:
        return P(None, "model")
    return P()


def shard_params(params: PyTree, mesh: Mesh, spec_fn=sfno_param_spec) -> PyTree:
    """Places parameters on the mesh according to ``spec_fn``."""

    def _put(path, leaf):
        spec = spec_fn(path, leaf, mesh)
        return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_put, params)


def shard_field_spatial(
    field: jax.Array, mesh: Mesh, spatial_axis: int = -2, axis: str = "model"
) -> jax.Array:
    """Shards one spatial axis of a solver field over the mesh.

    For very large grids this pencil-decomposes the 2-D FFT: XLA lowers the
    per-axis FFTs with an all_to_all transpose between them (SURVEY.md §5).
    """
    spec = [None] * field.ndim
    spec[spatial_axis % field.ndim] = axis
    return jax.device_put(field, NamedSharding(mesh, P(*spec)))
