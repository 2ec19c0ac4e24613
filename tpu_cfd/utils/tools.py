"""Determinism, timing, and introspection helpers (fno/utils.py counterpart)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def get_seed(s: int, printout: bool = True) -> jax.Array:
    """Full determinism setup (counterpart of fno/utils.py:16-53).

    JAX is deterministic by construction (explicit keys, no global RNG); this
    seeds numpy's global state for host-side shuffling and returns the master
    ``PRNGKey``.
    """
    np.random.seed(s)
    os.environ["PYTHONHASHSEED"] = str(s)
    key = jax.random.PRNGKey(s)
    if printout:
        lines = [
            f"np.random.seed({s})",
            f"key = jax.random.PRNGKey({s})",
            "derive per-sample keys with jax.random.fold_in(key, idx)",
        ]
        print("\n".join(lines))
    return key


@contextlib.contextmanager
def timer(label: str = "", verbose: bool = True):
    """Wall-clock (+host RSS delta when psutil is present) context manager.

    Counterpart of fno/utils.py:72-117. Blocks on all live device work at
    exit so the measured time covers asynchronous dispatches.
    """
    try:
        import psutil

        proc = psutil.Process()
        rss0 = proc.memory_info().rss
    except ImportError:
        proc = None
    t0 = time.perf_counter()
    result = {"seconds": None, "rss_mb": None}
    try:
        yield result
    finally:
        # drain async work so the timing is honest
        (jnp.zeros(()) + 0).block_until_ready()
        result["seconds"] = time.perf_counter() - t0
        if proc is not None:
            result["rss_mb"] = (proc.memory_info().rss - rss0) / 2**20
        if verbose:
            mem = (
                f" | ΔRSS {result['rss_mb']:+.1f} MB" if proc is not None else ""
            )
            print(f"[timer] {label}: {result['seconds']:.4f}s{mem}")


def get_num_params(params: Any) -> int:
    """Counts parameters; complex leaves count twice (fno/utils.py:186)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.complexfloating):
            n *= 2
        total += n
    return total


def get_size(params: Any) -> float:
    """Total parameter bytes in MB."""
    total = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, "size")
    )
    return total / 2**20


def get_config(obj: Any, logger=None) -> Dict[str, Any]:
    """Dumps an object's non-callable public attributes (fno/utils.py:194)."""
    config = {
        k: v
        for k, v in vars(obj).items()
        if not k.startswith("_") and not callable(v) and np.isscalar(v)
    } if hasattr(obj, "__dict__") else {}
    line = " | ".join(f"{k}={v}" for k, v in config.items())
    if logger is not None:
        logger.info(f"{type(obj).__name__}: {line}")
    else:
        print(f"{type(obj).__name__}: {line}")
    return config


def check_nan(tensor, tensor_name: str = "tensor"):
    """Raises if a field contains NaN (fno/utils.py:237).

    Host-side guard; inside jit use ``jax.debug.check`` /
    ``jax.config.update("jax_debug_nans", True)`` instead (SURVEY.md §5).
    """
    if bool(jnp.isnan(tensor).any()):
        raise ValueError(f"NaN detected in {tensor_name}")


def clones(module, n: int):
    """The torch ``clones`` helper has no JAX equivalent by design:

    flax modules are immutable configuration; parameters are made per-layer
    by ``init``. Returns n references to the same module definition.
    """
    return [module for _ in range(n)]
