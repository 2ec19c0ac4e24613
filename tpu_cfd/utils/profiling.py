"""Profiling helpers: jax.profiler traces + named annotations.

The reference has no profiler integration (SURVEY.md §5: only a wall-clock
timer); this is the TPU-native observability layer: traces open in
TensorBoard/Perfetto and show per-op device time, HBM usage, and fusion
boundaries.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def profile_to(log_dir: str = "/tmp/tpu_cfd_trace"):
    """Captures a device trace for the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def trace_annotation(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_summary() -> str:
    """Human-readable live-buffer summary (replaces utils.dump_tensors)."""
    lines = []
    total = 0
    for arr in jax.live_arrays():
        nbytes = arr.size * arr.dtype.itemsize
        total += nbytes
        lines.append(f"{str(arr.dtype):>12} {str(arr.shape):>24} {nbytes/2**20:8.2f} MB")
    lines.append(f"{'total':>37} {total/2**20:8.2f} MB across {len(lines)} arrays")
    return "\n".join(lines)
