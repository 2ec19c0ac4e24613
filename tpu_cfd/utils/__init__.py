"""Utilities: determinism, timing, parameter counting, config introspection.

TPU-native counterpart of the reference's ``fno/utils.py`` (get_seed:
utils.py:16-53, timer: :72-117, get_num_params: :186, get_config: :194,
check_nan: :237, clones: :215). Device-memory inspection (the reference's
``dump_tensors``, utils.py:141) maps to ``jax.live_arrays`` /
``device_memory_profile``.
"""

from tpu_cfd.utils.tools import (
    check_nan,
    get_config,
    get_num_params,
    get_seed,
    get_size,
    timer,
)
from tpu_cfd.utils.profiling import trace_annotation, profile_to
