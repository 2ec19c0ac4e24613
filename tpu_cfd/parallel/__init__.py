"""Multi-chip parallelism: device meshes, shardings, parallel train steps.

The reference is single-device only (SURVEY.md §2.4); this package is the
TPU-native scale-out layer: a ``jax.sharding.Mesh`` is the framework's
"communication backend" — XLA inserts all collectives (psum for grads over
ICI, all_gather for eval) from the sharding annotations.
"""

from tpu_cfd.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_field_spatial,
    shard_params,
    replicate,
    sfno_param_spec,
)
