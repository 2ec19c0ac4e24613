"""Test configuration: force a virtual 8-device CPU mesh and enable x64.

The TPU framework is tested on CPU with 8 fake devices
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding tests
run anywhere; fp64 is enabled because the reference's numerical tolerances
(e.g. Helmholtz divergence < 1e-12) are fp64 contracts.
"""

import os

# Force-set: the environment (axon sitecustomize) presets JAX_PLATFORMS to
# the TPU tunnel, which would make every CPU-sized unit test dispatch over
# the network. Backends initialize lazily, so overriding here (before any
# jax.devices() call) is effective.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is too late: the axon sitecustomize imported jax (and set
# jax_platforms) at interpreter startup. The config update below still works
# because backends bind lazily on first jax.devices().
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
