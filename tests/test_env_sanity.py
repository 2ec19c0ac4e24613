"""Sanity: tests must run on the virtual 8-device CPU mesh, not the TPU tunnel."""
import jax


def test_cpu_backend_with_8_devices():
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()
