"""Sanity: tests must run on the virtual 8-device CPU mesh, not the TPU tunnel."""
import jax


def test_cpu_backend_with_8_devices():
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()


class TestProfilingHelpers:
    """profiling.py is load-bearing (bench.py --trace); keep it working."""

    def test_profile_to_writes_trace(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from tpu_cfd.utils import profiling

        with profiling.profile_to(str(tmp_path / "trace")) as d:
            with profiling.trace_annotation("smoke"):
                x = jax.jit(lambda a: a * 2)(jnp.ones((8, 8)))
                jax.block_until_ready(x)
        import glob

        files = glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)
        assert files, "profiler trace produced no files"

    def test_device_memory_summary(self):
        import jax.numpy as jnp

        from tpu_cfd.utils import profiling

        keep = jnp.ones((16, 16))
        s = profiling.device_memory_summary()
        assert "total" in s and "MB" in s
        del keep
