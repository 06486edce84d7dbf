import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware.  The machine profile pins JAX_PLATFORMS to
# the tunneled TPU and the jaxtyping pytest plugin imports jax BEFORE this
# conftest, so the env var alone is not enough — force it through jax.config
# (safe while no backend has been initialised yet).
os.environ["JAX_PLATFORMS"] = "cpu"
# the production warm-up thread would add background kernel compiles to
# every tiny run_calling test; the ladders have their own dedicated tests
os.environ.setdefault("OCTOPUS_TPU_NO_WARM", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/octopus_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()


def pytest_configure(config):
    assert jax.default_backend() == "cpu", jax.default_backend()
