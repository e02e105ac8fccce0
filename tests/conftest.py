"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (the real TPU tunnel has one chip), and enable the persistent
compilation cache.

IMPORTANT: this sandbox's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (a remote-tunneled TPU), so environment variables set
here are too late -- we must use jax.config.update('jax_platforms', ...)
which works as long as no backend has been initialized yet.
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "4")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# Also export for any subprocesses the tests spawn.
if not os.environ.get("PALU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not os.environ.get("PALU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# XLA:CPU computes fp32 matmuls at reduced precision by default in some
# builds; numerics tests need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()} devices: {jax.device_count()}"
