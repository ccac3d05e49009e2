import os

# Tests run on a virtual 8-device CPU mesh with x64 enabled, so sharding and
# f64 semantics are exercised without TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax may already have been imported by a pytest plugin with the ambient
# JAX_PLATFORMS (e.g. a TPU tunnel); force the CPU backend regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the multigrid/structured-matvec graphs dominate
# suite time through XLA:CPU compilation; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
