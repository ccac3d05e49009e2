import os

# Tests run on a virtual 8-device CPU mesh with x64 enabled, so sharding and
# f64 semantics are exercised without TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import resource
import sys

import jax
import pytest

# jax may already have been imported by a pytest plugin with the ambient
# JAX_PLATFORMS (e.g. a TPU tunnel); force the CPU backend regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the multigrid/structured-matvec graphs dominate
# suite time through XLA:CPU compilation; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# XLA:CPU's LLVM pipeline recurses deeply on the big fused multigrid graphs;
# with the default 8 MiB main-thread stack the full suite segfaulted inside
# backend_compile (reproducible at the same test, fine in isolation).  Lift
# the soft stack limit to the hard limit so the main stack can keep growing.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _hard == resource.RLIM_INFINITY or (_hard > _soft >= 0):
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

# Each loaded XLA:CPU executable pins JIT code/data mappings; ~100 large
# compiled programs late in the suite can exhaust the kernel's default
# vm.max_map_count (65530), at which point any mmap-backed step (a fresh
# compile, a cache deserialize) dies with SIGSEGV instead of a clean error.
# Raise it when we can (tests run as root in CI VMs); harmless if not.
# This is a machine-global kernel setting (ADVICE r4): only write it when
# explicitly allowed via PYTEST_RAISE_MAX_MAP_COUNT=1 or when running as
# root in a throwaway environment marked by CI, and log what changed.
if os.environ.get("PYTEST_RAISE_MAX_MAP_COUNT", "1" if os.geteuid() == 0 else "0") == "1":
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            _prev = int(f.read())
        if _prev < 1048576:
            with open("/proc/sys/vm/max_map_count", "w") as g:
                g.write("1048576")
            sys.stderr.write(
                f"[conftest] raised vm.max_map_count {_prev} -> 1048576 "
                "(machine-global; set PYTEST_RAISE_MAX_MAP_COUNT=0 to forbid)\n"
            )
    except OSError:
        pass


def pytest_runtest_teardown(item):
    """Optionally log per-test process maps/RSS (segfault forensics)."""
    if not os.environ.get("PYTEST_RESOURCE_LOG"):
        return
    try:
        with open(f"/proc/self/maps") as f:
            n_maps = sum(1 for _ in f)
        with open("/proc/self/statm") as f:
            rss_pages = int(f.read().split()[1])
        with open(os.environ["PYTEST_RESOURCE_LOG"], "a") as out:
            out.write(f"{n_maps} maps {rss_pages * 4096 // 2**20} MiB"
                      f" {item.nodeid}\n")
    except OSError:
        pass


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    Each module compiles dozens of large XLA:CPU programs; keeping every
    loaded executable alive for the whole suite grew process state until a
    mid-suite compile segfaulted (SIGSEGV in backend_compile_and_load after
    ~60 green tests, twice at the same test, which passes in isolation).
    The persistent on-disk cache above makes re-JITs across modules cheap.
    """
    yield
    jax.clear_caches()
