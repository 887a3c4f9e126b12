"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding paths are
exercised without TPU hardware) with x64 enabled so numeric parity
checks against float64 references are meaningful. Set
``PB_BSS_TPU_TEST_PLATFORM=tpu`` to run the suite on a real device
instead.
"""
import os

_PLATFORM = os.environ.get('PB_BSS_TPU_TEST_PLATFORM', 'cpu')

if _PLATFORM == 'cpu':
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8'
        ).strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402
import pytest  # noqa: E402

if _PLATFORM == 'cpu':
    # Env vars may be snapshotted before this conftest runs (e.g. a
    # plugin imported jax first); config.update still works as long as
    # the backend has not been initialized.
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

jax.config.update('jax_threefry_partitionable', True)

# Persistent XLA compilation cache: the suite is compile-bound (one
# core, hundreds of distinct jit programs), and warm reruns skip the
# backend compile entirely — measured 2.1x on the spatial-model tier.
# Opt out with PB_BSS_TPU_TEST_COMPILE_CACHE=0 (e.g. when bisecting
# XLA itself). The directory is keyed by jax version automatically, so
# upgrades never read stale executables.
if os.environ.get('PB_BSS_TPU_TEST_COMPILE_CACHE', '1') != '0':
    _cache_dir = os.environ.get(
        'JAX_COMPILATION_CACHE_DIR',
        os.path.join(os.path.dirname(__file__), '..',
                     '.jax_compile_cache'))
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.2)
    jax.config.update(
        'jax_persistent_cache_enable_xla_caches', 'none')


@pytest.fixture(autouse=True)
def _bound_mmap_regions():
    """Keep the process below ``vm.max_map_count``.

    Every live XLA:CPU compiled executable holds ~3 mmap regions; a
    full suite run accumulates thousands of executables and crosses
    the kernel's per-process mapping limit (65530 here) around test
    ~340, at which point LLVM's JIT segfaults inside
    ``backend_compile_and_load`` (measured: the process died at 65141
    regions; the crash position is constant across suite compositions
    because it tracks cumulative compilation count, not any specific
    test). Dropping jax's compilation caches when the count gets high
    releases the mappings (measured 1367 -> 469 after 300 compiles);
    a few cheap recompiles beat a segfault.
    """
    yield
    try:
        count = sum(1 for _ in open('/proc/self/maps'))
    except OSError:  # non-Linux
        return
    if count > 40_000:
        jax.clear_caches()
