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

    # Keep foreign PJRT plugin shared libraries OUT of CPU-only test
    # processes: jax's plugin discovery imports + dlopens them even
    # when the platform is pinned to cpu, and a second compiler
    # runtime cohabiting with jaxlib's XLA:CPU intermittently
    # segfaults LLVM compilation deep into the suite (observed at
    # ~65% on this machine, crash in backend_compile_and_load).
    import sys
    import types
    for _name in ('axon', 'axon.register', 'axon.register.pjrt'):
        if _name not in sys.modules:
            _stub = types.ModuleType(_name)
            _stub.initialize = lambda: None
            sys.modules[_name] = _stub

import jax  # noqa: E402

if _PLATFORM == 'cpu':
    # Env vars may be snapshotted before this conftest runs (e.g. a
    # plugin imported jax first); config.update still works as long as
    # the backend has not been initialized.
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

jax.config.update('jax_threefry_partitionable', True)
