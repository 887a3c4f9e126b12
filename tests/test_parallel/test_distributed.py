"""Multi-host (DCN) entry point: the two-process CPU dryrun.

Runs ``scripts/dcn_dryrun.py`` in fresh subprocesses (the current
test process already initialized a single-controller backend, and
``jax.distributed`` must run before backend init)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_two_process_cpu_dryrun():
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_PLATFORMS', None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'dcn_dryrun.py')],
        capture_output=True, timeout=500, env=env, cwd=REPO)
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert b'DCN DRYRUN OK' in out.stdout, out.stdout
