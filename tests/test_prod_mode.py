"""Production-mode (x64 OFF) regression lane.

The whole test suite runs with x64 enabled (tests/conftest.py), which
hides dtype-contract bugs: jnp.asarray silently downcasts f64 -> f32
when x64 is off, so an assert placed after the conversion can never
pass in a production process even when the caller honored the f64
input contract (the r5 si_sdr facade bug). This lane runs the full
package-surface smoke in a SUBPROCESS with default (x64-off) JAX
config — exactly what any non-test process sees.
"""
import os
import pathlib
import subprocess
import sys

import pytest

_SCRIPT = pathlib.Path(__file__).parent.parent / 'scripts' / \
    'prod_smoke.py'


@pytest.mark.slow
def test_package_surfaces_in_x64_off_process():
    env = dict(os.environ)
    # the script pins jax_platforms to cpu itself; make sure no
    # ambient x64 flag leaks in
    env.pop('JAX_ENABLE_X64', None)
    r = subprocess.run(
        [sys.executable, str(_SCRIPT)], env=env, timeout=1500,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    out = r.stdout.decode(errors='replace')
    assert r.returncode == 0, out[-3000:]
    assert '18 surfaces OK' in out, out[-3000:]
