"""Run a command once the TPU tunnel is healthy (CLAUDE.md gotcha 4c).

Probes with a subprocess trivial jit under a timeout; on failure
sleeps and re-probes until the budget runs out, then execs the given
command.

Usage: python scripts/when_healthy.py [--budget SECONDS] CMD [ARGS...]
"""
import os
import subprocess
import sys
import time


def probe(timeout=180.0):
    code = (
        'import numpy as np, jax, jax.numpy as jnp;'
        'np.asarray(jax.jit(lambda v: v + 0.0)(jnp.float32(1.0)))'
    )
    try:
        r = subprocess.run(
            [sys.executable, '-c', code], timeout=timeout,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0


def main():
    args = sys.argv[1:]
    budget = 5400.0
    if args and args[0] == '--budget':
        budget = float(args[1])
        args = args[2:]
    assert args, 'usage: when_healthy.py [--budget S] CMD [ARGS...]'
    deadline = time.monotonic() + budget
    while time.monotonic() < deadline:
        t0 = time.monotonic()
        if probe():
            print(f'# healthy after {time.monotonic() - t0:.0f}s probe',
                  file=sys.stderr, flush=True)
            os.execvp(args[0], args)
        print('# tunnel unhealthy; sleeping 60s', file=sys.stderr,
              flush=True)
        time.sleep(60)
    print('# budget exhausted, tunnel never healthy', file=sys.stderr)
    sys.exit(1)


if __name__ == '__main__':
    main()
