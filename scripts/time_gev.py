"""Time the fused Pallas GEV kernel vs the staged XLA path on the
real TPU (honest protocol: distinct pre-staged inputs, derived-scalar
fetch; see bench.py / CLAUDE.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
    print(f'probe ok {time.perf_counter() - t0:.1f}s', flush=True)
    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (c @ c, None), x, None, length=4)[0].sum())(
            jnp.eye(64, dtype=jnp.float32)))
    print(f'warmup ok {time.perf_counter() - t0:.1f}s', flush=True)

    from pb_bss_tpu.ops.linalg import gev_max_eigvec

    F, D = 513, 6
    rng = np.random.default_rng(0)
    fetch = jax.jit(lambda v: v + 0.0)

    def make(batch=()):
        a = (rng.standard_normal((*batch, F, D, D))
             + 1j * rng.standard_normal((*batch, F, D, D)))
        xx = a @ a.conj().swapaxes(-1, -2) + 0.1 * np.eye(D)
        b = (rng.standard_normal((*batch, F, D, D))
             + 1j * rng.standard_normal((*batch, F, D, D)))
        nn = b @ b.conj().swapaxes(-1, -2) + 0.5 * np.eye(D)
        return (jnp.asarray(xx.real, jnp.float32),
                jnp.asarray(xx.imag, jnp.float32),
                jnp.asarray(nn.real, jnp.float32),
                jnp.asarray(nn.imag, jnp.float32))

    def timed(fn, inputs, reps):
        _ = np.asarray(fetch(fn(*inputs[0])))  # compile + warm
        start = time.perf_counter()
        acc = sum(fn(*i) for i in inputs[:reps])
        _ = np.asarray(fetch(acc))
        return (time.perf_counter() - start) / reps

    for method in ('pallas', 'xla'):
        for batch, reps in (((), 8), ((8,), 4)):
            inputs = [make(batch) for _ in range(reps)]

            def gev(xxr, xxi, nnr, nni, _m=method):
                beam = gev_max_eigvec(
                    xxr + 1j * xxi, nnr + 1j * nni, method=_m)
                return jnp.sum(jnp.real(beam * beam.conj()))

            gev = jax.jit(gev)
            t0 = time.perf_counter()
            dt = timed(gev, inputs, reps)
            per = dt / (batch[0] if batch else 1)
            print(f'gev {method} batch={batch}: {dt * 1e3:.2f} ms/call'
                  f' = {per * 1e3:.3f} ms per 513-bin GEV '
                  f'[first call {time.perf_counter() - t0:.0f}s]',
                  flush=True)


if __name__ == '__main__':
    main()
