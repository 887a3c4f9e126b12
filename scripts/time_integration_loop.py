"""Time the whole-fit integration kernel vs the per-iteration fused
path on the real TPU at the benchmark shape (honest protocol: distinct
pre-staged inputs, derived-scalar fetch; see bench.py / CLAUDE.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # tunnel health probe
    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
    print(f'probe ok {time.perf_counter() - t0:.1f}s', flush=True)
    # warm up the backend compile path
    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (c @ c, None), x, None, length=4)[0].sum())(
            jnp.eye(64, dtype=jnp.float32)))
    print(f'warmup ok {time.perf_counter() - t0:.1f}s', flush=True)

    from pb_bss_tpu.models.vmfcacgmm import VMFCACGMMTrainer
    from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer

    F, T, D, K, E = 513, 300, 6, 3, 20
    ITERS = 20
    rng = np.random.default_rng(0)
    fetch = jax.jit(lambda v: v + 0.0)

    def make_inputs(batch=()):
        shape = (*batch, F)
        atf = (rng.standard_normal((*shape, D, K))
               + 1j * rng.standard_normal((*shape, D, K)))
        s = (rng.standard_normal((*shape, K, T))
             + 1j * rng.standard_normal((*shape, K, T)))
        y = np.einsum('...dk,...kt->...dt', atf, s) + 0.2 * (
            rng.standard_normal((*shape, D, T))
            + 1j * rng.standard_normal((*shape, D, T)))
        obs = np.swapaxes(y, -1, -2).astype(np.complex64)
        obs /= np.linalg.norm(obs, axis=-1, keepdims=True)
        emb = rng.standard_normal((*shape, T, E)).astype(np.float32)
        return obs, emb

    def timed(fn, inputs, reps):
        _ = np.asarray(fetch(fn(*inputs[0])))  # compile + warm
        start = time.perf_counter()
        acc = sum(fn(*i) for i in inputs[:reps])
        _ = np.asarray(fetch(acc))
        return (time.perf_counter() - start) / reps

    for name, trainer_cls, extra in (
            ('vmfcacgmm', VMFCACGMMTrainer, {}),
            ('gcacgmm', GCACGMMTrainer,
             {'covariance_type': 'spherical'})):
        for mode in ('loop', 'step'):
            inputs = []
            for _ in range(4):
                obs, emb = make_inputs()
                inputs.append((
                    jnp.asarray(obs.real, jnp.float32),
                    jnp.asarray(obs.imag, jnp.float32),
                    jnp.asarray(emb)))
            import functools

            @functools.partial(jax.jit, static_argnames=())
            def fit(y_re, y_im, emb, _mode=mode, _cls=trainer_cls,
                    _extra=extra):
                model = _cls().fit(
                    y_re + 1j * y_im, emb, num_classes=K,
                    iterations=ITERS, use_fused_em=_mode, **_extra)
                return jnp.sum(model.cacg.covariance_eigenvalues)
            t0 = time.perf_counter()
            dt = timed(fit, inputs, reps=4)
            print(f'{name} {mode}: {dt * 1e3:.2f} ms/fit '
                  f'({dt / ITERS * 1e3:.3f} ms/iter) '
                  f'[first call {time.perf_counter() - t0:.0f}s]',
                  flush=True)

        # batch-8 folded (device-amortized)
        for mode in ('loop', 'step'):
            inputs = []
            for _ in range(2):
                obs, emb = make_inputs(batch=(8,))
                inputs.append((
                    jnp.asarray(obs.real, jnp.float32),
                    jnp.asarray(obs.imag, jnp.float32),
                    jnp.asarray(emb)))

            def fitb(y_re, y_im, emb, _mode=mode, _cls=trainer_cls,
                     _extra=extra):
                model = _cls().fit(
                    y_re + 1j * y_im, emb, num_classes=K,
                    iterations=ITERS, use_fused_em=_mode, **_extra)
                return jnp.sum(model.cacg.covariance_eigenvalues)
            fitb = jax.jit(fitb)
            try:
                dt = timed(fitb, inputs, reps=2)
                print(f'{name} {mode} batch-8: {dt / 8 * 1e3:.2f} '
                      f'ms/utt-fit', flush=True)
            except Exception as e:
                print(f'{name} {mode} batch-8 failed: '
                      f'{type(e).__name__}: {e}', flush=True)


if __name__ == '__main__':
    main()
