"""Time the aligner-hosting fused fc-EM path (VERDICT r4 #3) on the
real TPU: fused-with-DHTV vs fused-no-aligner vs scan-with-DHTV at
the bench shape, device-amortized per the honest protocol.

Run from /root/repo: python scripts/time_aligner_fused.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import jax.numpy as jnp

F, T, D, K = 513, 300, 6, 3
ITERS = 20


def main():
    fetch = jax.jit(lambda v: v + 0.0)
    print('backend:', jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(fetch(jnp.float32(1.0)))
    print(f'probe ok in {time.time() - t0:.1f}s', flush=True)
    w = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (c @ a, None), jnp.eye(8), None, length=4)[0])
    np.asarray(fetch(w(jnp.eye(8) * 0.5).sum()))
    print(f'warmup {time.time() - t0:.1f}s', flush=True)

    from pb_bss_tpu.models.cacgmm import CACGMMTrainer
    from pb_bss_tpu.permutation_alignment import (
        DHTVPermutationAlignment,
    )

    rng = np.random.default_rng(0)
    atf = rng.standard_normal((F, D, 2)) + 1j * rng.standard_normal(
        (F, D, 2))
    s = rng.standard_normal((F, 2, T)) + 1j * rng.standard_normal(
        (F, 2, T))
    y = (np.einsum('fdk,fkt->fdt', atf, s) + 0.3 * (
        rng.standard_normal((F, D, T))
        + 1j * rng.standard_normal((F, D, T))))
    y = np.swapaxes(y, -2, -1).astype(np.complex64)

    reps = 8
    inputs = [
        (jnp.asarray(y.real + 1e-3 * rng.standard_normal(
            y.shape).astype(np.float32)),
         jnp.asarray(y.imag))
        for _ in range(reps)
    ]
    _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs)))

    aligner = DHTVPermutationAlignment.from_stft_size(512)
    trainer = CACGMMTrainer()
    WCA = (-3, -1)

    def timed(fn):
        _ = np.asarray(fetch(fn(*inputs[0])))
        start = time.perf_counter()
        acc = sum(fn(*i) for i in inputs)
        _ = np.asarray(fetch(acc))
        return (time.perf_counter() - start) / reps

    for label, kwargs in (
        ('fused fc, no aligner', dict(use_fused_em=True)),
        ('fused fc + DHTV', dict(
            use_fused_em=True, inline_permutation_aligner=aligner)),
        ('scan + DHTV', dict(
            use_fused_em=False, inline_permutation_aligner=aligner)),
    ):
        @jax.jit
        def fit(y_re, y_im, kwargs=kwargs):
            m = trainer.fit(
                y_re + 1j * y_im, num_classes=K, iterations=ITERS,
                weight_constant_axis=WCA, **kwargs)
            return jnp.sum(m.cacg.covariance_eigenvalues)
        t_c = time.time()
        dt = timed(fit)
        print(f'{label:24s}: {dt * 1e3:7.2f} ms/fit '
              f'({dt / ITERS * 1e3:.3f} ms/iter; warm incl. first '
              f'call {time.time() - t_c:.1f}s)', flush=True)

    # f32-finiteness of the aligner path ON DEVICE (CLAUDE.md gotcha 6)
    @jax.jit
    def finite(y_re, y_im):
        m = trainer.fit(
            y_re + 1j * y_im, num_classes=K, iterations=ITERS,
            weight_constant_axis=WCA, use_fused_em=True,
            inline_permutation_aligner=aligner)
        return (jnp.isfinite(m.cacg.covariance_eigenvalues).all()
                & jnp.isfinite(m.weight).all()).astype(jnp.float32)
    print('aligner path finite on device:',
          float(np.asarray(fetch(finite(*inputs[0])))), flush=True)


if __name__ == '__main__':
    main()
