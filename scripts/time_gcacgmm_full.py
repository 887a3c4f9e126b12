"""Measure the GCACGMM 'full' spectral-covariance exclusion from the
fused integration kernel (VERDICT r4 #6): what does the scan-path
fallback actually cost vs the fused vector-covariance modes, and what
would carrying the (E, E) scatter per lane cost the kernel?

Run from /root/repo on the axon backend:
    python scripts/time_gcacgmm_full.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import jax.numpy as jnp

F, T, D, K, E = 513, 300, 6, 3, 20
ITERS = 20


def main():
    fetch = jax.jit(lambda v: v + 0.0)
    mk = jax.jit(lambda re, im: re + 1j * im)
    print('backend:', jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(fetch(jnp.float32(1.0)))
    print(f'probe ok in {time.time() - t0:.1f}s', flush=True)
    w = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (c @ a, None), jnp.eye(8), None, length=4)[0])
    np.asarray(fetch(w(jnp.eye(8) * 0.5).sum()))
    print(f'warmup {time.time() - t0:.1f}s', flush=True)

    from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer

    rng = np.random.default_rng(0)
    y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    emb = rng.standard_normal((F, T, E)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    aff0 = rng.uniform(size=(F, K, T)).astype(np.float32)
    aff0 /= aff0.sum(-2, keepdims=True)
    aff0 = jnp.asarray(aff0)
    emb_j = jnp.asarray(emb)

    reps = 4
    inputs = [
        (jnp.asarray(y.real + 1e-3 * rng.standard_normal(
            y.shape).astype(np.float32)),
         jnp.asarray(y.imag))
        for _ in range(reps)
    ]
    _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs)))

    def timed(fn):
        _ = np.asarray(fetch(fn(*inputs[0])))
        start = time.perf_counter()
        acc = sum(fn(*i) for i in inputs)
        _ = np.asarray(fetch(acc))
        return (time.perf_counter() - start) / reps

    for cov_type, fused in (('spherical', True), ('spherical', False),
                            ('diagonal', True), ('full', False)):
        @jax.jit
        def fit(y_re, y_im, cov_type=cov_type, fused=fused):
            m = GCACGMMTrainer().fit(
                mk(y_re, y_im), emb_j, initialization=aff0,
                iterations=ITERS, covariance_type=cov_type,
                use_fused_em=fused)
            return jnp.sum(m.cacg.covariance_eigenvalues)
        t_compile0 = time.time()
        dt = timed(fit)
        print(f'{cov_type:10s} fused={fused}: {dt * 1e3:7.1f} ms/fit '
              f'({dt / ITERS * 1e3:.2f} ms/iter; first call incl. '
              f'compile {time.time() - t_compile0:.1f}s)', flush=True)

    # analytic VMEM cost of carrying the (E, E) scatter per lane in
    # the fused kernel (the lifted-gate hypothetical)
    tile_f = 128
    blk = E * E * K * tile_f * 4
    print(f'\nhypothetical fused-full extras at tile_f={tile_f}: '
          f'(E,E,K,tile) scatter out block = {blk / 2 ** 20:.2f} MB '
          f'x2 double-buffered = {2 * blk / 2 ** 20:.2f} MB; E-step '
          f'precision assembly = E(E+1)/2 = {E * (E + 1) // 2} '
          f'unrolled plane pairs per class (vs {E} diagonal)',
          flush=True)


if __name__ == '__main__':
    main()
