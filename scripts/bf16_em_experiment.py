"""Measure the mixed-precision (bf16) lever on the cACGMM EM hot path.

Usage (one arm per process — the precision knob is trace-time):

    python scripts/bf16_em_experiment.py scan_highest
    python scripts/bf16_em_experiment.py scan_high
    python scripts/bf16_em_experiment.py scan_bf16
    python scripts/bf16_em_experiment.py fused

Arms:
    scan_highest  scan-EM path, einsums pinned HIGHEST (production)
    scan_high     3-pass bf16 (Precision.HIGH)
    scan_bf16     1-pass bf16 (Precision.DEFAULT) — the upper bound of
                  what mixed precision could buy the scan path
    fused         whole-fit Pallas kernel (f32 VPU, no MXU) for scale

Protocol: bench.py's honest-timing rules (distinct pre-staged real-pair
inputs, completion via fetching a derived real scalar, batched B-fold
fits in ONE program to amortize the ~2.7 ms tunnel dispatch).

Quality: per-frequency oracle MSE — data is *sampled* from a known
cACGMM (labels known), the fitted posterior is compared to the one-hot
labels under the best per-frequency class permutation. Every arm sees
identical data and identical initialization.

Prints one JSON line per arm; results recorded in docs/DESIGN.md
("Mixed precision: measured").
"""
import itertools
import json
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

ARM = sys.argv[1] if len(sys.argv) > 1 else 'scan_highest'
F, T, D, K = 513, 300, 6, 3
EM_ITERS = 20
B, REPS = 8, 6


def make_data(seed=0):
    """Sample (y, labels) from a known cACGMM per frequency."""
    rng = np.random.default_rng(seed)
    # K spatially-distinct rank-boosted covariances per frequency
    a = rng.standard_normal((F, K, D, 2)) + 1j * rng.standard_normal(
        (F, K, D, 2))
    cov = np.einsum('fkdr,fker->fkde', a, a.conj()) + 0.1 * np.eye(D)
    labels = rng.integers(0, K, size=(F, T))
    chol = np.linalg.cholesky(cov)  # (F, K, D, D)
    g = rng.standard_normal((F, T, D)) + 1j * rng.standard_normal(
        (F, T, D))
    y = np.einsum('ftde,fte->ftd', chol[np.arange(F)[:, None], labels], g)
    y /= np.maximum(np.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
    return y.astype(np.complex64), labels


def oracle_mse(affiliation, labels):
    """Best-per-frequency-permutation MSE vs the one-hot labels.

    affiliation: (F, K, T); labels: (F, T) ints.
    """
    one_hot = np.eye(K)[labels]  # (F, T, K)
    one_hot = np.einsum('ftk->fkt', one_hot)
    best = np.full(affiliation.shape[0], np.inf)
    for perm in itertools.permutations(range(K)):
        mse = np.mean(
            (affiliation[:, perm, :] - one_hot) ** 2, axis=(1, 2))
        best = np.minimum(best, mse)
    return float(np.mean(best))


def main():
    import jax
    import jax.numpy as jnp
    from pb_bss_tpu.models._precision import set_em_matmul_precision
    from pb_bss_tpu.models.cacgmm import CACGMMTrainer

    if ARM == 'scan_high':
        set_em_matmul_precision('high')
    elif ARM == 'scan_bf16':
        set_em_matmul_precision('default')
    use_fused = ARM == 'fused'

    fetch = jax.jit(lambda v: v + 0.0)
    # tunnel health probe (gotcha: degraded episodes)
    t0 = time.time()
    _ = np.asarray(fetch(jnp.float32(1.0)))
    print(f'# probe {time.time() - t0:.1f}s', file=sys.stderr)

    rng = np.random.default_rng(7)
    data = [make_data(seed) for seed in range(B)]
    y = np.stack([d[0] for d in data])          # (B, F, T, D)
    labels = np.stack([d[1] for d in data])     # (B, F, T)
    init = rng.uniform(size=(B, F, K, T)).astype(np.float32)
    init /= init.sum(-2, keepdims=True)

    trainer = CACGMMTrainer()

    @jax.jit
    def fit_predict(y_re, y_im, init):
        aff = trainer.fit_predict(
            y_re + 1j * y_im, initialization=init,
            iterations=EM_ITERS, use_fused_em=use_fused)
        return aff  # real (B, F, K, T)

    inputs = [
        (jnp.asarray(y.real + 1e-4 * r.standard_normal(y.shape)
                     .astype(np.float32), jnp.float32),
         jnp.asarray(y.imag, jnp.float32),
         jnp.asarray(init))
        for r in [np.random.default_rng(1000 + i) for i in range(REPS)]
    ]
    _ = np.asarray(fetch(sum(a.sum() + b.sum() + c.sum()
                             for a, b, c in inputs)))

    t0 = time.time()
    aff0 = fit_predict(jnp.asarray(y.real, jnp.float32),
                       jnp.asarray(y.imag, jnp.float32),
                       jnp.asarray(init))
    aff_host = np.asarray(aff0)  # fetch real array (compile + quality)
    print(f'# compile+first {time.time() - t0:.1f}s', file=sys.stderr)

    start = time.perf_counter()
    acc = sum(jnp.sum(fit_predict(*i)) for i in inputs)
    _ = np.asarray(fetch(acc))
    ms_per_iter = (time.perf_counter() - start) / (
        REPS * B * EM_ITERS) * 1e3

    mse = oracle_mse(
        aff_host.reshape(B * F, K, T),
        labels.reshape(B * F, T))

    print(json.dumps({
        'arm': ARM,
        'ms_per_em_iter_per_utt': round(ms_per_iter, 4),
        'oracle_mse': round(mse, 6),
        'finite': bool(np.isfinite(aff_host).all()),
    }))


if __name__ == '__main__':
    main()
