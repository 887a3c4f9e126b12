"""Drive the round-5 resume fixes on the real TPU (axon tunnel):

1. batched fc-fused resume from a batch-broadcast (1, K) weight
   (ops/pallas_em_step.py fix),
2. same through the streamed long-T kernel (ops/pallas_em_stream.py),
3. same through the scan path (models/cacgmm.py eval_shape broadcast).

Run from /root/repo: python scripts/verify_r5_resume.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print('backend:', jax.devices())
    fetch = jax.jit(lambda v: v + 0.0)
    mk = jax.jit(lambda re, im: re + 1j * im)

    t0 = time.time()
    np.asarray(fetch(jnp.float32(1.0)))
    print(f'probe ok in {time.time() - t0:.1f}s', flush=True)

    t0 = time.time()
    w = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (c @ a, None), jnp.eye(8), None, length=4)[0])
    np.asarray(fetch(w(jnp.eye(8) * 0.5).sum()))
    print(f'warmup compile in {time.time() - t0:.1f}s', flush=True)

    from pb_bss_tpu.models.cacgmm import CACGMM, CACGMMTrainer

    def mixture(F, T, D=4, seed=0):
        rng = np.random.default_rng(seed)
        atf = rng.standard_normal((F, D, 2)) + 1j * rng.standard_normal(
            (F, D, 2))
        s = rng.standard_normal((F, 2, T)) + 1j * rng.standard_normal(
            (F, 2, T))
        y = np.einsum('fdk,fkt->fdt', atf, s) + 0.3 * (
            rng.standard_normal((F, D, T))
            + 1j * rng.standard_normal((F, D, T)))
        # HOST complex — the caller stacks and crosses the boundary
        # as real pairs (a device complex here could never be
        # np.asarray'd back without the forbidden transfer)
        return np.swapaxes(y, -2, -1).astype(np.complex64)

    trainer = CACGMMTrainer()
    WCA = (-3, -1)

    def finite(m):
        return float(np.asarray(fetch(
            (jnp.isfinite(m.cacg.covariance_eigenvalues).all()
             & jnp.isfinite(m.weight).all()).astype(jnp.float32))))

    # --- 1. fc per-iteration kernel, batched resume ---------------------
    ys = [mixture(33, 40, seed=s) for s in (1, 2)]
    yb = mk(jnp.asarray(np.stack(ys).real), jnp.asarray(np.stack(ys).imag))
    t0 = time.time()
    m0 = trainer.fit(yb, num_classes=3, iterations=2,
                     weight_constant_axis=WCA, use_fused_em=True)
    shared = CACGMM(weight=jnp.mean(m0.weight, axis=0), cacg=m0.cacg)
    m1 = trainer.fit(yb, initialization=shared, iterations=3,
                     weight_constant_axis=WCA, use_fused_em=True)
    print(f'fc batched resume: finite={finite(m1)} '
          f'weight_shape={m1.weight.shape} ({time.time() - t0:.1f}s)',
          flush=True)

    # --- 2. streamed long-T kernel, batched fc resume -------------------
    ys = [mixture(9, 1200, D=3, seed=s) for s in (3, 4)]
    yb = mk(jnp.asarray(np.stack(ys).real), jnp.asarray(np.stack(ys).imag))
    t0 = time.time()
    m0 = trainer.fit(yb, num_classes=2, iterations=2,
                     weight_constant_axis=WCA, use_fused_em=True,
                     t_block=None)
    shared = CACGMM(weight=jnp.mean(m0.weight, axis=0), cacg=m0.cacg)
    m1 = trainer.fit(yb, initialization=shared, iterations=2,
                     weight_constant_axis=WCA, use_fused_em=True,
                     t_block=None)
    print(f'stream batched fc resume: finite={finite(m1)} '
          f'weight_shape={m1.weight.shape} ({time.time() - t0:.1f}s)',
          flush=True)

    # --- 3. scan path, batched resume (eval_shape broadcast) ------------
    t0 = time.time()
    m2 = trainer.fit(yb, initialization=shared, iterations=2,
                     weight_constant_axis=WCA, use_fused_em=False,
                     t_block=None)
    print(f'scan batched resume: finite={finite(m2)} '
          f'weight_shape={m2.weight.shape} ({time.time() - t0:.1f}s)',
          flush=True)
    print('ALL OK', flush=True)


if __name__ == '__main__':
    main()
