"""Ablate the whole-fit integration kernel's constructs on the real
TPU to locate the per-grid-step cost (diagnosis for the 9.5 ms/iter
vs ~0.05 ms/iter expectation)."""
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

    from pb_bss_tpu.ops.pallas_integration_em_loop import (
        integration_em_full, spec_rows)

    F, T, D, K, E = 513, 300, 6, 3, 20
    ITERS = 20
    rng = np.random.default_rng(0)
    fetch = jax.jit(lambda v: v + 0.0)

    def make():
        y = (rng.standard_normal((F, D, T))
             + 1j * rng.standard_normal((F, D, T)))
        y /= np.linalg.norm(y, axis=1, keepdims=True)
        emb = rng.standard_normal((F, E, T)).astype(np.float32)
        a = rng.standard_normal((F, K, D, D)) \
            + 1j * rng.standard_normal((F, K, D, D))
        cov = np.einsum('fkde,fkce->fkdc', a, a.conj()) / D \
            + 2 * np.eye(D)
        ev, vec = np.linalg.eigh(cov)
        ev = np.maximum(ev / ev.max(-1, keepdims=True), 1e-10)
        w = np.full((F, K), 1.0 / K)
        mu = rng.standard_normal((K, E))
        mu /= np.linalg.norm(mu, -1, keepdims=True)
        kappa = rng.uniform(1, 20, K)
        from scipy.special import ive
        nu = E / 2 - 1
        logc = ((E / 2) * np.log(2 * np.pi) + np.log(ive(nu, kappa))
                + kappa - nu * np.log(kappa))
        # e-major mu rows: row ee*K+kk = mu[kk, ee]
        spec0 = np.concatenate([
            np.transpose(mu).reshape(E * K, 1),
            kappa[:, None], logc[:, None]], 0)
        assert spec0.shape[0] == spec_rows(E, K, 'vmf')
        return (jnp.asarray(y.real, jnp.float32),
                jnp.asarray(y.imag, jnp.float32),
                jnp.asarray(emb),
                jnp.asarray(vec.real, jnp.float32),
                jnp.asarray(vec.imag, jnp.float32),
                jnp.asarray(ev, jnp.float32),
                jnp.asarray(w, jnp.float32),
                jnp.asarray(spec0, jnp.float32))

    inputs = [make() for _ in range(3)]
    _ = np.asarray(fetch(sum(x[0].sum() for x in inputs)))

    for ablate in ('', 'nospec', 'staticidx', 'nojacobi', 'noacc',
                   'noout'):
        def run(*args, _a=ablate):
            ev, vec, w, acc = integration_em_full(
                *args, n_utt=1, iterations=ITERS,
                spectral_mode='vmf', _ablate=_a)
            return jnp.sum(ev) + jnp.sum(w) + jnp.sum(acc)
        run = jax.jit(run)
        try:
            t0 = time.perf_counter()
            _ = np.asarray(fetch(run(*inputs[0])))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            acc = sum(run(*i) for i in inputs)
            _ = np.asarray(fetch(acc))
            dt = (time.perf_counter() - t0) / len(inputs)
            print(f'{ablate or "full":10s}: {dt * 1e3:7.2f} ms/fit '
                  f'({dt / ITERS * 1e3:6.3f} ms/iter) '
                  f'[compile {compile_s:.0f}s]', flush=True)
        except Exception as e:
            print(f'{ablate or "full"}: FAILED {type(e).__name__}: '
                  f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
