"""Drive the device-resident evaluation surface on the real TPU.

Run from /root/repo with the default (axon) backend:
    python scripts/verify_device_eval.py
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

    # Tunnel health probe (CLAUDE.md gotcha 4c).
    t0 = time.time()
    np.asarray(fetch(jnp.float32(1.0)))
    print(f'probe ok in {time.time() - t0:.1f}s')

    # Warmup compile so the one-time backend warmup is not attributed
    # to the eval program (gotcha 4b).
    t0 = time.time()
    w = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (c @ a, None), jnp.eye(8), None, length=4)[0])
    np.asarray(fetch(w(jnp.eye(8) * 0.5).sum()))
    print(f'warmup compile in {time.time() - t0:.1f}s')

    rng = np.random.RandomState(0)
    fs = 8000
    T = 2 * fs
    B = 4
    K = 2

    def make_pair():
        src = rng.randn(K, T).astype(np.float64)
        mix = 0.8 * src + 0.3 * src[::-1] + 0.05 * rng.randn(K, T)
        return src, mix[::-1]  # permuted estimates

    refs = np.stack([make_pair() for _ in range(B)])
    reference = refs[:, 0]
    estimation = refs[:, 1]

    import pb_bss_tpu
    from pb_bss_tpu.evaluation import (
        bss_eval_sources_batch, stoi_batch, OutputMetricsBatch)
    from pb_bss_tpu.evaluation.module_bss_eval import bss_eval_sources
    from pb_bss_tpu.evaluation.module_stoi import stoi as stoi_host

    # --- batched BSS-eval on device -------------------------------
    t0 = time.time()
    out = bss_eval_sources_batch(
        reference.astype(np.float32), estimation.astype(np.float32))
    dt = time.time() - t0
    print(f'bss_eval_sources_batch (B={B}) first call {dt:.1f}s')
    t0 = time.time()
    out = bss_eval_sources_batch(
        reference.astype(np.float32), estimation.astype(np.float32))
    print(f'  repeat {time.time() - t0 :.3f}s')
    assert out['sdr'].shape == (B, K), out['sdr'].shape
    assert np.isfinite(out['sdr']).all(), out['sdr']

    # Host f64 oracle parity.
    sdr_host = np.stack([
        bss_eval_sources(reference[b], estimation[b])[0]
        for b in range(B)])
    err = np.max(np.abs(out['sdr'] - sdr_host))
    print(f'  sdr parity vs host f64 oracle: max |d| = {err:.2e} dB')
    assert err < 5e-2, (out['sdr'], sdr_host)
    # Permutation recovered (estimates were flipped).
    assert (out['selection'] == [1, 0]).all(), out['selection']

    # --- batched STOI on device -----------------------------------
    t0 = time.time()
    st = stoi_batch(reference.astype(np.float32),
                    estimation[:, ::-1].astype(np.float32),
                    sample_rate=fs)
    print(f'stoi_batch first call {time.time() - t0:.1f}s')
    st_host = stoi_host(reference, estimation[:, ::-1], sample_rate=fs)
    err = np.max(np.abs(np.asarray(st) - np.asarray(st_host)))
    print(f'  stoi parity vs host: max |d| = {err:.2e}')
    assert err < 2e-2, (st, st_host)

    # --- batch facade ----------------------------------------------
    t0 = time.time()
    m = OutputMetricsBatch(
        speech_prediction=estimation.astype(np.float32),
        speech_source=reference.astype(np.float32),
        sample_rate=fs,
        enable_si_sdr=True,
    )
    d = m.as_dict()
    print(f'OutputMetricsBatch.as_dict in {time.time() - t0:.1f}s '
          f'keys={sorted(d)}')
    for k, v in d.items():
        assert np.isfinite(np.asarray(v)).all(), (k, v)

    # --- restructured host facade end-to-end ------------------------
    from pb_bss_tpu.evaluation.wrapper import OutputMetrics
    dm = OutputMetrics(
        speech_prediction=np.asarray(estimation[0], np.float64),
        speech_source=np.asarray(reference[0], np.float64),
        sample_rate=fs,
        enable_si_sdr=True,
    ).as_dict()
    print('OutputMetrics keys:', sorted(dm))
    assert abs(np.mean(dm['mir_eval_sdr']) - np.mean(sdr_host[0])) < 5e-2
    print('VERIFY OK')


if __name__ == '__main__':
    main()
