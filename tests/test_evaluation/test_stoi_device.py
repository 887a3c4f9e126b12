"""Device STOI vs the float64 host oracle.

The host implementation (``module_stoi``) is the oracle — it was
validated against pystoi's golden constants
(test_reference_goldens.py). The jitted device program must reproduce
it:

- at float64 to ~1e-9 (same constants, same arithmetic, including the
  scipy ``resample_poly`` replication),
- at float32 to ~1e-3 absolute STOI,
- including the static-shape silent-frame compaction (signals with a
  silent stretch) and the batched (..., N) entry.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.evaluation import stoi
from pb_bss_tpu.evaluation.module_stoi_device import (
    _resample_device,
    _resampler_design,
    stoi_batch,
    stoi_device,
)


def _speechlike(seed, n, fs):
    """Modulated noise with a few silent gaps (exercises frame
    removal)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / fs
    envelope = 0.2 + np.abs(np.sin(2 * np.pi * 3.1 * t))
    x = rng.randn(n) * envelope
    gap = int(0.05 * fs)
    for start in (int(0.2 * n), int(0.7 * n)):
        x[start:start + gap] *= 1e-4
    return x


def test_resample_poly_parity():
    import jax.numpy as jnp
    import scipy.signal

    rng = np.random.RandomState(0)
    x = rng.randn(8000)
    expected = scipy.signal.resample_poly(x, 10000, 8000)
    up, down, h, n_pre_remove, n_out = _resampler_design(
        10000, 8000, len(x))
    got = np.asarray(_resample_device(
        jnp.asarray(x), up, down, h, n_pre_remove, n_out))
    assert got.shape == expected.shape
    assert_allclose(got, expected, atol=1e-10)


@pytest.mark.parametrize('fs', [10000, 8000, 16000])
def test_f64_parity(fs):
    n = 2 * fs
    ref = _speechlike(1, n, fs)
    est = ref + 0.3 * _speechlike(2, n, fs)
    expected = stoi(ref, est, sample_rate=fs)
    got = stoi_device(ref, est, sample_rate=fs)
    assert_allclose(got, expected, atol=1e-9)


def test_f32_robustness():
    fs, n = 8000, 16000
    ref = _speechlike(3, n, fs)
    est = ref + 0.4 * _speechlike(4, n, fs)
    expected = stoi(ref, est, sample_rate=fs)
    got = stoi_device(
        ref.astype(np.float32), est.astype(np.float32), sample_rate=fs)
    assert_allclose(got, expected, atol=2e-3)


def test_batched_matches_loop():
    fs, n = 10000, 20000
    refs = np.stack([_speechlike(s, n, fs) for s in (5, 6, 7)])
    ests = refs + 0.25 * np.stack(
        [_speechlike(s, n, fs) for s in (8, 9, 10)])
    out = stoi_batch(refs, ests, sample_rate=fs)
    assert out.shape == (3,)
    expected = stoi(refs, ests, sample_rate=fs)
    assert_allclose(out, expected, atol=1e-9)


def test_leading_dims_broadcast():
    fs, n = 10000, 16000
    ref = _speechlike(11, n, fs)
    ests = np.stack([ref + 0.2 * _speechlike(12, n, fs),
                     ref + 0.5 * _speechlike(13, n, fs)])
    out = stoi_batch(ref[None], ests, sample_rate=fs)  # broadcast ref
    assert out.shape == (2,)
    for b in range(2):
        assert_allclose(
            out[b], stoi(ref, ests[b], sample_rate=fs), atol=1e-9)


def test_all_silent_is_nan():
    """Host raises when nothing survives the VAD; the jitted batch
    yields NaN instead."""
    fs, n = 10000, 16000
    ref = np.zeros(n)
    ref[:256] = _speechlike(14, 256, fs)  # one loud frame, < N_SEG
    est = ref.copy()
    with pytest.raises(ValueError):
        stoi(ref + 1e-12, est, sample_rate=fs)
    out = stoi_batch((ref + 1e-12)[None], est[None], sample_rate=fs)
    assert np.isnan(out[0])
