"""Device BSS-Eval vs the float64 host oracle.

The host implementation (``module_bss_eval``) is the oracle — it was
itself validated against mir_eval's golden constants
(test_reference_goldens.py). Here the jitted device program
(``module_bss_eval_device``) must reproduce it:

- at float64 to ~1e-9 dB (same algorithm, same arithmetic),
- at float32 to ~0.05 dB (loaded Cholesky + iterative refinement on
  an ill-conditioned speech Gram),
- including the K+1-estimates permutation routing of
  ``mir_eval_sources`` and the batched (..., K, T) entry.

Most cases run with short filters (the algorithm is
filter-length-generic); one 512-tap case matches the production
setting.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.evaluation import bss_eval_sources, mir_eval_sources
from pb_bss_tpu.evaluation.module_bss_eval_device import (
    bss_eval_sources_batch,
    bss_eval_sources_device,
    mir_eval_sources_batch,
)


def _scenario(seed, k=2, t=4000, m=None):
    """Convolutive toy mixture: estimates = filtered refs + leakage."""
    rng = np.random.RandomState(seed)
    refs = rng.randn(k, t)
    m = k if m is None else m
    ests = np.zeros((m, t))
    for i in range(m):
        j = i % k
        h = rng.randn(16) * 0.5 ** np.arange(16)
        ests[i] = np.convolve(refs[j], h)[:t]
        ests[i] += 0.1 * refs[(j + 1) % k] + 0.05 * rng.randn(t)
    return refs, ests


@pytest.mark.parametrize('seed,k', [(0, 2), (1, 3)])
def test_f64_parity(seed, k):
    refs, ests = _scenario(seed, k=k)
    # Scramble so the permutation search is exercised.
    perm = np.roll(np.arange(k), 1)
    ests = ests[perm]
    expected = bss_eval_sources(refs, ests, filter_length=128)
    got = bss_eval_sources_device(refs, ests, filter_length=128)
    for e, g in zip(expected[:3], got[:3]):
        assert_allclose(g, e, atol=1e-8)
    assert_allclose(got[3], expected[3])


def test_f64_parity_512_taps():
    refs, ests = _scenario(3, k=2, t=6000)
    expected = bss_eval_sources(refs, ests, filter_length=512)
    got = bss_eval_sources_device(refs, ests, filter_length=512)
    for e, g in zip(expected[:3], got[:3]):
        assert_allclose(g, e, atol=1e-7)


def test_no_permutation_diagonal():
    refs, ests = _scenario(4, k=3)
    expected = bss_eval_sources(
        refs, ests, compute_permutation=False, filter_length=64)
    got = bss_eval_sources_device(
        refs, ests, compute_permutation=False, filter_length=64)
    for e, g in zip(expected[:3], got[:3]):
        assert_allclose(g, e, atol=1e-8)


def test_f32_robustness():
    """f32 loaded-Cholesky + refinement stays within 0.05 dB of the
    f64 oracle on a correlated (ill-conditioned) speech-like Gram."""
    rng = np.random.RandomState(5)
    k, t = 2, 4000
    # Correlated references: shared low-pass component.
    common = np.convolve(rng.randn(t), np.ones(8) / 8, 'same')
    refs = 0.7 * common + 0.3 * rng.randn(k, t)
    ests = refs + 0.05 * rng.randn(k, t)
    expected = bss_eval_sources(refs, ests, filter_length=128)
    got = bss_eval_sources_device(
        refs.astype(np.float32), ests.astype(np.float32),
        filter_length=128)
    for e, g in zip(expected[:3], got[:3]):
        assert_allclose(g, e, atol=0.05)


def test_batched_matches_loop():
    refs = np.stack([_scenario(s, k=2)[0] for s in (6, 7, 8)])
    ests = np.stack([_scenario(s, k=2)[1] for s in (6, 7, 8)])
    out = bss_eval_sources_batch(refs, ests, filter_length=64)
    assert out['sdr'].shape == (3, 2)
    for b in range(3):
        e = bss_eval_sources(refs[b], ests[b], filter_length=64)
        assert_allclose(out['sdr'][b], e[0], atol=1e-8)
        assert_allclose(out['sir'][b], e[1], atol=1e-8)
        assert_allclose(out['sar'][b], e[2], atol=1e-8)
        assert_allclose(out['selection'][b], e[3])


def test_k_plus_one_routing():
    """M = K + 1 estimates (speakers + noise residual): the device
    permutation search must pick the same K estimates as the host
    ``mir_eval_sources``."""
    refs, ests = _scenario(9, k=2, t=3000, m=3)
    # Make the last estimate noise-like so it should be dropped.
    rng = np.random.RandomState(10)
    ests[2] = 0.9 * rng.randn(refs.shape[1]) + 0.05 * ests[2]
    # The host K+1 path hard-codes 512-tap filters.
    expected = mir_eval_sources(refs, ests, return_dict=True)
    got = mir_eval_sources_batch(refs, ests)
    assert_allclose(got['selection'], expected['selection'])
    assert_allclose(got['sdr'], expected['sdr'], atol=1e-8)
    assert_allclose(got['sir'], expected['sir'], atol=1e-8)
    assert_allclose(got['sar'], expected['sar'], atol=1e-8)


def test_multi_leading_dims():
    refs, ests = _scenario(11, k=2)
    refs4 = np.broadcast_to(refs, (2, 2) + refs.shape).copy()
    ests4 = np.broadcast_to(ests, (2, 2) + ests.shape).copy()
    out = bss_eval_sources_batch(refs4, ests4, filter_length=64)
    assert out['sdr'].shape == (2, 2, 2)
    assert_allclose(out['sdr'][0, 0], out['sdr'][1, 1], atol=1e-10)
