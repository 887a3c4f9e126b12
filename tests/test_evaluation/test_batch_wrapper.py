"""OutputMetricsBatch vs a loop of single-utterance OutputMetrics.

The host facade is the oracle (itself validated against the
reference's external-library goldens). The batched device facade must
reproduce every metric per utterance, including the permutation
selection that aligns them, on CPU-x64 to near machine precision.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.evaluation import (
    InputMetrics,
    InputMetricsBatch,
    OutputMetrics,
    OutputMetricsBatch,
)


def _utterance(seed, k=2, t=8000, extra_noise_estimate=False):
    rng = np.random.RandomState(seed)
    source = rng.randn(k, t)
    contribution = np.stack([
        np.stack([
            np.convolve(source[i], rng.randn(12) * 0.4)[:t]
            * (1.0 if i == j else 0.15)
            for j in range(k)
        ])
        for i in range(k)
    ])  # (K_source, K_target, T)
    noise_contribution = 0.1 * rng.randn(k, t)
    prediction = contribution.sum(0) + noise_contribution
    if extra_noise_estimate:
        extra = 0.5 * rng.randn(1, t)
        prediction = np.concatenate([prediction, extra], axis=0)
        contribution = np.concatenate(
            [contribution, np.zeros((k, 1, t))], axis=1)
        noise_contribution = np.concatenate(
            [noise_contribution, extra], axis=0)
    # Scramble the estimate order so the permutation search matters.
    perm = np.roll(np.arange(prediction.shape[0]), seed % 2 + 1)
    return (source, prediction[perm], contribution[:, perm],
            noise_contribution[perm])


@pytest.mark.parametrize('extra', [False, True])
@pytest.mark.slow
def test_batch_matches_host_loop(extra):
    utts = [_utterance(s, extra_noise_estimate=extra)
            for s in (0, 1, 2)]
    batch = OutputMetricsBatch(
        speech_prediction=np.stack([u[1] for u in utts]),
        speech_source=np.stack([u[0] for u in utts]),
        speech_contribution=np.stack([u[2] for u in utts]),
        noise_contribution=np.stack([u[3] for u in utts]),
        sample_rate=8000,
        enable_si_sdr=True,
    )
    got = batch.as_dict()
    assert 'pesq' not in got  # optional library absent, like the host

    for b, (source, prediction, contribution, noise) in enumerate(utts):
        expected = OutputMetrics(
            speech_prediction=prediction,
            speech_source=source,
            speech_contribution=contribution,
            noise_contribution=noise,
            sample_rate=8000,
            enable_si_sdr=True,
        ).as_dict()
        assert_allclose(
            got['mir_eval_selection'][b], expected['mir_eval_selection'])
        for key in ('mir_eval_sdr', 'mir_eval_sir', 'mir_eval_sar'):
            assert_allclose(got[key][b], expected[key], atol=1e-7,
                            err_msg=key)
        assert_allclose(got['stoi'][b], expected['stoi'], atol=1e-9)
        assert_allclose(got['si_sdr'][b], expected['si_sdr'], atol=1e-7)
        for key in ('invasive_sdr', 'invasive_sir', 'invasive_snr'):
            assert_allclose(got[key][b], expected[key], atol=1e-10,
                            err_msg=key)
        assert_allclose(got['srmr'][b], expected['srmr'], atol=1e-10)


@pytest.mark.slow
def test_multi_leading_dims_and_errors():
    utts = [_utterance(s) for s in (3, 4, 5, 6)]
    preds = np.stack([u[1] for u in utts]).reshape(2, 2, 2, -1)
    sources = np.stack([u[0] for u in utts]).reshape(2, 2, 2, -1)
    batch = OutputMetricsBatch(
        speech_prediction=preds, speech_source=sources,
        sample_rate=8000)
    assert batch['mir_eval_sdr'].shape == (2, 2, 2)
    assert batch['stoi'].shape == (2, 2, 2)

    with pytest.raises(ValueError):
        _ = batch['si_sdr']  # disabled by default
    with pytest.raises(KeyError):
        _ = batch['invasive_sdr']  # no contribution signals
    with pytest.raises(AssertionError):
        OutputMetricsBatch(
            speech_prediction=utts[0][1],  # single utterance
            speech_source=utts[0][0],
            sample_rate=8000)


@pytest.mark.slow
def test_input_batch_matches_host_loop():
    """InputMetricsBatch vs a loop of host-oracle InputMetrics."""
    rng = np.random.RandomState(3)
    B, K, D, T = 3, 2, 3, 8000
    sources = rng.randn(B, K, T)
    h = rng.randn(B, K, D, 12) * 0.3
    images = np.stack([
        np.stack([
            np.stack([np.convolve(sources[b, k], h[b, k, d])[:T]
                      for d in range(D)])
            for k in range(K)
        ])
        for b in range(B)
    ])                                      # (B, K, D, T)
    noise = 0.05 * rng.randn(B, D, T)
    obs = images.sum(1) + noise

    batch = InputMetricsBatch(
        observation=obs, speech_source=sources,
        speech_image=images, noise_image=noise, sample_rate=8000)
    got = batch.as_dict()
    assert 'pesq' not in got

    for b in range(B):
        expected = InputMetrics(
            observation=obs[b], speech_source=sources[b],
            speech_image=images[b], noise_image=noise[b],
            sample_rate=8000, device_metrics=False,
        ).as_dict()
        for key in ('mir_eval_sdr', 'mir_eval_sir', 'mir_eval_sar'):
            assert_allclose(got[key][b], expected[key], atol=1e-7,
                            err_msg=key)
        assert_allclose(got['stoi'][b], expected['stoi'], atol=1e-9)
        assert_allclose(got['srmr'][b], expected['srmr'], rtol=2e-3)
        for key in ('invasive_sdr', 'invasive_sir', 'invasive_snr'):
            assert_allclose(got[key][b], expected[key], atol=1e-10,
                            err_msg=key)


def test_input_batch_without_sample_rate():
    """Regression: mir_eval must work without a sample rate (BSS-Eval
    alone, mirroring the single-utterance facade); stoi must fail
    with a clear message instead of an opaque int(None) TypeError."""
    rng = np.random.RandomState(11)
    obs = rng.randn(2, 3, 2048)
    sources = rng.randn(2, 2, 2048)
    batch = InputMetricsBatch(observation=obs, speech_source=sources)
    sdr = batch.mir_eval_sdr
    assert sdr.shape == (2, 2, 3)
    assert np.all(np.isfinite(sdr))
    with pytest.raises(AssertionError, match='sample rate'):
        _ = batch.stoi


@pytest.mark.slow
def test_large_batch_srmr():
    """The host srmr/pesq < 30 leading-axis heuristic must not fire
    for validated batch shapes (the facade exists for large batches)."""
    rng = np.random.RandomState(7)
    b, t = 31, 4096
    sources = rng.randn(b, 1, t)
    preds = sources + 0.1 * rng.randn(b, 1, t)
    batch = OutputMetricsBatch(
        speech_prediction=preds, speech_source=sources,
        sample_rate=8000)
    out = batch.srmr
    assert out.shape == (b, 1)
    assert np.all(np.isfinite(out))


def test_permutation_table_guard():
    """K == 8 with the permutation search would build a ~363k-row
    static table; the batch entry must fail fast instead."""
    from pb_bss_tpu.evaluation import bss_eval_sources_batch
    rng = np.random.RandomState(0)
    refs = rng.randn(2, 8, 256)
    ests = rng.randn(2, 9, 256)
    with pytest.raises(AssertionError, match='permutation'):
        bss_eval_sources_batch(refs, ests)
