"""Golden metric-value regression on a fixed synthetic convolutive
scenario (the analog of
/root/reference/tests/test_evaluation/test_wrapper_values.py, re-pinned
for this framework's native metric implementations and RNG).
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.evaluation import InputMetrics, OutputMetrics


@pytest.fixture(scope='module')
def scenario():
    rng = np.random.RandomState(1)
    K, D, T = 2, 3, 16000
    source = rng.randn(K, T)
    h = rng.randn(K, D, 16) * 0.3
    image = np.stack([
        np.stack([np.convolve(source[k], h[k, d])[:T]
                  for d in range(D)])
        for k in range(K)
    ])
    noise = 0.1 * rng.randn(D, T)
    observation = image.sum(0) + noise
    return source, image, noise, observation


def test_input_metric_values(scenario):
    source, image, noise, observation = scenario
    metrics = InputMetrics(
        observation=observation,
        speech_source=source,
        speech_image=image,
        noise_image=noise,
        sample_rate=8000,
    ).as_dict()
    assert_allclose(metrics['stoi'], [
        [0.286678, 0.473558, 0.558771],
        [0.587241, 0.401719, 0.331033],
    ], rtol=1e-4)
    assert_allclose(metrics['mir_eval_sdr'], [
        [-2.138224, 2.957665, 0.889205],
        [2.636045, -2.503314, -0.384921],
    ], rtol=1e-4)
    assert_allclose(metrics['mir_eval_sir'], [
        [-2.110235, 3.008234, 0.92931],
        [2.685412, -2.476846, -0.350457],
    ], rtol=1e-4)
    assert_allclose(metrics['mir_eval_sar'], [
        [23.976164, 24.083527, 23.825578],
        [23.976164, 24.083527, 23.825578],
    ], rtol=1e-4)
    assert_allclose(
        metrics['srmr'], [0.285032, 0.320984, 0.294209], rtol=1e-4)
    assert_allclose(metrics['invasive_sdr'], [
        [-2.474964, 2.795838, 0.638741],
        [2.40698, -2.864316, -0.705958],
    ], rtol=1e-4)
    assert_allclose(metrics['invasive_snr'], [
        [19.991229, 22.662509, 21.446979],
        [22.441509, 19.821654, 20.772033],
    ], rtol=1e-4)
    assert_allclose(metrics['invasive_sir'], [
        [-2.450281, 2.840854, 0.674946],
        [2.450281, -2.840854, -0.674946],
    ], rtol=1e-4)


def test_output_metric_values(scenario):
    source, image, noise, observation = scenario
    contribution = np.stack([
        np.stack([image[0, 0], 0.1 * image[0, 1]]),
        np.stack([0.1 * image[1, 1], image[1, 0]]),
    ])
    noise_contribution = np.stack([0.2 * noise[0], 0.2 * noise[1]])
    prediction = contribution.sum(0) + noise_contribution

    metrics = OutputMetrics(
        speech_prediction=prediction,
        speech_source=source,
        speech_contribution=contribution,
        noise_contribution=noise_contribution,
        sample_rate=8000,
        enable_si_sdr=True,
    ).as_dict()

    assert_allclose(metrics['stoi'], [0.913714, 0.894992], rtol=1e-4)
    assert_allclose(
        metrics['mir_eval_sdr'], [19.746868, 19.684632], rtol=1e-4)
    assert_allclose(
        metrics['mir_eval_sir'], [20.338477, 19.962734], rtol=1e-4)
    assert_allclose(
        metrics['mir_eval_sar'], [28.736802, 31.802325], rtol=1e-4)
    np.testing.assert_array_equal(
        metrics['mir_eval_selection'], [0, 1])
    assert_allclose(
        metrics['srmr'], [0.292491, 0.296515], rtol=1e-4)
    assert_allclose(
        metrics['si_sdr'], [-26.429023, -37.001805], rtol=1e-4)
    assert_allclose(
        metrics['invasive_sdr'], [20.052742, 19.748942], rtol=1e-4)
    assert_allclose(
        metrics['invasive_snr'], [33.970629, 36.483947], rtol=1e-4)
    assert_allclose(
        metrics['invasive_sir'], [20.232612, 19.842038], rtol=1e-4)
