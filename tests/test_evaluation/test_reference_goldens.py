"""Cross-validation of the native metric implementations against the
reference's external-library golden constants.

The reference pins exact full-metric dicts on a pure-NumPy seeded
scenario (/root/reference/tests/test_evaluation/test_wrapper_values.py:
7-41: seed 1, 2 speakers x 3 channels, fftconvolve RIRs).  Those
constants were computed with the real pystoi / mir_eval / SRMRpy
libraries, which this framework replaces with native implementations
(module_stoi.py, module_bss_eval.py, module_srmr.py).  Reproducing the
scenario bit-for-bit therefore validates the native code against the
external libraries without having them installed.

Measured deviations (2026-08-19, x64 CPU):

==============  ===========  ========================================
metric          max rel err  notes
==============  ===========  ========================================
invasive_*      3e-7         pure linear algebra; exact
mir_eval_*      4e-8         native BSS-eval v3 == mir_eval
stoi            9e-3         native STOI vs pystoi: resampling and
                             frame-edge differences; systematic < 1%
srmr            1.3e-2       native gammatone/modulation filterbank
                             vs SRMRpy; systematic ~1%
pesq            (skipped)    needs the optional pesq C library, not
                             installed here (reference has the same
                             optional dependency)
==============  ===========  ========================================

The per-metric tolerances below are set ~3x above the measured
deviation so regressions surface while library-level differences pass.
"""
import numpy as np
import pytest
import scipy.signal
from numpy.testing import assert_allclose

from pb_bss_tpu.evaluation import InputMetrics, OutputMetrics


@pytest.fixture(scope='module')
def scenario():
    # Bit-for-bit reproduction of the reference scenario
    # (tests/test_evaluation/test_wrapper_values.py:7-41).
    samples = 10_000
    rir_length = 4
    channels = 3
    np.random.seed(1)

    speech_source_1 = np.random.rand(samples)
    speech_source_2 = np.random.rand(samples)

    h1 = np.random.rand(channels, rir_length)
    h2 = np.random.rand(channels, rir_length)

    speech_image_1 = np.array([
        scipy.signal.fftconvolve(speech_source_1, h, mode='same')
        for h in h1
    ])
    speech_image_2 = np.array([
        scipy.signal.fftconvolve(speech_source_2, h, mode='same')
        for h in h2
    ])
    noise = 0.01 * np.random.rand(channels, samples)
    observation = speech_image_1 + speech_image_2 + noise

    return {
        'speech_source': np.array([speech_source_1, speech_source_2]),
        'speech_image': np.array([speech_image_1, speech_image_2]),
        'noise_image': noise,
        'observation': observation,
    }


def test_input_metrics_vs_reference_goldens(scenario):
    metrics = InputMetrics(
        observation=scenario['observation'],
        speech_source=scenario['speech_source'],
        speech_image=scenario['speech_image'],
        noise_image=scenario['noise_image'],
        sample_rate=8000,
    )
    assert metrics.K_source == 2
    assert metrics.channels == 3
    m = metrics.as_dict()

    # Goldens from the reference's pinned constants
    # (test_wrapper_values.py:57-92), computed there with the external
    # mir_eval / pystoi / SRMRpy libraries.
    assert_allclose(m['invasive_sdr'], [
        [4.634096, 1.821645, 5.012743],
        [-4.634303, -1.821825, -5.013139]], rtol=1e-6)
    assert_allclose(m['invasive_sir'], [
        [4.63425, 1.821754, 5.013044],
        [-4.63425, -1.821754, -5.013044]], rtol=1e-6)
    assert_allclose(m['invasive_snr'], [
        [49.137625, 47.859369, 46.598417],
        [44.503376, 46.037615, 41.585373]], rtol=1e-6)
    assert_allclose(m['mir_eval_sdr'], [
        [16.286314, 15.048399, 17.420134],
        [14.386505, 14.606471, 12.842921]], rtol=1e-6)
    assert_allclose(m['mir_eval_sir'], [
        [18.172265, 17.323722, 18.868235],
        [15.523357, 16.609909, 13.310729]], rtol=1e-6)
    assert_allclose(m['mir_eval_sar'], [
        [20.883413, 19.02361, 22.949934],
        [20.883413, 19.02361, 22.949934]], rtol=1e-6)
    # Native reimplementations of external libraries: looser, see the
    # deviation table in the module docstring.
    assert_allclose(m['stoi'], [
        [0.691546, 0.626544, 0.717809],
        [0.28424, 0.345368, 0.279996]], rtol=3e-2)
    assert_allclose(
        m['srmr'], [0.51612031, 0.50214891, 0.48237807], rtol=4e-2)


def test_output_metrics_vs_reference_goldens(scenario):
    # Reference test_wrapper_values.py:97-150: speech image + noise of
    # channel 0 as the prediction (perfect cross-talk suppression).
    speech_prediction = (
        scenario['speech_image'][..., 0, :]
        + scenario['noise_image'][..., 0, :])
    speech_image_1, speech_image_2 = scenario['speech_image'][..., 0, :]

    speech_contribution = np.array([
        [speech_image_1, np.zeros_like(speech_image_2)],
        [np.zeros_like(speech_image_1), speech_image_2],
    ])
    noise_contribution = np.array([
        scenario['noise_image'][..., 0, :],
        scenario['noise_image'][..., 0, :],
    ])

    metrics = OutputMetrics(
        speech_prediction=speech_prediction,
        speech_source=scenario['speech_source'],
        speech_contribution=speech_contribution,
        noise_contribution=noise_contribution,
        sample_rate=8000,
    )
    assert metrics.K_source == 2
    m = metrics.as_dict()

    assert_allclose(m['invasive_sdr'], [49.137625, 44.503376],
                    rtol=1e-6)
    assert np.all(np.isinf(m['invasive_sir']))
    assert_allclose(m['invasive_snr'], [49.137625, 44.503376],
                    rtol=1e-6)
    assert_allclose(m['mir_eval_sdr'], [17.071665, 24.711722],
                    rtol=1e-6)
    assert_allclose(m['mir_eval_sir'], [29.423133, 37.060289],
                    rtol=1e-6)
    assert_allclose(m['mir_eval_sar'], [17.336992, 24.973125],
                    rtol=1e-6)
    np.testing.assert_array_equal(m['mir_eval_selection'], [0, 1])
    assert_allclose(m['stoi'], [0.968833, 0.976151], rtol=1e-2)
    assert_allclose(m['srmr'], [0.54593548, 0.49966431], rtol=4e-2)


def test_pesq_vs_reference_goldens(scenario):
    """PESQ golden check — only runs where the optional ``pesq`` C
    library is installed (the dedicated CI lane installs it; the
    default environment skips, matching the reference's optional-dep
    posture).  Constants from reference test_wrapper_values.py:82-85
    and :141-142.
    """
    pytest.importorskip('pesq')
    from pb_bss_tpu.evaluation import pesq as pesq_metric

    # InputMetrics pairing: every speaker vs every channel.
    observation = scenario['observation']
    speech_source = scenario['speech_source']
    K, N = speech_source.shape
    D = observation.shape[0]
    ref = np.broadcast_to(speech_source[:, None, :], (K, D, N))
    est = np.broadcast_to(observation[None, :, :], (K, D, N))
    assert_allclose(
        pesq_metric(ref, est, sample_rate=8000),
        [[3.494761, 3.034838, 3.755455],
         [2.437896, 2.820094, 2.434496]], rtol=1e-4)

    # OutputMetrics pairing: per-speaker prediction at channel 0.
    speech_prediction = (
        scenario['speech_image'][..., 0, :]
        + scenario['noise_image'][..., 0, :])
    assert_allclose(
        pesq_metric(speech_source, speech_prediction, sample_rate=8000),
        [4.37408, 4.405752], rtol=1e-4)
