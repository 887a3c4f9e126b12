"""Biquad/gammatone/Griffin-Lim tests: associative-scan IIR vs scipy
lfilter, filterbank parity, phase-reconstruction convergence.
"""
import numpy as np
import pytest
import scipy.signal
from numpy.testing import assert_allclose

from pb_bss_tpu.transform.filters import biquad_filter
from pb_bss_tpu.transform.gammatone import (
    calculate_cfs,
    gammatone_filterbank,
)


@pytest.mark.slow
class TestBiquad:
    def test_matches_scipy_lfilter(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(500)
        b = (0.2, 0.3, 0.1)
        a = (1.0, -0.5, 0.2)
        ours = np.asarray(biquad_filter(x, b, a))
        expected = scipy.signal.lfilter(b, a, x)
        assert_allclose(ours, expected, atol=1e-10)

    def test_batched(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 4, 200))
        b = (0.5, 0.2, 0.0)
        a = (1.0, -0.3, 0.05)
        ours = np.asarray(biquad_filter(x, b, a))
        expected = scipy.signal.lfilter(b, a, x, axis=-1)
        assert_allclose(ours, expected, atol=1e-10)

    def test_fir_only(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(100)
        b = (0.3, -0.2, 0.6)
        a = (1.0, 0.0, 0.0)
        ours = np.asarray(biquad_filter(x, b, a))
        expected = scipy.signal.lfilter(b, a, x)
        assert_allclose(ours, expected, atol=1e-12)


class TestGammatone:
    def test_cfs_erb_spacing(self):
        cfs = calculate_cfs(125, 8000, 23)
        assert len(cfs) == 23
        assert cfs[0] == pytest.approx(125, rel=1e-9)
        assert np.all(np.diff(cfs) > 0)
        assert cfs[-1] < 8000

    @pytest.mark.parametrize('method', ['fft', 'scan'])
    def test_matches_scipy_reference_implementation(self, method):
        """Same cascade with scipy.lfilter must match exactly — for
        both the FFT-convolution and the associative-scan method."""
        from pb_bss_tpu.transform.gammatone import (
            _calculate_coefficients)
        rng = np.random.default_rng(3)
        signal = rng.standard_normal(1000)
        n = 5
        cfs = calculate_cfs(125, 8000, n)
        A0, A11, A12, A13, A14, A2, B0, B1, B2, gain = \
            _calculate_coefficients(cfs, 16000)

        ours = np.asarray(gammatone_filterbank(
            signal, 16000, n=n, method=method))
        for i in range(n):
            y1 = scipy.signal.lfilter(
                [A0 / gain[i], A11[i] / gain[i], A2 / gain[i]],
                [B0, B1[i], B2[i]], signal)
            y2 = scipy.signal.lfilter(
                [A0, A12[i], A2], [B0, B1[i], B2[i]], y1)
            y3 = scipy.signal.lfilter(
                [A0, A13[i], A2], [B0, B1[i], B2[i]], y2)
            y4 = scipy.signal.lfilter(
                [A0, A14[i], A2], [B0, B1[i], B2[i]], y3)
            assert_allclose(ours[i], y4, atol=1e-10)

    def test_bandpass_selectivity(self):
        """A sinusoid at a center frequency passes mostly through its
        own band."""
        sample_rate = 16000
        n = 8
        cfs = calculate_cfs(125, 8000, n)
        t = np.arange(4000) / sample_rate
        tone = np.sin(2 * np.pi * cfs[4] * t)
        bands = np.asarray(gammatone_filterbank(
            tone, sample_rate, n=n))
        energies = (bands[:, 1000:] ** 2).sum(-1)
        assert energies.argmax() == 4


class TestGriffinLim:
    def test_griffin_lim_reconstructs_consistent_stft(self):
        from pb_bss_tpu.transform import stft
        from pb_bss_tpu.transform.griffin_lim_module import griffin_lim
        rng = np.random.default_rng(4)
        x = rng.standard_normal(4000)
        X = np.asarray(stft(x, 512, 128, fading=False))[None]
        x_hat = np.asarray(griffin_lim(X, iterations=30))
        X_hat = np.asarray(stft(x_hat, 512, 128, fading=False))
        # magnitudes should approach the target magnitudes
        err = np.linalg.norm(np.abs(X_hat) - np.abs(X)) \
            / np.linalg.norm(np.abs(X))
        assert err < 0.35, err

    def test_misi_distributes_mixture(self):
        from pb_bss_tpu.transform import stft
        from pb_bss_tpu.transform.griffin_lim_module import misi
        rng = np.random.default_rng(5)
        a = np.sin(2 * np.pi * 440 * np.arange(4000) / 8000)
        b = rng.standard_normal(4000) * 0.3
        y = a + b
        X = np.asarray(stft(np.stack([a, b]), 512, 128, fading=False))
        x_hat = np.asarray(misi(X, y, iterations=10))
        assert x_hat.shape[0] == 2
        # With oracle magnitudes MISI converges to the true sources in
        # the interior (edges lack OLA coverage with fading=False).
        sl = slice(512, 3500)
        rel = np.linalg.norm(x_hat.sum(0)[sl] - y[sl]) \
            / np.linalg.norm(y[sl])
        assert rel < 0.02, rel
        rel0 = np.linalg.norm(x_hat[0][sl] - a[sl]) \
            / np.linalg.norm(a[sl])
        assert rel0 < 0.02, rel0
