"""STFT/iSTFT frontend tests: perfect reconstruction, shape
contracts, spectral correctness (the reference outsources this to
nara_wpe with stft(signal, 512, 128); this framework owns it).
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.transform import STFT, istft, stft


class TestShapes:
    def test_default_shapes(self):
        x = np.random.default_rng(0).standard_normal((6, 38520))
        X = np.asarray(stft(x, 512, 128))
        assert X.shape[0] == 6
        assert X.shape[-1] == 257  # size // 2 + 1
        assert X.dtype == np.complex64 or X.dtype == np.complex128

    def test_batched_leading_dims(self):
        x = np.random.default_rng(1).standard_normal((2, 3, 4000))
        X = np.asarray(stft(x, 512, 128))
        assert X.shape[:2] == (2, 3)

    def test_stft_class(self):
        op = STFT(512, 128)
        assert op.frequencies == 257
        x = np.random.default_rng(2).standard_normal(4000)
        X = op(x)
        y = np.asarray(op.inverse(X, num_samples=4000))
        assert y.shape == (4000,)


class TestPerfectReconstruction:
    @pytest.mark.parametrize('window', ['blackman', 'hann', 'hamming'])
    @pytest.mark.parametrize('size,shift', [(512, 128), (1024, 256),
                                            (512, 256)])
    def test_roundtrip_with_fading(self, window, size, shift):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(8000)
        X = stft(x, size, shift, window=window, fading=True)
        y = np.asarray(istft(
            X, size, shift, window=window, fading=True,
            num_samples=8000))
        assert_allclose(y, x, atol=1e-5)

    def test_roundtrip_without_fading_interior(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal(8000)
        size, shift = 512, 128
        X = stft(x, size, shift, fading=False)
        y = np.asarray(istft(X, size, shift, fading=False))
        sl = slice(size, 7000)
        assert_allclose(y[sl], x[sl], atol=1e-5)

    def test_num_samples_pads(self):
        x = np.random.default_rng(5).standard_normal(1000)
        X = stft(x, 512, 128)
        y = np.asarray(istft(X, 512, 128, num_samples=1500))
        assert y.shape == (1500,)


class TestSpectralCorrectness:
    def test_sinusoid_peak_bin(self):
        sample_rate = 8000
        size, shift = 512, 128
        f0 = 1000.0
        t = np.arange(8000) / sample_rate
        x = np.sin(2 * np.pi * f0 * t)
        X = np.asarray(stft(x, size, shift))
        mag = np.abs(X[10:-10]).mean(0)
        expected_bin = round(f0 * size / sample_rate)
        assert abs(int(np.argmax(mag)) - expected_bin) <= 1

    def test_linearity(self):
        rng = np.random.default_rng(6)
        a = rng.standard_normal(4000)
        b = rng.standard_normal(4000)
        Xa = np.asarray(stft(a, 512, 128))
        Xb = np.asarray(stft(b, 512, 128))
        Xab = np.asarray(stft(a + 2 * b, 512, 128))
        assert_allclose(Xab, Xa + 2 * Xb, atol=1e-4)


class TestMatmulDFT:
    """The MXU-matmul DFT path (default on TPU) against the FFT path."""

    def test_stft_matches_fft(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, 5000)).astype(np.float32)
        a = np.asarray(stft(x, 512, 128, method='matmul'))
        b = np.asarray(stft(x, 512, 128, method='fft'))
        assert np.max(np.abs(a - b)) < 1e-3 * np.max(np.abs(b))

    def test_istft_matches_fft(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 5000)).astype(np.float32)
        S = stft(x, 512, 128)
        a = np.asarray(istft(S, 512, 128, method='matmul',
                             num_samples=5000))
        b = np.asarray(istft(S, 512, 128, method='fft',
                             num_samples=5000))
        assert np.max(np.abs(a - b)) < 1e-5
        assert np.max(np.abs(a - x)) < 1e-4

    def test_non_divisible_shift_gather_path(self):
        """size % shift != 0 exercises the gather/scatter fallback."""
        rng = np.random.default_rng(2)
        x = rng.standard_normal(4000).astype(np.float32)
        S = stft(x, 384, 100, method='fft')
        y = np.asarray(istft(S, 384, 100, method='fft',
                             num_samples=4000))
        assert np.max(np.abs(y - x)) < 1e-4
