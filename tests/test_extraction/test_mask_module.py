"""Mask-function tests mirroring the reference's doctest/shape sweeps
(/root/reference/pb_bss/extraction/mask_module.py) and verifying the
vectorized lorenz/quantile masks against loopy NumPy references.
"""
import numpy as np
import numpy.testing as tc
import pytest

from pb_bss_tpu.extraction.mask_module import (
    biased_binary_mask,
    ideal_amplitude_mask,
    ideal_binary_mask,
    ideal_complex_mask,
    ideal_ratio_mask,
    lorenz_mask,
    phase_sensitive_mask,
    quantile_mask,
    wiener_like_mask,
)


def rand(*shape):
    rng = np.random.default_rng(sum(shape))
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


class TestIdealBinaryMask:
    def test_shapes(self):
        assert ideal_binary_mask(rand(2, 3)).shape == (2, 3)
        assert ideal_binary_mask(rand(2, 3, 5)).shape == (2, 3, 5)
        assert ideal_binary_mask(
            rand(2, 3, 5), sensor_axis=1).shape == (2, 5)

    def test_binary_and_sums_to_one(self):
        mask = np.asarray(ideal_binary_mask(rand(2, 3, 5), sensor_axis=1))
        assert set(np.unique(mask)) <= {0.0, 1.0}
        tc.assert_allclose(mask.sum(axis=0), 1.0)

    def test_dtype_follows_signal(self):
        assert ideal_binary_mask(rand(2, 3)).dtype == np.float64


class TestWienerLikeMask:
    def test_shapes(self):
        assert wiener_like_mask(rand(2, 3)).shape == (2, 3)
        assert wiener_like_mask(
            rand(2, 3, 5), sensor_axis=1).shape == (2, 5)

    def test_sums_to_one(self):
        mask = np.asarray(wiener_like_mask(rand(2, 3, 5), sensor_axis=1))
        tc.assert_allclose(mask.sum(axis=0), 1.0, rtol=1e-6)

    def test_values(self):
        x = rand(2, 5)
        mask = np.asarray(wiener_like_mask(x))
        power = np.abs(x) ** 2
        tc.assert_allclose(
            mask, power / (power.sum(0, keepdims=True) + 1e-18))


class TestRatioAndAmplitudeMasks:
    def test_ratio_values(self):
        x = rand(2, 5)
        mask = np.asarray(ideal_ratio_mask(x))
        mag = np.abs(x)
        tc.assert_allclose(mask, mag / (mag.sum(0, keepdims=True) + 1e-18))

    def test_sensor_axis_rejected(self):
        with pytest.raises(AssertionError):
            ideal_ratio_mask(rand(2, 3, 5), sensor_axis=1)
        with pytest.raises(AssertionError):
            ideal_amplitude_mask(rand(2, 3, 5), sensor_axis=1)

    def test_amplitude_values(self):
        x = rand(2, 5)
        mask = np.asarray(ideal_amplitude_mask(x))
        expected = np.abs(x) / (np.abs(x.sum(0, keepdims=True)) + 1e-18)
        tc.assert_allclose(mask, expected)


def test_phase_sensitive_mask_values():
    x = rand(2, 5)
    mask = np.asarray(phase_sensitive_mask(x))
    y = x.sum(0, keepdims=True)
    theta = np.angle(x) - np.angle(y)
    expected = np.abs(x) / (np.abs(y) + 1e-18) * np.cos(theta)
    tc.assert_allclose(mask, expected)


def test_ideal_complex_mask_reconstructs():
    x = rand(2, 5)
    mask = np.asarray(ideal_complex_mask(x))
    y = x.sum(0)
    tc.assert_allclose(mask * y, x, rtol=1e-10)


class TestLorenzMask:
    def _loopy_lorenz(self, signal, lorenz_fraction=0.98, weight=0.999):
        power = np.abs(signal) ** 2
        shape = power.shape
        flat = power.reshape(-1)
        sorted_power = np.sort(flat, axis=None)[::-1]
        lorenz_function = np.cumsum(sorted_power) / np.sum(sorted_power)
        threshold = np.min(sorted_power[lorenz_function < lorenz_fraction])
        mask = (flat > threshold).astype(float)
        mask = 0.5 + weight * (mask - 0.5)
        return mask.reshape(shape)

    def test_matches_loopy_2d(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal((13, 17)) + 1j * rng.standard_normal((13, 17))
        ours = np.asarray(lorenz_mask(x))
        expected = self._loopy_lorenz(x)
        tc.assert_allclose(ours, expected)

    def test_batched_rows_independent(self):
        rng = np.random.default_rng(8)
        x = rng.standard_normal((3, 13, 17)) \
            + 1j * rng.standard_normal((3, 13, 17))
        ours = np.asarray(lorenz_mask(x, axis=(-2, -1)))
        for b in range(3):
            tc.assert_allclose(ours[b], self._loopy_lorenz(x[b]))

    def test_axis_time_only(self):
        rng = np.random.default_rng(9)
        x = rng.standard_normal((4, 21)) + 1j * rng.standard_normal((4, 21))
        ours = np.asarray(lorenz_mask(x, axis=-1))
        for f in range(4):
            tc.assert_allclose(ours[f], self._loopy_lorenz(x[f]))

    def test_values_are_soft_binary(self):
        mask = np.asarray(lorenz_mask(rand(5, 9)))
        assert set(np.round(np.unique(mask), 4)) <= {0.0005, 0.9995}


class TestQuantileMask:
    def test_tuple_returns_stack(self):
        x = rand(4, 9)
        mask = np.asarray(quantile_mask(x, quantile=(0.1, -0.9)))
        assert mask.shape == (2, 4, 9)

    def test_matches_numpy_percentile(self):
        rng = np.random.default_rng(10)
        x = np.abs(rng.standard_normal((5, 41)))
        q = 0.3
        ours = np.asarray(quantile_mask(x, quantile=q, axis=-1))
        threshold = np.percentile(x, (1 - q) * 100, axis=-1)
        expected = (x > threshold[:, None]).astype(float)
        expected = 0.5 + 0.999 * (expected - 0.5)
        tc.assert_allclose(ours, expected)

    def test_negative_quantile(self):
        rng = np.random.default_rng(11)
        x = np.abs(rng.standard_normal((5, 41)))
        q = -0.4
        ours = np.asarray(quantile_mask(x, quantile=q, axis=-1))
        threshold = np.percentile(x, 40, axis=-1)
        expected = (x < threshold[:, None]).astype(float)
        expected = 0.5 + 0.999 * (expected - 0.5)
        tc.assert_allclose(ours, expected)


def test_biased_binary_mask_shapes():
    x = rand(2, 30, 513)  # (speech/noise, T, F)
    mask = np.asarray(biased_binary_mask(x))
    assert mask.shape == (2, 30, 513)
    assert mask.dtype == bool
    # low frequency bins: speech off, noise on
    assert not mask[0, :, :4].any()
    assert mask[1, :, :4].all()
    # high frequency bins beyond high_cut
    assert not mask[0, :, 500:].any()
    assert mask[1, :, 500:].all()
