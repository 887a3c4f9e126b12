"""Complex Watson / CWMM tests
(mirrors /root/reference/tests/test_distribution/test_cwmm.py and
test_complex_watson.py).
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_equal

from pb_bss_tpu.models import (
    CWMMTrainer,
    ComplexAngularCentralGaussian,
    ComplexWatson,
    ComplexWatsonTrainer,
)


class TestComplexWatsonNorms:
    def test_log_norm_against_hyp1f1(self):
        from scipy.special import hyp1f1
        import math
        for dimension in [2, 3, 6]:
            scale = np.array([1e-4, 0.01, 0.5, 1.0, 5.0, 20.0, 100.0, 400.0])
            expected = np.log(
                hyp1f1(1, dimension, scale)
                * 2 * np.pi ** dimension / math.factorial(dimension - 1))
            got = np.asarray(
                ComplexWatson.log_norm_tran_vu(scale, dimension))
            assert_allclose(got, expected, rtol=1e-6)

    def test_low_medium_high_consistency(self):
        dimension = 6
        low = ComplexWatson.log_norm_low_concentration(
            np.array([0.01]), dimension)
        med = ComplexWatson.log_norm_medium_concentration(
            np.array([5.0]), dimension)
        high = ComplexWatson.log_norm_high_concentration(
            np.array([200.0]), dimension)
        med200 = ComplexWatson.log_norm_medium_concentration(
            np.array([200.0]), dimension)
        assert_allclose(float(high[0]), float(med200[0]), rtol=1e-6)
        assert np.isfinite(float(low[0]))
        assert np.isfinite(float(med[0]))


class TestHypergeometricRatioInverse:
    def test_round_trip(self):
        t = ComplexWatsonTrainer(5)
        kappas = np.array([0.5, 1.0, 5.0, 20.0, 100.0, 400.0])
        ratios = t.hypergeometric_ratio(kappas)
        got = np.asarray(t.hypergeometric_ratio_inverse(ratios))
        assert_allclose(got, kappas, rtol=1e-2)

    def test_reference_boundary_values(self):
        """Reference doctest values (complex_watson.py:258-266)."""
        t = ComplexWatsonTrainer(5)
        got = np.asarray(t.hypergeometric_ratio_inverse(
            [0, 1 / 5, 1 / 5 + 1e-4, 0.9599999, 1]))
        assert got[0] == 0
        assert got[1] == pytest.approx(0, abs=1e-3)
        assert got[2] == pytest.approx(3.7488e-3, rel=0.3)
        assert got[3] == pytest.approx(100, rel=0.01)
        assert got[4] == pytest.approx(500, rel=1e-6)


class TestComplexWatsonTrainer:
    def test_mode_recovery(self):
        """Fit on cACG samples with a dominant direction."""
        rng_key = 0
        covariance = np.array(
            [[10, 1 + 1j, 1 + 1j], [1 - 1j, 5, 1], [1 - 1j, 1, 2]])
        cacg = ComplexAngularCentralGaussian.from_covariance(
            covariance=covariance)
        x = np.asarray(cacg.sample(size=(5000,)))
        model = ComplexWatsonTrainer().fit(x)
        assert model.mode.shape == (3,)
        assert model.concentration.shape == ()
        # mode should align with the dominant eigenvector of the scatter
        # S[d, e] = sum_n y[n, d] conj(y[n, e])
        scatter = x.T @ x.conj() / len(x)
        w, v = np.linalg.eigh(scatter)
        mode = np.asarray(model.mode)
        cos = np.abs(mode.conj() @ v[:, -1])
        assert cos > 0.99, cos


class TestCWMM:
    def test_cwmm_shape(self):
        rng = np.random.RandomState(0)
        samples = 10000
        weight = np.array([0.3, 0.7])
        labels = rng.choice(2, size=(samples,), p=weight)
        covariance = np.array([
            [[10, 1 + 1j, 1 + 1j], [1 - 1j, 5, 1], [1 - 1j, 1, 2]],
            [[2, 0, 0], [0, 3, 0], [0, 0, 2]],
        ])
        covariance = covariance / np.trace(
            covariance, axis1=-2, axis2=-1)[..., None, None]
        dimension = covariance.shape[-1]
        x = np.zeros((samples, dimension), dtype=np.complex128)
        import jax
        for k in range(2):
            cacg = ComplexAngularCentralGaussian.from_covariance(
                covariance=covariance[k])
            x[labels == k] = np.asarray(cacg.sample(
                size=(int(np.sum(labels == k)),),
                key=jax.random.key(k)))

        model = CWMMTrainer().fit(x, num_classes=2)
        assert_equal(model.weight.shape, (2, 1))
        assert_equal(model.complex_watson.mode.shape, (2, 3))
        assert_equal(model.complex_watson.concentration.shape, (2,))

    def test_cwmm_per_frequency(self):
        """Leading independent (frequency) dims."""
        rng = np.random.RandomState(1)
        F, T, D = 5, 100, 3
        y = rng.randn(F, T, D) + 1j * rng.randn(F, T, D)
        model = CWMMTrainer().fit(y, num_classes=2, iterations=5)
        assert model.weight.shape == (F, 2, 1)
        assert model.complex_watson.mode.shape == (F, 2, D)
        affiliation = np.asarray(model.predict(y))
        assert affiliation.shape == (F, 2, T)
        assert_allclose(affiliation.sum(-2), 1.0, rtol=1e-5)

    def test_cwmm_separates_two_directions(self):
        """Two well-separated directional clusters on the complex
        sphere must be recovered."""
        rng = np.random.RandomState(2)
        D = 3
        modes = np.eye(D, dtype=complex)[:2]  # e_0, e_1
        x = []
        for k in range(2):
            base = np.tile(modes[k], (2000, 1))
            noise = 0.15 * (rng.randn(2000, D) + 1j * rng.randn(2000, D))
            x.append(base + noise)
        x = np.concatenate(x)
        model = CWMMTrainer().fit(x, num_classes=2, iterations=30)
        est = np.asarray(model.complex_watson.mode)
        scores = np.abs(est.conj() @ modes.T)  # (K_est, K_true)
        if scores[0, 0] + scores[1, 1] < scores[0, 1] + scores[1, 0]:
            est = est[::-1]
        for k in range(2):
            cos = np.abs(est[k].conj() @ modes[k]) / np.linalg.norm(est[k])
            assert cos > 0.97, (k, cos)
