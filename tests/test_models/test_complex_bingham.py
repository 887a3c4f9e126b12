"""Complex Bingham tests: solver parity with reference doctest values
(/root/reference/pb_bss/distribution/complex_bingham.py:236-425,
:85-160) and CBMM shape/EM smoke tests.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models.complex_bingham import (
    ComplexBingham,
    ComplexBinghamTrainer,
    find_eigenvalues,
    _remove_duplicate_eigenvalues,
)
from pb_bss_tpu.models.cbmm import CBMMTrainer


class TestNorm:
    def test_reference_doctest_values(self):
        assert_allclose(
            float(ComplexBingham(
                None, np.array([0.8, 0.92679492, 1.27320508])).norm()),
            84.71169626134224, rtol=1e-9)
        assert_allclose(
            float(ComplexBingham(None, np.array([1, 0.1, 0.1])).norm()),
            47.34827539909092, rtol=1e-7)
        assert_allclose(
            float(ComplexBingham(None, np.array([1, 0.1, 0.0])).norm()),
            45.92874653819097, rtol=1e-7)
        # independent axis
        assert_allclose(
            np.asarray(ComplexBingham(
                None, np.array([[1, 0.1, 0.1], [1, 0.1, 0.0]])).norm()),
            [47.3482754, 45.92874654], rtol=1e-7)
        # order invariance
        assert_allclose(
            np.asarray(ComplexBingham(
                None, np.array([[0.1, 1, 0.1], [0.1, 1, 0.0]])).norm()),
            [47.3482754, 45.92874654], rtol=1e-7)

    def test_duplicate_regularization_matches_analytic(self):
        # analytic solution for [1, 0.1, 0.1]
        analytic = 2 * np.pi ** 3 * (
            np.exp(1) / 0.9 ** 2 - np.exp(0.1) / 0.9 ** 2
            + np.exp(0.1) / (0.1 - 1))
        got = float(ComplexBingham(None, np.array([1, 0.1, 0.1])).norm())
        assert_allclose(got, analytic, rtol=1e-6)

    def test_higher_dimension(self):
        # exact value 19.10258... (50-digit mpmath); f64 evaluation of
        # the closed form loses ~4 digits to cancellation (the
        # reference's pinned doctest value 19.0955 has the same error)
        got = float(ComplexBingham(None, np.array([
            5.15996555e-04, 6.28805516e-04, 1.37554184e-03,
            1.53621463e-02, 3.74437619e-02, 9.44673748e-01])).norm())
        assert_allclose(got, 19.102580568891337, rtol=1e-3)


class TestRemoveDuplicateEigenvalues:
    def test_sorting_and_inverse_permutation(self):
        inv, vals = _remove_duplicate_eigenvalues(np.array([0.9, 0.1]))
        assert_allclose(np.asarray(vals), [0.1, 0.9])
        np.testing.assert_array_equal(np.asarray(inv), [1, 0])

        inv, vals = _remove_duplicate_eigenvalues(
            np.array([0.9, 0.06, 0.04]))
        assert_allclose(np.asarray(vals), [0.04, 0.06, 0.9])
        np.testing.assert_array_equal(np.asarray(inv), [2, 1, 0])

    def test_minimum_spacing(self):
        _, vals = _remove_duplicate_eigenvalues(np.array([0.5, 0.5]))
        vals = np.asarray(vals)
        assert vals[1] - vals[0] >= 1e-8 * (1 - 1e-12)


class TestFindEigenvalues:
    """Values pinned from the reference's find_eigenvalues_v3 doctests
    (complex_bingham.py:303-425)."""

    def test_d2(self):
        got = np.asarray(find_eigenvalues(np.array([0.9, 0.1])))
        assert_allclose(got, [0.0, -9.99544117], atol=1e-5)

    def test_d2_symmetric(self):
        got = np.asarray(find_eigenvalues(np.array([0.5, 0.5])))
        assert_allclose(got, [0.0, 0.0], atol=1e-3)

    def test_d3(self):
        got = np.asarray(find_eigenvalues(np.array([0.9, 0.06, 0.04])))
        assert_allclose(got, [0.0, -16.66662429, -24.99999135], atol=1e-4)

    def test_d6(self):
        got = np.asarray(find_eigenvalues(
            np.array([0.9, 0.06, 0.03, 0.006, 0.003, 0.001])))
        assert_allclose(
            got,
            [0.0, -16.66663119, -33.33332875, -166.66666412,
             -333.33333091, -999.99999758],
            rtol=1e-5, atol=1e-3)

    def test_d6_extreme(self):
        got = np.asarray(find_eigenvalues(np.array([
            5.15996555e-04, 6.28805516e-04, 1.37554184e-03,
            1.53621463e-02, 3.74437619e-02, 9.44673748e-01])))
        assert_allclose(
            got,
            [-1937.99743489, -1590.31683812, -726.98624711,
             -65.09507073, -26.70671827, 0.0],
            rtol=1e-4, atol=1e-2)

    def test_max_concentration_clips(self):
        got = np.asarray(find_eigenvalues(
            np.array([
                5.15996555e-04, 6.28805516e-04, 1.37554184e-03,
                1.53621463e-02, 3.74437619e-02, 9.44673748e-01]),
            max_concentration=500.0))
        assert got.min() >= -500.0 - 1e-6
        assert abs(got.max()) < 1e-3
        # the unclipped components remain close to the reference
        assert_allclose(got[3], -66.3, atol=2.0)
        assert_allclose(got[4], -26.9, atol=1.0)

    def test_moment_round_trip(self):
        """grad log c at the solution reproduces the input moments."""
        import jax
        from pb_bss_tpu.models.complex_bingham import (
            _grad_log_norm, _remove_duplicate_eigenvalues)
        s = np.array([0.04, 0.06, 0.9])
        lam = np.asarray(find_eigenvalues(s))
        lam_sorted = np.sort(lam)
        moments = np.asarray(_grad_log_norm(lam_sorted))
        assert_allclose(moments, np.sort(s), rtol=1e-4)

    def test_batched(self):
        from pb_bss_tpu.models.complex_bingham import _grad_log_norm
        s = np.array([[0.9, 0.1], [0.8, 0.2], [0.5, 0.5]])
        got = np.asarray(find_eigenvalues(s))
        assert got.shape == (3, 2)
        assert_allclose(got[0], [0.0, -9.99544117], atol=1e-5)
        # every row solves its own moment equation
        for row, target in zip(got, s):
            moments = np.asarray(_grad_log_norm(np.sort(row)))
            assert_allclose(moments, np.sort(target), atol=1e-3)


class TestComplexBinghamTrainer:
    def test_fit_shapes(self):
        rng = np.random.RandomState(0)
        N, D = 500, 3
        y = rng.randn(N, D) + 1j * rng.randn(N, D)
        model = ComplexBinghamTrainer().fit(y)
        assert model.covariance_eigenvectors.shape == (D, D)
        assert model.covariance_eigenvalues.shape == (D,)
        # max eigenvalue pinned to ~0
        assert abs(float(np.max(
            np.asarray(model.covariance_eigenvalues)))) < 1e-3

    def test_fit_recovers_dominant_direction(self):
        rng = np.random.RandomState(1)
        N, D = 3000, 3
        base = np.array([1.0, 0.0, 0.0], complex)
        y = np.tile(base, (N, 1)) + 0.2 * (
            rng.randn(N, D) + 1j * rng.randn(N, D))
        model = ComplexBinghamTrainer(max_concentration=500).fit(y)
        vecs = np.asarray(model.covariance_eigenvectors)
        vals = np.asarray(model.covariance_eigenvalues)
        mode = vecs[:, np.argmax(vals)]
        cos = abs(mode.conj() @ base) / np.linalg.norm(mode)
        assert cos > 0.98, cos


class TestCBMM:
    def test_cbmm_shape_smoke(self):
        """2 EM iterations like the reference smoke test
        (test_spatial_mm.py:140-149)."""
        rng = np.random.RandomState(0)
        F, T, D = 3, 100, 3
        y = rng.randn(F, T, D) + 1j * rng.randn(F, T, D)
        model = CBMMTrainer(max_concentration=500).fit(
            y, num_classes=2, iterations=2)
        assert model.weight.shape == (F, 2, 1)
        assert model.complex_bingham.covariance_eigenvalues.shape \
            == (F, 2, D)
        affiliation = np.asarray(model.predict(y))
        assert affiliation.shape == (F, 2, T)
        assert_allclose(affiliation.sum(-2), 1.0, rtol=1e-5)

    @pytest.mark.slow
    def test_warm_start_em_quality(self):
        """The warm-started inverse-moment Newton (10 steps from the
        previous EM iteration's eigenvalues) must reach the same EM
        objective as the cold 50-step solver; trajectories may differ
        (local-path noise), so compare total log-likelihood."""
        import jax
        import jax.numpy as jnp
        from jax.scipy.special import logsumexp
        import pb_bss_tpu.models.complex_bingham as cb

        rng = np.random.RandomState(3)
        F, T, D, K = 13, 80, 4, 2
        y = (rng.randn(F, T, D) + 1j * rng.randn(F, T, D)).astype(
            np.complex64)
        yj = jnp.asarray(y)

        def loglik(m):
            yn = yj / jnp.linalg.norm(yj, axis=-1, keepdims=True)
            lp = m.complex_bingham.log_pdf(yn[..., None, :, :])
            return float(jnp.sum(
                logsumexp(jnp.log(m.weight) + lp, axis=-2)))

        m_warm = CBMMTrainer().fit(yj, num_classes=K, iterations=8)
        orig_fit = cb.ComplexBinghamTrainer._fit

        def cold(self, y, saliency, warm_start=None,
                 solver_iterations=None):
            return orig_fit(self, y, saliency)

        cb.ComplexBinghamTrainer._fit = cold
        try:
            jax.clear_caches()
            m_cold = CBMMTrainer().fit(yj, num_classes=K, iterations=8)
        finally:
            cb.ComplexBinghamTrainer._fit = orig_fit
        ll_w, ll_c = loglik(m_warm), loglik(m_cold)
        assert abs(ll_w - ll_c) / abs(ll_c) < 1e-3, (ll_w, ll_c)

    def test_f32_degenerate_moments_stay_finite(self):
        """Near-zero f32 moments (point-like scatter) must not NaN:
        the solver clamps its iterates to the dd norm's exact domain
        (the unbounded -1/s init alone overflows f32)."""
        import jax
        import jax.numpy as jnp
        from pb_bss_tpu.models.complex_bingham import (
            _grad_log_norm, find_eigenvalues)
        rng = np.random.RandomState(0)
        s = np.sort(rng.dirichlet(
            np.ones(6) * 0.7, size=(64,)).astype(np.float32), -1)
        s[0, :3] = [0.0, 1e-12, 1e-7]  # degenerate rows
        s[0] /= s[0].sum()
        lam = np.asarray(find_eigenvalues(jnp.asarray(s)))
        assert np.isfinite(lam).all()
        g = np.asarray(jax.vmap(_grad_log_norm)(jnp.asarray(lam)))
        # moments reproduced except where clamped (tiny moments)
        mask = s > 1e-3
        assert np.abs((g - s) * mask).max() < 5e-3
