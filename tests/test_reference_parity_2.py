"""Reference-parity tier 2: model families with heavier dependencies
(sklearn-backed Gaussians, scipy-optimize Bingham solver, scipy-spline
Watson inverse, gammatone/SRMR, initializers, integration models).
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from _reference_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref():
    return load_reference([
        'pb_bss.distribution.gaussian',
        'pb_bss.distribution.gmm',
        'pb_bss.distribution.von_mises_fisher',
        'pb_bss.distribution.vmfmm',
        'pb_bss.distribution.complex_bingham',
        'pb_bss.distribution.cwmm',
        'pb_bss.distribution.complex_watson',
        'pb_bss.distribution.gcacgmm',
        'pb_bss.distribution.vmfcacgmm',
        'pb_bss.transform.gammatone',
        'pb_bss.evaluation.module_srmr',
        'pb_bss.initializer.deterministic',
        'pb_bss.initializer.deflation',
    ])


def _rng(seed=0):
    return np.random.RandomState(seed)


class TestGaussian:
    @pytest.mark.parametrize('covariance_type',
                             ['full', 'diagonal', 'spherical'])
    def test_fit_and_log_pdf(self, ref, covariance_type):
        from pb_bss_tpu.models import GaussianTrainer
        theirs_mod = ref['pb_bss.distribution.gaussian']
        rng = _rng(0)
        y = rng.randn(4, 100, 3)
        saliency = rng.rand(4, 100)

        ours = GaussianTrainer().fit(
            y, saliency=saliency, covariance_type=covariance_type)
        theirs = theirs_mod.GaussianTrainer().fit(
            y, saliency=saliency, covariance_type=covariance_type)
        assert_allclose(np.asarray(ours.mean), theirs.mean, rtol=1e-6)
        assert_allclose(
            np.asarray(ours.covariance), theirs.covariance, rtol=1e-6)

        # log_pdf is compared against scipy.stats (the ground truth)
        # in tests/test_models/test_gaussian_gmm.py: the reference's
        # full-covariance log_pdf whitens with the transposed
        # precision Cholesky ((L^T L)^-1 instead of Sigma^-1,
        # gaussian.py:47-51; ~1e-2 deviation from scipy) and its
        # diagonal log_pdf raises on (..., D) precisions.
        if covariance_type == 'spherical':
            x = rng.randn(4, 10, 3)
            assert_allclose(
                np.asarray(ours.log_pdf(x)),
                theirs.log_pdf(x), rtol=1e-6)


class TestGMM:
    def test_em_trajectory(self, ref):
        from pb_bss_tpu.models import GMMTrainer
        theirs_mod = ref['pb_bss.distribution.gmm']
        rng = _rng(1)
        y = rng.randn(200, 2)
        init = rng.rand(3, 200)
        init /= init.sum(0, keepdims=True)

        # one iteration = pure M-step (the reference's E-step uses
        # its transposed-precision log_pdf, see TestGaussian)
        ours = GMMTrainer().fit(y, initialization=init, iterations=1)
        theirs = theirs_mod.GMMTrainer().fit(
            y, initialization=init.copy(), iterations=1)
        assert_allclose(
            np.asarray(ours.weight), theirs.weight, rtol=1e-5)
        assert_allclose(
            np.asarray(ours.gaussian.mean), theirs.gaussian.mean,
            rtol=1e-5)
        assert_allclose(
            np.asarray(ours.gaussian.covariance),
            theirs.gaussian.covariance, rtol=1e-4)


class TestVonMisesFisher:
    def test_fit_and_log_pdf(self, ref):
        from pb_bss_tpu.models import VonMisesFisherTrainer
        theirs_mod = ref['pb_bss.distribution.von_mises_fisher']
        rng = _rng(2)
        y = rng.randn(5, 80, 4)
        saliency = rng.rand(5, 80)
        ours = VonMisesFisherTrainer().fit(y, saliency=saliency)
        theirs = theirs_mod.VonMisesFisherTrainer().fit(
            y, saliency=saliency)
        assert_allclose(np.asarray(ours.mean), theirs.mean, rtol=1e-6)
        assert_allclose(
            np.asarray(ours.concentration), theirs.concentration,
            rtol=1e-6)
        x = rng.randn(5, 10, 4)
        assert_allclose(
            np.asarray(ours.log_pdf(x)), theirs.log_pdf(x), rtol=1e-5)

    def test_vmfmm_trajectory(self, ref):
        from pb_bss_tpu.models import VMFMMTrainer
        theirs_mod = ref['pb_bss.distribution.vmfmm']
        rng = _rng(3)
        y = rng.randn(150, 3)
        init = rng.rand(2, 150)
        init /= init.sum(0, keepdims=True)
        ours = VMFMMTrainer().fit(y, initialization=init, iterations=5)
        theirs = theirs_mod.VMFMMTrainer().fit(
            y, initialization=init.copy(), iterations=5)
        assert_allclose(
            np.asarray(ours.weight), theirs.weight, rtol=1e-5)
        assert_allclose(
            np.asarray(ours.vmf.mean), theirs.vmf.mean, rtol=1e-5)
        assert_allclose(
            np.asarray(ours.vmf.concentration),
            theirs.vmf.concentration, rtol=1e-4)


class TestComplexBingham:
    @pytest.mark.slow
    def test_find_eigenvalues_random_moments(self, ref):
        from pb_bss_tpu.models.complex_bingham import find_eigenvalues
        theirs = ref['pb_bss.distribution.complex_bingham'] \
            .ComplexBinghamTrainer
        rng = _rng(4)
        for d in [2, 3, 4, 6]:
            s = rng.dirichlet(np.full(d, 2.0))
            a = np.asarray(find_eigenvalues(s))
            b = theirs.find_eigenvalues_v3(s)
            assert_allclose(a, b, rtol=1e-3, atol=5e-3)

    def test_find_eigenvalues_clipped(self, ref):
        # At the clip boundary the moment equations are infeasible;
        # the bounded scipy solver and the clipped Newton land on
        # slightly different boundary-adjacent points — compare the
        # clipped entry exactly and the free entries loosely.
        from pb_bss_tpu.models.complex_bingham import find_eigenvalues
        theirs = ref['pb_bss.distribution.complex_bingham'] \
            .ComplexBinghamTrainer
        s = np.array([0.005, 0.045, 0.95])
        a = np.asarray(find_eigenvalues(s, max_concentration=100.0))
        b = theirs.find_eigenvalues_v3(s, max_concentration=100.0)
        assert_allclose(a[0], -100.0, atol=1e-6)
        assert_allclose(b[0], -100.0, atol=1e-6)
        assert_allclose(a[1:], b[1:], rtol=0.1, atol=0.05)

    def test_norm(self, ref):
        from pb_bss_tpu.models.complex_bingham import ComplexBingham
        Theirs = ref['pb_bss.distribution.complex_bingham'] \
            .ComplexBingham
        rng = _rng(5)
        vals = np.sort(rng.uniform(0.05, 1.0, (4, 3)), axis=-1)
        a = np.asarray(ComplexBingham(None, vals).norm())
        b = Theirs(None, vals).norm()
        assert_allclose(a, b, rtol=1e-6)


class TestCWMM:
    def test_watson_concentration_inverse(self, ref):
        from pb_bss_tpu.models import ComplexWatsonTrainer
        theirs_mod = ref['pb_bss.distribution.complex_watson']
        ours_t = ComplexWatsonTrainer(6)
        theirs_t = theirs_mod.ComplexWatsonTrainer(6)
        ratios = np.array([0.2, 0.4, 0.6, 0.8, 0.95, 0.99])
        a = np.asarray(ours_t.hypergeometric_ratio_inverse(ratios))
        b = theirs_t.hypergeometric_ratio_inverse(ratios)
        assert_allclose(a, b, rtol=5e-3, atol=1e-3)

    def test_cwmm_trajectory(self, ref):
        """Same init -> matching EM trajectory; tolerance covers the
        linear-vs-quadratic concentration interpolation."""
        from pb_bss_tpu.models import CWMMTrainer
        theirs_mod = ref['pb_bss.distribution.cwmm']
        rng = _rng(6)
        F, T, D, K = 4, 60, 3, 2
        y = rng.randn(F, T, D) + 1j * rng.randn(F, T, D)
        init = rng.rand(F, K, T)
        init /= init.sum(-2, keepdims=True)
        ours = CWMMTrainer().fit(y, initialization=init, iterations=3)
        theirs = theirs_mod.CWMMTrainer().fit(
            y, initialization=init.copy(), iterations=3)
        assert_allclose(
            np.asarray(ours.weight), theirs.weight, rtol=1e-3)
        # modes up to per-(f,k) phase
        a = np.asarray(ours.complex_watson.mode)
        b = theirs.complex_watson.mode
        sim = np.abs(np.einsum('fkd,fkd->fk', a, b.conj()))
        assert_allclose(sim, 1.0, atol=1e-4)
        assert_allclose(
            np.asarray(ours.complex_watson.concentration),
            theirs.complex_watson.concentration, rtol=2e-2)


class TestIntegrationModels:
    def _data(self, seed=7, F=4, T=40, D=3, E=5):
        rng = _rng(seed)
        observation = rng.randn(F, T, D) + 1j * rng.randn(F, T, D)
        embedding = rng.randn(F, T, E)
        init = rng.rand(F, 2, T)
        init /= init.sum(-2, keepdims=True)
        return observation, embedding, init

    def test_gcacgmm_trajectory(self, ref):
        from pb_bss_tpu.models import GCACGMMTrainer
        theirs_mod = ref['pb_bss.distribution.gcacgmm']
        observation, embedding, init = self._data()
        kwargs = dict(iterations=3, covariance_type='spherical')
        ours = GCACGMMTrainer().fit(
            observation, embedding, initialization=init, **kwargs)
        theirs = theirs_mod.GCACGMMTrainer().fit(
            observation, embedding, initialization=init.copy(),
            **kwargs)
        assert_allclose(
            np.asarray(ours.weight), theirs.weight, rtol=1e-4)
        assert_allclose(
            np.asarray(ours.gaussian.mean), theirs.gaussian.mean,
            rtol=1e-4)
        assert_allclose(
            np.asarray(ours.gaussian.covariance),
            theirs.gaussian.covariance, rtol=1e-4)
        assert_allclose(
            np.asarray(ours.cacg.covariance_eigenvalues),
            theirs.cacg.covariance_eigenvalues, rtol=1e-3, atol=1e-7)

    def test_vmfcacgmm_trajectory(self, ref):
        from pb_bss_tpu.models import VMFCACGMMTrainer
        theirs_mod = ref['pb_bss.distribution.vmfcacgmm']
        observation, embedding, init = self._data(seed=8)
        ours = VMFCACGMMTrainer().fit(
            observation, embedding, initialization=init, iterations=3)
        theirs = theirs_mod.VMFCACGMMTrainer().fit(
            observation, embedding, initialization=init.copy(),
            iterations=3)
        assert_allclose(
            np.asarray(ours.weight), theirs.weight, rtol=1e-4)
        assert_allclose(
            np.asarray(ours.vmf.mean), theirs.vmf.mean, rtol=1e-3)
        assert_allclose(
            np.asarray(ours.vmf.concentration),
            theirs.vmf.concentration, rtol=1e-3)
        assert_allclose(
            np.asarray(ours.cacg.covariance_eigenvalues),
            theirs.cacg.covariance_eigenvalues, rtol=1e-3, atol=1e-7)


class TestGammatoneSrmr:
    def test_gammatone_filterbank(self, ref):
        from pb_bss_tpu.transform.gammatone import gammatone_filterbank
        theirs = ref['pb_bss.transform.gammatone']
        rng = _rng(9)
        x = rng.randn(2000)
        a = np.asarray(gammatone_filterbank(x, 16000, n=8))
        b = np.asarray(theirs.gammatone_filterbank(x, 16000, n=8))
        assert_allclose(a, b, atol=1e-8)

    def test_srmr(self, ref):
        from pb_bss_tpu.evaluation import srmr
        theirs = ref['pb_bss.evaluation.module_srmr']
        rng = _rng(10)
        t = np.arange(16000) / 16000
        env = np.clip(np.sin(2 * np.pi * 3 * t), 0, None) + 0.1
        x = env * rng.randn(16000)
        a = float(srmr(x, 16000))
        b = float(theirs.srmr(x, 16000))
        assert_allclose(a, b, rtol=1e-6)


class TestInitializers:
    def test_flag(self, ref):
        from pb_bss_tpu.initializer.deterministic import flag
        theirs = ref['pb_bss.initializer.deterministic']
        Y = np.ones([4, 50, 3])
        for kwargs in [{}, {'minimum': 0.05}]:
            a = np.asarray(flag(Y, 3, permutation_free=True, **kwargs))
            b = theirs.flag(Y, 3, permutation_free=True, **kwargs)
            assert_allclose(a, b, rtol=1e-12)

    def test_deflation_seed(self, ref):
        from pb_bss_tpu.initializer.deflation import deflationSeed
        theirs = ref['pb_bss.initializer.deflation']
        rng = _rng(11)
        F, T, D = 257, 30, 3
        Y = rng.randn(F, T, D) + 1j * rng.randn(F, T, D)
        a = np.asarray(deflationSeed(Y, sources=2))
        b = np.asarray(theirs.deflationSeed(Y.copy(), sources=2))
        assert_allclose(a, b, rtol=1e-5, atol=1e-8)
