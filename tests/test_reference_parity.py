"""Direct numerical parity against the reference implementation.

The reference's pure-NumPy modules (mounted read-only at
/root/reference) are imported with stubs for its unavailable
third-party dependencies and compared value-for-value against this
framework on identical random inputs — the strongest available check
that the TPU-native re-design preserves the reference's semantics.

Skipped when the reference checkout is not present.
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
        'pb_bss.utils',
        'pb_bss.math.solve',
        'pb_bss.distribution.mixture_model_utils',
        'pb_bss.distribution.complex_angular_central_gaussian',
        'pb_bss.distribution.cacgmm',
        'pb_bss.distribution.complex_watson',
        'pb_bss.extraction.mask_module',
        'pb_bss.extraction.beamformer',
        'pb_bss.permutation_alignment',
        'pb_bss.evaluation.sxr_module',
        'pb_bss.evaluation.module_si_sdr',
    ])


def _rng(seed=0):
    return np.random.RandomState(seed)


class TestMixtureModelUtils:
    def test_log_pdf_to_affiliation(self, ref):
        import pb_bss_tpu.models.mixture_model_utils as ours
        theirs = ref['pb_bss.distribution.mixture_model_utils']
        rng = _rng(0)
        log_pdf = rng.randn(5, 3, 20) * 10
        weight = rng.dirichlet([1, 1, 1], size=5)[..., None]
        mask = rng.rand(5, 3, 20) > 0.2
        for kwargs in [
            {},
            {'affiliation_eps': 1e-4},
            {'source_activity_mask': mask},
        ]:
            a = np.asarray(ours.log_pdf_to_affiliation(
                weight, log_pdf, **kwargs))
            b = theirs.log_pdf_to_affiliation(weight, log_pdf, **kwargs)
            assert_allclose(a, b, rtol=1e-6, atol=1e-12)

    @pytest.mark.parametrize('wca', [(-1,), -1, (-3, -1), -2, (-3,)])
    def test_estimate_mixture_weight(self, ref, wca):
        import pb_bss_tpu.models.mixture_model_utils as ours
        theirs = ref['pb_bss.distribution.mixture_model_utils']
        rng = _rng(1)
        affiliation = rng.rand(5, 3, 20)
        affiliation /= affiliation.sum(-2, keepdims=True)
        a = np.asarray(ours.estimate_mixture_weight(
            affiliation, weight_constant_axis=wca))
        b = theirs.estimate_mixture_weight(
            affiliation, weight_constant_axis=wca)
        assert a.shape == np.asarray(b).shape, (a.shape, b.shape)
        assert_allclose(a, b, rtol=1e-6)

    def test_estimate_mixture_weight_saliency(self, ref):
        import pb_bss_tpu.models.mixture_model_utils as ours
        theirs = ref['pb_bss.distribution.mixture_model_utils']
        rng = _rng(2)
        affiliation = rng.rand(5, 3, 20)
        saliency = rng.rand(5, 20)
        a = np.asarray(ours.estimate_mixture_weight(
            affiliation, saliency=saliency, weight_constant_axis=(-1,)))
        b = theirs.estimate_mixture_weight(
            affiliation, saliency=saliency, weight_constant_axis=(-1,))
        assert_allclose(a, b, rtol=1e-6)


class TestStableSolve:
    @pytest.mark.slow
    def test_regular_and_singular(self, ref):
        from pb_bss_tpu.ops.linalg import stable_solve as ours
        theirs = ref['pb_bss.math.solve'].stable_solve
        rng = _rng(3)
        A = rng.randn(4, 5, 5) + 1j * rng.randn(4, 5, 5)
        B = rng.randn(4, 5, 5) + 1j * rng.randn(4, 5, 5)
        assert_allclose(np.asarray(ours(A, B)), theirs(A, B), rtol=1e-8)
        A[2, :, :] = 0  # singular slice -> lstsq fallback
        assert_allclose(
            np.asarray(ours(A, B)), theirs(A, B), rtol=1e-6, atol=1e-9)


class TestMasks:
    def _signal(self, *shape, seed=4):
        rng = _rng(seed)
        return rng.randn(*shape) + 1j * rng.randn(*shape)

    @pytest.mark.parametrize('name,kwargs', [
        ('ideal_binary_mask', {}),
        ('ideal_binary_mask', {'sensor_axis': 1}),
        ('wiener_like_mask', {}),
        ('wiener_like_mask', {'sensor_axis': 1}),
        ('ideal_ratio_mask', {}),
        ('ideal_amplitude_mask', {}),
        ('phase_sensitive_mask', {}),
        ('ideal_complex_mask', {}),
    ])
    def test_simple_masks(self, ref, name, kwargs):
        import pb_bss_tpu.extraction.mask_module as ours
        theirs = ref['pb_bss.extraction.mask_module']
        x = self._signal(2, 3, 5)
        a = np.asarray(getattr(ours, name)(x, **kwargs))
        b = getattr(theirs, name)(x, **kwargs)
        assert_allclose(a, b, rtol=1e-6, atol=1e-12)

    def test_lorenz_mask(self, ref):
        import pb_bss_tpu.extraction.mask_module as ours
        theirs = ref['pb_bss.extraction.mask_module']
        x = self._signal(3, 13, 17, seed=5)
        for kwargs in [{}, {'axis': -1}, {'lorenz_fraction': 0.8}]:
            a = np.asarray(ours.lorenz_mask(x, **kwargs))
            b = theirs.lorenz_mask(x, **kwargs)
            assert_allclose(a, b, rtol=1e-6)

    def test_quantile_mask(self, ref):
        import pb_bss_tpu.extraction.mask_module as ours
        theirs = ref['pb_bss.extraction.mask_module']
        x = self._signal(4, 41, seed=6)
        a = np.asarray(ours.quantile_mask(x, quantile=(0.1, -0.9)))
        b = theirs.quantile_mask(x, quantile=(0.1, -0.9))
        assert_allclose(a, b, rtol=1e-6)

    def test_biased_binary_mask(self, ref):
        import pb_bss_tpu.extraction.mask_module as ours
        theirs = ref['pb_bss.extraction.mask_module']
        # 2-D input: for 3-D inputs the reference's high-cut slice uses
        # len(mask[0]) (the wrong axis) and silently never applies —
        # this implementation uses the intended frequency gating.
        x = self._signal(2, 513, seed=7)
        a = np.asarray(ours.biased_binary_mask(x))
        b = theirs.biased_binary_mask(x)
        np.testing.assert_array_equal(a, b)

    def test_voiced_unvoiced_split(self, ref):
        import pb_bss_tpu.extraction.mask_module as ours
        theirs = ref['pb_bss.extraction.mask_module']
        for bins in [257, 513]:
            av, au = ours.voiced_unvoiced_split_characteristic(bins)
            bv, bu = theirs.voiced_unvoiced_split_characteristic(bins)
            assert_allclose(av, bv)
            assert_allclose(au, bu)


class TestBeamformers:
    def _psds(self, seed=8, F=7, D=4):
        from pb_bss_tpu.testing.random_utils import pos_def_hermitian
        rng = np.random.default_rng(seed)
        return (np.asarray(pos_def_hermitian((F, D, D), rng=rng)),
                np.asarray(pos_def_hermitian((F, D, D), rng=rng)))

    def test_psd_estimation(self, ref):
        import pb_bss_tpu.extraction.beamformer as ours
        theirs = ref['pb_bss.extraction.beamformer']
        rng = _rng(9)
        F, D, K, T = 5, 3, 2, 40
        X = rng.randn(F, D, T) + 1j * rng.randn(F, D, T)
        mask = rng.rand(F, K, T)
        a = np.asarray(ours.get_power_spectral_density_matrix(
            X, mask=mask))
        b = theirs.get_power_spectral_density_matrix(X, mask=mask)
        assert_allclose(a, b, rtol=1e-6)
        a = np.asarray(ours.get_power_spectral_density_matrix(X))
        b = theirs.get_power_spectral_density_matrix(X)
        assert_allclose(a, b, rtol=1e-6)

    def test_mvdr_souden(self, ref):
        import pb_bss_tpu.extraction.beamformer as ours
        theirs = ref['pb_bss.extraction.beamformer']
        phi_xx, phi_nn = self._psds()
        a = np.asarray(ours.get_mvdr_vector_souden(phi_xx, phi_nn))
        b = theirs.get_mvdr_vector_souden(phi_xx, phi_nn)
        assert_allclose(a, b, rtol=1e-6)

    def test_wmwf(self, ref):
        import pb_bss_tpu.extraction.beamformer as ours
        theirs = ref['pb_bss.extraction.beamformer']
        phi_xx, phi_nn = self._psds(10)
        for kwargs in [
            {'reference_channel': 1},
            {'reference_channel': 0, 'distortion_weight': 3.0},
            {'reference_channel': 0,
             'distortion_weight': 'frequency_dependent'},
        ]:
            a = np.asarray(ours.get_wmwf_vector(
                phi_xx, phi_nn, **kwargs))
            b = theirs.get_wmwf_vector(phi_xx, phi_nn, **kwargs)
            assert_allclose(a, b, rtol=1e-6)

    def test_ban(self, ref):
        import pb_bss_tpu.extraction.beamformer as ours
        theirs = ref['pb_bss.extraction.beamformer']
        phi_xx, phi_nn = self._psds(11)
        rng = _rng(11)
        w = rng.randn(7, 4) + 1j * rng.randn(7, 4)
        a = np.asarray(ours.blind_analytic_normalization(w, phi_nn))
        b = theirs.blind_analytic_normalization(w, phi_nn)
        assert_allclose(a, b, rtol=1e-6)

    def test_lcmv(self, ref):
        import pb_bss_tpu.extraction.beamformer as ours
        theirs = ref['pb_bss.extraction.beamformer']
        rng = _rng(12)
        K, F, D = 2, 5, 4
        atf = rng.randn(K, F, D) + 1j * rng.randn(K, F, D)
        _, phi_nn = self._psds(12, F=F, D=D)
        a = np.asarray(ours.get_lcmv_vector(atf, [1., 0.], phi_nn))
        b = theirs.get_lcmv_vector(atf, [1., 0.], phi_nn)
        assert_allclose(a, b, rtol=1e-5)

    def test_gev_cos_similarity(self, ref):
        import pb_bss_tpu.extraction.beamformer as ours
        theirs = ref['pb_bss.extraction.beamformer']
        phi_xx, phi_nn = self._psds(13)
        a = np.asarray(ours.get_gev_vector(phi_xx, phi_nn))
        b = theirs.get_gev_vector(phi_xx, phi_nn)
        sim = np.abs(np.einsum('fd,fd->f', a, b.conj()))
        sim /= np.sqrt(np.abs(np.einsum('fd,fd->f', a, a.conj())))
        sim /= np.sqrt(np.abs(np.einsum('fd,fd->f', b, b.conj())))
        assert_allclose(sim, 1.0, atol=1e-6)

    def test_phase_correction_and_conditioning(self, ref):
        import pb_bss_tpu.extraction.beamformer as ours
        theirs = ref['pb_bss.extraction.beamformer']
        rng = _rng(14)
        w = rng.randn(7, 4) + 1j * rng.randn(7, 4)
        assert_allclose(
            np.asarray(ours.phase_correction(w)),
            theirs.phase_correction(w), rtol=1e-6)
        phi, _ = self._psds(14)
        assert_allclose(
            np.asarray(ours.condition_covariance(phi, 1e-3)),
            theirs.condition_covariance(phi, 1e-3), rtol=1e-6)

    def test_pca_vector_scalings(self, ref):
        import pb_bss_tpu.extraction.beamformer as ours
        theirs = ref['pb_bss.extraction.beamformer']
        phi, _ = self._psds(15)
        for scaling in [None, 'trace', 'eigenvalue']:
            a = np.asarray(ours.get_pca_vector(phi, scaling))
            b = theirs.get_pca_vector(phi, scaling)
            # eigenvectors carry an arbitrary phase per bin
            sim = np.abs(np.einsum('fd,fd->f', a, b.conj()))
            na = np.linalg.norm(a, axis=-1)
            nb = np.linalg.norm(b, axis=-1)
            assert_allclose(sim, na * nb, rtol=1e-6)
            assert_allclose(na, nb, rtol=1e-6)


class TestCACG:
    def test_log_pdf_parity(self, ref):
        from pb_bss_tpu.models import ComplexAngularCentralGaussian
        theirs_mod = ref[
            'pb_bss.distribution.complex_angular_central_gaussian']
        from pb_bss_tpu.testing.random_utils import pos_def_hermitian
        cov = np.asarray(pos_def_hermitian((4, 4)))
        rng = _rng(16)
        y = rng.randn(30, 4) + 1j * rng.randn(30, 4)

        ours = ComplexAngularCentralGaussian.from_covariance(cov)
        theirs = theirs_mod.ComplexAngularCentralGaussian.from_covariance(
            covariance=cov)
        assert_allclose(
            np.asarray(ours.log_pdf(y)), theirs.log_pdf(y), rtol=1e-6)

    def test_cacgmm_em_trajectory(self, ref):
        """Same affiliation init -> the full EM trajectory matches the
        reference step for step (covers E-step, M-step scatter, eigh
        parameterization and weight estimation at once)."""
        from pb_bss_tpu.models import CACGMMTrainer
        theirs_mod = ref['pb_bss.distribution.cacgmm']
        rng = _rng(17)
        F, T, D, K = 6, 50, 3, 2
        y = rng.randn(F, T, D) + 1j * rng.randn(F, T, D)
        init = rng.rand(F, K, T)
        init /= init.sum(-2, keepdims=True)

        ours = CACGMMTrainer().fit(
            y, initialization=init, iterations=4)
        theirs = theirs_mod.CACGMMTrainer().fit(
            y, initialization=init.copy(), iterations=4)

        assert_allclose(
            np.asarray(ours.weight), theirs.weight, rtol=1e-5)
        assert_allclose(
            np.asarray(ours.cacg.covariance_eigenvalues),
            theirs.cacg.covariance_eigenvalues, rtol=1e-4, atol=1e-8)
        a = np.asarray(ours.predict(y))
        b = theirs.predict(y)
        assert_allclose(a, b, rtol=1e-4, atol=1e-6)


class TestComplexWatson:
    def test_log_norms(self, ref):
        from pb_bss_tpu.models import ComplexWatson
        theirs = ref['pb_bss.distribution.complex_watson'].ComplexWatson
        # each approximation compared inside its validity domain (the
        # low-concentration Taylor series diverges above ~20, where
        # tiny implementation differences amplify)
        low = np.array([1e-4, 1e-3, 0.05])
        medium = np.array([0.5, 5.0, 20.0, 100.0])
        high = np.array([50.0, 100.0, 400.0])
        for dimension in [3, 6]:
            assert_allclose(
                np.asarray(ComplexWatson.log_norm_low_concentration(
                    low, dimension)),
                theirs.log_norm_low_concentration(low, dimension),
                rtol=1e-6)
            assert_allclose(
                np.asarray(ComplexWatson.log_norm_medium_concentration(
                    medium, dimension)),
                theirs.log_norm_medium_concentration(medium, dimension),
                rtol=1e-6)
            assert_allclose(
                np.asarray(ComplexWatson.log_norm_high_concentration(
                    high, dimension)),
                theirs.log_norm_high_concentration(high, dimension),
                rtol=1e-6)


class TestPermutationAlignment:
    def test_dhtv_mapping_identical(self, ref):
        from pb_bss_tpu.permutation_alignment import (
            DHTVPermutationAlignment as Ours)
        Theirs = ref['pb_bss.permutation_alignment'] \
            .DHTVPermutationAlignment
        rng = _rng(18)
        K, F, T = 3, 257, 40
        base = rng.uniform(0.1, 1.0, size=(K, 1, T))
        modulation = 1 + 0.3 * np.sin(
            np.linspace(0, 4 * np.pi, F)[None, :, None]
            + np.arange(K)[:, None, None])
        mask = (base * modulation)
        perm = np.stack([rng.permutation(K) for _ in range(F)], axis=1)
        mask = mask[perm, np.arange(F)]

        a = np.asarray(
            Ours.from_stft_size(512).calculate_mapping(mask))
        b = Theirs.from_stft_size(512).calculate_mapping(mask.copy())
        np.testing.assert_array_equal(a, b)

    def test_greedy_chain_identical(self, ref):
        from pb_bss_tpu.permutation_alignment import (
            GreedyPermutationAlignment as Ours)
        Theirs = ref['pb_bss.permutation_alignment'] \
            .GreedyPermutationAlignment
        rng = _rng(19)
        K, F, T = 3, 33, 20
        mask = rng.rand(K, F, T)
        for metric in ['cos', 'euclidean']:
            a = np.asarray(Ours(metric).calculate_mapping(mask))
            b = Theirs(metric).calculate_mapping(mask)
            np.testing.assert_array_equal(a, b)

    def test_score_matrices_identical(self, ref):
        import pb_bss_tpu.permutation_alignment as ours
        theirs = ref['pb_bss.permutation_alignment']
        rng = _rng(20)
        mask = rng.rand(3, 9, 20)
        refm = rng.rand(3, 9, 20)
        for metric in ['cos', 'multiply', 'euclidean']:
            a = np.asarray(
                getattr(ours._ScoreMatrix, metric)(mask, refm))
            b = getattr(theirs._ScoreMatrix, metric)(mask, refm)
            assert_allclose(a, b, rtol=1e-6)


class TestEvaluation:
    def test_si_sdr(self, ref):
        from pb_bss_tpu.evaluation import si_sdr as ours
        theirs = ref['pb_bss.evaluation.module_si_sdr'].si_sdr
        rng = _rng(21)
        r = rng.randn(3, 500)
        e = r + 0.1 * rng.randn(3, 500)
        assert_allclose(np.asarray(ours(r, e)), theirs(r, e), rtol=1e-9)

    def test_sxr(self, ref):
        from pb_bss_tpu.evaluation import input_sxr, output_sxr
        theirs = ref['pb_bss.evaluation.sxr_module']
        rng = _rng(22)
        images = rng.randn(2, 3, 400)
        noise = 0.3 * rng.randn(3, 400)
        a = input_sxr(images, noise, average_sources=False,
                      average_channels=False)
        b = theirs.input_sxr(images, noise, average_sources=False,
                             average_channels=False)
        assert_allclose(a.sdr, b.sdr, rtol=1e-9)
        assert_allclose(a.sir, b.sir, rtol=1e-9)
        assert_allclose(a.snr, b.snr, rtol=1e-9)

        contribution = rng.randn(2, 2, 400)
        noise_contribution = 0.1 * rng.randn(2, 400)
        a = output_sxr(contribution, noise_contribution,
                       average_sources=False)
        b = theirs.output_sxr(contribution, noise_contribution,
                              average_sources=False)
        assert_allclose(a.sdr, b.sdr, rtol=1e-9)
        assert_allclose(a.sir, b.sir, rtol=1e-9)
        assert_allclose(a.snr, b.snr, rtol=1e-9)


class TestUtils:
    def test_labels_to_one_hot(self, ref):
        from pb_bss_tpu.utils import labels_to_one_hot as ours
        theirs = ref['pb_bss.utils'].labels_to_one_hot
        labels = np.array([[0, 2], [1, 0]])
        for axis in [0, 1, -1]:
            a = np.asarray(ours(labels, 3, axis=axis))
            b = theirs(labels, 3, axis=axis)
            np.testing.assert_array_equal(a, b)

    def test_get_stft_center_frequencies(self, ref):
        from pb_bss_tpu.utils import get_stft_center_frequencies as ours
        theirs = ref['pb_bss.utils'].get_stft_center_frequencies
        assert_allclose(ours(512, 16000), theirs(512, 16000))
