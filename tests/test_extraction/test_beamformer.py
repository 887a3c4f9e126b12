"""Beamformer tests, mirroring the reference test tiers
(/root/reference/tests/test_extraction/test_beamformer.py): shape
sweeps under different PSD shapes, the GEV==PCA identity for white
noise, and the exhaustive eps/zero/inf pathology semantics of
MVDR-Souden (:184-376).
"""
import numpy as np
import numpy.testing as tc
import pytest

from pb_bss_tpu.extraction.beamformer import (
    apply_beamforming_vector,
    blind_analytic_normalization,
    get_gev_vector,
    get_lcmv_vector,
    get_mvdr_vector,
    get_mvdr_vector_souden,
    get_pca_vector,
    get_power_spectral_density_matrix,
    get_wmwf_vector,
    phase_correction,
)
from pb_bss_tpu.testing.random_utils import (
    hermitian,
    pos_def_hermitian,
    uniform,
)


def cos_similarity(A, B):
    similarity = np.abs(np.einsum('...d,...d', A, B.conj()))
    similarity /= np.sqrt(np.abs(np.einsum('...d,...d', A, A.conj())))
    similarity /= np.sqrt(np.abs(np.einsum('...d,...d', B, B.conj())))
    return similarity


@pytest.mark.slow
class TestBeamformerShapes:
    K, F, D = 2, 3, 6
    shape_psd = (F, D, D)

    @property
    def shape_vector(self):
        return self.shape_psd[:-1]

    def test_gev_dimensions(self):
        output = get_gev_vector(
            pos_def_hermitian(self.shape_psd),
            pos_def_hermitian(self.shape_psd))
        assert output.shape == self.shape_vector

    def test_gev_ban_dimensions(self):
        output = blind_analytic_normalization(
            get_gev_vector(
                pos_def_hermitian(self.shape_psd),
                pos_def_hermitian(self.shape_psd)),
            pos_def_hermitian(self.shape_psd))
        assert output.shape == self.shape_vector

    def test_mvdr_souden_dimensions(self):
        output = get_mvdr_vector_souden(
            pos_def_hermitian(self.shape_psd),
            pos_def_hermitian(self.shape_psd))
        assert output.shape == self.shape_vector

    def test_mvdr_souden_dimensions_with_ref_channel(self):
        output = get_mvdr_vector_souden(
            pos_def_hermitian(self.shape_psd),
            pos_def_hermitian(self.shape_psd), ref_channel=1)
        assert output.shape == self.shape_vector

    def test_wmwf_dimensions(self):
        output = get_wmwf_vector(
            pos_def_hermitian(self.shape_psd),
            pos_def_hermitian(self.shape_psd),
            reference_channel=1)
        assert output.shape == self.shape_vector

    def test_wmwf_dimensions_frequency_dependent_distortion_weight(self):
        output = get_wmwf_vector(
            pos_def_hermitian(self.shape_psd),
            pos_def_hermitian(self.shape_psd),
            reference_channel=1, distortion_weight='frequency_dependent')
        assert output.shape == self.shape_vector

    def test_pca_dimensions(self):
        for scaling in [None, 'trace', 'eigenvalue']:
            output = get_pca_vector(
                pos_def_hermitian(self.shape_psd), scaling)
            assert output.shape == self.shape_vector

    def test_mvdr_dimensions(self):
        output = get_mvdr_vector(
            uniform(self.shape_vector), pos_def_hermitian(self.shape_psd))
        assert output.shape == self.shape_vector

    def test_lcmv_dimensions(self):
        K, F, D = self.K, self.F, self.D
        output = get_lcmv_vector(
            uniform((K, F, D)), [1, 0], pos_def_hermitian((F, D, D)))
        assert output.shape == (F, D)

    def test_gev_falls_back_to_pca_for_unity_noise_matrix(self):
        Phi_XX = hermitian(6, 6)
        Phi_NN = np.identity(6)
        W_gev = np.asarray(get_gev_vector(Phi_XX, Phi_NN))
        W_pca = np.asarray(get_pca_vector(Phi_XX))
        tc.assert_allclose(cos_similarity(W_gev, W_pca), 1.0, atol=1e-6)

    def test_gev_matches_scipy(self):
        from scipy.linalg import eigh
        phi_xx = np.asarray(pos_def_hermitian(self.shape_psd))
        phi_nn = np.asarray(pos_def_hermitian(self.shape_psd))
        ours = np.asarray(get_gev_vector(phi_xx, phi_nn))
        flat_xx = phi_xx.reshape(-1, self.D, self.D)
        flat_nn = phi_nn.reshape(-1, self.D, self.D)
        flat_ours = ours.reshape(-1, self.D)
        for f in range(flat_xx.shape[0]):
            w, v = eigh(flat_xx[f], flat_nn[f])
            expected = v[:, -1]
            tc.assert_allclose(
                cos_similarity(flat_ours[f], expected), 1.0, atol=1e-6)


@pytest.mark.slow
class TestBeamformerShapesWithoutIndependent(TestBeamformerShapes):
    K, F, D = 2, 3, 6
    shape_psd = (1, 6, 6)


@pytest.mark.slow
class TestBeamformerShapesWithSpeakers(TestBeamformerShapes):
    K, F, D = 2, 3, 6
    shape_psd = (2, 3, 6, 6)

    def test_mvdr_souden_dimensions(self):
        with pytest.raises(ValueError):
            super().test_mvdr_souden_dimensions()

    def test_gev_matches_scipy(self):
        pass  # covered by the base class shapes


class TestMvdrSoudenPathologies:
    """Zero/inf/eps semantics (reference test_beamformer.py:184-376)."""

    def setup_method(self):
        obs = np.array([[0, 0, 1], [0, 0.1, 1], [0.1, 0, 1]])
        self.PhiXX = obs.T.conj() @ obs
        self.PhiNN = np.eye(3)

    def get_w_well_behaviour(self):
        w, = np.asarray(get_mvdr_vector_souden(
            self.PhiXX[None, ...], self.PhiNN[None, ...]))
        return w

    def test_well_behaviour(self):
        w = self.get_w_well_behaviour()
        tc.assert_allclose(
            w, [0.03311258, 0.03311258, 0.99337748], rtol=1e-6)
        w3 = np.asarray(get_mvdr_vector_souden(
            np.asarray([self.PhiXX] * 3), np.asarray([self.PhiNN] * 3)))
        tc.assert_allclose([w] * 3, w3)

    def test_zero_matrices_yield_zero_beamformer(self):
        for args in [
            (self.PhiXX[None] * 0, self.PhiNN[None]),
            (self.PhiXX[None], self.PhiNN[None] * 0),
            (self.PhiXX[None] * 0, self.PhiNN[None] * 0),
        ]:
            w = np.asarray(get_mvdr_vector_souden(*args))
            tc.assert_allclose(w, [[0., 0., 0.]], atol=1e-12)

    def test_inf_matrices_raise(self):
        for args in [
            (self.PhiXX[None] * np.inf, self.PhiNN[None]),
            (self.PhiXX[None], self.PhiNN[None] * np.inf),
            (self.PhiXX[None] * np.inf, self.PhiNN[None] * np.inf),
        ]:
            with pytest.raises(AssertionError):
                get_mvdr_vector_souden(*args)

    def test_difficulties_without_eps_single(self):
        for args in [
            (self.PhiXX[None] * 0, self.PhiNN[None]),
            (self.PhiXX[None], self.PhiNN[None] * 0),
            (self.PhiXX[None] * 0, self.PhiNN[None] * 0),
            (self.PhiXX[None] * np.inf, self.PhiNN[None]),
            (self.PhiXX[None], self.PhiNN[None] * np.inf),
            (self.PhiXX[None] * np.inf, self.PhiNN[None] * np.inf),
        ]:
            with pytest.raises(AssertionError):
                get_mvdr_vector_souden(*args, eps=0)

    def test_difficulties_eps_multi(self):
        """Zero bins damage only themselves; the ref channel comes from
        the healthy bin."""
        well_w = self.get_w_well_behaviour()
        for args in [
            (np.asarray([self.PhiXX * 0, self.PhiXX]),
             np.asarray([self.PhiNN, self.PhiNN])),
            (np.asarray([self.PhiXX, self.PhiXX]),
             np.asarray([self.PhiNN * 0, self.PhiNN])),
            (np.asarray([self.PhiXX * 0, self.PhiXX]),
             np.asarray([self.PhiNN * 0, self.PhiNN])),
        ]:
            w, ref_channel = get_mvdr_vector_souden(
                *args, return_ref_channel=True)
            assert int(ref_channel) == 2, ref_channel
            tc.assert_allclose(
                np.asarray(w), np.array([[0., 0., 0.], well_w]),
                atol=1e-10)

    def test_difficulties_without_eps_multi(self):
        for args in [
            (np.asarray([self.PhiXX * 0, self.PhiXX]),
             np.asarray([self.PhiNN, self.PhiNN])),
            (np.asarray([self.PhiXX, self.PhiXX]),
             np.asarray([self.PhiNN * 0, self.PhiNN])),
            (np.asarray([self.PhiXX * np.inf, self.PhiXX]),
             np.asarray([self.PhiNN, self.PhiNN])),
        ]:
            with pytest.raises(AssertionError):
                get_mvdr_vector_souden(*args, eps=0)


class TestPsd:
    def test_psd_shapes(self):
        rng = np.random.default_rng(0)
        F, T, D, K = 51, 31, 6, 2
        X = rng.standard_normal((F, D, T)) \
            + 1j * rng.standard_normal((F, D, T))
        mask = rng.standard_normal((F, K, T))
        assert get_power_spectral_density_matrix(
            X, mask=mask).shape == (F, K, D, D)
        mask1 = rng.standard_normal((F, T))
        assert get_power_spectral_density_matrix(
            X, mask=mask1).shape == (F, D, D)
        assert get_power_spectral_density_matrix(X).shape == (F, D, D)

    def test_psd_is_scaled_scatter(self):
        rng = np.random.default_rng(1)
        D, T = 4, 100
        X = rng.standard_normal((D, T)) + 1j * rng.standard_normal((D, T))
        psd = np.asarray(get_power_spectral_density_matrix(X))
        expected = X @ X.conj().T / T
        tc.assert_allclose(psd, expected, rtol=1e-10)

    def test_masked_psd_normalization(self):
        rng = np.random.default_rng(2)
        D, T = 3, 50
        X = rng.standard_normal((D, T)) + 1j * rng.standard_normal((D, T))
        mask = rng.uniform(size=(T,))
        psd = np.asarray(get_power_spectral_density_matrix(X, mask=mask))
        w = mask / mask.sum()
        expected = (w * X) @ X.conj().T
        tc.assert_allclose(psd, expected, rtol=1e-10)


def test_apply_beamforming_vector():
    rng = np.random.default_rng(3)
    F, D, T = 5, 3, 7
    w = rng.standard_normal((F, D)) + 1j * rng.standard_normal((F, D))
    x = rng.standard_normal((F, D, T)) + 1j * rng.standard_normal((F, D, T))
    y = np.asarray(apply_beamforming_vector(w, x))
    expected = np.einsum('fd,fdt->ft', w.conj(), x)
    tc.assert_allclose(y, expected, rtol=1e-10)


def test_phase_correction_doctest():
    w = np.array([[1, 1], [-1, -1]], dtype=np.complex128)
    out = np.around(np.asarray(phase_correction(w)), decimals=14)
    tc.assert_allclose(out, [[1. + 0.j, 1. + 0.j], [1. - 0.j, 1. - 0.j]])


def test_mvdr_distortionless_constraint():
    """MVDR (ATF form) satisfies w^H h == 1."""
    rng = np.random.default_rng(4)
    F, D = 7, 4
    atf = rng.standard_normal((F, D)) + 1j * rng.standard_normal((F, D))
    phi_nn = np.asarray(pos_def_hermitian((F, D, D)))
    w = np.asarray(get_mvdr_vector(atf, phi_nn))
    response = np.einsum('fd,fd->f', w.conj(), atf)
    tc.assert_allclose(response, np.ones(F), rtol=1e-8)


def test_lcmv_response_constraints():
    """LCMV satisfies w^H h_k == response_k for all sources."""
    rng = np.random.default_rng(5)
    K, F, D = 2, 5, 4
    atfs = rng.standard_normal((K, F, D)) + 1j * rng.standard_normal((K, F, D))
    phi_nn = np.asarray(pos_def_hermitian((F, D, D)))
    response = np.array([1.0, 0.0])
    w = np.asarray(get_lcmv_vector(atfs, response, phi_nn))
    for k in range(K):
        got = np.einsum('fd,fd->f', w.conj(), atfs[k])
        tc.assert_allclose(got, np.full(F, response[k]), atol=1e-8)
