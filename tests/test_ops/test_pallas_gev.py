"""Fused Pallas GEV kernel: parity with the staged XLA path and with
scipy's generalized eigensolver (interpret mode on CPU; on TPU the
kernel replaces four batched stages with one launch)."""
import numpy as np
import pytest
import scipy.linalg
from numpy.testing import assert_allclose

from pb_bss_tpu.ops.linalg import gev_max_eigvec
from pb_bss_tpu.ops.pallas_gev import gev_pallas

pytestmark = pytest.mark.slow  # interpret-mode fused GEV: ~1 min per config



def _pencils(B=24, D=6, seed=0):
    rng = np.random.default_rng(seed)

    def herm_pd(scale):
        a = (rng.standard_normal((B, D, D))
             + 1j * rng.standard_normal((B, D, D)))
        return (a @ a.conj().swapaxes(-1, -2)
                + scale * np.eye(D)).astype(np.complex64)

    return herm_pd(0.1), herm_pd(0.5)


def _cos(a, b):
    num = np.abs(np.einsum('...d,...d->...', a.conj(), b))
    return num / (np.linalg.norm(a, axis=-1)
                  * np.linalg.norm(b, axis=-1))


@pytest.mark.parametrize('D', [2, 3, 6, 8])
def test_matches_scipy(D):
    phi_xx, phi_nn = _pencils(D=D)
    beam = np.asarray(gev_pallas(
        phi_xx, phi_nn, interpret=True, tile_b=8))

    ref = np.stack([
        scipy.linalg.eigh(x.astype(np.complex128),
                          n.astype(np.complex128))[1][:, -1]
        for x, n in zip(phi_xx, phi_nn)])
    assert_allclose(_cos(beam, ref), 1.0, atol=1e-3)
    # B-normalization (zhegvd convention): beam^H phi_nn beam = 1
    bnb = np.einsum('bd,bde,be->b', beam.conj(), phi_nn, beam)
    assert_allclose(bnb.real, 1.0, atol=1e-3)
    assert_allclose(bnb.imag, 0.0, atol=1e-3)


def test_matches_staged_xla_path():
    phi_xx, phi_nn = _pencils(B=13, D=6, seed=1)
    fused = np.asarray(gev_pallas(
        phi_xx, phi_nn, interpret=True, tile_b=8))
    staged = np.asarray(gev_max_eigvec(phi_xx, phi_nn, method='xla'))
    assert_allclose(_cos(fused, staged), 1.0, atol=1e-4)
    norm_f = np.einsum('bd,bde,be->b', fused.conj(), phi_nn, fused)
    norm_s = np.einsum('bd,bde,be->b', staged.conj(), phi_nn, staged)
    assert_allclose(norm_f.real, norm_s.real, atol=1e-3)


def test_non_pd_noise_yields_nonfinite():
    """Zero / non-PD noise PSD bins must surface as non-finite lanes
    so the caller's diagonal-loading retry (get_gev_vector) fires —
    the XLA-Cholesky semantics."""
    phi_xx, phi_nn = _pencils(B=8, D=4, seed=2)
    phi_nn[3] = 0.0
    beam = np.asarray(gev_pallas(
        phi_xx, phi_nn, interpret=True, tile_b=8))
    ok = np.all(np.isfinite(beam), axis=-1)
    assert not ok[3]
    assert ok[[0, 1, 2, 4, 5, 6, 7]].all()


def test_leading_batch_dims():
    phi_xx, phi_nn = _pencils(B=12, D=3, seed=3)
    flat = np.asarray(gev_pallas(
        phi_xx, phi_nn, interpret=True, tile_b=8))
    shaped = np.asarray(gev_pallas(
        phi_xx.reshape(3, 4, 3, 3), phi_nn.reshape(3, 4, 3, 3),
        interpret=True, tile_b=8))
    assert shaped.shape == (3, 4, 3)
    assert_allclose(shaped.reshape(12, 3), flat, atol=1e-6)
