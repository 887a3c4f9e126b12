"""Pallas single-kernel Jacobi eigh: parity with numpy (interpret
mode on CPU; the compiled kernel runs on TPU where it is ~3.4x faster
than the HLO-level Jacobi inside EM scans)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.ops.pallas_eigh import eigh_jacobi_pallas

pytestmark = pytest.mark.slow  # interpret-mode Jacobi kernel: ~40 s per shape



def _hermitian(B=24, D=6, seed=0, complex_=True):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((B, D, D))
    if complex_:
        a = a + 1j * rng.standard_normal((B, D, D))
    a = a.astype(np.complex64 if complex_ else np.float32)
    return (a @ a.conj().swapaxes(-1, -2)
            + 0.1 * np.eye(D, dtype=a.dtype))


@pytest.mark.parametrize('D', [2, 4, 6, 8])
def test_matches_numpy(D):
    h = _hermitian(D=D)
    w, v = eigh_jacobi_pallas(h, interpret=True, tile_b=8)
    w = np.asarray(w)
    v = np.asarray(v)
    w_np, _ = np.linalg.eigh(h.astype(np.complex128))
    assert_allclose(w, w_np, rtol=1e-4, atol=1e-4)
    # eigenvalues ascending
    assert np.all(np.diff(w, axis=-1) >= -1e-5)
    # reconstruction + orthonormality
    recon = np.einsum('bde,be,bfe->bdf', v, w, v.conj())
    assert_allclose(recon, h, rtol=1e-3, atol=1e-3)
    orth = np.einsum('bde,bdf->bef', v.conj(), v)
    assert_allclose(orth, np.broadcast_to(np.eye(D), orth.shape),
                    atol=1e-5)


def test_padding_path():
    """Batch not divisible by the tile size."""
    h = _hermitian(B=13, D=4)
    w, v = eigh_jacobi_pallas(h, interpret=True, tile_b=8)
    w_np, _ = np.linalg.eigh(h.astype(np.complex128))
    assert_allclose(np.asarray(w), w_np, rtol=1e-4, atol=1e-4)


def test_real_symmetric():
    h = _hermitian(B=16, D=5, complex_=False)
    w, v = eigh_jacobi_pallas(h, interpret=True, tile_b=8)
    w_np, _ = np.linalg.eigh(np.asarray(h, np.float64))
    assert_allclose(np.asarray(w), w_np, rtol=1e-4, atol=1e-4)
