import numpy as np
import pytest

from pb_bss_tpu.ops import linalg
from pb_bss_tpu.testing import random_utils


@pytest.mark.parametrize('d', [
    2, 3, 6,
    # D=8 unrolls the largest Jacobi sweep program — compile-heavy,
    # shape-generic like the rest, so full tier only.
    pytest.param(8, marks=pytest.mark.slow),
])
@pytest.mark.parametrize('dtype', [np.complex128, np.complex64, np.float64])
def test_eigh_jacobi_matches_numpy(d, dtype):
    rng = np.random.default_rng(0)
    a = random_utils.pos_def_hermitian(17, d, d, dtype=np.complex128, rng=rng)
    if dtype == np.float64:
        a = a.real + np.eye(d)  # keep symmetric PD
    a = a.astype(dtype)

    w, v = linalg.eigh_jacobi(a)
    w = np.asarray(w)
    v = np.asarray(v)
    w_ref = np.linalg.eigvalsh(a.astype(np.complex128) if np.iscomplexobj(a) else a.astype(np.float64))

    tol = 1e-10 if np.finfo(w.dtype).bits > 32 else 1e-4
    np.testing.assert_allclose(w, w_ref, rtol=tol, atol=tol * abs(w_ref).max())
    # reconstruction + orthonormality
    recon = np.einsum('...ik,...k,...jk->...ij', v, w, v.conj())
    np.testing.assert_allclose(recon, a, atol=tol * abs(w_ref).max() * 10)
    eye = np.eye(d)
    gram = np.einsum('...ki,...kj->...ij', v.conj(), v)
    np.testing.assert_allclose(gram, np.broadcast_to(eye, gram.shape), atol=tol * 10)


def test_eigh_jacobi_near_rank_deficient():
    rng = np.random.default_rng(1)
    u = random_utils.randn(9, 6, 2, rng=rng)
    a = np.einsum('fdk,fek->fde', u, u.conj())  # rank 2
    w, v = linalg.eigh_jacobi(a)
    w_ref = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-10)


def test_stable_solve_matches_solve_and_lstsq():
    rng = np.random.default_rng(2)
    a = random_utils.randn(5, 6, 6, rng=rng)
    b = random_utils.randn(5, 6, 6, rng=rng)
    x = np.asarray(linalg.stable_solve(a, b))
    np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=1e-8, atol=1e-10)

    # singular batch entry falls back to minimum-norm lstsq
    a[2] = 0
    b[2] = 0
    x = np.asarray(linalg.stable_solve(a, b))
    assert np.all(np.isfinite(x.view(np.float64)))
    np.testing.assert_allclose(x[2], 0)  # zero matrix -> zero solution
    np.testing.assert_allclose(
        x[[0, 1, 3, 4]], np.linalg.solve(a[[0, 1, 3, 4]], b[[0, 1, 3, 4]]),
        rtol=1e-8, atol=1e-10,
    )

    # singular but non-zero: compare against numpy lstsq per matrix
    a[2] = random_utils.randn(6, 6, rng=rng)
    a[2, :, 0] = a[2, :, 1]  # rank deficient
    b[2] = random_utils.randn(6, 6, rng=rng)
    x = np.asarray(linalg.stable_solve(a, b))
    x_ref = np.linalg.lstsq(a[2], b[2], rcond=None)[0]
    np.testing.assert_allclose(x[2], x_ref, rtol=1e-6, atol=1e-8)


def test_gev_matches_scipy():
    scipy_linalg = pytest.importorskip('scipy.linalg')
    rng = np.random.default_rng(3)
    F, D = 33, 6
    phi_xx = random_utils.pos_def_hermitian(F, D, D, rng=rng)
    phi_nn = random_utils.pos_def_hermitian(F, D, D, rng=rng)
    beam = np.asarray(linalg.gev_max_eigvec(phi_xx, phi_nn))
    for f in range(F):
        w_ref, v_ref = scipy_linalg.eigh(phi_xx[f], phi_nn[f])
        v_dom = v_ref[:, -1]
        cos = abs(np.vdot(v_dom, beam[f])) / (
            np.linalg.norm(v_dom) * np.linalg.norm(beam[f]))
        assert cos > 1 - 1e-8, (f, cos)
        # B-normalization convention w^H phi_nn w == 1
        np.testing.assert_allclose(
            np.einsum('d,de,e->', beam[f].conj(), phi_nn[f], beam[f]).real,
            1.0, rtol=1e-6,
        )


def test_unit_norm_eps_styles():
    signal = np.array([[1, 1], [1e-20, 1e-20], [0, 0]])
    out = np.asarray(linalg.unit_norm(signal, eps=1e-4, eps_style='plus'))
    np.testing.assert_allclose(out[0], 7.07056785e-01, rtol=1e-6)
    out = np.asarray(linalg.unit_norm(signal, eps=1e-4, eps_style='max'))
    np.testing.assert_allclose(out[0], 0.70710678, rtol=1e-6)
    out = np.asarray(linalg.unit_norm(signal, eps=1e-4, eps_style='where'))
    np.testing.assert_allclose(out[1], 0.70710678, rtol=1e-6)
    np.testing.assert_allclose(out[2], 0.0)


def test_get_pca():
    m = np.array([[2., 0.], [0., 1.]])
    vec, val = linalg.get_pca(m)
    np.testing.assert_allclose(np.abs(np.asarray(vec)), [1., 0.], atol=1e-12)
    np.testing.assert_allclose(np.asarray(val), 2.)


def test_force_hermitian():
    a = np.array([[1 + 2j, 3 + 5j], [7 + 11j, 13 + 17j]])
    h = np.asarray(linalg.force_hermitian(a))
    np.testing.assert_allclose(h, h.conj().T)
