"""Batched linear-algebra kernels, TPU-first.

This module is the TPU-native replacement for three pieces of the
reference:

* the Cython LAPACK kernels (reference:
  pb_bss/extraction/cythonized/get_gev_vector.pyx:42,
  pb_bss/extraction/cythonized/c_eig.pyx:14) -> :func:`eigh_jacobi` /
  :func:`gev_max_eigvec`: instead of a per-frequency-bin LAPACK loop we
  run a *batched* cyclic Jacobi eigensolver expressed as pure vector ops
  (VPU friendly, no data-dependent control flow, compiles in seconds
  where XLA's general QDWH ``eigh`` can be slow to build),

* ``pb_bss/math/solve.py:20`` (``stable_solve`` with its
  solve -> per-matrix solve -> lstsq fallback ladder) ->
  :func:`stable_solve`: a branchless equivalent that detects singular
  systems by non-finite solve output and substitutes a minimum-norm
  least-squares solution computed from the (Jacobi) eigendecomposition
  of ``A^H A``,

* ``pb_bss/utils.py:111`` / ``pb_bss/extraction/beamformer.py:163``
  (``get_pca``) -> :func:`get_pca`.

Everything is shape-polymorphic over leading batch dimensions and
dtype-polymorphic (f32/c64 on TPU, f64/c128 under x64 on CPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    'force_hermitian',
    'unit_norm',
    'eigh',
    'eigh_jacobi',
    'stable_solve',
    'solve_pinv',
    'get_pca',
    'gev_max_eigvec',
    'condition_hermitian',
]


from .._dtypes import real_dtype as _real_dtype, tiny as _tiny


def force_hermitian(matrix):
    """Symmetrize: ``(A + A^H) / 2`` (reference: distribution/utils.py:318).

    >>> import numpy as np
    >>> A = np.array([[1+2j, 3+5j], [7+11j, 13+17j]])
    >>> np.asarray(force_hermitian(A))
    array([[ 1.+0.j,  5.-3.j],
           [ 5.+3.j, 13.+0.j]])
    """
    matrix = jnp.asarray(matrix)
    return (matrix + jnp.swapaxes(matrix.conj(), -1, -2)) / 2


def unit_norm(signal, *, axis=-1, eps=1e-4, eps_style='plus', ord=None):
    """Normalize vectors to unit norm with configurable eps semantics.

    The three eps styles replicate the reference exactly
    (reference: distribution/utils.py:223):

    - ``'plus'``:  divide by ``norm + eps``
    - ``'max'``:   divide by ``max(norm, eps)``
    - ``'where'``: divide by ``eps`` only where the norm is exactly zero
      (so zero vectors stay zero).
    """
    signal = jnp.asarray(signal)
    if ord is None or ord == 2:
        norm = jnp.sqrt(
            jnp.sum(jnp.real(signal * signal.conj()), axis=axis,
                    keepdims=True)
        ).astype(_real_dtype(signal))
    elif ord == 1:
        norm = jnp.sum(jnp.abs(signal), axis=axis, keepdims=True)
    else:
        raise NotImplementedError(f'ord={ord}')
    if eps_style == 'plus':
        norm = norm + eps
    elif eps_style == 'max':
        norm = jnp.maximum(norm, eps)
    elif eps_style == 'where':
        norm = jnp.where(norm == 0, eps, norm)
    else:
        raise ValueError(eps_style)
    return signal / norm


# ---------------------------------------------------------------------------
# Batched Hermitian eigendecomposition: cyclic Jacobi
# ---------------------------------------------------------------------------

def _default_sweeps(d, dtype):
    # Convergence of cyclic Jacobi is quadratic; these counts give
    # machine-precision diagonals for the matrix sizes used in BSS
    # (D <= 16) -- verified in tests/test_ops/test_linalg.py.
    base = 6 if jnp.finfo(_real_dtype(dtype)).bits <= 32 else 9
    if d > 8:
        base += 2
    return base


def _jacobi_rotate(A, V, p, q):
    """One batched Jacobi rotation zeroing A[..., p, q] (and [q, p]).

    A: (B, D, D) hermitian, V: (B, D, D) accumulated eigenvectors.
    p < q are static Python ints.
    """
    complex_input = jnp.iscomplexobj(A)
    apq = A[:, p, q]
    absa = jnp.abs(apq)
    app = A[:, p, p].real
    aqq = A[:, q, q].real

    tiny = _tiny(A.dtype)
    safe_absa = jnp.maximum(absa, tiny)
    tau = (aqq - app) / (2 * safe_absa)
    t = jnp.where(
        tau == 0,
        jnp.ones_like(tau),
        jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau)),
    )
    c = 1.0 / jnp.sqrt(1 + t * t)
    sr = t * c
    if complex_input:
        phase = apq / safe_absa
        s = sr * phase
    else:
        s = sr * jnp.sign(apq)

    # Skip (identity rotation) where the off-diagonal element is zero.
    active = absa > 0
    c = jnp.where(active, c, 1.0)[:, None]
    s = jnp.where(active, s, 0.0 * s)[:, None]
    sc = s.conj()

    # A <- G^H A G with G = I except G[p,p]=c, G[p,q]=s, G[q,p]=-s^*,
    # G[q,q]=c. Row update then column update (order matters).
    rowp = A[:, p, :]
    rowq = A[:, q, :]
    A = A.at[:, p, :].set(c * rowp - s * rowq)
    A = A.at[:, q, :].set(sc * rowp + c * rowq)
    colp = A[:, :, p]
    colq = A[:, :, q]
    A = A.at[:, :, p].set(c * colp - sc * colq)
    A = A.at[:, :, q].set(s * colp + c * colq)

    vp = V[:, :, p]
    vq = V[:, :, q]
    V = V.at[:, :, p].set(c * vp - sc * vq)
    V = V.at[:, :, q].set(s * vp + c * vq)
    return A, V


@functools.partial(jax.jit, static_argnames=('sweeps', 'sort'))
def eigh_jacobi(a, *, sweeps: Optional[int] = None, sort: bool = True):
    """Batched Hermitian eigendecomposition via cyclic Jacobi sweeps.

    TPU-native replacement for the reference's per-bin LAPACK ``zheevd``
    usage: a fixed number of Jacobi sweeps, each a static sequence of
    batched row/column rotations (pure VPU element-wise work, no
    data-dependent control flow, fast to compile and to run for the
    small matrix sizes D <= 16 used in beamforming / EM).

    Args:
        a: (..., D, D) Hermitian matrices (complex or real symmetric).
        sweeps: number of cyclic sweeps; default picked from D and dtype.
        sort: sort eigenvalues ascending (numpy ``eigh`` convention).

    Returns:
        (eigenvalues (..., D) real, eigenvectors (..., D, D) with
        eigenvectors in columns, i.e. ``v[..., :, i]``).
    """
    a = jnp.asarray(a)
    d = a.shape[-1]
    assert a.shape[-2] == d, a.shape
    if sweeps is None:
        sweeps = _default_sweeps(d, a.dtype)
    batch_shape = a.shape[:-2]
    A = a.reshape((-1,) + a.shape[-2:])
    B = A.shape[0]
    eye = jnp.eye(d, dtype=a.dtype)
    V = jnp.broadcast_to(eye, (B, d, d))

    if d == 1:
        w = A[..., 0, 0].real.reshape(batch_shape + (1,))
        v = jnp.ones(batch_shape + (1, 1), a.dtype)
        return w, v

    def sweep(carry, _):
        A, V = carry
        for p in range(d - 1):
            for q in range(p + 1, d):
                A, V = _jacobi_rotate(A, V, p, q)
        return (A, V), None

    (A, V), _ = lax.scan(sweep, (A, V), None, length=sweeps)

    w = jnp.diagonal(A, axis1=-2, axis2=-1).real
    if sort:
        # Rank-based one-hot permutation: both TPU gathers on (B, D, D)
        # and argsort itself lower to slow code; D^2 comparisons are
        # trivial for D <= 16 (see pallas_eigh._sort_ascending).
        from .pallas_eigh import _sort_ascending
        w, V = _sort_ascending(w, V)
    return w.reshape(batch_shape + (d,)), V.reshape(batch_shape + (d, d))


def _pallas_eligible(a):
    """Route to the single-kernel Pallas Jacobi (ops/pallas_eigh.py)?

    Only on a non-CPU backend, for f32/c64, D <= 16, and a batch big
    enough that padding to the kernel's batch tile is not pure waste.
    """
    if jax.default_backend() == 'cpu':
        return False
    if a.ndim < 3 or a.shape[-1] > 16:
        return False
    if a.dtype not in (jnp.dtype(jnp.complex64), jnp.dtype(jnp.float32)):
        return False
    batch = 1
    for s in a.shape[:-2]:
        batch *= s
    return batch >= 64


def eigh(a, *, method='auto', sweeps=None, sort=True):
    """Batched Hermitian eigh; eigenvalues ascending (when ``sort``).

    ``method='auto'`` picks the single-kernel Pallas Jacobi on TPU for
    f32/c64 batches with D <= 16 (~3.4x faster than the HLO-level
    Jacobi), :func:`eigh_jacobi` otherwise for D <= 16, and XLA's QDWH
    ``eigh`` for larger matrices.
    """
    a = jnp.asarray(a)
    if method == 'auto':
        if _pallas_eligible(a):
            method = 'pallas'
        else:
            method = 'jacobi' if a.shape[-1] <= 16 else 'xla'
    if method == 'pallas':
        from .pallas_eigh import eigh_jacobi_pallas
        return eigh_jacobi_pallas(a, sweeps=sweeps, sort=sort)
    if method == 'jacobi':
        return eigh_jacobi(a, sweeps=sweeps, sort=sort)
    elif method == 'xla':
        return jnp.linalg.eigh(a)
    raise ValueError(method)


# ---------------------------------------------------------------------------
# Solves
# ---------------------------------------------------------------------------

def solve_pinv(a, b, *, rcond=None, hermitian=False):
    """Minimum-norm least-squares solve via eigendecomposition.

    Computes ``pinv(A) @ B`` batched, without SVD: the pseudo-inverse is
    assembled from the Jacobi eigendecomposition of ``A^H A`` (or of
    ``A`` itself when ``hermitian=True``), with eigenvalues below
    ``rcond * max_eig`` treated as zero. Zero matrices map to zero
    solutions (the semantics the zero-PSD beamformer tests rely on,
    reference: tests/test_extraction/test_beamformer.py:215-230).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    d = a.shape[-1]
    if rcond is None:
        rcond = jnp.finfo(_real_dtype(a.dtype)).eps * d * 10

    if hermitian:
        w, v = eigh_jacobi(a)
        cutoff = rcond * jnp.max(jnp.abs(w), axis=-1, keepdims=True)
        keep = jnp.abs(w) > cutoff
        w_inv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
        # pinv(A) @ B = V diag(w_inv) V^H B
        vhb = jnp.einsum('...dk,...dn->...kn', v.conj(), b)
        return jnp.einsum('...dk,...k,...kn->...dn', v, w_inv.astype(v.dtype) if jnp.iscomplexobj(v) else w_inv, vhb)
    else:
        # normal equations: pinv(A) B = pinv(A^H A) A^H B
        aha = jnp.einsum('...da,...db->...ab', a.conj(), a)
        ahb = jnp.einsum('...da,...dn->...an', a.conj(), b)
        w, v = eigh_jacobi(aha)
        cutoff = rcond * jnp.max(jnp.abs(w), axis=-1, keepdims=True)
        keep = jnp.abs(w) > cutoff
        w_inv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
        vhb = jnp.einsum('...dk,...dn->...kn', v.conj(), ahb)
        return jnp.einsum('...dk,...k,...kn->...dn', v, w_inv.astype(v.dtype) if jnp.iscomplexobj(v) else w_inv, vhb)


def stable_solve(a, b, *, hermitian=False):
    """Branchless ``solve`` with per-matrix least-squares fallback.

    Reference semantics (pb_bss/math/solve.py:20): try ``solve``; for
    matrices where that fails, fall back to minimum-norm ``lstsq``. A
    jit-compatible program cannot raise/retry, so singular systems are
    detected by non-finite entries in the direct solution and replaced
    by the pseudo-inverse solution per batch element.

    Args:
        a: (..., D, D)
        b: (..., D, N)
    Returns:
        x: (..., D, N) with ``a @ x ~= b``.

    A regular system solves exactly; a singular one in the same batch
    silently takes the pseudo-inverse route (the reference raises in
    ``np.linalg.solve`` and retries per matrix — solve.py:95-114):

    >>> import numpy as np, jax.numpy as jnp
    >>> a = jnp.stack([jnp.eye(2) * 2.0, jnp.zeros((2, 2))])
    >>> b = jnp.ones((2, 2, 1))
    >>> x = stable_solve(a, b)
    >>> np.asarray(x[0], np.float64)  # regular: exact solve
    array([[0.5],
           [0.5]])
    >>> bool(jnp.isfinite(x[1]).all())  # singular: min-norm, finite
    True
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    assert a.shape[:-2] == b.shape[:-2], (a.shape, b.shape)
    assert a.shape[-1] == b.shape[-2], (a.shape, b.shape)

    # Full f32 matmul precision: under the TPU default (bf16 passes)
    # the LU factorization degrades AND every relative residual lands
    # around 1e-2 — far above ``tol`` — so the gate below silently
    # routed ALL bins to the pseudo-inverse fallback, whose own
    # bf16-degraded solutions produced negative MVDR traces
    # (overflowing beamformers) on device.
    with jax.default_matmul_precision('float32'):
        x = jnp.linalg.solve(a, b)
        finite = jnp.all(jnp.isfinite(
            jnp.abs(x) if jnp.iscomplexobj(x) else x), axis=(-2, -1))
        # LU may also return finite garbage for (near-)singular
        # systems; catch those with a relative residual check.
        def _fro(m):
            return jnp.sqrt(
                jnp.sum(jnp.real(m * m.conj()), axis=(-2, -1)))
        x_safe = jnp.where(finite[..., None, None], x, 0)
        residual = _fro(
            jnp.einsum('...ij,...jn->...in', a, x_safe) - b)
        # A valid least-squares solution always has residual <=
        # ||b||; a garbage LU solution of a singular system does not.
        tol = jnp.sqrt(jnp.finfo(_real_dtype(a.dtype)).eps)
        bad = (~finite) | (
            residual > tol * jnp.maximum(_fro(b), _tiny(a.dtype)))
        x_ls = solve_pinv(a, b, hermitian=hermitian)
        return jnp.where(bad[..., None, None], x_ls, x_safe)


def condition_hermitian(x, gamma=1e-10):
    """Diagonal loading (reference: beamformer.py:563 ``condition_covariance``)."""
    x = jnp.asarray(x)
    d = x.shape[-1]
    scale = gamma * jnp.trace(x, axis1=-2, axis2=-1).real / d
    eye = jnp.eye(d, dtype=x.dtype)
    return (x + eye * scale[..., None, None]) / (1 + gamma)


def get_pca(target_psd_matrix, return_all_vecs=False):
    """Dominant eigenvector/eigenvalue of batched Hermitian matrices.

    Reference: pb_bss/extraction/beamformer.py:163 / pb_bss/utils.py:111.

    Returns (beamforming_vector (..., D), eigenvalue (...,)) or, with
    ``return_all_vecs``, all eigenvectors/eigenvalues ascending.
    """
    w, v = eigh(jnp.asarray(target_psd_matrix))
    if return_all_vecs:
        return v, w
    return v[..., -1], w[..., -1]


def gev_max_eigvec(target_psd_matrix, noise_psd_matrix, *,
                   condition=0.0, method='auto'):
    """Dominant generalized eigenvector of the pencil (phi_xx, phi_nn).

    TPU-native GEV kernel replacing the reference's per-bin LAPACK
    ``zhegvd`` loop (cythonized/get_gev_vector.pyx:42): Cholesky-whiten
    the noise PSD (phi_nn = L L^H), run the batched Jacobi eigh on
    ``L^-1 phi_xx L^-H`` and map the dominant eigenvector back with a
    triangular solve. The result is B-normalized (``w^H phi_nn w = 1``),
    matching LAPACK's convention.

    ``method='auto'`` fuses all four stages (Cholesky, two triangular
    solves, Jacobi, back-substitution) into ONE Pallas launch on TPU
    for f32/c64 batches with D <= 16 (ops/pallas_gev.py) — the
    separate Cholesky/triangular-solve HLOs are the dominant cost of
    the XLA path at BSS sizes; ``method='xla'`` forces the staged
    path.

    Args:
        target_psd_matrix: (..., D, D) Hermitian.
        noise_psd_matrix: (..., D, D) Hermitian positive definite.
        condition: optional diagonal-loading gamma applied to the noise
            PSD before the Cholesky (0 disables).
    Returns:
        (..., D) beamforming vectors.
    """
    phi_xx = jnp.asarray(target_psd_matrix)
    phi_nn = jnp.asarray(noise_psd_matrix)
    if condition:
        phi_nn = condition_hermitian(phi_nn, condition)
    if method == 'auto' and _pallas_eligible(phi_nn):
        method = 'pallas'
    if method == 'pallas':
        from .pallas_gev import gev_pallas
        return gev_pallas(phi_xx, phi_nn)
    # full f32 matmul precision: the Cholesky whitening is the
    # quality-critical stage of the beamformer (bf16 default passes
    # degrade small factorizations, see stable_solve)
    with jax.default_matmul_precision('float32'):
        L = jnp.linalg.cholesky(phi_nn)
        # C = L^-1 phi_xx L^-H
        tmp = jax.scipy.linalg.solve_triangular(L, phi_xx, lower=True)
        c = jax.scipy.linalg.solve_triangular(
            L, tmp.conj().swapaxes(-1, -2), lower=True
        ).conj().swapaxes(-1, -2)
        c = force_hermitian(c)
        # no sort: select the dominant eigenvector via a one-hot
        # argmax contraction (cheaper than the sorting permutation)
        w, v = eigh(c, sort=False)
        sel = (jnp.argmax(w, axis=-1)[..., None]
               == jnp.arange(w.shape[-1])).astype(v.dtype)
        u = jnp.einsum('...de,...e->...d', v, sel)
        # back-substitute: w = L^-H u
        beam = jax.scipy.linalg.solve_triangular(
            L.conj().swapaxes(-1, -2), u[..., None], lower=False
        )[..., 0]
    return beam
