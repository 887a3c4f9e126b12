"""Device-resident (JAX) BSS-Eval v3 "sources".

Same algorithm as :mod:`pb_bss_tpu.evaluation.module_bss_eval` (the
float64 host oracle; see there for the [Vincent2006] decomposition and
the shared-Gram factorization idea), rebuilt as one jittable program so
that batched evaluation runs on the accelerator instead of serializing
on the host (reference anchor: the per-pair FIR projections of
pb_bss/evaluation/module_mir_eval.py:111-128).

Design notes (TPU-first):

- Everything is static-shaped: the block-Toeplitz Gram of the delayed
  references is assembled from the circular correlations with a
  constant diagonal-offset index map (no data-dependent control flow),
  factorized ONCE per utterance, and shared by every
  (estimate, reference) pair — like the host fast path, unlike
  mir_eval's per-pair rebuild.
- The Cholesky solve runs at the input dtype. At float32 (TPU) the
  Gram of correlated speech references is ill-conditioned, so the
  factorization is computed on a relatively-loaded copy
  (``_JITTER_F32`` * mean diagonal) and two iterative-refinement steps
  against the *unloaded* Gram remove the loading bias; the refined
  solution is backward-stable at f32. At float64 (CPU tests / host
  fallback) the loading is a negligible 1e-12 relative and results
  match the host oracle to <1e-5 dB (tests/test_evaluation/
  test_bss_eval_device.py). The same loading+refinement also keeps the
  duplicate-reference case finite, where the host falls back to lstsq:
  the projection (unlike the coefficients) is unique, and refinement
  converges to it.
- The permutation search is branchless: a static table of
  ``permutations(range(M), K)`` scored with one-hot einsums (TPU
  gathers on small dynamic indices are slow; one-hot contractions are
  MXU-friendly — see CLAUDE.md gotcha 5).
- Matmul precision is pinned to float32 throughout (bf16 matmuls
  corrupt iterative linalg on TPU — CLAUDE.md gotcha 6).

Use :func:`bss_eval_sources_batch` for (..., K, T) batches (one device
program for the whole batch) and :func:`bss_eval_sources_device` as a
single-utterance drop-in for the host ``bss_eval_sources``.
"""
from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'bss_eval_sources_device',
    'bss_eval_sources_batch',
    'mir_eval_sources_batch',
]

# Relative diagonal loading of the Gram factorization per dtype. The
# refinement steps solve against the unloaded Gram, so this only needs
# to make the Cholesky finite and a good preconditioner.
_JITTER_F32 = 1e-5
_JITTER_F64 = 1e-12
_REFINEMENT_STEPS = 2


def _next_pow2(n):
    return int(2 ** np.ceil(np.log2(n)))


def _toeplitz_last(ssf, flen):
    """Toeplitz matrices ``T[..., a, b] = ssf[..., (b - a) % n]`` from
    circular correlations ``ssf`` (..., n), n >= 2 * flen - 1."""
    ext = jnp.concatenate(
        [ssf[..., -(flen - 1):], ssf[..., :flen]], axis=-1)
    # Static diagonal-offset index map; constant at trace time.
    idx = flen - 1 + (np.arange(flen)[None, :] - np.arange(flen)[:, None])
    return ext[..., idx]


def _loaded_cholesky(gram, jitter_rel):
    d = gram.shape[-1]
    load = jitter_rel * (
        jnp.trace(gram, axis1=-2, axis2=-1)[..., None, None] / d)
    eye = jnp.eye(d, dtype=gram.dtype)
    return jnp.linalg.cholesky(gram + load * eye)


def _cho_solve(chol, rhs):
    """Solve ``G x = rhs`` given ``G = L L^T``; rhs (..., d, m)."""
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(
        chol, y, lower=True, trans='T')


def _refined_solve(gram, chol, rhs, steps):
    """Cholesky solve + ``steps`` iterative-refinement sweeps against
    the (possibly unloaded) ``gram``."""
    x = _cho_solve(chol, rhs)
    for _ in range(steps):
        r = rhs - gram @ x
        x = x + _cho_solve(chol, r)
    return x


def _criteria(refs, ests, flen, diagonal_only):
    """SDR/SIR/SAR of every (estimate, reference) pairing.

    Args:
        refs: (K, T) real references.
        ests: (M, T) real estimates (M == K or K + 1).
        flen: distortion-filter length (static).
        diagonal_only: score only the aligned pairing; requires M == K
            (static).
    Returns:
        (sdr, sir, sar) of shape (M, K), or (M,) when diagonal_only.
    """
    K, ns = refs.shape
    M = ests.shape[0]
    trunc = ns + flen - 1
    n_fft = _next_pow2(trunc)
    real = refs.dtype
    jitter = _JITTER_F64 if real == jnp.float64 else _JITTER_F32

    sf = jnp.fft.rfft(refs, n=n_fft, axis=-1)            # (K, nf)
    sef = jnp.fft.rfft(ests, n=n_fft, axis=-1)           # (M, nf)

    # Gram of all 0..flen-1 delays of the references: circular
    # correlations -> block Toeplitz (K, flen, K, flen).
    ssf = jnp.fft.irfft(
        sf[:, None] * jnp.conj(sf[None]), n=n_fft, axis=-1)
    blocks = _toeplitz_last(ssf, flen)                    # (K, K, fl, fl)
    gram = jnp.transpose(blocks, (0, 2, 1, 3)).reshape(
        K * flen, K * flen)
    diag_blocks = blocks[np.arange(K), np.arange(K)]      # (K, fl, fl)

    # Cross-correlations of every estimate with every delayed
    # reference: rhs (M, K, flen); rhs[m, i, a] = <est_m, ref_i(.-a)>.
    ssef = jnp.fft.irfft(
        sf[None] * jnp.conj(sef[:, None]), n=n_fft, axis=-1)
    rhs = jnp.concatenate(
        [ssef[..., :1], jnp.flip(ssef[..., -(flen - 1):], axis=-1)],
        axis=-1)                                          # (M, K, flen)

    # Full-subspace projection coefficients, one shared factorization.
    chol_full = _loaded_cholesky(gram, jitter)
    c_full = _refined_solve(
        gram, chol_full, rhs.reshape(M, K * flen).T,
        _REFINEMENT_STEPS)                                # (K*flen, M)
    c_full = c_full.T.reshape(M, K, flen)

    # Projection signals via the already-computed reference spectra.
    cf_full = jnp.fft.rfft(c_full, n=n_fft, axis=-1)
    pall = jnp.fft.irfft(
        jnp.sum(cf_full * sf[None], axis=1), n=n_fft, axis=-1,
    )[..., :trunc]                                        # (M, trunc)

    chol_single = _loaded_cholesky(diag_blocks, jitter)   # (K, fl, fl)

    def _single_proj(block, chol, r, spec):
        """r: (m, flen) rhs rows -> (m, trunc) projection signals."""
        c = _refined_solve(block, chol, r.T, _REFINEMENT_STEPS).T
        cf = jnp.fft.rfft(c, n=n_fft, axis=-1)
        return jnp.fft.irfft(cf * spec, n=n_fft, axis=-1)[..., :trunc]

    ests_pad = jnp.pad(ests, ((0, 0), (0, flen - 1)))     # (M, trunc)

    def _db(num, den):
        # den == 0 -> inf (host _safe_db); num == 0 -> -inf via log10.
        return 10 * jnp.log10(jnp.where(den == 0, jnp.inf, num / den))

    if diagonal_only:
        # p1[m] = projection of estimate m onto reference m's delays.
        p1 = jax.vmap(
            lambda bl, ch, r, sp: _single_proj(bl, ch, r[None], sp)[0],
        )(diag_blocks, chol_single, rhs[np.arange(M), np.arange(M)],
          sf)                                             # (M, trunc)
        e_sum = jnp.sum((ests_pad - p1) ** 2, axis=-1)
        s_filt = jnp.sum(p1 ** 2, axis=-1)
        e_interf = jnp.sum((pall - p1) ** 2, axis=-1)
        e_artif = jnp.sum((ests_pad - pall) ** 2, axis=-1)
        pall_e = jnp.sum(pall ** 2, axis=-1)
        sdr = _db(s_filt, e_sum)
        sir = _db(s_filt, e_interf)
        sar = _db(pall_e, e_artif)
        return sdr, sir, sar

    # p1[m, j] = projection of estimate m onto reference j's delays.
    p1 = jax.vmap(  # over j (references)
        _single_proj, in_axes=(0, 0, 1, 0), out_axes=1,
    )(diag_blocks, chol_single, rhs, sf)                  # (M, K, trunc)

    s_filt = jnp.sum(p1 ** 2, axis=-1)                    # (M, K)
    e_sum = jnp.sum((ests_pad[:, None] - p1) ** 2, axis=-1)
    e_interf = jnp.sum((pall[:, None] - p1) ** 2, axis=-1)
    e_artif = jnp.sum((ests_pad - pall) ** 2, axis=-1)    # (M,)
    pall_e = jnp.sum(pall ** 2, axis=-1)                  # (M,)

    sdr = _db(s_filt, e_sum)
    sir = _db(s_filt, e_interf)
    sar = _db(
        jnp.broadcast_to(pall_e[:, None], (M, K)),
        jnp.broadcast_to(e_artif[:, None], (M, K)))
    return sdr, sir, sar


def _select_permutation(sdr, sir, sar, perm_table):
    """Branchless max-mean-SIR selection over a static permutation
    table (P, K) of estimate indices; returns per-reference metric
    vectors and the integer selection."""
    M = sdr.shape[0]
    K = perm_table.shape[1]
    onehot = jax.nn.one_hot(perm_table, M, dtype=sdr.dtype)  # (P, K, M)
    mean_sir = jnp.einsum('pkm,mk->p', onehot, sir) / K
    best = jnp.argmax(mean_sir)
    sel = jnp.einsum(
        'p,pkm->km',
        jax.nn.one_hot(best, perm_table.shape[0], dtype=sdr.dtype),
        onehot)                                              # (K, M)
    pick = lambda mat: jnp.einsum('km,mk->k', sel, mat)
    selection = jnp.einsum(
        'km,m->k', sel, jnp.arange(M, dtype=sdr.dtype)
    ).astype(jnp.int32)
    return pick(sdr), pick(sir), pick(sar), selection


def _bss_eval_core(refs, ests, *, flen, compute_permutation,
                   diagonal_only):
    with jax.default_matmul_precision('float32'):
        if diagonal_only:
            sdr, sir, sar = _criteria(
                refs, ests, flen, diagonal_only=True)
            M = ests.shape[0]
            return sdr, sir, sar, jnp.arange(M, dtype=jnp.int32)
        sdr, sir, sar = _criteria(refs, ests, flen, diagonal_only=False)
        if not compute_permutation:
            K = refs.shape[0]
            d = np.arange(K)
            return (sdr[d, d], sir[d, d], sar[d, d],
                    jnp.arange(K, dtype=jnp.int32))
        perm_table = np.array(list(itertools.permutations(
            range(ests.shape[0]), refs.shape[0])))
        return _select_permutation(sdr, sir, sar, perm_table)


_bss_eval_single = jax.jit(
    _bss_eval_core,
    static_argnames=('flen', 'compute_permutation', 'diagonal_only'))


def bss_eval_sources_device(reference_sources, estimated_sources,
                            compute_permutation=True,
                            filter_length=512):
    """Drop-in for the host ``bss_eval_sources`` running on the
    default JAX backend (float64 on CPU-x64, float32 on TPU).

    Args:
        reference_sources: (K, T) real.
        estimated_sources: (K, T) real (use
            :func:`mir_eval_sources_batch` for K+1 estimates).
    Returns:
        (sdr, sir, sar, perm) numpy arrays of shape (K,).
    """
    refs = jnp.atleast_2d(jnp.asarray(reference_sources))
    ests = jnp.atleast_2d(jnp.asarray(estimated_sources))
    assert refs.shape == ests.shape, (refs.shape, ests.shape)
    assert refs.shape[0] < 8, (refs.shape, 'K! permutation search')
    sdr, sir, sar, perm = _bss_eval_single(
        refs, ests, flen=filter_length,
        compute_permutation=compute_permutation,
        diagonal_only=not compute_permutation)
    return (np.asarray(sdr), np.asarray(sir), np.asarray(sar),
            np.asarray(perm))


@functools.partial(
    jax.jit,
    static_argnames=('flen', 'compute_permutation', 'diagonal_only'))
def _bss_eval_batch(refs, ests, *, flen, compute_permutation,
                    diagonal_only):
    fn = functools.partial(
        _bss_eval_core, flen=flen,
        compute_permutation=compute_permutation,
        diagonal_only=diagonal_only)
    return jax.vmap(fn)(refs, ests)


@functools.partial(
    jax.jit,
    static_argnames=('flen', 'compute_permutation', 'diagonal_only'))
def _bss_eval_batch_packed(refs, ests, *, flen, compute_permutation,
                           diagonal_only):
    """(B, 4, K) pack of (sdr, sir, sar, selection): the device work is
    ~14 ms per batch-8 call but every separate host fetch costs ~30 ms
    on the tunneled transport, so the four results ride ONE transfer
    (selection is exact in f32 for any practical K)."""
    sdr, sir, sar, sel = _bss_eval_batch(
        refs, ests, flen=flen, compute_permutation=compute_permutation,
        diagonal_only=diagonal_only)
    return jnp.stack(
        [sdr, sir, sar, sel.astype(sdr.dtype)], axis=1)


def bss_eval_sources_batch(reference, estimation,
                           compute_permutation=True,
                           filter_length=512):
    """Batched BSS-Eval: one device program for a whole batch.

    Args:
        reference: (..., K, T) real references.
        estimation: (..., M, T) with M in {K, K+1}; when M == K + 1
            the permutation search routes the extra (noise) estimate
            like the host ``mir_eval_sources``.
    Returns:
        dict with 'sdr', 'sir', 'sar' (..., K) and 'selection'
        (..., K) numpy arrays.
    """
    refs = jnp.asarray(reference)
    ests = jnp.asarray(estimation)
    assert refs.ndim >= 2 and ests.ndim == refs.ndim, (
        refs.shape, ests.shape)
    K, T = refs.shape[-2:]
    M = ests.shape[-2]
    assert ests.shape[-1] == T, (refs.shape, ests.shape)
    assert M in (K, K + 1), (refs.shape, ests.shape)
    # Mirror the single-utterance guard: the permutation search builds
    # a static table of M-permute-K rows and a one-hot (P, K, M)
    # scoring tensor per batch element; K == 8 with M == 9 would be
    # ~363k rows (~100 MB each) — fail fast instead of OOMing at
    # compile.
    if compute_permutation:
        assert K < 8, (refs.shape, 'K! permutation search')
    if M == K + 1 and not compute_permutation:
        raise NotImplementedError(compute_permutation, 'with K + 1')
    lead = refs.shape[:-2]
    assert ests.shape[:-2] == lead, (refs.shape, ests.shape)

    refs_flat = refs.reshape((-1, K, T))
    ests_flat = ests.reshape((-1, M, T))
    packed = np.asarray(_bss_eval_batch_packed(
        refs_flat, ests_flat, flen=filter_length,
        compute_permutation=compute_permutation,
        diagonal_only=(not compute_permutation) and M == K))
    out_shape = lead + (K,)
    return {
        'sdr': packed[:, 0].reshape(out_shape),
        'sir': packed[:, 1].reshape(out_shape),
        'sar': packed[:, 2].reshape(out_shape),
        'selection': np.rint(packed[:, 3]).astype(np.int64).reshape(
            lead + (packed.shape[-1],)),
    }


def mir_eval_sources_batch(reference, estimation, return_dict=True,
                           compute_permutation=True):
    """Device analog of ``mir_eval_sources`` for batched inputs
    (same K-vs-K and K+1-vs-K semantics, one device program)."""
    out = bss_eval_sources_batch(
        reference, estimation, compute_permutation=compute_permutation)
    if return_dict:
        if not compute_permutation:
            out.pop('selection')
        return out
    if compute_permutation:
        return out['sdr'], out['sir'], out['sar'], out['selection']
    return out['sdr'], out['sir'], out['sar']
