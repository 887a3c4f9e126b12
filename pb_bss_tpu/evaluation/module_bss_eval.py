"""Native BSS-Eval (v3 "sources" variant).

The reference wraps ``mir_eval.separation.bss_eval_sources``
(pb_bss/evaluation/module_mir_eval.py:31). That library is not a
dependency of this framework, so the algorithm [Vincent2006
Performance Measurement in BSS] is implemented here from its public
specification: each estimate is decomposed against 512-tap
least-squares FIR projections onto the delayed references —
``s_target + e_interf + e_artif`` — and SDR/SIR/SAR are energy ratios
of that decomposition; the permutation maximizes the mean SIR.

Float64 host NumPy: evaluation is offline and the Gram systems
(K*512 square) are solved once per (estimate, reference) pair.
"""
from __future__ import annotations

import itertools

import numpy as np
from scipy.linalg import toeplitz
from scipy.signal import fftconvolve

__all__ = ['bss_eval_sources']


def _project(reference_sources, estimated_source, flen):
    """Least-squares projection of ``estimated_source`` on the subspace
    spanned by all 0..flen-1 sample delays of ``reference_sources``.

    Args:
        reference_sources: (J, T).
        estimated_source: (T,).
    Returns:
        (T + flen - 1,) projected signal.
    """
    nsrc, nsampl = reference_sources.shape
    reference_sources = np.hstack(
        (reference_sources, np.zeros((nsrc, flen - 1))))
    estimated_source = np.hstack((estimated_source, np.zeros(flen - 1)))
    n_fft = int(2 ** np.ceil(np.log2(nsampl + flen - 1.0)))
    sf = np.fft.fft(reference_sources, n=n_fft, axis=1)
    sef = np.fft.fft(estimated_source, n=n_fft)

    # Gram matrix of the delayed references (block Toeplitz from
    # circular correlations).
    G = np.zeros((nsrc * flen, nsrc * flen))
    for i in range(nsrc):
        for j in range(i, nsrc):
            ssf = np.real(np.fft.ifft(sf[i] * np.conj(sf[j])))
            ss = toeplitz(
                np.hstack((ssf[0], ssf[-1:-flen:-1])), r=ssf[:flen])
            G[i * flen:(i + 1) * flen, j * flen:(j + 1) * flen] = ss
            G[j * flen:(j + 1) * flen, i * flen:(i + 1) * flen] = ss.T

    # cross-correlations between the estimate and delayed references
    D = np.zeros(nsrc * flen)
    for i in range(nsrc):
        ssef = np.real(np.fft.ifft(sf[i] * np.conj(sef)))
        D[i * flen:(i + 1) * flen] = np.hstack(
            (ssef[0], ssef[-1:-flen:-1]))

    try:
        C = np.linalg.solve(G, D).reshape(flen, nsrc, order='F')
    except np.linalg.LinAlgError:
        C = np.linalg.lstsq(G, D, rcond=None)[0].reshape(
            flen, nsrc, order='F')

    sproj = np.zeros(nsampl + flen - 1)
    for i in range(nsrc):
        sproj += fftconvolve(
            C[:, i], reference_sources[i])[:nsampl + flen - 1]
    return sproj


def _bss_decomp_mtifilt(reference_sources, estimated_source, j, flen):
    """Decompose an estimate into
    ``s_true + e_spat + e_interf + e_artif`` w.r.t. reference ``j``."""
    nsampl = estimated_source.size
    s_true = np.hstack((reference_sources[j], np.zeros(flen - 1)))
    e_spat = _project(
        reference_sources[j, np.newaxis, :], estimated_source, flen
    ) - s_true
    e_interf = _project(
        reference_sources, estimated_source, flen) - s_true - e_spat
    e_artif = -s_true - e_spat - e_interf
    e_artif[:nsampl] += estimated_source
    return s_true, e_spat, e_interf, e_artif


def _safe_db(num, den):
    if den == 0:
        return np.inf
    with np.errstate(divide='ignore'):
        return 10 * np.log10(num / den)


def _bss_source_crit(s_true, e_spat, e_interf, e_artif):
    """Energy-ratio criteria of the decomposition."""
    s_filt = s_true + e_spat
    sdr = _safe_db(np.sum(s_filt ** 2),
                   np.sum((e_interf + e_artif) ** 2))
    sir = _safe_db(np.sum(s_filt ** 2), np.sum(e_interf ** 2))
    sar = _safe_db(np.sum((s_filt + e_interf) ** 2),
                   np.sum(e_artif ** 2))
    return sdr, sir, sar


def bss_eval_sources(reference_sources, estimated_sources,
                     compute_permutation=True, filter_length=512):
    """BSS-Eval SDR/SIR/SAR with time-invariant 512-tap distortion
    filters (algorithm of ``mir_eval.separation.bss_eval_sources``).

    Args:
        reference_sources: (K, T).
        estimated_sources: (K, T).
        compute_permutation: search the K! orderings for the maximum
            mean SIR; otherwise score the diagonal pairing.
    Returns:
        (sdr, sir, sar, perm) arrays of shape (K,); ``perm[j]`` is the
        estimate index assigned to reference j.
    """
    reference_sources = np.atleast_2d(
        np.asarray(reference_sources, np.float64))
    estimated_sources = np.atleast_2d(
        np.asarray(estimated_sources, np.float64))
    assert reference_sources.shape == estimated_sources.shape, (
        reference_sources.shape, estimated_sources.shape)
    nsrc = reference_sources.shape[0]
    assert nsrc < 8, (nsrc, 'K! permutation search')
    assert not np.allclose(reference_sources, 0), \
        'all-silent reference sources'
    assert not np.allclose(estimated_sources, 0), \
        'all-silent estimated sources'

    if compute_permutation:
        sdr = np.empty((nsrc, nsrc))
        sir = np.empty((nsrc, nsrc))
        sar = np.empty((nsrc, nsrc))
        for jest in range(nsrc):
            for jtrue in range(nsrc):
                parts = _bss_decomp_mtifilt(
                    reference_sources, estimated_sources[jest],
                    jtrue, filter_length)
                sdr[jest, jtrue], sir[jest, jtrue], sar[jest, jtrue] = \
                    _bss_source_crit(*parts)

        perms = list(itertools.permutations(range(nsrc)))
        dum = np.arange(nsrc)
        mean_sir = np.array([
            np.mean(sir[list(perm), dum]) for perm in perms])
        popt = np.asarray(perms[np.argmax(mean_sir)])
        idx = (popt, dum)
        return sdr[idx], sir[idx], sar[idx], popt
    else:
        sdr = np.empty(nsrc)
        sir = np.empty(nsrc)
        sar = np.empty(nsrc)
        for j in range(nsrc):
            parts = _bss_decomp_mtifilt(
                reference_sources, estimated_sources[j], j,
                filter_length)
            sdr[j], sir[j], sar[j] = _bss_source_crit(*parts)
        return sdr, sir, sar, np.arange(nsrc)
