"""Fused single-utterance device evaluation (BSS-Eval + STOI).

The ``OutputMetrics`` facade needs both BSS-Eval (whose permutation
``selection`` aligns every other metric — reference
pb_bss/evaluation/wrapper.py:411-427) and STOI on the selected
estimates. Run separately that is two device programs, two input
uploads and two result fetches; on a tunneled backend each host fetch
costs ~30 ms, which dominates the actual device time. This module
fuses them: one jitted program computes the BSS-Eval criteria, applies
the selection to the estimates ON DEVICE (one-hot matmul, no gather —
CLAUDE.md gotcha 5), evaluates STOI on the aligned pairs, and returns
everything packed as one (5, K) array = ONE fetch.

The per-metric math is shared with :mod:`.module_bss_eval_device` and
:mod:`.module_stoi_device` (both parity-tested against the host f64
oracles); this file only composes them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .module_bss_eval_device import _bss_eval_core
from .module_stoi import FS, MINFREQ, N_FRAME, NFFT, NUMBAND, _thirdoct
from .module_stoi_device import (
    _resample_device,
    _resampler_design,
    _stoi_core_10k,
)

__all__ = ['bss_eval_stoi_fused', 'bss_eval_stoi_fused_batch']


def _make_single(sample_rate, k, m, n, compute_permutation):
    """(K, N), (M, N) -> (5, K) evaluation of one utterance (rows:
    sdr, sir, sar, selection, stoi); traced under jit by the cached
    program builders below."""
    obm_np, _ = _thirdoct(FS, NFFT, NUMBAND, MINFREQ)
    window_np = np.hanning(N_FRAME + 2)[1:-1]
    design = (_resampler_design(FS, sample_rate, n)
              if sample_rate != FS else None)
    diagonal_only = (not compute_permutation) and m == k

    def evaluate(refs, ests):
        sdr, sir, sar, sel = _bss_eval_core(
            refs, ests, flen=512,
            compute_permutation=compute_permutation,
            diagonal_only=diagonal_only)
        onehot = (sel[:, None]
                  == jnp.arange(m)).astype(refs.dtype)    # (K, M)
        est_sel = onehot @ ests                            # (K, N)
        obm = jnp.asarray(obm_np, refs.dtype)
        window = jnp.asarray(window_np, refs.dtype)

        def stoi_one(r, e):
            if design is not None:
                up, down, h, n_pre, n_out = design
                r = _resample_device(r, up, down, h, n_pre, n_out)
                e = _resample_device(e, up, down, h, n_pre, n_out)
            return _stoi_core_10k(r, e, obm, window)

        st = jax.vmap(stoi_one)(refs, est_sel)             # (K,)
        return jnp.stack(
            [sdr, sir, sar, sel.astype(refs.dtype), st], axis=0)

    return evaluate


@functools.lru_cache(maxsize=16)
def _fused_program(sample_rate, k, m, n, compute_permutation):
    """One jitted (K, N), (M, N) -> (5, K) program per signature.
    Bounded cache — pad ragged datasets to bucket lengths (see
    module_stoi_device)."""
    evaluate = _make_single(sample_rate, k, m, n, compute_permutation)

    @jax.jit
    def program(refs, ests):
        with jax.default_matmul_precision('float32'):
            return evaluate(refs, ests)

    return program


@functools.lru_cache(maxsize=16)
def _fused_batch_program(sample_rate, k, m, n, compute_permutation):
    """One jitted (B, K, N), (B, M, N) -> (B, 5, K) program per
    signature: the whole batch's BSS-Eval + aligned STOI in one
    launch and ONE packed fetch."""
    evaluate = _make_single(sample_rate, k, m, n, compute_permutation)

    @jax.jit
    def program(refs, ests):
        with jax.default_matmul_precision('float32'):
            return jax.vmap(evaluate)(refs, ests)

    return program


def bss_eval_stoi_fused(reference, estimation, sample_rate,
                        compute_permutation=True):
    """BSS-Eval + selection-aligned STOI in one device program.

    Args:
        reference: (K, N) real sources.
        estimation: (M, N) with M in {K, K+1}.
        sample_rate: input rate (STOI device-resamples to 10 kHz).
    Returns:
        dict with 'sdr', 'sir', 'sar', 'stoi' (K,) float arrays and
        'selection' (K,) int64 — one host fetch for all five.
    """
    refs = jnp.asarray(reference)
    ests = jnp.asarray(estimation)
    assert refs.ndim == 2 and ests.ndim == 2, (refs.shape, ests.shape)
    K, n = refs.shape
    M = ests.shape[0]
    assert M in (K, K + 1), (refs.shape, ests.shape)
    assert ests.shape[1] == n, (refs.shape, ests.shape)
    if compute_permutation:
        assert K < 8, (refs.shape, 'K! permutation search')
    else:
        assert M == K, (
            'the extra (noise) estimate needs the permutation search '
            'to route it', refs.shape, ests.shape)
    program = _fused_program(
        int(sample_rate), K, M, n, bool(compute_permutation))
    packed = np.asarray(program(refs, ests))                  # (5, K)
    return {
        'sdr': packed[0],
        'sir': packed[1],
        'sar': packed[2],
        'selection': np.rint(packed[3]).astype(np.int64),
        'stoi': packed[4],
    }


def bss_eval_stoi_fused_batch(reference, estimation, sample_rate,
                              compute_permutation=True):
    """Batched :func:`bss_eval_stoi_fused`: (..., K, N) references vs
    (..., M, N) estimates, everything in one device program and one
    packed fetch. Returns dict of (..., K) arrays ('sdr', 'sir',
    'sar', 'stoi' float; 'selection' int64)."""
    refs = jnp.asarray(reference)
    ests = jnp.asarray(estimation)
    assert refs.ndim >= 2 and ests.ndim == refs.ndim, (
        refs.shape, ests.shape)
    K, n = refs.shape[-2:]
    M = ests.shape[-2]
    assert M in (K, K + 1), (refs.shape, ests.shape)
    assert ests.shape[-1] == n, (refs.shape, ests.shape)
    lead = refs.shape[:-2]
    assert ests.shape[:-2] == lead, (refs.shape, ests.shape)
    if compute_permutation:
        assert K < 8, (refs.shape, 'K! permutation search')
    else:
        assert M == K, (
            'the extra (noise) estimate needs the permutation search '
            'to route it', refs.shape, ests.shape)
    program = _fused_batch_program(
        int(sample_rate), K, M, n, bool(compute_permutation))
    packed = np.asarray(program(
        refs.reshape((-1, K, n)), ests.reshape((-1, M, n))))
    out_shape = lead + (K,)
    return {
        'sdr': packed[:, 0].reshape(out_shape),
        'sir': packed[:, 1].reshape(out_shape),
        'sar': packed[:, 2].reshape(out_shape),
        'selection': np.rint(packed[:, 3]).astype(np.int64).reshape(
            out_shape),
        'stoi': packed[:, 4].reshape(out_shape),
    }
