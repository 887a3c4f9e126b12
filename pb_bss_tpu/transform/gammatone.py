"""Gammatone filterbank (Apple TR #35 coefficients).

Capability parity with ``pb_bss/transform/gammatone.py``: 4th-order
gammatone filters as a cascade of four second-order sections with
ERB-spaced center frequencies (reference :6-58 filterbank, :61-102
coefficients).

TPU-first realization: each section runs through the associative-scan
biquad (:mod:`pb_bss_tpu.transform.filters`) with the ``n`` filters
batched along a leading axis via per-filter coefficient ARRAYS — one
compiled program (4 cascaded biquads) instead of ``n x 4`` sequential
``scipy.signal.lfilter`` calls. The coefficients enter as traced
inputs, so different center-frequency sets never recompile; a
per-scalar-coefficient formulation measured ~92 separate compiles
(~minutes over the TPU tunnel) and was replaced by this layout.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .filters import biquad_filter

__all__ = ['gammatone_filterbank', 'calculate_cfs']


@jax.jit
def _filterbank_jit(signal, stages, a):
    """signal (..., T); stages (4, n, 3) feedforward, a (n, 3)
    feedback -> (n, ..., T)."""
    n = a.shape[0]
    x = jnp.broadcast_to(signal[None], (n,) + signal.shape)
    expand = (slice(None),) + (None,) * (signal.ndim - 1)
    a_ = tuple(a[:, i][expand] for i in range(3))
    for s in range(stages.shape[0]):
        b_ = tuple(stages[s, :, i][expand] for i in range(3))
        x = biquad_filter(x, b_, a_)
    return x


def Hz_2_ERBS(f):
    return 21.4 * math.log(0.00437 * f + 1, 10)


def ERBS_2_Hz(f):
    return (10 ** (f / 21.4) - 1) / 0.00437


def calculate_cfs(low_f, high_f, n):
    """n center frequencies linearly spaced on the ERBS scale in
    [low_f, high_f); high_f itself is excluded (reference :34-50)."""
    low = Hz_2_ERBS(low_f)
    high = Hz_2_ERBS(high_f)
    step = (high - low) / n
    return np.array([ERBS_2_Hz(low + i * step) for i in range(n)])


def _calculate_coefficients(cfs, sample_rate):
    """Apple TR #35 gammatone coefficients (reference :63-102)."""
    EarQ = 9.26449
    minBW = 24.7

    T = 1 / sample_rate
    ERB = cfs / EarQ + minBW
    B = 1.019 * 2 * math.pi * ERB

    cos_1 = T * np.cos(2 * cfs * math.pi * T) / np.exp(B * T)
    sin_1 = T * np.sin(2 * cfs * math.pi * T) / np.exp(B * T)

    A0 = T
    A2 = 0.0
    B0 = 1.0
    B1 = -2 * np.cos(2 * cfs * math.pi * T) / np.exp(B * T)
    B2 = np.exp(-2 * B * T)

    A11 = -(cos_1 + (3 + 2 ** 1.5) ** 0.5 * sin_1)
    A12 = -(cos_1 - (3 + 2 ** 1.5) ** 0.5 * sin_1)
    A13 = -(cos_1 + (3 - 2 ** 1.5) ** 0.5 * sin_1)
    A14 = -(cos_1 - (3 - 2 ** 1.5) ** 0.5 * sin_1)

    cos_2 = np.cos(2 * cfs * math.pi * T)
    sin_2 = np.sin(2 * cfs * math.pi * T)

    c_1 = -2 * np.exp(4j * cfs * math.pi * T) * T
    c_2 = 2 * np.exp(-1 * B * T + 2j * cfs * math.pi * T) * T

    dividend = (
        (c_1 + c_2 * (cos_2 - (3 - 2 ** 1.5) ** 0.5 * sin_2))
        * (c_1 + c_2 * (cos_2 + (3 - 2 ** 1.5) ** 0.5 * sin_2))
        * (c_1 + c_2 * (cos_2 - (3 + 2 ** 1.5) ** 0.5 * sin_2))
        * (c_1 + c_2 * (cos_2 + (3 + 2 ** 1.5) ** 0.5 * sin_2))
    )
    divisor = np.power(
        -2 / np.exp(2 * B * T) - 2 * np.exp(4j * cfs * math.pi * T)
        + 2 * (1 + np.exp(4j * cfs * math.pi * T)) / np.exp(B * T),
        4,
    )
    gain = np.abs(dividend / divisor)
    return A0, A11, A12, A13, A14, A2, B0, B1, B2, gain


def _section_coefficients(low_freq, high_freq, n, sample_rate):
    """(4, n, 3) feedforward stages + (n, 3) shared feedback."""
    cfs = calculate_cfs(low_freq, high_freq, n)
    A0, A11, A12, A13, A14, A2, B0, B1, B2, gain = \
        _calculate_coefficients(cfs, sample_rate)
    a = np.stack([np.full(n, B0), B1, B2], -1)  # (n, 3)
    stages = np.stack([
        np.stack([np.full(n, A0) / gain, A11 / gain,
                  np.full(n, A2) / gain], -1),
        np.stack([np.full(n, A0), A12, np.full(n, A2)], -1),
        np.stack([np.full(n, A0), A13, np.full(n, A2)], -1),
        np.stack([np.full(n, A0), A14, np.full(n, A2)], -1),
    ])  # (4, n, 3)
    return stages, a


def gammatone_filterbank(signal, sample_rate: int = 16000, n: int = 23,
                         low_freq: int = 125, high_freq: int = 0,
                         device=True):
    """Filter ``signal`` with ``n`` 4th-order gammatone filters.

    Args:
        signal: (..., T) real signal.
        sample_rate: sampling rate in Hz.
        n: number of filters.
        low_freq: lowest center frequency.
        high_freq: highest center frequency (exclusive); default
            ``sample_rate / 2``.
        device: run the jitted associative-scan filterbank (one
            compiled program). ``False`` runs the identical cascade
            through ``scipy.signal.lfilter`` on the host — for
            offline host-side consumers (the SRMR metric) where a
            one-off device compile would dominate.
    Returns:
        (n, ..., T) filtered signals (stacked; index like the
        reference's list).
    """
    if high_freq == 0:
        high_freq = sample_rate / 2

    stages, a = _section_coefficients(low_freq, high_freq, n,
                                      sample_rate)
    if not device:
        import scipy.signal
        x = np.broadcast_to(
            np.asarray(signal, float)[None],
            (n,) + np.shape(signal)).copy()
        for s in range(stages.shape[0]):
            for i in range(n):
                x[i] = scipy.signal.lfilter(stages[s, i], a[i], x[i],
                                            axis=-1)
        return x

    signal = jnp.asarray(signal)
    return _filterbank_jit(
        signal,
        jnp.asarray(stages, signal.dtype),
        jnp.asarray(a, signal.dtype))
