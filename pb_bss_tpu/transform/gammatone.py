"""Gammatone filterbank (Apple TR #35 coefficients).

Capability parity with ``pb_bss/transform/gammatone.py``: 4th-order
gammatone filters as a cascade of four second-order sections with
ERB-spaced center frequencies (reference :6-58 filterbank, :61-102
coefficients).

TPU-first realization, two device methods:

* ``'fft'`` (default): each band is one linear FFT convolution
  against the cascade's impulse response, precomputed on the host in
  float64 and truncated to the signal length — EXACT ``lfilter``
  semantics for a finite zero-state signal (only lags < T contribute)
  — with one shared forward rfft of the signal. Measured ~35x faster
  than the scan on TPU for SRMR-scale work (the (2, 2) matrix chains
  of the scan underuse the VPU).
* ``'scan'``: each section runs through the associative-scan biquad
  (:mod:`pb_bss_tpu.transform.filters`) with the ``n`` filters
  batched along a leading axis via per-filter coefficient ARRAYS —
  one compiled program whose coefficients are traced inputs, so
  different center-frequency sets never recompile (a
  per-scalar-coefficient formulation measured ~92 separate compiles
  over the TPU tunnel). Use it when the signal length varies per call
  (the FFT method caches one host impulse response per length) or as
  a building block for streaming.
"""
from __future__ import annotations

import functools
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


@functools.lru_cache(maxsize=16)
def _impulse_response_rfft(low_freq, high_freq, n, sample_rate, t,
                           n_fft):
    """Host-f64 cascade impulse responses, truncated to the signal
    length, as rfft spectra (n, n_fft // 2 + 1)."""
    import scipy.signal

    stages, a = _section_coefficients(low_freq, high_freq, n,
                                      sample_rate)
    h = np.zeros((n, t))
    h[:, 0] = 1.0
    for s in range(stages.shape[0]):
        for i in range(n):
            h[i] = scipy.signal.lfilter(stages[s, i], a[i], h[i])
    return np.fft.rfft(h, n_fft)


@functools.lru_cache(maxsize=16)
def _impulse_response_rfft_device(low_freq, high_freq, n, sample_rate,
                                  t, n_fft, rdtype):
    """Device-resident (real, imag) filter spectra — uploaded once per
    signature, not once per call (~3 MB per upload on a tunneled
    backend)."""
    hf = _impulse_response_rfft(
        low_freq, high_freq, n, sample_rate, t, n_fft)
    return (jnp.asarray(hf.real, rdtype), jnp.asarray(hf.imag, rdtype))


@functools.partial(jax.jit, static_argnames=('n_fft', 't'))
def _filterbank_fft_jit(signal, hf_re, hf_im, *, n_fft, t):
    """(..., T) x (n, n_fft/2+1) -> (n, ..., T) linear convolutions
    sharing one forward rfft of the signal. The filter spectra enter
    as real pairs — complex arrays must not cross the host boundary
    on tunneled TPU backends (CLAUDE.md gotcha 2)."""
    xf = jnp.fft.rfft(signal, n_fft)        # (..., n_fft/2+1)
    hf = hf_re + 1j * hf_im
    hf = hf.reshape((hf.shape[0],) + (1,) * (signal.ndim - 1)
                    + (hf.shape[-1],))
    return jnp.fft.irfft(xf[None] * hf, n_fft, axis=-1)[..., :t]


def gammatone_filterbank(signal, sample_rate: int = 16000, n: int = 23,
                         low_freq: int = 125, high_freq: int = 0,
                         device=True, method='fft'):
    """Filter ``signal`` with ``n`` 4th-order gammatone filters.

    Args:
        signal: (..., T) real signal.
        sample_rate: sampling rate in Hz.
        n: number of filters.
        low_freq: lowest center frequency.
        high_freq: highest center frequency (exclusive); default
            ``sample_rate / 2``.
        device: run a jitted device filterbank; ``False`` runs the
            identical cascade through ``scipy.signal.lfilter`` on the
            host — for offline host-side consumers where a one-off
            device compile would dominate.
        method: ``'fft'`` (default; exact truncated-impulse-response
            convolution, one host design per distinct signal length)
            or ``'scan'`` (associative-scan IIR; no per-length state —
            see the module docstring for the trade).
    Returns:
        (n, ..., T) filtered signals (stacked; index like the
        reference's list).
    """
    if high_freq == 0:
        high_freq = sample_rate / 2

    if not device:
        import scipy.signal
        stages, a = _section_coefficients(low_freq, high_freq, n,
                                          sample_rate)
        x = np.broadcast_to(
            np.asarray(signal, float)[None],
            (n,) + np.shape(signal)).copy()
        for s in range(stages.shape[0]):
            for i in range(n):
                x[i] = scipy.signal.lfilter(stages[s, i], a[i], x[i],
                                            axis=-1)
        return x

    signal = jnp.asarray(signal)
    if method == 'fft':
        t = signal.shape[-1]
        n_fft = int(2 ** np.ceil(np.log2(max(2 * t - 1, 2))))
        rdtype = ('float64' if signal.dtype == jnp.float64
                  else 'float32')
        if isinstance(signal, jax.core.Tracer):
            # called inside an outer jit: embed the spectra as program
            # constants (device-array caching would leak tracers)
            hf = _impulse_response_rfft(
                low_freq, float(high_freq), n, sample_rate, t, n_fft)
            hf_re = np.asarray(hf.real, rdtype)
            hf_im = np.asarray(hf.imag, rdtype)
        else:
            # eager: upload the ~MB spectra once per signature, not
            # once per call
            hf_re, hf_im = _impulse_response_rfft_device(
                low_freq, float(high_freq), n, sample_rate, t, n_fft,
                rdtype)
        return _filterbank_fft_jit(
            signal, hf_re, hf_im, n_fft=n_fft, t=t)
    assert method == 'scan', method
    stages, a = _section_coefficients(low_freq, high_freq, n,
                                      sample_rate)
    return _filterbank_jit(
        signal,
        jnp.asarray(stages, signal.dtype),
        jnp.asarray(a, signal.dtype))
