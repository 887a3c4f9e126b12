"""Device-resident (JAX) SRMR (reference anchor:
pb_bss/evaluation/module_srmr.py:42-186).

Same measure as :mod:`pb_bss_tpu.evaluation.module_srmr` (the host
oracle, validated against SRMRpy goldens), restructured so the heavy
numerics — the 23-band gammatone filterbank, the Hilbert envelopes,
the 8 modulation band-pass filters and the Hamming-windowed segment
energies — run as ONE jitted device program over a chunk of signals,
while the two cheap data-dependent host stages stay host-side:

* the VAD preprocessing (its splicing changes the signal length — a
  data-dependent shape by construction; O(N) host work), and
* the mean/std normalization of the spliced signal.

Spliced signals are zero-padded to a shared bucket length with their
true lengths passed as traced integers; every filter is causal, so
values inside the valid range equal the host's exactly, and segment
energies are masked to segments fully inside it. The ONE approximation
versus the host is the Hilbert envelope: the analytic signal is
computed by an FFT over the padded bucket instead of the exact spliced
length (the gammatone outputs are zeroed beyond the valid range first,
so the only difference is the transform length). The Hilbert kernel's
1/t decay makes this a boundary effect; measured deviation of the
final SRMR stays well inside the host implementation's own 1.3e-2
tolerance against SRMRpy (tests/test_evaluation/test_srmr_device.py).

Both filterbanks run as FFT convolutions against impulse responses
precomputed ON THE HOST IN FLOAT64 and truncated to the bucket length
— for a finite zero-state signal this IS ``lfilter`` exactly (only
lags < m contribute), for two independent reasons:

* the 8 modulation filters are near-DC band-passes (4-128 Hz at an
  8/16 kHz rate) whose pole sections have DC gains of ~4e5, so f32
  RECURSION — sequential or scan — amplifies coefficient rounding
  into O(1) errors (measured: 70x output error for the 4 Hz filter;
  only the feedforward zeros at z = +-1 keep the response finite, and
  they no longer cancel once the coefficients are rounded). The FFT
  convolution has no resonant error amplification.
* the 23-band gammatone cascade is f32-SAFE as a recursion (measured)
  but SLOW as one: the associative-scan IIR spends ~370 ms on the
  8-signal bucket (tiny (2, 2) matrix chains scan poorly on the VPU),
  vs ~10 ms as 23 FFT convolutions sharing one forward rfft of the
  signal. Its impulse response decays below 1e-20 well inside the
  bucket, so the truncation is exact at f32.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..transform.gammatone import _section_coefficients, calculate_cfs
from .module_srmr import _preprocessing_vad

__all__ = ['srmr_batch', 'srmr_device']

_MODULATION_FREQS = (4.0, 6.5, 10.7, 17.6, 28.9, 47.5, 78.1, 128.0)
_CHUNK = 8


def _modulation_coefficients(sample_rate):
    """(8, 3) feedforward / (8, 3) feedback biquad coefficients of the
    modulation filterbank (host srmr's per-filter scalars, stacked)."""
    bs, as_ = [], []
    for f_mod in _MODULATION_FREQS:
        w0 = math.tan(2 * math.pi * f_mod / (2 * sample_rate))
        b0 = w0 / 2
        norm = 1 + b0 + w0 ** 2
        bs.append([b0 / norm, 0.0, -b0 / norm])
        as_.append([1.0, (2 * w0 ** 2 - 2) / norm,
                    (1 - b0 + w0 ** 2) / norm])
    return np.array(bs), np.array(as_)


@functools.lru_cache(maxsize=8)
def _program(sample_rate, m, n, low_freq):
    """One jitted (CHUNK, M), (CHUNK,) -> (CHUNK,) SRMR program per
    signature (bucketed M keeps the cache small)."""
    import scipy.signal

    frame = int(sample_rate / 1000) * 256
    shift = int(sample_rate / 1000) * 64
    assert m % shift == 0, (m, shift)
    ratio = frame // shift
    n_seg = m // shift - (ratio - 1)
    hamm = scipy.signal.windows.hamming(frame, sym=True)
    stages, a_gt = _section_coefficients(
        low_freq, sample_rate / 2, n, sample_rate)
    b_mod, a_mod = _modulation_coefficients(sample_rate)
    # float64 host impulse responses, truncated to the bucket: exact
    # lfilter-from-zero-state semantics via linear FFT convolution
    imp = np.zeros(m)
    imp[0] = 1.0
    h_mod = np.stack([
        scipy.signal.lfilter(b_mod[kf], a_mod[kf], imp)
        for kf in range(len(_MODULATION_FREQS))])      # (8, m)
    n_fft = int(2 ** np.ceil(np.log2(2 * m - 1)))
    hf_mod = np.fft.rfft(h_mod, n_fft)                 # (8, n_fft/2+1)
    # ... and the same for the 23-band gammatone cascade (one combined
    # impulse response per band through all 4 sections)
    h_gt = np.broadcast_to(imp, (n, m)).copy()
    for s in range(4):
        for i in range(n):
            h_gt[i] = scipy.signal.lfilter(
                stages[s, i], a_gt[i], h_gt[i])
    hf_gt = np.fft.rfft(h_gt, n_fft)                   # (n, n_fft/2+1)
    cfs = calculate_cfs(low_freq, sample_rate / 2, n)
    erbs = cfs / 9.26449 + 24.7
    cutoffs = np.array([
        f - (math.tan(2 * math.pi * f / sample_rate / 2) / 2
             * sample_rate / (2 * math.pi))
        for f in _MODULATION_FREQS])
    # analytic-signal multiplier for an even/odd FFT length m
    h = np.zeros(m)
    if m % 2 == 0:
        h[0] = h[m // 2] = 1
        h[1:m // 2] = 2
    else:
        h[0] = 1
        h[1:(m + 1) // 2] = 2

    def single(x, length, hf_gt_d, hamm_d, h_d, hf_mod_d):
        valid = (jnp.arange(m) < length).astype(x.dtype)
        # 23-band gammatone bank: one shared forward rfft of the
        # signal, one inverse per band
        xf = jnp.fft.rfft(x, n_fft)                  # (n_fft/2+1,)
        bands = jnp.fft.irfft(
            xf[None] * hf_gt_d, n_fft, axis=-1)[..., :m]
        bands = bands * valid[None]
        # Hilbert envelope over the bucket length
        env = jnp.abs(jnp.fft.ifft(jnp.fft.fft(bands, axis=-1)
                                   * h_d[None], axis=-1))

        # segment validity: segment s covers [s*shift, s*shift+frame)
        starts = jnp.arange(n_seg) * shift
        seg_valid = (starts + frame <= length).astype(x.dtype)
        count = jnp.sum(seg_valid)

        def seg_means(filtered):
            """(n, M) -> (n,) masked mean of windowed segment
            energies."""
            blocks = filtered.reshape(n, m // shift, shift)
            frames = jnp.concatenate(
                [blocks[:, i:n_seg + i] for i in range(ratio)],
                axis=-1)                            # (n, n_seg, frame)
            energies = jnp.sum((hamm_d * frames) ** 2, axis=-1)
            return (jnp.sum(energies * seg_valid, axis=-1)
                    / jnp.where(count == 0, jnp.nan, count))

        env_f = jnp.fft.rfft(env, n_fft, axis=-1)   # (n, n_fft/2+1)
        means = []
        for kf in range(len(_MODULATION_FREQS)):
            filtered = jnp.fft.irfft(
                env_f * hf_mod_d[kf], n_fft, axis=-1)[..., :m]
            means.append(seg_means(filtered))
        means = jnp.stack(means, axis=-1)           # (n, 8)

        total = jnp.sum(means)
        ac_perc = jnp.sum(means, axis=1) * 100 / total
        cum = jnp.cumsum(ac_perc)
        found = cum > 90
        first = jnp.argmax(found)                   # first True
        bw = jnp.where(
            jnp.any(found),
            jnp.sum((jnp.arange(n) == first)
                    * jnp.asarray(erbs, x.dtype)),
            jnp.asarray(0.0, x.dtype))

        per_mod = jnp.sum(means, axis=0)            # (8,)
        numerator = jnp.sum(per_mod[:4])
        # host loop: den = p4; add p5, stop if c4<BW<c5; add p6, stop
        # if c5<BW<c6; add p7 — branchless unrolled
        stop5 = ((cutoffs[4] < bw) & (bw < cutoffs[5])).astype(x.dtype)
        stop6 = ((cutoffs[5] < bw) & (bw < cutoffs[6])).astype(x.dtype)
        den = per_mod[4] + per_mod[5] + (1 - stop5) * (
            per_mod[6] + (1 - stop6) * per_mod[7])
        return numerator / den

    @jax.jit
    def program(xs, lengths):
        hamm_d = jnp.asarray(hamm, xs.dtype)
        h_d = jnp.asarray(h, xs.dtype)
        cdtype = (jnp.complex128 if xs.dtype == jnp.float64
                  else jnp.complex64)
        hf_mod_d = jnp.asarray(hf_mod, cdtype)
        hf_gt_d = jnp.asarray(hf_gt, cdtype)
        with jax.default_matmul_precision('float32'):
            return jax.vmap(
                lambda x, l: single(x, l, hf_gt_d, hamm_d,
                                    h_d, hf_mod_d))(xs, lengths)

    return program


def srmr_batch(signal, sample_rate: int = 16000,
               n_cochlear_filters: int = 23, low_freq: int = 125):
    """Batched device SRMR over independent leading axes.

    Args:
        signal: (..., num_samples) real time signals.
        sample_rate: sampling rate in Hz.
    Returns:
        numpy array of shape (...,); NaN where a VAD-spliced signal is
        shorter than one analysis frame (the host warns and yields NaN
        there too).
    """
    x = np.asarray(signal, float)
    if x.ndim == 1:
        return float(srmr_batch(x[None], sample_rate,
                                n_cochlear_filters, low_freq)[0])
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])

    spliced = []
    for row in flat:
        s = _preprocessing_vad(row, sample_rate)
        s = s - np.mean(s)
        s = s / np.std(s, keepdims=True)
        spliced.append(s)
    lengths = np.array([len(s) for s in spliced], np.int32)

    frame = int(sample_rate / 1000) * 256
    shift = int(sample_rate / 1000) * 64
    bucket = 4 * frame
    m = max(int(-(-max(lengths.max(), frame) // bucket)) * bucket,
            frame + shift)
    m = -(-m // shift) * shift

    padded = np.zeros((len(spliced), m), np.float32)
    for i, s in enumerate(spliced):
        padded[i, :len(s)] = s

    program = _program(int(sample_rate), m, int(n_cochlear_filters),
                       int(low_freq))
    # The program's working set scales with chunk * bands * n_fft
    # (complex spectra of every band); shrink the chunk for long
    # buckets so minutes-long signals cannot exhaust device memory.
    n_fft = int(2 ** np.ceil(np.log2(2 * m - 1)))
    per_signal = n_cochlear_filters * n_fft * 8 * 4  # bytes, ~4 copies
    chunk_size = int(max(1, min(_CHUNK, (2 << 30) // per_signal)))
    out = []
    for i in range(0, len(spliced), chunk_size):
        chunk = padded[i:i + chunk_size]
        lens = lengths[i:i + chunk_size]
        pad_rows = chunk_size - chunk.shape[0]
        if pad_rows:
            chunk = np.pad(chunk, ((0, pad_rows), (0, 0)))
            lens = np.pad(lens, (0, pad_rows))
        out.append(np.asarray(program(jnp.asarray(chunk),
                                      jnp.asarray(lens))))
    return np.concatenate(out)[:len(spliced)].reshape(lead)


def srmr_device(signal, sample_rate: int = 16000,
                n_cochlear_filters: int = 23, low_freq: int = 125):
    """Single-signal drop-in for the host ``SRMR``."""
    return float(srmr_batch(
        np.asarray(signal)[None], sample_rate, n_cochlear_filters,
        low_freq)[0])
