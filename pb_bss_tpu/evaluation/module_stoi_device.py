"""Device-resident (JAX) STOI.

Same measure as :mod:`pb_bss_tpu.evaluation.module_stoi` (the host
float64 oracle, itself validated against pystoi's golden constants in
tests/test_evaluation/test_reference_goldens.py), rebuilt as one
jittable static-shape program so batched evaluation runs on the
accelerator instead of a per-signal host loop (reference anchor: the
recursion wrapper of pb_bss/evaluation/module_stoi.py:4-25).

The two host constructs that resist jit are redesigned rather than
looped:

- **Resampling** (``scipy.signal.resample_poly``): the anti-aliasing
  FIR is designed on the host once per (up, down) pair with scipy's
  own ``firwin`` parameterization (Kaiser 5.0, half_len = 10 *
  max_rate) so the numbers match the host oracle exactly; the
  polyphase upfirdn itself becomes zero-stuffing + one rfft
  convolution + a strided slice on device.
- **Silent-frame removal** is data-dependent on the host (boolean
  indexing changes the signal length). Here it is a static-shape
  compaction: retained frames are permuted to the front with a
  one-hot matmul built from the cumsum of the retention mask (TPU
  gathers on data-dependent indices are slow; one-hot contractions
  are MXU-friendly — CLAUDE.md gotcha 5), overlap-add is two shifted
  half-frame adds (frame_len == 2 * hop), and every later reduction
  is masked by the retained-frame count. Signals whose retained
  segment count is zero yield NaN (the host raises instead — a jitted
  batch cannot).

Matmul precision is pinned to float32 (CLAUDE.md gotcha 6).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .module_stoi import (
    BETA,
    DYN_RANGE,
    FS,
    MINFREQ,
    N_FRAME,
    N_SEG,
    NFFT,
    NUMBAND,
    _thirdoct,
)

__all__ = ['stoi_device', 'stoi_batch']

_HOP = N_FRAME // 2


@functools.lru_cache(maxsize=32)
def _resampler_design(up, down, n_in):
    """Host-side replication of scipy.signal.resample_poly's filter
    design and alignment bookkeeping (constant per signature)."""
    import math

    import scipy.signal

    g = math.gcd(up, down)
    up //= g
    down //= g
    assert (up, down) != (1, 1)
    n_out = n_in * up
    n_out = n_out // down + bool(n_out % down)

    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = scipy.signal.firwin(
        2 * half_len + 1, 1.0 / max_rate, window=('kaiser', 5.0))
    h = h * up
    n_pre_pad = down - half_len % down
    n_pre_remove = (half_len + n_pre_pad) // down
    h = np.concatenate([np.zeros(n_pre_pad), h])
    # Ensure the full linear convolution reaches the last kept output
    # sample (scipy's n_post_pad loop, solved in closed form).
    conv_len = (n_in - 1) * up + len(h)
    needed = (n_pre_remove + n_out - 1) * down + 1
    if conv_len < needed:
        h = np.concatenate([h, np.zeros(needed - conv_len)])
    return up, down, h, n_pre_remove, n_out


def _resample_device(x, up, down, h, n_pre_remove, n_out):
    """upfirdn(h, x, up, down) + scipy's alignment slice; x (..., N)."""
    n_in = x.shape[-1]
    # Zero-stuff to the upsampled grid.
    up_len = (n_in - 1) * up + 1
    x_up = jnp.zeros(x.shape[:-1] + (up_len,), x.dtype)
    x_up = x_up.at[..., ::up].set(x)
    # Full linear convolution via rfft.
    n_fft = int(2 ** np.ceil(np.log2(up_len + len(h) - 1)))
    hf = jnp.fft.rfft(jnp.asarray(h, x.dtype), n=n_fft)
    y = jnp.fft.irfft(jnp.fft.rfft(x_up, n=n_fft) * hf, n=n_fft)
    y = y[..., ::down]
    return y[..., n_pre_remove:n_pre_remove + n_out]


def _frames(x, num_frames):
    """(..., N) -> (..., num_frames, N_FRAME) with hop N_FRAME/2 via
    two shifted half-frame views (no gather)."""
    blocks = x[..., :(num_frames + 1) * _HOP].reshape(
        x.shape[:-1] + (num_frames + 1, _HOP))
    return jnp.concatenate([blocks[..., :-1, :], blocks[..., 1:, :]],
                           axis=-1)


def _stoi_core_10k(reference, estimation, obm, window):
    """STOI of one pair already at 10 kHz; (N,) -> scalar."""
    n = reference.shape[-1]
    num_frames = 1 + (n - N_FRAME) // _HOP
    assert num_frames >= 1, (n, N_FRAME)
    dtype = reference.dtype
    eps = jnp.asarray(np.finfo(np.asarray(0, dtype).dtype).eps, dtype)

    x_frames = _frames(reference, num_frames) * window
    y_frames = _frames(estimation, num_frames) * window

    # Retention mask from the clean signal's frame energies.
    energies = 20 * jnp.log10(
        jnp.linalg.norm(x_frames, axis=-1) + eps)
    mask = energies > jnp.max(energies) - DYN_RANGE
    n_ret = jnp.sum(mask.astype(jnp.int32))

    # Compact retained frames to the front: one-hot permutation.
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    perm = (jax.nn.one_hot(pos, num_frames, dtype=dtype)
            * mask[:, None].astype(dtype)).T          # (T, T)
    x_c = perm @ x_frames                              # (T, N_FRAME)
    y_c = perm @ y_frames

    # Overlap-add (frame_len == 2 * hop): signal block i is
    # first_half[i] + second_half[i - 1]; then re-frame. Rows past
    # n_ret are zero by construction of ``perm``.
    def blocks_of(c):
        a, b = c[:, :_HOP], c[:, _HOP:]
        return jnp.concatenate(
            [a[:1], a[1:] + b[:-1], b[-1:]], axis=0)   # (T + 1, HOP)

    def band_mags(c):
        sig_blocks = blocks_of(c)
        frames2 = jnp.concatenate(
            [sig_blocks[:-1], sig_blocks[1:]], axis=-1) * window
        spec = jnp.fft.rfft(frames2, NFFT, axis=-1)    # (T, NFFT/2+1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        return jnp.sqrt(power @ obm.T).T               # (bands, T)

    x_tob = band_mags(x_c)
    y_tob = band_mags(y_c)

    # All length-N_SEG sliding segments, masked to the retained count.
    # (The host loops m in [N_SEG, T_retained]; segment s here covers
    # frames s .. s+N_SEG-1, valid iff s + N_SEG <= n_ret.)
    num_seg = num_frames - N_SEG + 1
    assert num_seg >= 1, (num_frames, N_SEG)
    x_seg = jnp.stack(
        [x_tob[:, s:s + num_seg] for s in range(N_SEG)], axis=-1)
    y_seg = jnp.stack(
        [y_tob[:, s:s + num_seg] for s in range(N_SEG)], axis=-1)
    seg_valid = (jnp.arange(num_seg) + N_SEG <= n_ret).astype(dtype)

    c = 10.0 ** (-BETA / 20)
    alpha = jnp.sqrt(
        jnp.sum(x_seg ** 2, axis=-1, keepdims=True)
        / (jnp.sum(y_seg ** 2, axis=-1, keepdims=True) + eps))
    y_prime = jnp.minimum(alpha * y_seg, x_seg * (1 + c))
    x_n = x_seg - jnp.mean(x_seg, axis=-1, keepdims=True)
    y_n = y_prime - jnp.mean(y_prime, axis=-1, keepdims=True)
    x_n = x_n / (jnp.linalg.norm(x_n, axis=-1, keepdims=True) + eps)
    y_n = y_n / (jnp.linalg.norm(y_n, axis=-1, keepdims=True) + eps)
    d_seg = jnp.sum(jnp.sum(x_n * y_n, axis=-1), axis=0)  # (num_seg,)

    d_sum = jnp.sum(d_seg * seg_valid)
    count = NUMBAND * jnp.sum(seg_valid)
    # count == 0 (everything silent / too short) -> NaN, not a raise.
    return d_sum / jnp.where(count == 0, jnp.nan, count)


@functools.lru_cache(maxsize=16)
def _batch_program(sample_rate, n_in):
    """One jitted (B, N) -> (B,) STOI program per input signature.

    The cache is bounded: on ragged datasets every distinct signal
    length would otherwise pin one compiled executable for the process
    lifetime. Eviction drops the oldest programs (they recompile on
    reuse) — but callers with many distinct lengths should pad to a
    few bucket lengths anyway (see :func:`stoi_batch`), both for this
    cache and for compile time itself."""
    obm_np, _ = _thirdoct(FS, NFFT, NUMBAND, MINFREQ)
    window_np = np.hanning(N_FRAME + 2)[1:-1]
    if sample_rate != FS:
        design = _resampler_design(FS, sample_rate, n_in)
    else:
        design = None

    def single(ref, est, obm, window):
        if design is not None:
            up, down, h, n_pre_remove, n_out = design
            ref = _resample_device(ref, up, down, h, n_pre_remove,
                                   n_out)
            est = _resample_device(est, up, down, h, n_pre_remove,
                                   n_out)
        return _stoi_core_10k(ref, est, obm, window)

    @jax.jit
    def program(refs, ests):
        obm = jnp.asarray(obm_np, refs.dtype)
        window = jnp.asarray(window_np, refs.dtype)
        with jax.default_matmul_precision('float32'):
            return jax.vmap(
                lambda r, e: single(r, e, obm, window))(refs, ests)

    return program


def stoi_batch(reference, estimation, sample_rate):
    """Batched device STOI: one device program for the whole batch.

    Args:
        reference / estimation: (..., num_samples) real, broadcastable
            against each other.
        sample_rate: input sampling rate (device-resampled to 10 kHz
            with scipy's resample_poly parameterization).
    Returns:
        numpy array of shape (...,); NaN where the host oracle would
        raise (no non-silent segment).

    Every distinct ``num_samples`` compiles (and caches) its own
    device program; on datasets with ragged lengths, pad signals to a
    few shared bucket lengths before calling (STOI's silent-frame
    removal makes trailing zero-padding benign) — the program cache is
    bounded at 16 signatures.
    """
    # Broadcast on device: np.broadcast_arrays would pull an already
    # device-resident input back to the host (a full round-trip per
    # call over the tunneled transport).
    reference = jnp.asarray(reference)
    estimation = jnp.asarray(estimation)
    shape = jnp.broadcast_shapes(reference.shape, estimation.shape)
    lead, n = shape[:-1], shape[-1]
    refs = jnp.broadcast_to(reference, shape).reshape((-1, n))
    ests = jnp.broadcast_to(estimation, shape).reshape((-1, n))
    program = _batch_program(int(sample_rate), n)
    return np.asarray(program(refs, ests)).reshape(lead)


def stoi_device(reference, estimation, sample_rate):
    """Single-signal drop-in for the host ``stoi`` on the default JAX
    backend (float64 on CPU-x64 tests, float32 on TPU)."""
    out = stoi_batch(
        np.asarray(reference)[None], np.asarray(estimation)[None],
        sample_rate)
    return float(out[0])
