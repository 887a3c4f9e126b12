"""STFT / iSTFT frontend.

The reference outsources the STFT to nara_wpe
(reference: tests/test_distribution/test_spatial_mm.py:4,17-22 uses
``stft(signal, 512, 128)`` with the default Blackman window and edge
fading). This framework owns the transform: framing + rfft under jit,
with a bias-compensated overlap-add synthesis window so that
``istft(stft(x)) == x`` to machine precision for any window/shift.

Conventions (matching the reference usage):
    * ``stft``: (..., num_samples) -> (..., T, F) complex, F = size//2+1
    * ``fading=True`` pads ``size - shift`` zeros on both ends so every
      sample receives full window coverage,
    * iSTFT synthesis uses the biorthogonal window
      ``w / sum_k w^2[n + k*shift]`` (perfect reconstruction OLA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

__all__ = ['stft', 'istft', 'STFT']


def _blackman(size):
    # periodic Blackman (matches scipy.signal.blackman(size, sym=False))
    return scipy.signal.get_window('blackman', size, fftbins=True)


def _hann(size):
    return scipy.signal.get_window('hann', size, fftbins=True)


_WINDOWS = {
    'blackman': _blackman,
    'hann': _hann,
    'hamming': lambda size: scipy.signal.get_window(
        'hamming', size, fftbins=True),
    'boxcar': lambda size: np.ones(size),
}


def _get_window(window, size):
    if callable(window):
        return np.asarray(window(size), np.float64)
    return np.asarray(_WINDOWS[window](size), np.float64)


def _biorthogonal_window(analysis_window, shift):
    """Synthesis window for perfect-reconstruction overlap-add.

    For each sample position within a frame, divides the analysis
    window by the overlapped sum of squared analysis windows.
    """
    size = len(analysis_window)
    denominator = np.zeros(size)
    for offset in range(-(size // shift), size // shift + 1):
        shifted = np.zeros(size)
        lo = offset * shift
        src_lo = max(0, lo)
        src_hi = min(size, size + lo)
        if src_lo < src_hi:
            shifted[src_lo - lo:src_hi - lo] = (
                analysis_window[src_lo:src_hi] ** 2)
        denominator += shifted
    return analysis_window / denominator


def _frame(time_signal, size, shift, frames):
    """(..., samples) -> (..., frames, size) overlapping frames.

    When ``shift`` divides ``size`` the signal is reshaped into
    contiguous ``shift``-chunks and each frame is a concatenation of
    ``size/shift`` *static* chunk slices — TPU gathers with a (T, size)
    index array lower to slow dynamic slices, static slices are free.
    """
    if size % shift == 0:
        r = size // shift
        n_chunks = frames + r - 1
        chunks = time_signal[..., :n_chunks * shift].reshape(
            time_signal.shape[:-1] + (n_chunks, shift))
        return jnp.concatenate(
            [chunks[..., i:i + frames, :] for i in range(r)], axis=-1)
    starts = np.arange(frames) * shift
    idx = starts[:, None] + np.arange(size)[None, :]  # (T, size)
    return time_signal[..., idx]


@functools.lru_cache(maxsize=None)
def _dft_weights(size, window):
    """Windowed real-DFT analysis matrices (cos, -sin), (size, F)."""
    w = _get_window(window, size)
    angle = 2 * np.pi * np.outer(
        np.arange(size), np.arange(size // 2 + 1)) / size
    return (np.cos(angle) * w[:, None], -np.sin(angle) * w[:, None])


@functools.lru_cache(maxsize=None)
def _idft_weights(size, shift, window):
    """Real-iDFT synthesis matrices (F, size) with the biorthogonal
    synthesis window folded in: ``x = Xr @ Ar + Xi @ Ai``."""
    synthesis = _biorthogonal_window(_get_window(window, size), shift)
    f = np.arange(size // 2 + 1)
    alpha = np.where((f == 0) | (f == size // 2), 1.0, 2.0) / size
    angle = 2 * np.pi * np.outer(f, np.arange(size)) / size
    return (np.cos(angle) * alpha[:, None] * synthesis[None, :],
            -np.sin(angle) * alpha[:, None] * synthesis[None, :])


@functools.partial(
    jax.jit,
    static_argnames=('size', 'shift', 'window', 'fading', 'pad',
                     'method'),
)
def stft(
        time_signal,
        size: int = 512,
        shift: int = 128,
        *,
        window='blackman',
        fading: bool = True,
        pad: bool = True,
        method: str = 'auto',
):
    """Short-time Fourier transform.

    Args:
        time_signal: (..., num_samples) real.
        size: frame size == FFT size.
        shift: frame shift (hop).
        window: window name or callable size->array.
        fading: pad ``size - shift`` zeros on both ends.
        pad: zero-pad the end so the last partial frame is kept.
        method: ``'fft'`` (XLA FFT), ``'matmul'`` (windowed DFT as two
            MXU matmuls — much faster on TPU for size <= ~1024 where
            the XLA FFT is latency-bound), or ``'auto'`` (matmul on
            non-CPU f32 inputs, fft otherwise).

    Returns:
        (..., T, F) complex with F = size // 2 + 1.

    >>> import numpy as np, jax.numpy as jnp
    >>> x = jnp.asarray(np.random.default_rng(0).standard_normal(4000))
    >>> Y = stft(x)
    >>> Y.shape  # (frames, size // 2 + 1)
    (35, 257)
    >>> from pb_bss_tpu.transform import istft
    >>> x_hat = istft(Y, num_samples=4000)
    >>> bool(jnp.allclose(x_hat, x, atol=1e-5))  # perfect reconstruction
    True
    """
    time_signal = jnp.asarray(time_signal)
    real_dtype = jnp.result_type(time_signal.dtype, jnp.float32)
    if method == 'auto':
        method = (
            'matmul'
            if (jax.default_backend() != 'cpu'
                and real_dtype == jnp.float32 and size <= 2048)
            else 'fft')

    if fading:
        pad_width = [(0, 0)] * (time_signal.ndim - 1) \
            + [(size - shift, size - shift)]
        time_signal = jnp.pad(time_signal, pad_width)

    samples = time_signal.shape[-1]
    if samples < size:
        frames = 1
    elif pad:
        frames = int(np.ceil((samples - size + shift) / shift))
    else:
        frames = (samples - size + shift) // shift
    needed = size + (frames - 1) * shift
    if needed > samples:
        pad_width = [(0, 0)] * (time_signal.ndim - 1) \
            + [(0, needed - samples)]
        time_signal = jnp.pad(time_signal, pad_width)

    framed = _frame(time_signal, size, shift, frames)  # (..., T, size)
    if method == 'matmul':
        cr, ci = _dft_weights(size, window if isinstance(window, str)
                              else window)  # hashable for the cache
        cr = jnp.asarray(cr, real_dtype)
        ci = jnp.asarray(ci, real_dtype)
        yr = jnp.einsum('...tl,lf->...tf', framed, cr,
                        precision=jax.lax.Precision.HIGHEST)
        yi = jnp.einsum('...tl,lf->...tf', framed, ci,
                        precision=jax.lax.Precision.HIGHEST)
        return jax.lax.complex(yr, yi)
    w = jnp.asarray(_get_window(window, size), real_dtype)
    return jnp.fft.rfft(framed * w, n=size, axis=-1)


def _overlap_add(framed, size, shift, frames):
    """(..., T, size) -> (..., size + (T-1)*shift) overlap-add.

    When ``shift`` divides ``size``, each frame is ``size/shift``
    contiguous chunks and the accumulation is ``size/shift`` static
    slice-adds — the index-array ``.at[].add`` scatter this replaces is
    very slow on TPU.
    """
    length = size + (frames - 1) * shift
    if size % shift == 0:
        r = size // shift
        n_chunks = frames + r - 1
        sub = framed.reshape(framed.shape[:-1] + (r, shift))
        acc = jnp.zeros(
            framed.shape[:-2] + (n_chunks, shift), framed.dtype)
        for i in range(r):
            acc = acc.at[..., i:i + frames, :].add(sub[..., :, i, :])
        return acc.reshape(framed.shape[:-2] + (length,))
    out_shape = framed.shape[:-2] + (length,)
    starts = np.arange(frames) * shift
    idx = (starts[:, None] + np.arange(size)[None, :]).reshape(-1)
    return jnp.zeros(out_shape, framed.dtype).at[..., idx].add(
        framed.reshape(framed.shape[:-2] + (-1,)))


@functools.partial(
    jax.jit,
    static_argnames=('size', 'shift', 'window', 'fading', 'num_samples',
                     'method'),
)
def istft(
        stft_signal,
        size: int = 512,
        shift: int = 128,
        *,
        window='blackman',
        fading: bool = True,
        num_samples: int = None,
        method: str = 'auto',
):
    """Inverse STFT with bias-compensated overlap-add.

    Args:
        stft_signal: (..., T, F) complex.
        method: ``'fft'``, ``'matmul'`` (synthesis-windowed real iDFT
            as two MXU matmuls), or ``'auto'`` (matmul on non-CPU c64
            inputs).
    Returns:
        (..., num_samples) real. When ``num_samples`` is given the
        output is cut/padded to exactly that length (after fading
        removal), mirroring ``istft(...)[..., :num_samples]`` usage in
        the reference tests.
    """
    stft_signal = jnp.asarray(stft_signal)
    if method == 'auto':
        method = (
            'matmul'
            if (jax.default_backend() != 'cpu'
                and stft_signal.dtype == jnp.complex64 and size <= 2048)
            else 'fft')
    frames = stft_signal.shape[-2]

    if method == 'matmul':
        ar, ai = _idft_weights(size, shift, window)
        ar = jnp.asarray(ar, jnp.float32)
        ai = jnp.asarray(ai, jnp.float32)
        framed = (
            jnp.einsum('...tf,fl->...tl', stft_signal.real, ar,
                       precision=jax.lax.Precision.HIGHEST)
            + jnp.einsum('...tf,fl->...tl', stft_signal.imag, ai,
                         precision=jax.lax.Precision.HIGHEST))
    else:
        analysis = _get_window(window, size)
        synthesis = jnp.asarray(
            _biorthogonal_window(analysis, shift), jnp.float32
            if stft_signal.dtype == jnp.complex64 else jnp.float64)
        framed = jnp.fft.irfft(stft_signal, n=size, axis=-1) * synthesis

    time_signal = _overlap_add(framed, size, shift, frames)
    length = size + (frames - 1) * shift

    if fading:
        time_signal = time_signal[
            ..., size - shift: length - (size - shift)]
    if num_samples is not None:
        cur = time_signal.shape[-1]
        if num_samples <= cur:
            time_signal = time_signal[..., :num_samples]
        else:
            pad_width = [(0, 0)] * (time_signal.ndim - 1) \
                + [(0, num_samples - cur)]
            time_signal = jnp.pad(time_signal, pad_width)
    return time_signal


class STFT:
    """Object-style frontend bundling parameters, convenient for
    pipelines: ``STFT(512, 128)(signal)`` / ``.inverse(Signal)``."""

    def __init__(self, size=512, shift=128, *, window='blackman',
                 fading=True):
        self.size = size
        self.shift = shift
        self.window = window
        self.fading = fading

    def __call__(self, time_signal):
        return stft(time_signal, self.size, self.shift,
                    window=self.window, fading=self.fading)

    def inverse(self, stft_signal, num_samples=None):
        return istft(stft_signal, self.size, self.shift,
                     window=self.window, fading=self.fading,
                     num_samples=num_samples)

    @property
    def frequencies(self):
        return self.size // 2 + 1
