"""Sample-level streaming separation — beyond-reference capability.

The offline pipeline (:mod:`pb_bss_tpu.pipeline`) separates a complete
utterance in one compiled program. This module is the *serving* form:
audio arrives in fixed-size multichannel sample chunks, each chunk is
analyzed, fed to the block-online cACGMM
(:class:`~pb_bss_tpu.models.cacgmm_streaming.StreamingCACGMM`), masked
and synthesized — one jitted device program per chunk, with
deterministic latency.

Latency contract: one chunk (``block_frames * shift`` samples) of
algorithmic buffering plus ``size - shift`` samples of overlap-add
completion, i.e. with the defaults (512/128, 16 frames @ 16 kHz)
``16 * 128 + 384 = 2432`` samples ≈ 152 ms.

Steady-state reconstruction is exact (the biorthogonal synthesis
window of :mod:`pb_bss_tpu.transform` is time-invariant); only the
first ``size - shift`` output samples of a stream lack full window
overlap — identical to the offline transform with ``fading=False``.

The per-chunk class order is stable because every chunk's EM is
warm-started from the previous model; run the DHTV aligner on the
accumulated masks offline if cross-frequency alignment is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .models.cacgmm_streaming import StreamingCACGMM
from .transform.stft_module import istft, stft

__all__ = ['StreamingSeparator']


@functools.partial(
    jax.jit,
    static_argnames=('size', 'shift', 'window'))
def _analyze(lookback, chunk, *, size, shift, window):
    """(D, size-shift) lookback + (D, B*shift) chunk -> (F, B, D)
    STFT block + the new lookback."""
    xs = jnp.concatenate([lookback, chunk], axis=-1)
    # length == size + (B-1)*shift -> exactly B frames, no padding
    Y = stft(xs, size, shift, window=window, fading=False, pad=False)
    return jnp.einsum('dtf->ftd', Y), xs[..., -(size - shift):]


@functools.partial(
    jax.jit,
    static_argnames=('size', 'shift', 'window', 'reference_channel'))
def _synthesize(Y, affiliation, ola_tail, *, size, shift, window,
                reference_channel):
    """Mask the reference channel and overlap-add one block.

    Args:
        Y: (F, B, D) analysis block.
        affiliation: (F, K, B) streaming posteriors.
        ola_tail: (K, size - shift) synthesis carry.
    Returns:
        (out (K, B*shift), new_tail (K, size - shift)).
    """
    B = Y.shape[1]
    masked = jnp.einsum(
        'fkt,ft->ktf', affiliation, Y[..., reference_channel])
    block = istft(masked, size, shift, window=window, fading=False)
    # block length == size + (B-1)*shift == B*shift + (size-shift)
    out = block[..., :B * shift]
    out = out.at[..., :size - shift].add(ola_tail)
    return out, block[..., B * shift:]


class StreamingSeparator:
    """Block-online multichannel separation with fixed latency.

    Usage::

        sep = StreamingSeparator(num_classes=3)
        for chunk in microphone_chunks:     # (D, chunk_samples) each
            out = sep.process(chunk)        # (K, n) as blocks complete
            ...
        out = sep.flush()                   # final overlap-add tail

    Arbitrary chunk sizes are accepted (samples are buffered on the
    host); every full ``block_frames`` STFT frames trigger one jitted
    device step. Output class order is stable across a stream.

    Args:
        num_classes: K mixture components (speakers + noise).
        stft_size / stft_shift / window: transform parameters.
        block_frames: STFT frames per EM block; must satisfy
            ``block_frames * stft_shift >= stft_size - stft_shift``
            (the overlap-add carry cannot span more than one block).
        forgetting / inner_iterations / init_iterations: the
            :class:`StreamingCACGMM` tracking knobs.
        reference_channel: channel whose STFT the masks scale.
        key: PRNG key for the first block's EM initialization.
    """

    def __init__(self, num_classes, *, stft_size=512, stft_shift=128,
                 window='blackman', block_frames=16, forgetting=0.999,
                 inner_iterations=2, init_iterations=10,
                 reference_channel=0, key=None):
        assert block_frames * stft_shift >= stft_size - stft_shift, (
            block_frames, stft_size, stft_shift)
        self.num_classes = num_classes
        self.size = stft_size
        self.shift = stft_shift
        self.window = window
        self.block_frames = block_frames
        self.reference_channel = reference_channel
        self.key = key
        self.stream = StreamingCACGMM(
            num_classes, forgetting=forgetting,
            inner_iterations=inner_iterations,
            init_iterations=init_iterations)
        self._em_state = None
        self._lookback = None          # (D, size - shift) device
        self._ola_tail = None          # (K, size - shift) device
        self._buffer = None            # host sample buffer (D, n)

    @property
    def latency_samples(self):
        """Worst-case algorithmic latency in samples."""
        return (self.block_frames * self.shift
                + (self.size - self.shift))

    def _step(self, chunk):
        """One full device step for (D, block_frames*shift) samples."""
        Y, self._lookback = _analyze(
            self._lookback, chunk, size=self.size, shift=self.shift,
            window=self.window)
        # StreamingCACGMM expects (..., T, D) blocks; Y is (F, B, D).
        self._em_state, affiliation = self.stream.update(
            self._em_state, Y, key=self.key)
        out, self._ola_tail = _synthesize(
            Y, affiliation, self._ola_tail, size=self.size,
            shift=self.shift, window=self.window,
            reference_channel=self.reference_channel)
        return np.asarray(out)

    def process(self, samples):
        """Feed (D, n) samples; returns (K, m) separated samples
        (m = however many full blocks completed, possibly 0)."""
        samples = np.asarray(samples)
        assert samples.ndim == 2, samples.shape
        if self._buffer is None:
            D = samples.shape[0]
            self._buffer = np.zeros((D, 0), samples.dtype)
            self._lookback = jnp.zeros(
                (D, self.size - self.shift), jnp.float32)
            self._ola_tail = jnp.zeros(
                (self.num_classes, self.size - self.shift),
                jnp.float32)
        self._buffer = np.concatenate([self._buffer, samples], axis=-1)

        block_samples = self.block_frames * self.shift
        outs = []
        while self._buffer.shape[-1] >= block_samples:
            chunk = jnp.asarray(
                self._buffer[:, :block_samples], jnp.float32)
            self._buffer = self._buffer[:, block_samples:]
            outs.append(self._step(chunk))
        if outs:
            return np.concatenate(outs, axis=-1)
        return np.zeros((self.num_classes, 0), np.float32)

    def flush(self):
        """Zero-pad the remaining buffered samples to a whole block,
        process it, and emit everything incl. the overlap-add tail."""
        if self._buffer is None:
            return np.zeros((self.num_classes, 0), np.float32)
        n_rest = self._buffer.shape[-1]
        block_samples = self.block_frames * self.shift
        outs = []
        if n_rest:
            pad = np.zeros(
                (self._buffer.shape[0], block_samples - n_rest),
                self._buffer.dtype)
            outs.append(self.process(pad)[:, :n_rest])
        outs.append(np.asarray(self._ola_tail))
        self._buffer = self._buffer[:, :0]
        return np.concatenate(outs, axis=-1)
