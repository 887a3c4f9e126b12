"""Iterative phase reconstruction: Griffin-Lim and MISI.

Capability parity with ``pb_bss/transform/griffin_lim_module.py``
(GriffinLim :6-90, MISI :93-130). The reference delegates the STFT to
nara_wpe; this framework owns it (:mod:`pb_bss_tpu.transform.
stft_module`), so each ``step`` is a fully jittable
stft -> magnitude-projection -> istft round trip.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .stft_module import istft, stft

__all__ = ['GriffinLim', 'MISI', 'griffin_lim', 'misi']


class GriffinLim:
    """[Griffin1984GriffinLim] signal estimation from modified STFT.

    Args:
        X: (K, T, F) complex STFT magnitudes (phases discarded).
        y: (num_samples,) mixture (needed by MISI / first_guess='y').
        first_guess: 'istft' | 'white_gaussian_noise' | 'y'.
    """

    def __init__(self, X, y=None, first_guess='istft',
                 size=512, shift=128, fading=False, key=None):
        self.size = size
        self.shift = shift
        self.fading = fading
        self.stft = partial(stft, size=size, shift=shift, fading=fading)
        self.istft = partial(
            istft, size=size, shift=shift, fading=fading)

        self.X = jnp.asarray(X)
        self.X_dash_dash = self.X
        self.X_dash = self.X
        self.y = None if y is None else jnp.asarray(y)

        if first_guess == 'istft':
            self.x_hat = self.istft(self.X)
        elif first_guess == 'white_gaussian_noise':
            shape = self.istft(self.X).shape
            if key is None:
                key = jax.random.key(0)
            self.x_hat = jax.random.normal(key, shape)
        elif first_guess == 'y':
            K = self.X.shape[0]
            # Text just under [Gunawan2010MISI] Equation 5
            self.x_hat = jnp.repeat(self.y[None, :] / K, K, axis=0)
        else:
            raise ValueError(first_guess)

    def step(self):
        self.X_dash_dash = self.stft(self.x_hat)
        self.X_dash = jnp.abs(self.X) * jnp.exp(
            1j * jnp.angle(self.X_dash_dash))
        self.x_hat = self.istft(self.X_dash)

    def evaluate(self, speech_source):
        """Consistency + mir_eval metrics against the oracle sources."""
        import pb_bss_tpu.evaluation as evaluation
        from pb_bss_tpu.evaluation.sxr_module import (
            get_variance_for_zero_mean_signal,
        )
        metrics = evaluation.OutputMetrics(
            speech_prediction=np.asarray(self.x_hat),
            speech_source=np.asarray(speech_source),
            enable_si_sdr=True,
        )
        return dict(
            mir_eval_sdr=float(np.mean(metrics.mir_eval['sdr'])),
            mir_eval_sir=float(np.mean(metrics.mir_eval['sir'])),
            inconsistency=float(get_variance_for_zero_mean_signal(
                self.X_dash - self.stft(self.istft(self.X_dash)))),
        )


class MISI(GriffinLim):
    """[Gunawan2010MISI]: distribute the mixture residual across the
    sources before each magnitude projection."""

    def step(self):
        K = self.X.shape[0]
        # [Gunawan2010MISI] Equation 5. The iSTFT round trip may pad
        # the estimates beyond len(y); align by zero-padding y.
        if self.x_hat.shape[-1] != self.y.shape[-1]:
            y = jnp.pad(
                self.y,
                (0, self.x_hat.shape[-1] - self.y.shape[-1]))
        else:
            y = self.y
        e = y - jnp.sum(self.x_hat, axis=0)
        # [Gunawan2010MISI] Equation 4
        x_dash_dash = self.x_hat + e / K
        self.X_dash_dash = self.stft(x_dash_dash)
        # [Gunawan2010MISI] Equation 3
        self.X_dash = jnp.abs(self.X) * jnp.exp(
            1j * jnp.angle(self.X_dash_dash))
        # [Gunawan2010MISI] Equation 2
        self.x_hat = self.istft(self.X_dash)


@partial(jax.jit, static_argnames=('iterations', 'size', 'shift',
                                   'fading'))
def _griffin_lim_loop(X, x_hat, *, iterations, size, shift, fading):
    mag = jnp.abs(X)

    def body(_, x_hat):
        X_dash_dash = stft(x_hat, size=size, shift=shift, fading=fading)
        X_dash = mag * jnp.exp(1j * jnp.angle(X_dash_dash))
        return istft(X_dash, size=size, shift=shift, fading=fading)

    return jax.lax.fori_loop(0, iterations, body, x_hat)


@partial(jax.jit, static_argnames=('iterations', 'size', 'shift',
                                   'fading'))
def _misi_loop(X, x_hat, y, *, iterations, size, shift, fading):
    mag = jnp.abs(X)
    K = X.shape[0]
    if x_hat.shape[-1] != y.shape[-1]:
        y = jnp.pad(y, (0, x_hat.shape[-1] - y.shape[-1]))

    def body(_, x_hat):
        e = y - jnp.sum(x_hat, axis=0)
        x_dash_dash = x_hat + e / K
        X_dash_dash = stft(
            x_dash_dash, size=size, shift=shift, fading=fading)
        X_dash = mag * jnp.exp(1j * jnp.angle(X_dash_dash))
        return istft(X_dash, size=size, shift=shift, fading=fading)

    return jax.lax.fori_loop(0, iterations, body, x_hat)


def griffin_lim(X, iterations=20, **kwargs):
    """Functional Griffin-Lim: the class trajectory with the whole
    iteration as ONE jitted ``fori_loop`` (the eager per-step class
    API costs a device dispatch per op). One eager step settles the
    iSTFT round-trip length; the loop carries a stable shape."""
    gl = GriffinLim(X, **kwargs)
    if iterations < 1:
        return gl.x_hat
    gl.step()
    gl.x_hat = _griffin_lim_loop(
        gl.X, gl.x_hat, iterations=iterations - 1, size=gl.size,
        shift=gl.shift, fading=gl.fading)
    return gl.x_hat


def misi(X, y, iterations=20, **kwargs):
    """Functional MISI: returns the reconstructed source signals
    (jitted loop; see :func:`griffin_lim`)."""
    m = MISI(X, y=y, first_guess='y', **kwargs)
    if iterations < 1:
        return m.x_hat
    m.step()
    m.x_hat = _misi_loop(
        m.X, m.x_hat, m.y, iterations=iterations - 1, size=m.size,
        shift=m.shift, fading=m.fading)
    return m.x_hat
