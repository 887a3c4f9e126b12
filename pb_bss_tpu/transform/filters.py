"""IIR filtering primitives, TPU-native.

The reference runs ``scipy.signal.lfilter`` cascades (sequential over
time) for the gammatone filterbank (reference transform/gammatone.py).
On TPU a second-order IIR section is an affine linear recurrence
``s[n] = A s[n-1] + c[n]``, which is associative under
``(A2, c2) o (A1, c1) = (A2 A1, A2 c1 + c2)`` — so it runs as a
``lax.associative_scan`` in O(log T) depth instead of a length-T loop.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ['biquad_filter', 'lfilter_sos']


def biquad_filter(x, b, a):
    """Apply one second-order IIR section along the last axis.

    Equivalent to ``scipy.signal.lfilter(b, a, x)`` with
    ``b = (b0, b1, b2)``, ``a = (1, a1, a2)`` (a0 must be 1), in
    transposed direct form II, parallelized over time via an
    associative scan.

    Args:
        x: (..., T) real signal.
        b: 3 feedforward coefficients (scalars or arrays broadcastable
            against x's batch dims).
        a: 3 feedback coefficients, ``a[0] == 1``.
    Returns:
        (..., T) filtered signal.
    """
    x = jnp.asarray(x)
    b0, b1, b2 = [jnp.asarray(v, x.dtype) for v in b]
    a0, a1, a2 = [jnp.asarray(v, x.dtype) for v in a]
    # normalize a0 = 1
    b0, b1, b2 = b0 / a0, b1 / a0, b2 / a0
    a1, a2 = a1 / a0, a2 / a0

    T = x.shape[-1]
    batch = x.shape[:-1]

    # state s = (s1, s2): y[n] = s1[n-1] + b0 x[n]
    # s1[n] = -a1 s1[n-1] + s2[n-1] + (b1 - a1 b0) x[n]
    # s2[n] = -a2 s1[n-1]           + (b2 - a2 b0) x[n]
    A = jnp.stack([
        jnp.stack([jnp.broadcast_to(-a1, batch),
                   jnp.broadcast_to(jnp.ones((), x.dtype), batch)], -1),
        jnp.stack([jnp.broadcast_to(-a2, batch),
                   jnp.broadcast_to(jnp.zeros((), x.dtype), batch)], -1),
    ], -2)  # (..., 2, 2)
    A = jnp.broadcast_to(A[..., None, :, :], batch + (T, 2, 2))
    c = jnp.stack([
        (b1 - a1 * b0)[..., None] * x,
        (b2 - a2 * b0)[..., None] * x,
    ], -1)  # (..., T, 2)

    def compose(left, right):
        A1, c1 = left
        A2, c2 = right
        return (
            jnp.einsum('...ij,...jk->...ik', A2, A1),
            jnp.einsum('...ij,...j->...i', A2, c1) + c2,
        )

    _, s = lax.associative_scan(compose, (A, c), axis=x.ndim - 1)
    s1 = s[..., 0]
    s1_prev = jnp.concatenate(
        [jnp.zeros(batch + (1,), x.dtype), s1[..., :-1]], axis=-1)
    return s1_prev + b0[..., None] * x


def lfilter_sos(x, sections):
    """Cascade of biquad sections: ``sections`` is a sequence of
    (b_coeffs, a_coeffs) tuples applied in order."""
    for b, a in sections:
        x = biquad_filter(x, b, a)
    return x
