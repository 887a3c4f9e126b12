"""EM matmul-precision knob.

The cACGMM hot path pins its MXU einsums (E-step projection /
quadratic form, M-step scatter) to ``Precision.HIGHEST`` because the
TPU's default bf16 matmul passes measurably corrupt the EM numerics
(see docs/DESIGN.md, "Mixed precision"): affiliations are
exponentially sensitive to small-eigenvalue rounding and downstream
iterative linalg (stable_solve residual gates, MVDR-Souden) breaks on
bf16 residuals.

This module exposes the pin so the trade can be *measured* instead of
assumed (scripts/bf16_em_experiment.py): ``set_em_matmul_precision``
swaps the precision used by subsequently *traced* programs. It is a
trace-time global — already-jitted executables keep the precision they
were compiled with, so flip it at process start (the experiment runs
each arm in a fresh process).
"""
from __future__ import annotations

import jax

__all__ = ['em_matmul_precision', 'set_em_matmul_precision']

_ALIASES = {
    'highest': jax.lax.Precision.HIGHEST,
    'high': jax.lax.Precision.HIGH,
    'default': jax.lax.Precision.DEFAULT,
    'bf16': jax.lax.Precision.DEFAULT,
}

_em_precision = jax.lax.Precision.HIGHEST


def em_matmul_precision():
    """Precision for the EM hot-path einsums (read at trace time)."""
    return _em_precision


def set_em_matmul_precision(precision):
    """Set the EM einsum precision ('highest' | 'high' | 'default' /
    'bf16', or a ``jax.lax.Precision``). Affects programs traced after
    the call; returns the previous value."""
    global _em_precision
    previous = _em_precision
    if isinstance(precision, str):
        precision = _ALIASES[precision.lower()]
    _em_precision = precision
    return previous
