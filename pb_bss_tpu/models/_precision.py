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
trace-time global; because jit executable caches are not keyed on it,
changing the value also clears JAX's compilation caches so already-
traced EM programs are re-traced with the new precision instead of
silently serving stale executables (the recompiles are the price of a
mid-process flip — it is an experiment-level knob, not a hot path).
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
    'bf16', or a ``jax.lax.Precision``). Returns the previous value.

    A change clears JAX's compilation caches (the executables are not
    keyed on this global), so the new precision applies to every EM
    program — including shapes that were already traced."""
    global _em_precision
    previous = _em_precision
    if isinstance(precision, str):
        precision = _ALIASES[precision.lower()]
    _em_precision = precision
    if precision != previous:
        jax.clear_caches()
    return previous
