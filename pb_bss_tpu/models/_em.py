"""Shared jitted EM engine for all mixture trainers.

Every mixture trainer in the reference follows the same skeleton
(e.g. pb_bss/distribution/cwmm.py:152-183, vmfmm.py:123-146,
gmm.py:116-141): start from affiliations, then alternate
``model = m_step(affiliation)`` / ``affiliation = e_step(model)`` with
an optional inline permutation alignment after each E-step, returning
after an M-step. Here that skeleton is one ``lax.scan`` under ``jit``
with the model pytree as carry, shared by all model families.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['run_em']


def run_em(
        *,
        affiliation,
        iterations: int,
        m_step,
        e_step,
        aligner=None,
        weight_constant_axis=(-1,),
):
    """Run the EM loop as a single compiled program.

    Args:
        affiliation: initial responsibilities (..., K, N).
        iterations: number of M-steps (> 0).
        m_step: affiliation -> model (pure, jit-compatible). A
            two-parameter ``m_step(affiliation, previous_model)``
            receives the carry model (None on the first call) —
            for warm-startable M-step solvers.
        e_step: model -> affiliation (pure, jit-compatible).
        aligner: optional inline permutation aligner applied to the
            E-step output (requires (F, K, T) affiliations).
        weight_constant_axis: only used to validate aligner usage.
    Returns:
        The fitted model pytree.
    """
    assert iterations > 0, iterations

    import inspect
    takes_model = len(inspect.signature(m_step).parameters) >= 2
    if not takes_model:
        orig_m_step = m_step
        m_step = lambda affiliation, _model: orig_m_step(affiliation)

    def e_then_m(model):
        affiliation = e_step(model)
        if aligner is not None:
            from .mixture_model_utils import (
                apply_inline_permutation_alignment,
            )
            affiliation = apply_inline_permutation_alignment(
                affiliation=affiliation,
                weight_constant_axis=weight_constant_axis,
                aligner=aligner,
            )
        return m_step(affiliation, model)

    model = m_step(affiliation, None)
    if iterations > 1:
        def step(model, _):
            return e_then_m(model), None
        model, _ = lax.scan(step, model, None, length=iterations - 1)
    return model
