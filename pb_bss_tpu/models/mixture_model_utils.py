"""Shared mixture-model math (E-step posteriors, weight estimation).

Capability parity with the reference's
``pb_bss/distribution/mixture_model_utils.py`` (log_pdf_to_affiliation
:7-55, estimate_mixture_weight :133-203, Dirichlet-MAP variant :206,
inline-PA helpers :58-130, :264-306) re-expressed as jit-compatible
functions: the K!-search of the integration-model inline PA is a static
gather over all permutations instead of a per-frequency Python loop.
"""
from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

__all__ = [
    'log_pdf_to_affiliation',
    'log_pdf_to_affiliation_for_integration_models_with_inline_pa',
    'estimate_mixture_weight',
    'apply_inline_permutation_alignment',
]

from .base import _unit_norm


from .._dtypes import tiny as _tiny


def log_pdf_to_affiliation(
        weight,
        log_pdf,
        source_activity_mask=None,
        affiliation_eps=0.,
):
    """Posterior responsibilities from per-class log densities.

    Max-shifted exponentiation, weight multiplication in the linear
    domain (avoids log(0) for zero weights), optional boolean source
    activity gating, tiny-clamped normalization, optional eps clipping
    (semantics of reference mixture_model_utils.py:7-55).

    Args:
        weight: broadcastable against log_pdf, e.g. (..., K, 1).
        log_pdf: (..., K, N)
        source_activity_mask: optional bool (..., K, N)
        affiliation_eps: if nonzero, clip to [eps, 1-eps] (no
            re-normalization afterwards, like the reference).
    """
    weight = jnp.asarray(weight)
    log_pdf = jnp.asarray(log_pdf)

    affiliation = log_pdf - jnp.max(log_pdf, axis=-2, keepdims=True)
    affiliation = jnp.exp(affiliation)
    affiliation = affiliation * weight
    if source_activity_mask is not None:
        affiliation = affiliation * source_activity_mask
    denominator = jnp.maximum(
        jnp.sum(affiliation, axis=-2, keepdims=True),
        _tiny(affiliation),
    )
    affiliation = affiliation / denominator
    if affiliation_eps != 0:
        affiliation = jnp.clip(
            affiliation, affiliation_eps, 1 - affiliation_eps)
    return affiliation


def log_pdf_to_affiliation_for_integration_models_with_inline_pa(
        weight,
        spatial_log_pdf,
        spectral_log_pdf,
        source_activity_mask=None,
        affiliation_eps=0.,
):
    """Inline per-frequency permutation alignment between a spatial and a
    spectral model ([Drude2018Dual] Eq. 11-12; reference
    mixture_model_utils.py:58-130).

    Instead of the reference's per-frequency Python loop over all K!
    permutations, all permutations are evaluated at once as a gather:
    (P, F, K, T) candidate log-pdfs -> auxiliary values (P, F) ->
    argmax over P per frequency. K is asserted small so P = K! stays
    tiny (K=4 -> 24).

    Shapes: spatial_log_pdf/spectral_log_pdf: (F, K, T).
    """
    spatial_log_pdf = jnp.asarray(spatial_log_pdf)
    spectral_log_pdf = jnp.asarray(spectral_log_pdf)
    F, num_classes, T = spatial_log_pdf.shape
    assert num_classes <= 6, (num_classes, 'K! blows up')
    permutations = np.array(
        list(itertools.permutations(range(num_classes))))  # (P, K)

    # (P, F, K, T): spatial rows permuted, spectral fixed
    log_pdf = spatial_log_pdf[:, permutations, :].transpose(1, 0, 2, 3) \
        + spectral_log_pdf[None]

    shifted = log_pdf - jnp.max(log_pdf, axis=-2, keepdims=True)
    candidate = jnp.exp(shifted)
    denominator = jnp.maximum(
        jnp.sum(candidate, axis=-2, keepdims=True), _tiny(candidate))
    candidate = candidate / denominator
    auxiliary = jnp.sum(candidate * log_pdf, axis=(-2, -1))  # (P, F)
    best = jnp.argmax(auxiliary, axis=0)  # (F,)

    best_log_pdf = jnp.take_along_axis(
        log_pdf, best[None, :, None, None], axis=0)[0]  # (F, K, T)

    return log_pdf_to_affiliation(
        jnp.broadcast_to(jnp.asarray(weight), spatial_log_pdf.shape),
        best_log_pdf,
        source_activity_mask=source_activity_mask,
        affiliation_eps=affiliation_eps,
    )


def estimate_mixture_weight(
        affiliation,
        saliency=None,
        weight_constant_axis=-1,
        dirichlet_prior_concentration=1,
):
    """M-step mixture weight with the reference's ``weight_constant_axis``
    semantics (mixture_model_utils.py:133-203):

    - axis resolving to -2 (the class axis): weights fixed to 1/K with
      shape (K, 1),
    - otherwise: (saliency-weighted) mean over the given axes, keepdims.

    ``dirichlet_prior_concentration`` > 1 applies the MAP plug-in rule
    of the reference's ``_estimate_mixture_weight_with_dirichlet_prior_
    concentration`` (mixture_model_utils.py:206-261).

    >>> import numpy as np, jax.numpy as jnp
    >>> affiliation = jnp.array(  # (F=2, K=2, T=2)
    ...     [[[1., 1.], [0., 0.]],
    ...      [[1., 0.], [0., 1.]]])
    >>> np.asarray(  # per-bin weights: mean over T
    ...     estimate_mixture_weight(affiliation), np.float64)
    array([[[1. ],
            [0. ]],
    <BLANKLINE>
           [[0.5],
            [0.5]]])
    >>> np.asarray(  # frequency-constant: mean over F and T
    ...     estimate_mixture_weight(
    ...         affiliation, weight_constant_axis=(-3, -1)), np.float64)
    array([[[0.75],
            [0.25]]])
    >>> np.asarray(  # axis -2 -> fixed 1/K
    ...     estimate_mixture_weight(
    ...         affiliation, weight_constant_axis=-2), np.float64)
    array([[0.5],
           [0.5]])
    """
    affiliation = jnp.asarray(affiliation)

    if isinstance(weight_constant_axis, int) and \
            weight_constant_axis % affiliation.ndim - affiliation.ndim == -2:
        K = affiliation.shape[-2]
        return jnp.full([K, 1], 1. / K, dtype=affiliation.dtype)
    if isinstance(weight_constant_axis, list):
        weight_constant_axis = tuple(weight_constant_axis)

    if saliency is None:
        if dirichlet_prior_concentration == 1:
            return jnp.mean(
                affiliation, axis=weight_constant_axis, keepdims=True)
        elif np.isposinf(dirichlet_prior_concentration):
            *independent, K, T = affiliation.shape
            return jnp.broadcast_to(
                jnp.asarray(1. / K, affiliation.dtype), [*independent, K, 1])
        else:
            assert dirichlet_prior_concentration >= 1, \
                dirichlet_prior_concentration
            assert weight_constant_axis in ((-1,), -1), weight_constant_axis
            K, T = affiliation.shape[-2:]
            tmp = jnp.sum(affiliation, axis=-1, keepdims=True)
            return (
                tmp + (dirichlet_prior_concentration - 1)
            ) / (
                T + (dirichlet_prior_concentration - 1) * K
            )
    else:
        masked_affiliation = affiliation * saliency[..., None, :]
        return _unit_norm(
            jnp.sum(
                masked_affiliation, axis=weight_constant_axis, keepdims=True),
            ord=1,
            axis=-2,
            eps=1e-10,
            eps_style='where',
        )


def apply_inline_permutation_alignment(
        affiliation,
        *,
        quadratic_form=None,
        weight_constant_axis,
        aligner,
):
    """Run a permutation aligner inside the EM loop
    (reference mixture_model_utils.py:264-306).

    affiliation: (F, K, T); the aligner works on (K, F, T).
    The aligner must provide jit-compatible ``calculate_mapping`` and
    ``apply_mapping`` (all aligners in
    :mod:`pb_bss_tpu.permutation_alignment` do).
    """
    affiliation = jnp.asarray(affiliation)
    assert affiliation.ndim == 3, (
        'Inline permutation alignment requires (F, K, T) affiliations, '
        f'got {affiliation.shape}.'
    )
    assert weight_constant_axis in ((-3,), (-3, -1), -3), (
        'Inline permutation alignment exists to reduce the mismatch '
        'between frequency-INDEPENDENT mixture weights and the '
        'per-frequency observation model, so it requires a '
        'frequency-constant weight_constant_axis ((-3,) or (-3, -1)); '
        f'got {weight_constant_axis}. With per-bin weights the model '
        'is invariant under per-bin class relabeling — fit without '
        'the inline aligner and align the result instead (reference '
        'mixture_model_utils.py:264-306 enforces the same).'
    )

    a_kft = jnp.transpose(affiliation, (1, 0, 2))
    mapping = aligner.calculate_mapping(a_kft)
    a_kft = aligner.apply_mapping(a_kft, mapping)
    affiliation = jnp.transpose(a_kft, (1, 0, 2))

    if quadratic_form is None:
        return affiliation
    q_kft = jnp.transpose(jnp.asarray(quadratic_form), (1, 0, 2))
    q_kft = aligner.apply_mapping(q_kft, mapping)
    quadratic_form = jnp.transpose(q_kft, (1, 0, 2))
    return affiliation, quadratic_form
