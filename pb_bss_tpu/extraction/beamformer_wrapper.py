"""String-dispatch beamformer wrapper.

Capability parity with ``pb_bss/extraction/beamformer_wrapper.py``:
``get_bf_vector('rank1_gev+mvdr_souden+ban', ...)`` parses the ``+ban``
suffix, optional rank-1 ATF re-estimation (``rank1_pca``/``rank1_gev``)
and dispatches to the core estimators (reference :117-236). Also the
rank-one helpers (:11-68) and the ``'chX'`` passthrough (:218-223).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import labels_to_one_hot
from .beamformer import (
    blind_analytic_normalization,
    get_gev_vector,
    get_mvdr_vector,
    get_mvdr_vector_souden,
    get_pca_vector,
    get_wmwf_vector,
)

__all__ = [
    'get_bf_vector',
]


def get_pca_rank_one_estimate(covariance_matrix, **atf_kwargs):
    """Rank-1 PSD approximation from the dominant eigenvector
    (Wang et al. "Rank-1 Constrained MWF" Eq. 25/26; reference :11-24)."""
    covariance_matrix = jnp.asarray(covariance_matrix)
    a = get_pca_vector(covariance_matrix, **atf_kwargs)
    cov_rank1 = jnp.einsum('...d,...D->...dD', a, a.conj())
    scale = jnp.trace(covariance_matrix, axis1=-1, axis2=-2) \
        / jnp.trace(cov_rank1, axis1=-1, axis2=-2)
    return scale[..., None, None] * cov_rank1


def _get_gev_atf_vector(
        covariance_matrix, noise_covariance_matrix, **gev_kwargs):
    """Scaled ATF estimate from the dominant generalized eigenvector
    (https://arxiv.org/pdf/1707.00201.pdf Eq. 27; reference :27-46)."""
    assert noise_covariance_matrix is not None
    w = get_gev_vector(
        covariance_matrix, noise_covariance_matrix, **gev_kwargs)
    return jnp.einsum(
        '...dD,...D->...d', jnp.asarray(noise_covariance_matrix), w)


def get_gev_rank_one_estimate(
        covariance_matrix, noise_covariance_matrix, **gev_kwargs):
    """Rank-1 PSD approximation from the GEV-based ATF (reference :49-68)."""
    covariance_matrix = jnp.asarray(covariance_matrix)
    a = _get_gev_atf_vector(
        covariance_matrix, noise_covariance_matrix, **gev_kwargs)
    cov_rank1 = jnp.einsum('...d,...D->...dD', a, a.conj())
    scale = jnp.trace(covariance_matrix, axis1=-1, axis2=-2) \
        / jnp.trace(cov_rank1, axis1=-1, axis2=-2)
    return scale[..., None, None] * cov_rank1


def _get_atf_vector(
        atf_type, target_psd_matrix, noise_psd_matrix, **atf_kwargs):
    if atf_type == 'pca':
        return get_pca_vector(target_psd_matrix, **atf_kwargs)
    elif atf_type == 'scaled_gev_atf':
        return _get_gev_atf_vector(
            target_psd_matrix, noise_psd_matrix, **atf_kwargs)
    else:
        raise ValueError(atf_type, 'use either pca or scaled_gev_atf')


def _get_rank_1_approximation(
        atf_type, target_psd_matrix, noise_psd_matrix, **atf_kwargs):
    if atf_type == 'rank1_pca':
        return get_pca_rank_one_estimate(target_psd_matrix, **atf_kwargs)
    elif atf_type == 'rank1_gev':
        return get_gev_rank_one_estimate(
            target_psd_matrix, noise_psd_matrix, **atf_kwargs)
    else:
        raise ValueError(atf_type, 'use either rank1_pca or rank1_gev')


def _get_response_vector(source_index, num_sources, epsilon=0.):
    response_vector = labels_to_one_hot(
        np.array(source_index), num_sources, dtype=np.float64)
    return np.clip(response_vector, epsilon, 1.)


def get_bf_vector(
        beamformer,
        target_psd_matrix,
        noise_psd_matrix=None,
        **bf_kwargs,
):
    """Obtain a beamforming vector by name (reference :117-236).

    Common beamformers: ``'mvdr_souden'``, ``'mvdr_souden+ban'``,
    ``'rank1_gev+mvdr_souden+ban'``, ``'gev+ban'``, ``'pca'``,
    ``'pca+mvdr'``, ``'scaled_gev_atf+mvdr'``, ``'wmwf'``, ``'chX'``.

    Args:
        beamformer: '+'-separated estimation pipeline string.
        target_psd_matrix: (..., sensor, sensor).
        noise_psd_matrix: (..., sensor, sensor).
        **bf_kwargs: forwarded to the core estimator; ATF options under
            the ``atf_kwargs`` key.

    >>> import numpy as np
    >>> from pb_bss_tpu.testing.random_utils import pos_def_hermitian
    >>> rng = np.random.default_rng(0)
    >>> target = pos_def_hermitian((6, 3, 3), rng=rng)
    >>> noise = pos_def_hermitian((6, 3, 3), rng=rng)
    >>> get_bf_vector('mvdr_souden', target, noise).shape
    (6, 3)
    >>> get_bf_vector('rank1_gev+mvdr_souden+ban', target, noise).shape
    (6, 3)
    """
    assert 'lcmv' not in beamformer, (
        'LCMV takes per-source PSD stacks plus a response vector, which '
        'does not fit this single-target dispatch — call '
        '`pb_bss_tpu.extraction.get_lcmv_vector` (or '
        '`get_lcmv_vector_souden`) directly.'
    )
    assert isinstance(beamformer, str), beamformer

    if beamformer.endswith('+ban'):
        ban = True
        beamformer_core = beamformer[:-len('+ban')]
    else:
        ban = False
        beamformer_core = beamformer

    if beamformer_core == 'pca':
        beamforming_vector = get_pca_vector(target_psd_matrix, **bf_kwargs)
    elif beamformer_core in ['pca+mvdr', 'scaled_gev_atf+mvdr']:
        atf, _ = beamformer_core.split('+')
        atf_vector = _get_atf_vector(
            atf, target_psd_matrix, noise_psd_matrix,
            **bf_kwargs.pop('atf_kwargs', {}))
        beamforming_vector = get_mvdr_vector(atf_vector, noise_psd_matrix)
    elif beamformer_core in [
        'mvdr_souden', 'rank1_pca+mvdr_souden', 'rank1_gev+mvdr_souden',
    ]:
        if beamformer_core != 'mvdr_souden':
            rank1_type, _ = beamformer_core.split('+')
            target_psd_matrix = _get_rank_1_approximation(
                rank1_type, target_psd_matrix, noise_psd_matrix,
                **bf_kwargs.pop('atf_kwargs', {}))
        beamforming_vector = get_mvdr_vector_souden(
            target_psd_matrix, noise_psd_matrix, **bf_kwargs)
    elif beamformer_core in ['gev', 'rank1_pca+gev', 'rank1_gev+gev']:
        if beamformer_core != 'gev':
            rank1_type, _ = beamformer_core.split('+')
            target_psd_matrix = _get_rank_1_approximation(
                rank1_type, target_psd_matrix, noise_psd_matrix,
                **bf_kwargs.pop('atf_kwargs', {}))
        beamforming_vector = get_gev_vector(
            target_psd_matrix, noise_psd_matrix, **bf_kwargs)
    elif beamformer_core in ['wmwf', 'rank1_pca+wmwf', 'rank1_gev+wmwf']:
        if beamformer_core != 'wmwf':
            rank1_type, _ = beamformer_core.split('+')
            target_psd_matrix = _get_rank_1_approximation(
                rank1_type, target_psd_matrix, noise_psd_matrix,
                **bf_kwargs.pop('atf_kwargs', {}))
        beamforming_vector = get_wmwf_vector(
            target_psd_matrix, noise_psd_matrix, **bf_kwargs)
    elif 'ch' in beamformer_core and beamformer_core[2:].isdigit():
        target_psd_matrix = jnp.asarray(target_psd_matrix)
        D = target_psd_matrix.shape[-1]
        beamforming_vector = jnp.zeros(D).at[
            int(beamformer_core[2:])].set(1)
        beamforming_vector = jnp.broadcast_to(
            beamforming_vector, target_psd_matrix.shape[:-1])
    else:
        raise ValueError(
            f'Could not find implementation for {beamformer_core}.\n'
            f'Original call contained {beamformer}.'
        )

    if ban:
        beamforming_vector = blind_analytic_normalization(
            beamforming_vector, noise_psd_matrix)
    return beamforming_vector
