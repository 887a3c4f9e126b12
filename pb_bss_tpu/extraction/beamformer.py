"""Beamformer module, TPU-native.

Capability parity with the reference ``pb_bss/extraction/beamformer.py``:
PSD estimation (:59-160), PCA/ATF (:163-224), MVDR in ATF form
(:230-260) and Souden form (:627-698) with SNR-based reference-channel
selection (:601-624), the MERL variant (:263-289), GEV (:292-411), LCMV
(:414-456), wMWF (:701-753) and the postfilters/normalizations
(:459-599).

Shape convention (same as the reference): time at the end, independent
dims in front — X: (F, D, T), mask: (F, K, T), PSD: (F, K, D, D).

TPU-first realization: every estimator is a batched XLA program — the
reference's per-bin LAPACK loops (``_get_gev_vector`` :367-411, the
Cython ``zhegvd`` kernel) become one Cholesky-whitened batched Jacobi
eigendecomposition (:func:`pb_bss_tpu.ops.linalg.gev_max_eigvec`); the
``solve -> per-bin solve -> lstsq`` ladder becomes the branchless
:func:`pb_bss_tpu.ops.linalg.stable_solve`. Everything is
jit-compatible; sharding the frequency axis over a mesh parallelizes
all estimators with zero communication.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import (
    condition_hermitian,
    eigh,
    force_hermitian,
    gev_max_eigvec,
    stable_solve,
)

__all__ = [
    'get_power_spectral_density_matrix',
    'get_mvdr_vector_souden',
    'get_mvdr_vector',
    'get_wmwf_vector',
    'get_pca_vector',
    'get_gev_vector',
    'blind_analytic_normalization',
    'condition_covariance',
    'apply_beamforming_vector',
    'get_lcmv_vector',
    'get_lcmv_vector_souden',
]


from .._dtypes import real_dtype as _real_dtype, tiny as _tiny


def get_power_spectral_density_matrix(
        observation,
        mask=None,
        sensor_dim=-2,
        source_dim=-2,
        time_dim=-1,
        normalize=True,
):
    """Weighted power spectral density (spatial covariance) matrix.

    Args:
        observation: complex (..., sensors, frames) (other layouts via
            ``sensor_dim``/``time_dim``).
        mask: (..., frames) or (..., sources, frames); bool masks are
            cast to float; normalized over time unless ``normalize=False``.
    Returns:
        (..., sensors, sensors) or (..., sources, sensors, sensors); a
        ``source_dim`` left of -2 moves the source axis to the front,
        mirroring the reference (beamformer.py:100-160).
    """
    observation = jnp.asarray(observation)
    sensor_dim, source_dim, time_dim = (
        d % observation.ndim - observation.ndim
        for d in (sensor_dim, source_dim, time_dim)
    )

    obs_transpose = [
        i for i in range(-observation.ndim, 0)
        if i not in [sensor_dim, time_dim]
    ] + [sensor_dim, time_dim]
    observation = observation.transpose(obs_transpose)

    if mask is None:
        psd = jnp.einsum(
            '...dt,...et->...de', observation, observation.conj(),
            precision=jax.lax.Precision.HIGHEST)
        psd = psd / observation.shape[-1]
        return psd

    mask = jnp.asarray(mask)
    if mask.dtype == jnp.bool_:
        mask = mask.astype(_real_dtype(observation))

    if normalize:
        mask = mask / jnp.maximum(
            jnp.sum(mask, axis=time_dim, keepdims=True), 1e-10)

    if mask.ndim + 1 == observation.ndim:
        mask = jnp.expand_dims(mask, -2)
        return jnp.einsum(
            '...dt,...et->...de', mask * observation, observation.conj(),
            precision=jax.lax.Precision.HIGHEST)

    mask_transpose = [
        i for i in range(-observation.ndim, 0)
        if i not in [source_dim, time_dim]
    ] + [source_dim, time_dim]
    mask = mask.transpose(mask_transpose)
    psd = jnp.einsum(
        '...kt,...dt,...et->...kde', mask, observation, observation.conj(),
        precision=jax.lax.Precision.HIGHEST)
    if source_dim < -2:
        psd = jnp.moveaxis(psd, -3, source_dim % observation.ndim)
    return psd


def get_pca(target_psd_matrix, return_all_vecs=False):
    """All principal components / the dominant one
    (reference beamformer.py:163-194), via the batched Jacobi eigh."""
    w, v = eigh(jnp.asarray(target_psd_matrix))
    if return_all_vecs:
        return v, w
    return v[..., -1], w[..., -1]


def get_pca_vector(target_psd_matrix, scaling=None):
    """PCA beamforming vector with optional 'trace'/'eigenvalue' scaling
    (reference beamformer.py:197-224)."""
    target_psd_matrix = jnp.asarray(target_psd_matrix)
    eigenvectors, eigenvalues = get_pca(target_psd_matrix)
    if scaling is None:
        scale = 1
    elif scaling == 'trace':
        scale = jnp.sqrt(
            jnp.trace(target_psd_matrix, axis1=-1, axis2=-2)
        ) / jnp.linalg.norm(eigenvectors, axis=-1)
        scale = scale[..., None]
    elif scaling == 'eigenvalue':
        scale = eigenvalues / jnp.linalg.norm(eigenvectors, axis=-1)
        scale = scale[..., None]
    else:
        raise ValueError(scaling)
    return eigenvectors * scale


def get_mvdr_vector(atf_vector, noise_psd_matrix):
    """MVDR in ATF form: ``Phi_nn^-1 h / (h^H Phi_nn^-1 h)``
    (reference beamformer.py:230-260). Hermitizes the noise PSD and
    falls back to least squares per singular bin via ``stable_solve``.
    """
    assert noise_psd_matrix is not None
    atf_vector = jnp.asarray(atf_vector)
    noise_psd_matrix = jnp.asarray(noise_psd_matrix)

    while atf_vector.ndim > noise_psd_matrix.ndim - 1:
        noise_psd_matrix = jnp.expand_dims(noise_psd_matrix, axis=0)
    noise_psd_matrix = force_hermitian(noise_psd_matrix)
    noise_psd_matrix = jnp.broadcast_to(
        noise_psd_matrix, atf_vector.shape + atf_vector.shape[-1:])

    numerator = stable_solve(
        noise_psd_matrix, atf_vector[..., None], hermitian=True)[..., 0]
    denominator = jnp.einsum(
        '...d,...d->...', atf_vector.conj(), numerator)
    return numerator / denominator[..., None]


def get_mvdr_vector_merl(target_psd_matrix, noise_psd_matrix):
    """MVDR variant of https://www.merl.com/publications/docs/TR2016-072.pdf
    with global post-SNR reference-channel selection
    (reference beamformer.py:263-289)."""
    target_psd_matrix = jnp.asarray(target_psd_matrix)
    noise_psd_matrix = jnp.asarray(noise_psd_matrix)
    with jax.default_matmul_precision('float32'):  # bf16-safe LU
        G = jnp.linalg.solve(noise_psd_matrix, target_psd_matrix)
    lambda_ = jnp.trace(G, axis1=-2, axis2=-1)
    h = G / lambda_[..., None, None]

    # per-channel post-SNR (the reference sums the channel vector before
    # the argmax, beamformer.py:278-285, which degenerates to channel 0;
    # here the per-channel ratio is kept so the argmax is meaningful)
    nom_c = jnp.einsum('...fac,fab,...fbc->c', h.conj(), target_psd_matrix, h)
    denom_c = jnp.einsum('...fac,fab,...fbc->c', h.conj(), noise_psd_matrix, h)
    h_idx = jnp.argmax((nom_c / denom_c).real)
    return jnp.take(h, h_idx, axis=-1)


def get_gev_vector(
        target_psd_matrix,
        noise_psd_matrix,
        force_cython=False,  # kept for API parity; native path is XLA
        use_eig=False,
):
    """GEV (Max-SNR) beamforming vector [Warsitz2007GEV]
    (reference beamformer.py:292-411).

    One batched program: Cholesky-whitening of the noise PSD + batched
    Jacobi eigh (see :func:`pb_bss_tpu.ops.linalg.gev_max_eigvec`),
    replacing the reference's Cython ``zhegvd``/``zggev`` per-bin
    kernels. Result is B-normalized like LAPACK (``w^H Phi_nn w = 1``).

    Bins whose noise PSD is not positive definite (Cholesky produces
    non-finite values) are retried branchlessly with diagonal loading —
    the XLA analog of the reference's ``eigh -> eig`` escape hatch
    (``use_eig``).
    """
    del force_cython, use_eig  # one code path on TPU
    assert noise_psd_matrix is not None
    target_psd_matrix = jnp.asarray(target_psd_matrix)
    noise_psd_matrix = jnp.asarray(noise_psd_matrix)

    beam = gev_max_eigvec(target_psd_matrix, noise_psd_matrix)
    bad = ~jnp.all(jnp.isfinite(jnp.abs(beam)), axis=-1, keepdims=True)
    loaded = gev_max_eigvec(
        target_psd_matrix, noise_psd_matrix, condition=1e-10)
    beam = jnp.where(bad, loaded, beam)
    return beam


def get_lcmv_vector(atf_vectors, response_vector, noise_psd_matrix):
    """LCMV beamformer from per-source ATFs and a response vector
    (reference beamformer.py:414-456).

    Args:
        atf_vectors: (K, F, D)
        response_vector: (K,) e.g. one-hot for the attended source.
        noise_psd_matrix: (F, D, D)
    Returns:
        (F, D) beamforming vectors.
    """
    atf_vectors = jnp.asarray(atf_vectors)
    response_vector = jnp.asarray(response_vector)
    K, F, D = atf_vectors.shape
    noise_psd_matrix = jnp.asarray(noise_psd_matrix)
    assert noise_psd_matrix.shape == (F, D, D), noise_psd_matrix.shape

    phi_inverse_times_h = stable_solve(
        jnp.broadcast_to(noise_psd_matrix[None], (K, F, D, D)),
        atf_vectors[:, :, :, None],
    )[..., 0]  # (K, F, D)

    h_phi_h = jnp.einsum(
        'k...d,K...d->...kK', atf_vectors.conj(), phi_inverse_times_h)

    response = jnp.broadcast_to(
        response_vector[None, :, None].astype(h_phi_h.dtype), (F, K, 1))
    temp = stable_solve(h_phi_h, response)  # (F, K, 1)
    return jnp.einsum(
        'k...d,...k->...d', phi_inverse_times_h, temp[..., 0])


def blind_analytic_normalization(vector, noise_psd_matrix):
    """BAN postfilter [Warsitz2007GEV] Section III.A
    (reference beamformer.py:459-488). Zero denominators map to a zero
    gain (zero-PSD semantics)."""
    vector = jnp.asarray(vector)
    noise_psd_matrix = jnp.asarray(noise_psd_matrix)
    nominator = jnp.einsum(
        '...a,...ab,...bc,...c->...',
        vector.conj(), noise_psd_matrix, noise_psd_matrix, vector)
    nominator = jnp.sqrt(nominator)
    denominator = jnp.einsum(
        '...a,...ab,...b->...', vector.conj(), noise_psd_matrix, vector)
    denominator = jnp.sqrt(denominator * denominator.conj())
    normalization = jnp.where(
        denominator != 0,
        nominator / jnp.where(denominator == 0, 1, denominator),
        0,
    )
    return vector * jnp.abs(normalization)[..., None]


def distortionless_normalization(vector, atf_vector, noise_psd_matrix):
    """Rescale towards a distortionless response for the given ATF
    (reference beamformer.py:491-499)."""
    vector = jnp.asarray(vector)
    nominator = jnp.einsum(
        'fab,fb,fc->fac', jnp.asarray(noise_psd_matrix), vector,
        vector.conj())
    denominator = jnp.einsum(
        'fa,fab,fb->f', vector.conj(), jnp.asarray(noise_psd_matrix), vector)
    projection_matrix = nominator / denominator[..., None, None]
    return jnp.einsum(
        'fab,fb->fa', projection_matrix, jnp.asarray(atf_vector))


def mvdr_snr_postfilter(vector, target_psd_matrix, noise_psd_matrix):
    """Single-channel SNR postfilter (reference beamformer.py:502-509)."""
    vector = jnp.asarray(vector)
    nominator = jnp.einsum(
        'fa,fab,fb->f', vector.conj(), jnp.asarray(target_psd_matrix),
        vector)
    denominator = jnp.einsum(
        'fa,fab,fb->f', vector.conj(), jnp.asarray(noise_psd_matrix), vector)
    return (nominator / denominator)[:, None]


def zero_degree_normalization(vector, reference_channel):
    """Rotate phases so the reference channel is real positive
    (reference beamformer.py:512-514)."""
    vector = jnp.asarray(vector)
    return vector * jnp.exp(
        -1j * jnp.angle(vector[..., reference_channel, None]))


def phase_correction(vector):
    """Phase-align beamforming vectors across frequency via a cumulative
    product of adjacent-bin phase flips (reference beamformer.py:517-560).

    Args:
        vector: (..., F, D).
    """
    vector = jnp.asarray(vector)
    correction = jnp.cumprod(
        jnp.exp(1j * jnp.angle(jnp.sum(
            vector[..., 1:, :].conj() * vector[..., :-1, :],
            axis=-1, keepdims=True,
        ))),
        axis=-2,
    )
    return jnp.concatenate(
        [vector[..., :1, :], vector[..., 1:, :] * correction], axis=-2)


def condition_covariance(x, gamma):
    """Diagonal loading ``(x + gamma tr(x)/D I) / (1 + gamma)``
    (reference beamformer.py:563-569)."""
    return condition_hermitian(jnp.asarray(x), gamma)


def apply_beamforming_vector(vector, mix):
    """``y_t = w^H x_t`` (reference beamformer.py:572-583)."""
    vector = jnp.asarray(vector)
    assert vector.shape[-1] < 30, (vector.shape,)
    return jnp.einsum('...a,...at->...t', vector.conj(), jnp.asarray(mix))


def apply_online_beamforming_vector(vector, mix):
    """Time-varying beamforming (reference beamformer.py:586-598).
    vector: (D, F, T) -> transposed to (F, T, D)."""
    vector = jnp.asarray(vector).transpose(1, 2, 0)
    return jnp.einsum('...at,...at->...t', vector.conj(), jnp.asarray(mix))


def get_optimal_reference_channel(
        w_mat,
        target_psd_matrix,
        noise_psd_matrix,
        eps=None,
):
    """SNR-maximizing reference channel (reference beamformer.py:601-624).

    The frequency axis is required and reduced; independent dims are not
    supported (the SNR estimate would not be unique).
    """
    w_mat = jnp.asarray(w_mat)
    if w_mat.ndim != 3:
        raise ValueError(
            'Estimating the ref_channel expects currently that the input '
            'has 3 ndims (frequency x sensors x sensors). '
            'Considering an independent dim in the SNR estimate is not '
            'unique.'
        )
    if eps is None:
        eps = _tiny(w_mat)
    SNR = jnp.einsum(
        '...FdR,...FdD,...FDR->...R',
        w_mat.conj(), jnp.asarray(target_psd_matrix), w_mat
    ) / jnp.maximum(jnp.einsum(
        '...FdR,...FdD,...FDR->...R',
        w_mat.conj(), jnp.asarray(noise_psd_matrix), w_mat
    ).real, eps)
    if not isinstance(SNR, jax.core.Tracer):
        assert bool(np.all(np.isfinite(np.asarray(SNR)))), SNR
    return jnp.argmax(SNR.real)


def get_mvdr_vector_souden(
        target_psd_matrix,
        noise_psd_matrix,
        ref_channel=None,
        eps=None,
        return_ref_channel=False,
):
    """MVDR in the Souden formulation [Souden2010MVDR, Erdogan2016MVDR]
    (reference beamformer.py:627-698).

    ``w = Phi_nn^-1 Phi_xx / tr(Phi_nn^-1 Phi_xx) e_ref`` with the
    reference channel selected by the SNR estimate unless given. The
    eps ladder matches the reference: zero matrices yield zero
    beamformers (tested in test_beamformer.py:184-376).
    """
    assert noise_psd_matrix is not None
    target_psd_matrix = jnp.asarray(target_psd_matrix)
    noise_psd_matrix = jnp.asarray(noise_psd_matrix)

    phi = stable_solve(noise_psd_matrix, target_psd_matrix)
    lambda_ = jnp.trace(phi, axis1=-1, axis2=-2)[..., None, None]
    if eps is None:
        eps = _tiny(lambda_)
    mat = phi / jnp.maximum(lambda_.real, eps)

    if ref_channel is None:
        ref_channel = get_optimal_reference_channel(
            mat, target_psd_matrix, noise_psd_matrix, eps=eps)

    beamformer = jnp.take(mat, ref_channel, axis=-1)
    if return_ref_channel:
        return beamformer, ref_channel
    return beamformer


def get_wmwf_vector(
        target_psd_matrix, noise_psd_matrix, reference_channel=None,
        channel_selection_vector=None, distortion_weight=1.):
    """Speech-distortion-weighted multichannel Wiener filter
    (reference beamformer.py:701-753).

    ``distortion_weight='frequency_dependent'`` uses the Max-SNR-inspired
    frequency-dependent trade-off of https://arxiv.org/abs/1707.00201.
    """
    assert noise_psd_matrix is not None
    target_psd_matrix = jnp.asarray(target_psd_matrix)
    noise_psd_matrix = jnp.asarray(noise_psd_matrix)

    phi = stable_solve(noise_psd_matrix, target_psd_matrix)
    lambda_ = jnp.trace(phi, axis1=-1, axis2=-2)[..., None, None]
    if isinstance(distortion_weight, str) \
            and distortion_weight == 'frequency_dependent':
        phi_x1x1 = target_psd_matrix[..., 0:1, 0:1]
        distortion_weight = jnp.sqrt(phi_x1x1 * lambda_)
        filter_ = phi / distortion_weight
    else:
        filter_ = phi / (distortion_weight + lambda_)
    if channel_selection_vector is not None:
        channel_selection_vector = jnp.asarray(channel_selection_vector)
        projected = filter_ * channel_selection_vector[..., None, :]
        return jnp.sum(projected, axis=-1)
    if reference_channel is None:
        reference_channel = get_optimal_reference_channel(
            filter_, target_psd_matrix, noise_psd_matrix)
    return jnp.take(filter_, reference_channel, axis=-1)


def get_lcmv_vector_souden(
        target_psd_matrix,
        interference_psd_matrix,
        noise_psd_matrix,
        ref_channel=None,
        eps=None,
        return_ref_channel=False,
):
    """Souden-style rank-1 LCMV (reference beamformer.py:756-787) —
    intentionally unimplemented, mirroring the reference."""
    raise NotImplementedError(
        'This is not yet thoroughly tested. It also misses the response '
        'vector, thus it is unclear, how to select, which speaker to '
        'attend to.'
    )
