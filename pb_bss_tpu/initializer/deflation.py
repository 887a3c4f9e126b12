"""Deflation-based affiliation initializer.

Capability parity with ``pb_bss/initializer/deflation.py``: iteratively
pick the saliency peak, estimate a local PSD + PCA mode around it,
convert the mode-similarity into a posterior and deflate the saliency;
the final class absorbs the remainder (reference :6-89).

TPU-first realization: the time-neighborhood gathers around the peaks
are ``take_along_axis`` gathers; the loop over sources is a short
static Python loop (K-1 iterations, K small).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..extraction.beamformer import (
    get_pca_vector,
    get_power_spectral_density_matrix,
)
from ..permutation_alignment import _parameterized_vector_norm

__all__ = ['deflationSeed']


def deflationSeed(
        Y,
        sources: int,
        saliencies=None,
        permutation_free: bool = True,
        neighbors: int = 5,
        similarity_transform=None,
        eps=0,
):
    """
    Args:
        Y: (F, T, D) complex STFT observations.
        sources: number of classes K (the last absorbs the rest).
        saliencies: optional (F, T) importance; default ||Y||.
        permutation_free: pick one global peak frame per deflation step
            (instead of a per-frequency peak).
        neighbors: half-width of the local time window.
        similarity_transform: optional callable
            ``(similarity, saliencies) -> similarity``.
    Returns:
        (K, F, T) posterior initialization.
    """
    Y = jnp.asarray(Y)
    if saliencies is None:
        saliencies = jnp.linalg.norm(Y, axis=-1)
    saliencies = jnp.asarray(saliencies)

    F, T = saliencies.shape
    assert F in [257, 513], F

    Z = _parameterized_vector_norm(Y, axis=-1)
    offsets = jnp.arange(-neighbors, neighbors + 1)

    posterior = []
    for k in range(sources - 1):
        if permutation_free:
            maxidx = jnp.argmax(jnp.mean(saliencies, axis=0), axis=-1)
            maxidx = jnp.broadcast_to(maxidx, (F,))
        else:
            maxidx = jnp.argmax(saliencies, axis=-1)

        maxidx = jnp.clip(maxidx, neighbors, T - 1 - neighbors)
        window = maxidx[:, None] + offsets[None, :]  # (F, 2n+1)

        # (F, T_local, D) and (F, T_local) gathers around the peaks
        Y_local = jnp.take_along_axis(Y, window[..., None], axis=1)
        Y_local = jnp.swapaxes(Y_local, -1, -2)  # (F, D, T_local)
        saliencies_local = jnp.take_along_axis(saliencies, window, axis=1)

        psd = get_power_spectral_density_matrix(
            Y_local, mask=saliencies_local)
        mode = get_pca_vector(psd)

        similarity = jnp.abs(jnp.einsum(
            'FTD,FD->FT',
            Z.conj(),
            _parameterized_vector_norm(mode, axis=-1),
        )) ** 2

        if similarity_transform is not None:
            similarity = similarity_transform(similarity, saliencies)

        posterior.append(similarity)
        saliencies = saliencies * (1 - similarity)

    posterior.append(1 - sum(posterior))
    posterior = jnp.stack(posterior)
    posterior = jnp.maximum(posterior, eps)
    return posterior / jnp.sum(posterior, axis=0, keepdims=True)
