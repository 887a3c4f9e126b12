"""GMM + k-means (BinaryGMM) for Deep-Clustering embeddings.

Capability parity with ``pb_bss/distribution/gmm.py``: ``GMM.predict``
(:21), EM trainer with ``fixed_covariance`` (:29-174), and
``BinaryGMM``/``BinaryGMMTrainer`` (:176-230).

TPU-first realization: the EM loop runs through the shared
``lax.scan`` engine (:mod:`pb_bss_tpu.models._em`); ``BinaryGMM`` is a
native batched Lloyd k-means (kmeans++-style farthest-point seeding +
fixed-iteration assignment/update scan) instead of an sklearn wrapper
(reference gmm.py:10,176-230).
"""
from __future__ import annotations

import functools
from operator import xor

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ._em import run_em
from .base import Model, modelclass
from .gaussian import (
    DiagonalGaussian,
    Gaussian,
    GaussianTrainer,
    SphericalGaussian,
)
from .mixture_model_utils import (
    estimate_mixture_weight,
    log_pdf_to_affiliation,
)
from ..utils import labels_to_one_hot

__all__ = ['GMM', 'GMMTrainer', 'BinaryGMM', 'BinaryGMMTrainer', 'kmeans']


@modelclass
class GMM(Model):
    weight: jnp.ndarray = None  # (..., K, 1)
    gaussian: Gaussian = None

    def predict(self, x):
        return log_pdf_to_affiliation(
            self.weight,
            self.gaussian.log_pdf(jnp.asarray(x)[..., None, :, :]),
        )


class GMMTrainer:
    def __init__(self, eps=1e-10):
        self.eps = eps
        self.log_likelihood_history = []

    def fit(
            self,
            y,
            initialization=None,
            num_classes=None,
            iterations=100,
            *,
            key=None,
            saliency=None,
            weight_constant_axis=(-1,),
            covariance_type='full',
            fixed_covariance=None,
    ):
        """EM for GMMs with any number of independent dimensions
        (reference gmm.py:33-91).

        Args:
            y: (..., N, D) real observations.
            initialization: affiliations (..., K, N) or None.
            num_classes: K (exclusive with initialization).
            key: jax PRNG key for the random init.
            fixed_covariance: overrides the learned covariance (shape
                must match the covariance of ``covariance_type``).
        """
        assert xor(initialization is None, num_classes is None), (
            'Provide either `initialization` or `num_classes` — not '
            'both and not neither. Got initialization is None: '
            f'{initialization is None}, num_classes is None: '
            f'{num_classes is None}.'
        )
        y = jnp.asarray(y)
        assert not jnp.iscomplexobj(y), y.dtype

        if initialization is None and num_classes is not None:
            *independent, num_observations, _ = y.shape
            if key is None:
                key = jax.random.key(0)
            affiliation_shape = (
                *independent, num_classes, num_observations)
            initialization = jax.random.uniform(
                key, affiliation_shape, y.dtype)
            initialization = initialization / jnp.einsum(
                '...kn->...n', initialization)[..., None, :]
        initialization = jnp.asarray(initialization)

        if saliency is None:
            saliency = jnp.ones_like(initialization[..., 0, :])

        if isinstance(weight_constant_axis, list):
            weight_constant_axis = tuple(weight_constant_axis)

        return _gmm_fit_em(
            y, initialization, saliency, fixed_covariance,
            iterations=int(iterations),
            weight_constant_axis=weight_constant_axis,
            covariance_type=covariance_type,
        )

    def fit_predict(
            self,
            y,
            initialization=None,
            num_classes=None,
            iterations=100,
            *,
            key=None,
            saliency=None,
            weight_constant_axis=(-2,),
            covariance_type='full',
            fixed_covariance=None,
    ):
        """Fit a model, then return the posterior affiliations."""
        model = self.fit(
            y=y,
            initialization=initialization,
            num_classes=num_classes,
            iterations=iterations,
            key=key,
            saliency=saliency,
            weight_constant_axis=weight_constant_axis,
            covariance_type=covariance_type,
            fixed_covariance=fixed_covariance,
        )
        return model.predict(y)


@functools.partial(
    jax.jit,
    static_argnames=(
        'iterations', 'weight_constant_axis', 'covariance_type'),
)
def _gmm_fit_em(y, affiliation, saliency, fixed_covariance, *,
                iterations, weight_constant_axis, covariance_type):
    def m_step(affiliation):
        weight = estimate_mixture_weight(
            affiliation=affiliation,
            saliency=saliency,
            weight_constant_axis=weight_constant_axis,
        )
        gaussian = GaussianTrainer()._fit(
            y=y[..., None, :, :],
            saliency=affiliation * saliency[..., None, :],
            covariance_type=covariance_type,
        )
        if fixed_covariance is not None:
            assert fixed_covariance.shape == gaussian.covariance.shape, (
                f'{fixed_covariance.shape} != {gaussian.covariance.shape}'
            )
            gaussian = gaussian.__class__(
                mean=gaussian.mean, covariance=fixed_covariance)
        return GMM(weight=weight, gaussian=gaussian)

    return run_em(
        affiliation=affiliation,
        iterations=iterations,
        m_step=m_step,
        e_step=lambda model: model.predict(y),
    )


# ---------------------------------------------------------------------------
# k-means (native replacement of the sklearn wrapper)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('num_classes', 'iterations'))
def kmeans(x, num_classes, *, key=None, iterations=25):
    """Batched Lloyd k-means with farthest-point (kmeans++-style)
    seeding, fully on device.

    Args:
        x: (N, D) real points.
        num_classes: K.
        key: jax PRNG key (default key(0)).
        iterations: Lloyd iterations.
    Returns:
        (K, D) cluster centers.
    """
    x = jnp.asarray(x)
    N, D = x.shape
    if key is None:
        key = jax.random.key(0)

    # Farthest-point seeding: deterministic given the key.
    first = jax.random.randint(key, (), 0, N)
    centers0 = jnp.zeros((num_classes, D), x.dtype).at[0].set(x[first])

    def seed_step(carry, k):
        centers, min_d2 = carry
        d2 = jnp.sum((x - centers[k - 1]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2)
        centers = centers.at[k].set(x[nxt])
        return (centers, min_d2), None

    (centers, _), _ = lax.scan(
        seed_step,
        (centers0, jnp.full((N,), jnp.inf, x.dtype)),
        jnp.arange(1, num_classes),
    )

    def lloyd_step(centers, _):
        d2 = jnp.sum(
            (x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)  # (N, K)
        assign = jnp.argmin(d2, axis=-1)
        onehot = (assign[:, None] == jnp.arange(num_classes)[None, :]
                  ).astype(x.dtype)  # (N, K)
        counts = jnp.maximum(onehot.sum(0), 1.0)
        new_centers = (onehot.T @ x) / counts[:, None]
        # keep old center for empty clusters
        new_centers = jnp.where(
            (onehot.sum(0) > 0)[:, None], new_centers, centers)
        return new_centers, None

    centers, _ = lax.scan(lloyd_step, centers, None, length=iterations)
    return centers


@modelclass
class BinaryGMM(Model):
    """Hard-assignment clustering model for DC embeddings
    (reference gmm.py:176-196); stores the k-means centers natively."""

    means: jnp.ndarray = None  # (K, D)

    def predict(self, x):
        """x: (N, D) -> one-hot affiliations (K, N)."""
        x = jnp.asarray(x)
        N, D = x.shape
        assert not jnp.iscomplexobj(x), x.dtype
        K = self.means.shape[0]
        d2 = jnp.sum(
            (x[:, None, :] - self.means[None, :, :]) ** 2, axis=-1)
        labels = jnp.argmin(d2, axis=-1)  # (N,)
        affiliations = (
            labels[None, :] == jnp.arange(K)[:, None]).astype(x.dtype)
        return affiliations


class BinaryGMMTrainer:
    """k-means trainer for Deep Clustering embeddings
    (reference gmm.py:199-230)."""

    def fit(self, x, num_classes, saliency=None, *, key=None,
            iterations=25):
        """
        Args:
            x: (N, D) embeddings.
            num_classes: K.
            saliency: optional boolean (N,) — excluded points do not
                influence the centers.
        """
        x = jnp.asarray(x)
        N, D = x.shape
        if saliency is not None:
            saliency = np.asarray(saliency)
            assert saliency.dtype == bool, (
                'Only boolean saliency supported. '
                f'Current dtype: {saliency.dtype}.'
            )
            assert saliency.shape == (N,)
            x = x[saliency, :]
        return BinaryGMM(means=kmeans(
            x, num_classes, key=key, iterations=iterations))
