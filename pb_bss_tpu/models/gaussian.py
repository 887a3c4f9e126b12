"""Real Gaussian models (full / diagonal / spherical covariance).

Capability parity with ``pb_bss/distribution/gaussian.py``: the three
covariance types with precision-Cholesky log-pdfs (reference :19-130)
and the einsum-dispatch trainer (:133-193).

TPU-first realization: instead of precomputing the precision Cholesky in
``__post_init__`` (the reference borrows sklearn internals,
gaussian.py:3-14), the models store only (mean, covariance) — clean
pytree leaves for scan carries — and whiten on the fly with a batched
``cholesky`` + triangular solve inside the jitted E-step, which XLA
CSEs across calls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import Model, modelclass
from ..utils import is_broadcast_compatible

__all__ = [
    'Gaussian',
    'DiagonalGaussian',
    'SphericalGaussian',
    'GaussianTrainer',
]


def _tiny(x):
    return jnp.finfo(jnp.asarray(x).dtype).tiny


@modelclass
class Gaussian(Model):
    mean: jnp.ndarray = None  # (..., D)
    covariance: jnp.ndarray = None  # (..., D, D)

    @property
    def precision_cholesky(self):
        """Upper-triangular P with covariance^-1 = P P^T (sklearn
        convention, reference gaussian.py:26-34)."""
        d = self.mean.shape[-1]
        chol = jnp.linalg.cholesky(self.covariance)
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=chol.dtype), chol.shape)
        inv = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
        return jnp.swapaxes(inv, -1, -2)

    @property
    def log_det_precision_cholesky(self):
        chol = jnp.linalg.cholesky(self.covariance)
        return -jnp.sum(jnp.log(
            jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)

    def log_pdf(self, y):
        """y: (..., N, D) -> (..., N)."""
        y = jnp.asarray(y)
        d = self.mean.shape[-1]
        with jax.default_matmul_precision('float32'):  # bf16-safe
            chol = jnp.linalg.cholesky(self.covariance)
            difference = y - self.mean[..., None, :]
            # white_x = L^-1 (y - mu): batched triangular solve
            white_x = jax.scipy.linalg.solve_triangular(
                chol, jnp.swapaxes(difference, -1, -2), lower=True)
        log_det_precision_cholesky = -jnp.sum(jnp.log(
            jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        return (
            -0.5 * d * jnp.log(2 * jnp.pi)
            + log_det_precision_cholesky[..., None]
            - 0.5 * jnp.sum(white_x ** 2, axis=-2)
        )


@modelclass
class DiagonalGaussian(Model):
    mean: jnp.ndarray = None  # (..., D)
    covariance: jnp.ndarray = None  # (..., D)

    def log_pdf(self, y):
        y = jnp.asarray(y)
        d = self.mean.shape[-1]
        difference = y - self.mean[..., None, :]
        precision = 1.0 / self.covariance
        log_det_precision_cholesky = -0.5 * jnp.sum(
            jnp.log(self.covariance), axis=-1)
        return (
            -0.5 * d * jnp.log(2 * jnp.pi)
            + log_det_precision_cholesky[..., None]
            - 0.5 * jnp.sum(
                difference ** 2 * precision[..., None, :], axis=-1)
        )


@modelclass
class SphericalGaussian(Model):
    mean: jnp.ndarray = None  # (..., D)
    covariance: jnp.ndarray = None  # (...,)

    def log_pdf(self, y):
        y = jnp.asarray(y)
        d = self.mean.shape[-1]
        difference = y - self.mean[..., None, :]
        precision = 1.0 / self.covariance
        log_det_precision_cholesky = -0.5 * d * jnp.log(self.covariance)
        return (
            -0.5 * d * jnp.log(2 * jnp.pi)
            + log_det_precision_cholesky[..., None]
            - 0.5 * jnp.sum(difference ** 2, axis=-1)
            * precision[..., None]
        )


class GaussianTrainer:
    def fit(self, y, saliency=None, covariance_type='full'):
        """Weighted ML fit (reference gaussian.py:133-193).

        Args:
            y: (..., N, D) real observations.
            saliency: optional (..., N) weights.
            covariance_type: 'full' | 'diagonal' | 'spherical'.
        """
        y = jnp.asarray(y)
        assert not jnp.iscomplexobj(y), y.dtype
        if saliency is not None:
            saliency = jnp.asarray(saliency)
            assert is_broadcast_compatible(y.shape[:-1], saliency.shape), (
                y.shape, saliency.shape)
        return self._fit(y, saliency=saliency,
                         covariance_type=covariance_type)

    def _fit(self, y, saliency, covariance_type):
        dimension = y.shape[-1]

        if saliency is None:
            denominator = jnp.asarray(y.shape[-2], y.dtype)
            mean = jnp.einsum('...nd->...d', y)
        else:
            denominator = jnp.maximum(
                jnp.einsum('...n->...', saliency), _tiny(y))
            mean = jnp.einsum('...n,...nd->...d', saliency, y)
        mean = mean / denominator[..., None]

        difference = y - mean[..., None, :]

        if covariance_type == 'full':
            operation = '...nd,...nD->...dD'
            denominator_c = denominator[..., None, None]
            model_cls = Gaussian
        elif covariance_type == 'diagonal':
            operation = '...nd,...nd->...d'
            denominator_c = denominator[..., None]
            model_cls = DiagonalGaussian
        elif covariance_type == 'spherical':
            operation = '...nd,...nd->...'
            denominator_c = denominator * dimension
            model_cls = SphericalGaussian
        else:
            raise ValueError(
                f"Unknown covariance type '{covariance_type}'.")

        if saliency is None:
            covariance = jnp.einsum(operation, difference, difference)
        else:
            covariance = jnp.einsum(
                '...n,' + operation, saliency, difference, difference)
        covariance = covariance / denominator_c
        return model_cls(mean=mean, covariance=covariance)
