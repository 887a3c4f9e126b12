"""Complex circular-symmetric Gaussian.

Capability parity with reference
``pb_bss/distribution/complex_circular_symmetric_gaussian.py``
(log_pdf :26-48, sample :50-72, trainer :94-116). Sampling threads an
explicit ``jax.random`` key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Model, modelclass, force_hermitian
from .._dtypes import real_dtype as _real_dtype

__all__ = [
    'ComplexCircularSymmetricGaussian',
    'ComplexCircularSymmetricGaussianTrainer',
]


@modelclass
class ComplexCircularSymmetricGaussian(Model):
    covariance: jnp.ndarray = None  # (..., D, D)

    def log_pdf(self, y):
        """y: (..., N, D)."""
        y = jnp.asarray(y)
        D = y.shape[-1]
        _, logdet = jnp.linalg.slogdet(self.covariance)
        inv_y = jnp.linalg.solve(
            self.covariance, jnp.swapaxes(y, -2, -1))  # (..., D, N)
        quad = jnp.einsum('...nd,...dn->...n', y.conj(), inv_y).real
        return (
            - D * jnp.log(jnp.asarray(jnp.pi, _real_dtype(y)))
            - logdet[..., None]
            - quad
        )

    def sample(self, size, key=None):
        """Draw ``size`` (tuple or int) samples; explicit PRNG key."""
        if key is None:
            key = jax.random.key(0)
        if isinstance(size, int):
            size = (size,)
        D = self.covariance.shape[-1]
        assert self.covariance.ndim == 2, (
            'Not implemented for batched covariance', self.covariance.shape)
        real_dtype = _real_dtype(self.covariance)
        kr, ki = jax.random.split(key)
        x = (
            jax.random.normal(kr, (*size, D), real_dtype)
            + 1j * jax.random.normal(ki, (*size, D), real_dtype)
        ) * jnp.sqrt(0.5).astype(real_dtype)
        cholesky = jnp.linalg.cholesky(self.covariance)
        return (cholesky @ x[..., None])[..., 0]


class ComplexCircularSymmetricGaussianTrainer:
    def fit(self, y, saliency=None):
        """y: (..., N, D), saliency: (..., N)."""
        y = jnp.asarray(y)
        assert jnp.iscomplexobj(y), y.dtype
        return self._fit(y, saliency=saliency)

    def _fit(self, y, saliency):
        if saliency is None:
            denominator = jnp.asarray(y.shape[-2], _real_dtype(y))
            covariance = jnp.einsum('...nd,...ne->...de', y, y.conj())
        else:
            denominator = jnp.sum(saliency, axis=-1)[..., None, None]
            covariance = jnp.einsum(
                '...n,...nd,...ne->...de', saliency, y, y.conj())
        covariance = covariance / denominator
        return ComplexCircularSymmetricGaussian(
            covariance=force_hermitian(covariance))
