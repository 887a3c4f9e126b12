"""von Mises-Fisher distribution on the real unit hypersphere.

Capability parity with ``pb_bss/distribution/von_mises_fisher.py``:
log-norm via the exponentially-scaled modified Bessel function
(reference :35-45), log-pdf (:65), closed-form [Banerjee2005] trainer
(:122-144).

TPU-first realization: ``scipy.special.ive`` is replaced by a
jit-compatible log-domain power series for ``log I_nu(kappa)`` —
``logsumexp`` over a static number of series terms, accurate over the
entire clipped concentration range [1e-10, 500] for any order
(verified against scipy in tests/test_models/test_vmfmm.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, logsumexp

from .base import Model, modelclass
from ..utils import is_broadcast_compatible

__all__ = ['VonMisesFisher', 'VonMisesFisherTrainer', 'log_ive']

_SERIES_TERMS = 512


def log_ive(nu, kappa):
    """``log(ive(nu, kappa)) = log I_nu(kappa) - kappa``, jit-compatible.

    Power series of the modified Bessel function evaluated in the log
    domain: ``I_nu(k) = sum_m (k/2)^(2m+nu) / (m! Gamma(m+nu+1))``.
    With 512 terms the series dominates up to ``kappa ~ 900`` (the term
    index of the maximum is ~kappa/2), covering the clipped
    concentration range of the trainers (max 500).

    The order ``nu`` is static in every caller, so the gamma terms
    are host-side trace-time CONSTANTS — no per-iteration device
    ``gammaln`` over the 512 series terms inside EM scans.
    """
    kappa = jnp.asarray(kappa)
    dtype = jnp.result_type(kappa.dtype, jnp.float32)
    kappa = kappa.astype(dtype)
    log_half_kappa = jnp.log(jnp.maximum(
        kappa / 2, jnp.finfo(dtype).tiny))
    m_host = np.arange(_SERIES_TERMS, dtype=np.float64)
    try:
        nu_host = float(nu)
    except (TypeError, jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        nu_host = None
    if nu_host is not None:
        from scipy.special import gammaln as np_gammaln
        log_gamma = jnp.asarray(
            np_gammaln(m_host + 1) + np_gammaln(m_host + nu_host + 1),
            dtype)
        orders = jnp.asarray(2 * m_host + nu_host, dtype)
    else:  # traced order: keep the on-device lowering
        m = jnp.arange(_SERIES_TERMS, dtype=dtype)
        log_gamma = gammaln(m + 1) + gammaln(m + nu + 1)
        orders = 2 * m + nu
    terms = orders * log_half_kappa[..., None] - log_gamma
    return logsumexp(terms, axis=-1) - kappa


@modelclass
class VonMisesFisher(Model):
    mean: jnp.ndarray = None  # (..., D)
    concentration: jnp.ndarray = None  # (...,)

    def log_norm(self):
        """Stable for concentration > 1e-10 (reference :35-45)."""
        D = self.mean.shape[-1]
        concentration = jnp.asarray(self.concentration)
        return (
            (D / 2) * jnp.log(2 * jnp.pi)
            + log_ive(D / 2 - 1, concentration)
            + (jnp.abs(concentration)
               - (D / 2 - 1) * jnp.log(concentration))
        )

    def sample(self, size):
        raise NotImplementedError(
            'A good implementation can be found in libdirectional: '
            'https://github.com/libDirectional/libDirectional/blob/master/'
            'lib/distributions/Hypersphere/VMFDistribution.m#L239'
        )

    def norm(self):
        return jnp.exp(self.log_norm())

    def log_pdf(self, y):
        """y: (..., D) observations; unit-normalized internally."""
        y = jnp.asarray(y)
        y = y / jnp.maximum(
            jnp.linalg.norm(y, axis=-1, keepdims=True),
            jnp.finfo(y.dtype).tiny)
        result = jnp.einsum('...d,...d', y, self.mean[..., None, :])
        result = result * self.concentration[..., None]
        result = result - self.log_norm()[..., None]
        return result

    def pdf(self, y):
        return jnp.exp(self.log_pdf(y))


class VonMisesFisherTrainer:
    def fit(
            self, y, saliency=None, min_concentration=1e-10,
            max_concentration=500,
    ) -> VonMisesFisher:
        """Closed-form [Banerjee2005] fit (reference :96-144).

        Args:
            y: (..., N, D) real observations (normalized internally).
            saliency: optional (..., N).
        """
        y = jnp.asarray(y)
        assert not jnp.iscomplexobj(y), y.dtype
        y = y / jnp.maximum(
            jnp.linalg.norm(y, axis=-1, keepdims=True),
            jnp.finfo(y.dtype).tiny)
        if saliency is not None:
            assert is_broadcast_compatible(
                y.shape[:-1], jnp.asarray(saliency).shape), (
                y.shape, jnp.asarray(saliency).shape)
        return self._fit(
            y,
            saliency=saliency,
            min_concentration=min_concentration,
            max_concentration=max_concentration,
        )

    def _fit(self, y, saliency, min_concentration,
             max_concentration) -> VonMisesFisher:
        D = y.shape[-1]
        if saliency is None:
            saliency = jnp.ones(y.shape[:-1], y.dtype)

        # [Banerjee2005vMF] Equation 2.4
        r = jnp.einsum('...n,...nd->...d', saliency, y)
        norm = jnp.linalg.norm(r, axis=-1)
        mean = r / jnp.maximum(
            norm, jnp.finfo(y.dtype).tiny)[..., None]

        # [Banerjee2005vMF] Equation 2.5
        r_bar = norm / jnp.sum(saliency, axis=-1)

        # [Banerjee2005vMF] Equation 4.4
        concentration = (r_bar * D - r_bar ** 3) / (1 - r_bar ** 2)
        concentration = jnp.clip(
            concentration, min_concentration, max_concentration)
        return VonMisesFisher(mean=mean, concentration=concentration)
