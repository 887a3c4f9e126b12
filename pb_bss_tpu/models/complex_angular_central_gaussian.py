"""Complex angular central Gaussian (cACG) — the core spatial density.

Capability parity with reference
``pb_bss/distribution/complex_angular_central_gaussian.py``:
eigendecomposition parameterization with relative eigenvalue flooring
(:81-132), unit-norm + time-last observation normalization (:34-55),
quadratic-form log-pdf (:167-203), weighted-scatter M-step (:253-342).

TPU-first realization:

* the covariance eigendecomposition runs on the batched Jacobi kernel
  (:func:`pb_bss_tpu.ops.linalg.eigh_jacobi`) instead of per-bin LAPACK;
  the reference's ``eigh -> eig -> raise`` fallback ladder
  (reference :94-110) is unnecessary because the Jacobi iteration never
  "fails" — flooring alone guarantees finite reciprocal eigenvalues,
* the quadratic form ``y^H V diag(1/lambda) V^H y`` is evaluated as one
  batched MXU matmul (``z = V^H y``) plus a VPU reduction instead of a
  5-operand einsum,
* the M-step scatter ``D * E[y y^H s/q]`` is a batched matmul over the
  time axis (time-last layout keeps the reduction contiguous, the same
  reasoning as the reference's layout note :37-42).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Model, modelclass, force_hermitian, _unit_norm
from ..ops.linalg import eigh
from ..utils import is_broadcast_compatible

__all__ = [
    'ComplexAngularCentralGaussian',
    'ComplexAngularCentralGaussianTrainer',
    'sample_complex_angular_central_gaussian',
    'normalize_observation',
]


from .._dtypes import real_dtype as _real_dtype, tiny as _tiny
from ._precision import em_matmul_precision


@jax.jit
def normalize_observation(observation):
    """Unit-norm over channels, then swap to time-last layout
    (one compiled program; avoids eager per-op dispatch).

    Args:
        observation: (..., N, D) complex.
    Returns:
        (..., D, N) unit-norm observations.
    """
    observation = jnp.asarray(observation)
    observation = _unit_norm(
        observation,
        axis=-1,
        eps=_tiny(observation),
        eps_style='where',
    )
    return jnp.swapaxes(observation, -2, -1)


def sample_complex_angular_central_gaussian(size, covariance, key=None):
    from .complex_circular_symmetric_gaussian import (
        ComplexCircularSymmetricGaussian,
    )
    csg = ComplexCircularSymmetricGaussian(covariance=jnp.asarray(covariance))
    x = csg.sample(size=size, key=key)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@modelclass
class ComplexAngularCentralGaussian(Model):
    """Parameterized by the covariance *eigendecomposition*; eigenvalues
    are floored/normalized for stability (see ``from_covariance``)."""

    covariance_eigenvectors: jnp.ndarray = None  # (..., D, D)
    covariance_eigenvalues: jnp.ndarray = None  # (..., D)

    @classmethod
    def from_covariance(
            cls,
            covariance,
            eigenvalue_floor=0.,
            covariance_norm='eigenvalue',
            eigh_sweeps=None,
    ):
        covariance = jnp.asarray(covariance)
        if covariance_norm == 'trace':
            cov_trace = jnp.einsum(
                '...dd', covariance)[..., None, None]
            covariance = covariance / jnp.maximum(
                jnp.abs(cov_trace), _tiny(covariance))
        else:
            assert covariance_norm in ['eigenvalue', False], covariance_norm

        # On TPU at f32/c64 this routes to the single-kernel Pallas
        # Jacobi (~3.4x faster than the HLO-level path, see
        # ops/pallas_eigh.py); CPU/x64 keeps the XLA lowering.
        eigenvals, eigenvecs = eigh(covariance, sweeps=eigh_sweeps)
        eigenvals = eigenvals.real
        if covariance_norm == 'eigenvalue':
            # Scale of the eigenvalues does not matter for the density.
            eigenvals = eigenvals / jnp.maximum(
                jnp.max(eigenvals, axis=-1, keepdims=True),
                _tiny(eigenvals),
            )
            eigenvals = jnp.maximum(eigenvals, eigenvalue_floor)
        else:
            eigenvals = jnp.maximum(
                eigenvals,
                jnp.max(eigenvals, axis=-1, keepdims=True) * eigenvalue_floor,
            )
        return cls(
            covariance_eigenvalues=eigenvals,
            covariance_eigenvectors=eigenvecs,
        )

    @property
    def covariance(self):
        return jnp.einsum(
            '...wx,...x,...zx->...wz',
            self.covariance_eigenvectors,
            self.covariance_eigenvalues.astype(
                self.covariance_eigenvectors.dtype),
            self.covariance_eigenvectors.conj(),
        )

    @property
    def log_determinant(self):
        return jnp.sum(jnp.log(self.covariance_eigenvalues), axis=-1)

    def sample(self, size, key=None):
        return sample_complex_angular_central_gaussian(
            size=size, covariance=self.covariance, key=key)

    def log_pdf(self, y):
        """y: (..., N, D)."""
        y = normalize_observation(y)
        log_pdf, _ = self._log_pdf(y)
        return log_pdf

    def _log_pdf(self, y):
        """Internal: y in time-last layout (..., D, N).

        Returns (log_pdf, quadratic_form), both (..., N).
        """
        y = jnp.asarray(y)
        *independent, D, T = y.shape
        assert is_broadcast_compatible(
            [*independent, D, D], self.covariance_eigenvectors.shape
        ), (y.shape, self.covariance_eigenvectors.shape)

        # z = V^H y : batched matmul (MXU), then the quadratic form is a
        # scaled magnitude reduction (VPU).
        z = jnp.einsum(
            '...de,...dt->...et', self.covariance_eigenvectors.conj(), y,
            precision=em_matmul_precision())
        quadratic_form = jnp.maximum(
            jnp.einsum(
                '...et,...e->...t',
                z.real ** 2 + z.imag ** 2,
                1. / self.covariance_eigenvalues,
                precision=em_matmul_precision(),
            ),
            _tiny(y),
        )
        log_pdf = -D * jnp.log(quadratic_form)
        log_pdf = log_pdf - self.log_determinant[..., None]
        return log_pdf, quadratic_form


class ComplexAngularCentralGaussianTrainer:
    def fit(
            self,
            y,
            saliency=None,
            hermitize=True,
            covariance_norm='eigenvalue',
            eigenvalue_floor=1e-10,
            iterations=10,
    ):
        """Fixed-point iteration for a single cACG.

        Args:
            y: (..., N, D) complex, unit-norm not required (re-normalized).
            saliency: optional (..., N) weights.
        """
        y = jnp.asarray(y)
        *independent, N, D = y.shape
        assert jnp.iscomplexobj(y), y.dtype
        assert y.shape[-1] > 1
        y = normalize_observation(y)  # (..., D, N)

        assert iterations > 0, iterations

        if saliency is None:
            quadratic_form = jnp.ones((*independent, N), _real_dtype(y))
        else:
            quadratic_form = jnp.ones((*independent, N), _real_dtype(y))

        model = None
        for _ in range(iterations):
            model = self._fit(
                y=y,
                saliency=saliency,
                quadratic_form=quadratic_form,
                hermitize=hermitize,
                covariance_norm=covariance_norm,
                eigenvalue_floor=eigenvalue_floor,
            )
            _, quadratic_form = model._log_pdf(y)
        return model

    def _fit(
            self,
            y,
            saliency,
            quadratic_form,
            hermitize=True,
            covariance_norm='eigenvalue',
            eigenvalue_floor=1e-10,
            eigh_sweeps=None,
    ) -> ComplexAngularCentralGaussian:
        """Single M-step. y in time-last layout (..., D, N);
        saliency/quadratic_form: (..., N)."""
        y = jnp.asarray(y)
        assert jnp.iscomplexobj(y), y.dtype
        quadratic_form = jnp.asarray(quadratic_form)
        assert is_broadcast_compatible(
            y.shape[:-2], quadratic_form.shape[:-1]
        ), (y.shape, quadratic_form.shape)

        D = y.shape[-2]
        *independent, N = quadratic_form.shape

        # Floor: when the covariance is zero the quadratic form would be
        # zero as well; keep it strictly positive.
        quadratic_form = jnp.maximum(
            quadratic_form, 10 * _tiny(quadratic_form))
        if saliency is None:
            weights = 1.0 / quadratic_form
            denominator = jnp.asarray(N, _real_dtype(y))
        else:
            weights = saliency / quadratic_form
            denominator = jnp.sum(saliency, axis=-1)[..., None, None]

        # scatter: D * sum_t w_t y_t y_t^H / denominator — a batched
        # matmul over the (contiguous, time-last) reduction axis.
        yw = y * weights[..., None, :].astype(_real_dtype(y))
        covariance = D * jnp.einsum(
            '...dn,...en->...de', yw, y.conj(),
            precision=em_matmul_precision())
        covariance = covariance / jnp.maximum(
            denominator, _tiny(covariance)).astype(_real_dtype(covariance))
        assert covariance.shape == (*independent, D, D), (
            covariance.shape, (*independent, D, D))

        if hermitize:
            covariance = force_hermitian(covariance)

        return ComplexAngularCentralGaussian.from_covariance(
            covariance,
            eigenvalue_floor=eigenvalue_floor,
            covariance_norm=covariance_norm,
            eigh_sweeps=eigh_sweeps,
        )
