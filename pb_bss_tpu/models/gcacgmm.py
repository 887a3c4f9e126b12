"""Gaussian x complex-Angular-Central-Gaussian integration model.

Joint spatial (cACG on the multichannel observation) + spectral
(Gaussian on the Deep-Clustering embedding) mixture [Drude2019
Integration]. Capability parity with
``pb_bss/distribution/gcacgmm.py``: fixed (F, T, D)/(F, T, E) shapes,
weighted log-pdf combination with ``spatial_weight``/``spectral_weight``
exponents (:43-44, :66-117), optional per-frequency inline permutation
alignment over the K! permutations (:100-106), spherical-default
Gaussian on the flattened (1, F*T, E) embedding plus per-frequency cACG
M-step (:267-333).

TPU-first realization: the EM loop is one jitted ``lax.scan`` with the
(model, quadratic_form) pair threaded through; the inline-PA E-step is
a static K!-gather (see
``log_pdf_to_affiliation_for_integration_models_with_inline_pa``).
"""
from __future__ import annotations

import functools
from operator import xor
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from .base import Model, modelclass, static_field
from .._dtypes import real_dtype as _real_dtype, tiny as _tiny
from .complex_angular_central_gaussian import (
    ComplexAngularCentralGaussian,
    ComplexAngularCentralGaussianTrainer,
)
from .gaussian import GaussianTrainer
from .mixture_model_utils import (
    log_pdf_to_affiliation,
    log_pdf_to_affiliation_for_integration_models_with_inline_pa,
)
from ..utils import unsqueeze

__all__ = ['GCACGMM', 'GCACGMMTrainer']


@jax.jit
def _integration_predict_jit(model, observation, embedding):
    return model._predict(observation, embedding)


@modelclass
class GCACGMM(Model):
    weight: jnp.ndarray = None  # () / (K, 1) / (F, K, 1) / (K, T)
    gaussian: Any = None  # Gaussian / DiagonalGaussian / SphericalGaussian
    cacg: ComplexAngularCentralGaussian = None
    weight_constant_axis: tuple = static_field((-1,))
    spatial_weight: float = static_field(1.)
    spectral_weight: float = static_field(1.)

    def predict(self, observation, embedding):
        """observation: (F, T, D) complex; embedding: (F, T, E) real.
        Returns affiliation (F, K, T)."""
        observation = jnp.asarray(observation)
        embedding = jnp.asarray(embedding)
        assert jnp.iscomplexobj(observation), observation.dtype
        assert not jnp.iscomplexobj(embedding), embedding.dtype
        observation = observation / jnp.maximum(
            jnp.linalg.norm(observation, axis=-1, keepdims=True),
            _tiny(observation),
        )
        affiliation, _ = _integration_predict_jit(
            self, observation, embedding)
        return affiliation

    def _predict(self, observation, embedding, affiliation_eps=0.,
                 inline_permutation_alignment=False):
        F, T, D = observation.shape
        _, _, E = embedding.shape

        observation_ = observation[..., None, :, :]
        cacg_log_pdf, quadratic_form = self.cacg._log_pdf(
            jnp.swapaxes(observation_, -1, -2))

        embedding_ = jnp.reshape(embedding, (1, F * T, E))
        gaussian_log_pdf = self.gaussian.log_pdf(embedding_)
        num_classes = gaussian_log_pdf.shape[0]
        gaussian_log_pdf = jnp.transpose(
            jnp.reshape(gaussian_log_pdf, (num_classes, F, T)), (1, 0, 2))

        weight = unsqueeze(self.weight, self.weight_constant_axis)
        if inline_permutation_alignment:
            affiliation = \
                log_pdf_to_affiliation_for_integration_models_with_inline_pa(
                    weight=weight,
                    spatial_log_pdf=self.spatial_weight * cacg_log_pdf,
                    spectral_log_pdf=self.spectral_weight
                    * gaussian_log_pdf,
                    affiliation_eps=affiliation_eps,
                )
        else:
            affiliation = log_pdf_to_affiliation(
                weight=weight,
                log_pdf=(self.spatial_weight * cacg_log_pdf
                         + self.spectral_weight * gaussian_log_pdf),
                affiliation_eps=affiliation_eps,
            )
        return affiliation, quadratic_form


class GCACGMMTrainer:
    def fit(
            self,
            observation,
            embedding,
            initialization=None,
            num_classes=None,
            iterations=100,
            saliency=None,
            *,
            key=None,
            hermitize=True,
            covariance_norm='eigenvalue',
            eigenvalue_floor=1e-10,
            covariance_type='spherical',
            fixed_covariance=None,
            affiliation_eps=1e-10,
            weight_constant_axis=(-1,),
            spatial_weight=1.,
            spectral_weight=1.,
            inline_permutation_alignment=False,
    ) -> GCACGMM:
        """EM on (F, T, D) observations + (F, T, E) embeddings
        (reference gcacgmm.py:121-226).

        ``weight_constant_axis`` semantics (affiliation is (F, K, T)):
        (-3, -2, -1) scalar, (-3, -1) per class, (-1,) per (F, K),
        (-3,) per (K, T).
        """
        assert xor(initialization is None, num_classes is None), (
            'Incompatible input combination. '
            'Exactly one of the two inputs has to be None: '
            f'{initialization is None} xor {num_classes is None}'
        )
        observation = jnp.asarray(observation)
        embedding = jnp.asarray(embedding)
        assert jnp.iscomplexobj(observation), observation.dtype
        assert not jnp.iscomplexobj(embedding), embedding.dtype
        assert observation.shape[-1] > 1
        observation = observation / jnp.maximum(
            jnp.linalg.norm(observation, axis=-1, keepdims=True),
            _tiny(observation),
        )

        F, T, D = observation.shape

        if initialization is None and num_classes is not None:
            if key is None:
                key = jax.random.key(0)
            affiliation_shape = (F, num_classes, T)
            initialization = jax.random.uniform(
                key, affiliation_shape, _real_dtype(observation))
            initialization = initialization / jnp.einsum(
                '...kt->...t', initialization)[..., None, :]
        initialization = jnp.asarray(initialization)

        if saliency is None:
            saliency = jnp.ones_like(initialization[..., 0, :])

        if isinstance(weight_constant_axis, list):
            weight_constant_axis = tuple(weight_constant_axis)

        return _gcacgmm_fit_em(
            observation, embedding, initialization, saliency,
            fixed_covariance,
            iterations=int(iterations),
            hermitize=bool(hermitize),
            covariance_norm=covariance_norm,
            eigenvalue_floor=float(eigenvalue_floor),
            covariance_type=covariance_type,
            affiliation_eps=float(affiliation_eps),
            weight_constant_axis=weight_constant_axis,
            spatial_weight=float(spatial_weight),
            spectral_weight=float(spectral_weight),
            inline_permutation_alignment=bool(
                inline_permutation_alignment),
        )

    def fit_predict(self, observation, embedding, initialization=None,
                    num_classes=None, iterations=100, saliency=None,
                    *, key=None, hermitize=True,
                    covariance_norm='eigenvalue', eigenvalue_floor=1e-10,
                    covariance_type='spherical', fixed_covariance=None,
                    affiliation_eps=1e-10, weight_constant_axis=(-1,),
                    spatial_weight=1., spectral_weight=1.,
                    inline_permutation_alignment=False):
        """Fit a model, then return the posterior affiliations."""
        model = self.fit(
            observation=observation,
            embedding=embedding,
            initialization=initialization,
            num_classes=num_classes,
            iterations=iterations,
            saliency=saliency,
            key=key,
            hermitize=hermitize,
            covariance_norm=covariance_norm,
            eigenvalue_floor=eigenvalue_floor,
            covariance_type=covariance_type,
            fixed_covariance=fixed_covariance,
            affiliation_eps=affiliation_eps,
            weight_constant_axis=weight_constant_axis,
            spatial_weight=spatial_weight,
            spectral_weight=spectral_weight,
            inline_permutation_alignment=inline_permutation_alignment,
        )
        return model.predict(observation=observation, embedding=embedding)


def _integration_weight(masked_affiliation, weight_constant_axis):
    """Weight M-step of the integration models
    (reference gcacgmm.py:287-295): sum over the constant axes,
    normalize over classes, squeeze the constant axes."""
    K = masked_affiliation.shape[-2]
    if -2 in weight_constant_axis:
        return jnp.asarray(1.0 / K, masked_affiliation.dtype)
    weight = jnp.sum(
        masked_affiliation, axis=weight_constant_axis, keepdims=True)
    weight = weight / jnp.sum(weight, axis=-2, keepdims=True)
    return jnp.squeeze(weight, axis=weight_constant_axis)


@functools.partial(
    jax.jit,
    static_argnames=(
        'iterations', 'hermitize', 'covariance_norm', 'eigenvalue_floor',
        'covariance_type', 'affiliation_eps', 'weight_constant_axis',
        'spatial_weight', 'spectral_weight',
        'inline_permutation_alignment'),
)
def _gcacgmm_fit_em(observation, embedding, affiliation, saliency,
                    fixed_covariance, *, iterations, hermitize,
                    covariance_norm, eigenvalue_floor, covariance_type,
                    affiliation_eps, weight_constant_axis, spatial_weight,
                    spectral_weight, inline_permutation_alignment):
    F, T, D = observation.shape
    _, _, E = embedding.shape
    K = affiliation.shape[-2]

    def m_step(affiliation, quadratic_form):
        masked_affiliation = affiliation * saliency[..., None, :]
        weight = _integration_weight(
            masked_affiliation, weight_constant_axis)

        embedding_ = jnp.reshape(embedding, (1, F * T, E))
        masked_affiliation_ = jnp.reshape(
            jnp.transpose(masked_affiliation, (1, 0, 2)), (K, F * T))
        gaussian = GaussianTrainer()._fit(
            y=embedding_,
            saliency=masked_affiliation_,
            covariance_type=covariance_type,
        )
        if fixed_covariance is not None:
            assert fixed_covariance.shape == gaussian.covariance.shape, (
                f'{fixed_covariance.shape} != {gaussian.covariance.shape}'
            )
            gaussian = gaussian.__class__(
                mean=gaussian.mean, covariance=fixed_covariance)

        cacg = ComplexAngularCentralGaussianTrainer()._fit(
            y=jnp.swapaxes(observation[..., None, :, :], -1, -2),
            saliency=masked_affiliation,
            quadratic_form=quadratic_form,
            hermitize=hermitize,
            covariance_norm=covariance_norm,
            eigenvalue_floor=eigenvalue_floor,
        )
        return GCACGMM(
            weight=weight,
            gaussian=gaussian,
            cacg=cacg,
            weight_constant_axis=weight_constant_axis,
            spatial_weight=spatial_weight,
            spectral_weight=spectral_weight,
        )

    quadratic_form = jnp.ones_like(affiliation)
    model = m_step(affiliation, quadratic_form)
    if iterations > 1:
        def step(model, _):
            affiliation, quadratic_form = model._predict(
                observation=observation,
                embedding=embedding,
                inline_permutation_alignment=inline_permutation_alignment,
                affiliation_eps=affiliation_eps,
            )
            return m_step(affiliation, quadratic_form), None
        model, _ = lax.scan(step, model, None, length=iterations - 1)
    return model
