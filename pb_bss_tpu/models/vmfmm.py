"""von-Mises-Fisher mixture model.

Capability parity with ``pb_bss/distribution/vmfmm.py`` (predict
:19-37, EM trainer :40-172); the EM loop runs through the shared
jitted ``lax.scan`` engine.
"""
from __future__ import annotations

import functools
from operator import xor

import jax
import jax.numpy as jnp

from ._em import run_em
from .base import Model, modelclass
from .mixture_model_utils import (
    estimate_mixture_weight,
    log_pdf_to_affiliation,
)
from .von_mises_fisher import VonMisesFisher, VonMisesFisherTrainer

__all__ = ['VMFMM', 'VMFMMTrainer']


@modelclass
class VMFMM(Model):
    vmf: VonMisesFisher = None
    weight: jnp.ndarray = None  # (..., K, 1)

    def predict(self, y):
        """y: (..., N, D) -> affiliations (..., K, N)."""
        y = jnp.asarray(y)
        assert not jnp.iscomplexobj(y), y.dtype
        y = y / jnp.maximum(
            jnp.linalg.norm(y, axis=-1, keepdims=True),
            jnp.finfo(y.dtype).tiny)
        return self._predict(y)

    def _predict(self, y):
        log_pdf = self.vmf.log_pdf(y[..., None, :, :])
        return log_pdf_to_affiliation(self.weight, log_pdf)


class VMFMMTrainer:
    """EM for vMF mixtures (clusters e.g. DC embeddings)."""

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
            min_concentration=1e-10,
            max_concentration=500,
    ) -> VMFMM:
        """EM for vMFMMs with any number of independent dimensions
        (reference vmfmm.py:43-98)."""
        assert xor(initialization is None, num_classes is None), (
            'Provide either `initialization` or `num_classes` — not '
            'both and not neither. Got initialization is None: '
            f'{initialization is None}, num_classes is None: '
            f'{num_classes is None}.'
        )
        y = jnp.asarray(y)
        assert not jnp.iscomplexobj(y), y.dtype
        y = y / jnp.maximum(
            jnp.linalg.norm(y, axis=-1, keepdims=True),
            jnp.finfo(y.dtype).tiny)

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

        return _vmfmm_fit_em(
            y, initialization, saliency,
            iterations=int(iterations),
            weight_constant_axis=weight_constant_axis,
            min_concentration=float(min_concentration),
            max_concentration=float(max_concentration),
        )

    def fit_predict(self, y, initialization=None, num_classes=None,
                    iterations=100, **kwargs):
        """Fit a model, then return its posterior affiliations for
        ``y`` (keyword knobs are those of :meth:`fit`)."""
        model = self.fit(
            y=y, initialization=initialization,
            num_classes=num_classes, iterations=iterations, **kwargs)
        return model.predict(y)


@functools.partial(
    jax.jit,
    static_argnames=(
        'iterations', 'weight_constant_axis',
        'min_concentration', 'max_concentration'),
)
def _vmfmm_fit_em(y, affiliation, saliency, *, iterations,
                  weight_constant_axis, min_concentration,
                  max_concentration):
    def m_step(affiliation):
        weight = estimate_mixture_weight(
            affiliation, saliency=saliency,
            weight_constant_axis=weight_constant_axis)
        vmf = VonMisesFisherTrainer()._fit(
            y[..., None, :, :],
            saliency=affiliation * saliency[..., None, :],
            min_concentration=min_concentration,
            max_concentration=max_concentration)
        return VMFMM(weight=weight, vmf=vmf)

    return run_em(
        affiliation=affiliation, iterations=iterations,
        m_step=m_step, e_step=lambda model: model._predict(y))
