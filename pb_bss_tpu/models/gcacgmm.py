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

    @classmethod
    def from_dict(cls, d):
        """Reconstructs the polymorphic ``gaussian`` field (its
        annotation is ``Any`` — full/diagonal/spherical — so the
        generic nested-model restore cannot resolve it; the variant
        is identified by the covariance rank relative to the mean).
        The reference's ``from_dict`` leaves nested models as dicts
        entirely (reference distribution/utils.py:159-193 doctest)."""
        model = super().from_dict(d)
        g = model.gaussian
        if isinstance(g, dict) and g.get('covariance') is not None:
            from .gaussian import (
                DiagonalGaussian, Gaussian, SphericalGaussian,
            )
            mean = jnp.asarray(g['mean'])
            covariance = jnp.asarray(g['covariance'])
            if covariance.ndim == mean.ndim + 1:
                gaussian_cls = Gaussian
            elif covariance.ndim == mean.ndim:
                gaussian_cls = DiagonalGaussian
            else:
                gaussian_cls = SphericalGaussian
            model = model.replace(gaussian=gaussian_cls.from_dict(g))
        return model

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
        *batch, F, T, D = observation.shape
        E = embedding.shape[-1]

        observation_ = observation[..., None, :, :]
        cacg_log_pdf, quadratic_form = self.cacg._log_pdf(
            jnp.swapaxes(observation_, -1, -2))

        # the spectral model is global over (F*T) per utterance
        # (reference gcacgmm.py:66-117); leading batch axes carry
        # their own spectral state
        embedding_ = jnp.reshape(embedding, (*batch, 1, F * T, E))
        gaussian_log_pdf = self.gaussian.log_pdf(embedding_)
        num_classes = gaussian_log_pdf.shape[-2]
        gaussian_log_pdf = jnp.moveaxis(
            jnp.reshape(gaussian_log_pdf, (*batch, num_classes, F, T)),
            -3, -2)

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
            use_fused_em='auto',
    ) -> GCACGMM:
        """EM on (F, T, D) observations + (F, T, E) embeddings
        (reference gcacgmm.py:121-226).

        ``weight_constant_axis`` semantics (affiliation is (F, K, T)):
        (-3, -2, -1) scalar, (-3, -1) per class, (-1,) per (F, K),
        (-3,) per (K, T).

        use_fused_em: run each EM iteration's E-step + M-statistics as
            ONE Pallas kernel pass (see models/vmfcacgmm.py). 'auto'
            enables it on TPU for eligible inputs ('spherical' /
            'diagonal' covariance); True forces it (interpret mode on
            CPU, slow — for tests); False keeps the pure-XLA scan.
        """
        assert xor(initialization is None, num_classes is None), (
            'Provide either `initialization` or `num_classes` — not '
            'both and not neither. Got initialization is None: '
            f'{initialization is None}, num_classes is None: '
            f'{num_classes is None}.'
        )
        observation = jnp.asarray(observation)
        embedding = jnp.asarray(embedding)
        assert jnp.iscomplexobj(observation), observation.dtype
        assert not jnp.iscomplexobj(embedding), embedding.dtype
        assert observation.shape[-1] > 1
        # Plausibility guard in the spirit of the reference's cACGMM
        # (cacgmm.py:249-250): catches (F, D, T)-layout mistakes.
        assert observation.shape[-1] < 35, (
            f'Channels: {observation.shape[-1]}, sure?')
        observation = observation / jnp.maximum(
            jnp.linalg.norm(observation, axis=-1, keepdims=True),
            _tiny(observation),
        )

        *batch, F, T, D = observation.shape
        assert not (batch and inline_permutation_alignment), (
            'inline permutation alignment needs (F, T, D) '
            'observations (no leading batch axes)', observation.shape)

        if initialization is None and num_classes is not None:
            if key is None:
                key = jax.random.key(0)
            affiliation_shape = (*batch, F, num_classes, T)
            initialization = jax.random.uniform(
                key, affiliation_shape, _real_dtype(observation))
            initialization = initialization / jnp.einsum(
                '...kt->...t', initialization)[..., None, :]
        initialization = jnp.asarray(initialization)

        saliency_arg = saliency
        if saliency is None:
            saliency = jnp.ones_like(initialization[..., 0, :])

        if isinstance(weight_constant_axis, list):
            weight_constant_axis = tuple(weight_constant_axis)

        from .vmfcacgmm import (
            _fused_integration_eligible,
            _resolve_fused_mode,
            _whole_fit_integration_eligible,
        )
        vector_cov = covariance_type in ('spherical', 'diagonal')
        use_fused_em = _resolve_fused_mode(
            use_fused_em,
            vector_cov and _fused_integration_eligible(
                observation, embedding,
                initialization.shape[-2], saliency_arg,
                weight_constant_axis, inline_permutation_alignment),
            vector_cov and fixed_covariance is None
            and _whole_fit_integration_eligible(
                observation, embedding,
                initialization.shape[-2], saliency_arg,
                weight_constant_axis, inline_permutation_alignment,
                int(iterations), covariance_norm, bool(hermitize),
                'gaussian'))

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
            use_fused_em=use_fused_em,
            has_saliency=saliency_arg is not None,
        )

    def fit_predict(self, observation, embedding, initialization=None,
                    num_classes=None, iterations=100, saliency=None,
                    *, key=None, hermitize=True,
                    covariance_norm='eigenvalue', eigenvalue_floor=1e-10,
                    covariance_type='spherical', fixed_covariance=None,
                    affiliation_eps=1e-10, weight_constant_axis=(-1,),
                    spatial_weight=1., spectral_weight=1.,
                    inline_permutation_alignment=False,
                    use_fused_em='auto'):
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
            use_fused_em=use_fused_em,
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
        'inline_permutation_alignment', 'use_fused_em',
        'has_saliency'),
)
def _gcacgmm_fit_em(observation, embedding, affiliation, saliency,
                    fixed_covariance, *, iterations, hermitize,
                    covariance_norm, eigenvalue_floor, covariance_type,
                    affiliation_eps, weight_constant_axis, spatial_weight,
                    spectral_weight, inline_permutation_alignment,
                    use_fused_em='off', has_saliency=False):
    *batch, F, T, D = observation.shape
    E = embedding.shape[-1]
    K = affiliation.shape[-2]

    def m_step(affiliation, quadratic_form):
        masked_affiliation = affiliation * saliency[..., None, :]
        weight = _integration_weight(
            masked_affiliation, weight_constant_axis)

        embedding_ = jnp.reshape(embedding, (*batch, 1, F * T, E))
        masked_affiliation_ = jnp.reshape(
            jnp.moveaxis(masked_affiliation, -2, -3),
            (*batch, K, F * T))
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
    if use_fused_em == 'loop':
        # the whole-fit kernel has no saliency path — running it
        # would silently drop the weighting
        assert not has_saliency, (
            "use_fused_em='loop' does not support saliency; use "
            "'step' or the scan path")
    if iterations > 1 and use_fused_em == 'loop':
        # WHOLE-FIT single-launch kernel (see models/vmfcacgmm.py for
        # the vMF twin): only the initial M-step and the final
        # Gaussian moment-matching finish are XLA.
        from ..ops.pallas_integration_em_loop import integration_em_full
        f32 = jnp.float32
        tiny = jnp.finfo(f32).tiny
        fold = 1
        for b in batch:
            fold *= b
        y_tl = jnp.reshape(
            jnp.swapaxes(observation, -1, -2), (fold * F, D, T))
        emb_tl = jnp.reshape(
            jnp.swapaxes(embedding, -1, -2), (fold * F, E, T))
        model = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.complex64)
            if jnp.iscomplexobj(x) else x.astype(f32), model)
        spherical = covariance_type == 'spherical'

        def to_bins(x):
            return jnp.reshape(x, (fold * F,) + x.shape[len(batch) + 1:])

        def from_bins(x):
            return jnp.reshape(x, (*batch, F) + x.shape[1:])

        def spec_cols(x):  # (fold, K[, E]) -> packed rows
            if x.ndim == 3:
                return jnp.reshape(
                    jnp.transpose(x, (2, 1, 0)), (E * K, fold))
            return jnp.transpose(x)

        g = model.gaussian
        g_mean = jnp.reshape(g.mean, (fold, K, E))
        if spherical:
            cov = jnp.reshape(g.covariance, (fold, K))
            prec = jnp.broadcast_to(
                (1. / cov)[..., None], g_mean.shape)
            ldpc = -0.5 * E * jnp.log(cov)
        else:
            cov = jnp.reshape(g.covariance, (fold, K, E))
            prec = 1. / cov
            ldpc = -0.5 * jnp.sum(jnp.log(cov), axis=-1)
        const = (0.5 * E * jnp.log(2 * jnp.pi) - ldpc
                 + 0.5 * jnp.sum(g_mean ** 2 * prec, axis=-1))
        spec0 = jnp.concatenate([
            spec_cols(prec * g_mean),
            spec_cols(prec),
            spec_cols(const),
        ], axis=0)
        vecs = model.cacg.covariance_eigenvectors
        eigenvalues, vectors, weight, acc = integration_em_full(
            y_tl.real.astype(f32),
            y_tl.imag.astype(f32),
            emb_tl.astype(f32),
            to_bins(vecs.real.astype(f32)),
            to_bins(vecs.imag.astype(f32)),
            to_bins(model.cacg.covariance_eigenvalues),
            to_bins(model.weight),
            spec0,
            n_utt=fold, iterations=iterations - 1,
            spatial_weight=spatial_weight,
            spectral_weight=spectral_weight,
            affiliation_eps=affiliation_eps,
            eigenvalue_floor=eigenvalue_floor,
            spectral_mode='gaussian', spherical=spherical,
            interpret=jax.default_backend() == 'cpu')
        # Gaussian finish of the last E-step's moments (exactly the
        # fused_step XLA closed form, reference gaussian.py:133-167)
        r = jnp.transpose(
            jnp.reshape(acc[:E * K], (E, K, fold)), (2, 1, 0))
        n = jnp.transpose(acc[E * K:E * K + K])  # (fold, K)
        m2 = jnp.transpose(
            jnp.reshape(acc[E * K + K:], (E, K, fold)), (2, 1, 0))
        denom = jnp.maximum(n, tiny)
        mean = r / denom[..., None]
        centered = jnp.maximum(
            m2 / denom[..., None] - mean ** 2, tiny)
        covariance = (jnp.mean(centered, axis=-1) if spherical
                      else centered)

        def spec_shape(x):
            return jnp.reshape(x, tuple(batch) + x.shape[1:])

        return GCACGMM(
            weight=from_bins(weight),
            gaussian=g.__class__(
                mean=spec_shape(mean),
                covariance=spec_shape(covariance)),
            cacg=ComplexAngularCentralGaussian(
                covariance_eigenvalues=from_bins(eigenvalues),
                covariance_eigenvectors=from_bins(vectors)),
            weight_constant_axis=weight_constant_axis,
            spatial_weight=spatial_weight,
            spectral_weight=spectral_weight,
        )
    if iterations > 1 and use_fused_em == 'step':
        from ..ops.pallas_integration_em import (
            choose_tile_f, e_stats_staged, stage_observation,
            stage_saliency)
        tile_f = choose_tile_f(D, E, K, -(-T // 8) * 8,
                               has_sal=has_saliency)
        # leading batch axes fold into the (independent) bin axis
        # (see models/vmfcacgmm.py)
        fold = 1
        for b in batch:
            fold *= b
        y_tl = jnp.reshape(
            jnp.swapaxes(observation, -1, -2), (fold * F, D, T))
        emb_tl = jnp.reshape(
            jnp.swapaxes(embedding, -1, -2), (fold * F, E, T))
        staged = stage_observation(
            y_tl.real, y_tl.imag, emb_tl, tile_f=tile_f)
        sal_s = (stage_saliency(
            jnp.reshape(saliency, (fold * F, T)), tile_f=tile_f)
            if has_saliency else None)
        interpret = jax.default_backend() == 'cpu'
        f32 = jnp.float32
        # the kernel computes in f32; pin the scan carry's dtypes so
        # the first (XLA) M-step's x64 leaves can't mismatch it
        model = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.complex64)
            if jnp.iscomplexobj(x) else x.astype(f32), model)
        spherical = covariance_type == 'spherical'

        def to_bins(x):
            return jnp.reshape(x, (fold * F,) + x.shape[len(batch) + 1:])

        def spectral_to_bins(x):
            x = jnp.broadcast_to(
                x[..., None, :, :] if x.ndim == len(batch) + 2
                else x[..., None, :],
                (*batch, F) + x.shape[len(batch):])
            return to_bins(x)

        def from_bins(x):
            return jnp.reshape(x, (*batch, F) + x.shape[1:])

        def fused_step(model, _):
            # One kernel pass: E-step + every M-statistic (the
            # posterior never touches HBM); the small M-step finish
            # (Pallas Jacobi eigh, Gaussian moment matching) stays
            # in XLA.
            g = model.gaussian
            if spherical:
                prec = jnp.broadcast_to(
                    (1. / g.covariance)[..., None], g.mean.shape)
                ldpc = -0.5 * E * jnp.log(g.covariance)
            else:
                prec = 1. / g.covariance  # (*batch, K, E)
                ldpc = -0.5 * jnp.sum(jnp.log(g.covariance), axis=-1)
            const = (0.5 * E * jnp.log(2 * jnp.pi) - ldpc
                     + 0.5 * jnp.sum(g.mean ** 2 * prec, axis=-1))
            eigenvalues = model.cacg.covariance_eigenvalues
            scatter, asum, r, m2 = e_stats_staged(
                *staged,
                to_bins(model.cacg.covariance_eigenvectors.real),
                to_bins(model.cacg.covariance_eigenvectors.imag),
                to_bins(1. / eigenvalues),
                to_bins(jnp.sum(jnp.log(eigenvalues), axis=-1)),
                to_bins(model.weight),
                spectral_to_bins(prec * g.mean),
                spectral_to_bins(prec),
                spectral_to_bins(const),
                sal_s,
                f_real=fold * F, t_real=T,
                spatial_weight=spatial_weight,
                spectral_weight=spectral_weight,
                affiliation_eps=affiliation_eps,
                tile_f=tile_f, interpret=interpret,
                spectral_mode='gaussian')
            scatter = from_bins(scatter)  # (*batch, F, K, D, D)
            asum = from_bins(asum)  # (*batch, F, K)
            r = jnp.sum(from_bins(r), axis=-3)  # (*batch, K, E)
            m2 = jnp.sum(from_bins(m2), axis=-3)  # (*batch, K, E)
            tiny = jnp.finfo(f32).tiny
            # weight M-step (reference gcacgmm.py:287-295 for (-1,))
            weight = asum / jnp.maximum(
                jnp.sum(asum, axis=-1, keepdims=True), tiny)
            # Gaussian M-step from the global zeroth/first/second
            # moments (reference gaussian.py:133-167): the centered
            # covariance is E[e^2] - mean^2 under the posterior
            denom = jnp.maximum(
                jnp.sum(asum, axis=-2), tiny)  # (*batch, K)
            mean = r / denom[..., None]
            centered = jnp.maximum(
                m2 / denom[..., None] - mean ** 2, tiny)
            if spherical:
                covariance = jnp.mean(centered, axis=-1)
            else:
                covariance = centered
            if fixed_covariance is not None:
                covariance = fixed_covariance.astype(f32)
            gaussian = g.__class__(mean=mean, covariance=covariance)
            # cACG M-step: scatter is built hermitian in-kernel
            cacg_covariance = D * scatter / jnp.maximum(
                asum, tiny)[..., None, None].astype(scatter.dtype)
            cacg = ComplexAngularCentralGaussian.from_covariance(
                cacg_covariance,
                eigenvalue_floor=eigenvalue_floor,
                covariance_norm=covariance_norm,
            )
            return GCACGMM(
                weight=weight,
                gaussian=gaussian,
                cacg=cacg,
                weight_constant_axis=weight_constant_axis,
                spatial_weight=spatial_weight,
                spectral_weight=spectral_weight,
            ), None

        model, _ = lax.scan(
            fused_step, model, None, length=iterations - 1)
    elif iterations > 1:
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
