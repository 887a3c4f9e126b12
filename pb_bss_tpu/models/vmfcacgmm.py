"""vMF x complex-Angular-Central-Gaussian integration model.

Same structure as :mod:`pb_bss_tpu.models.gcacgmm` with a von
Mises-Fisher spectral model on the unit-normalized embedding.
Capability parity with ``pb_bss/distribution/vmfcacgmm.py`` (:34-97
predict, :244-301 M-step).
"""
from __future__ import annotations

import functools
from operator import xor

import jax
import jax.numpy as jnp
from jax import lax

from .base import Model, modelclass, static_field
from .._dtypes import real_dtype as _real_dtype, tiny as _tiny
from .complex_angular_central_gaussian import (
    ComplexAngularCentralGaussian,
    ComplexAngularCentralGaussianTrainer,
)
from .gcacgmm import _integration_weight, _integration_predict_jit
from .mixture_model_utils import (
    log_pdf_to_affiliation,
    log_pdf_to_affiliation_for_integration_models_with_inline_pa,
)
from .von_mises_fisher import VonMisesFisher, VonMisesFisherTrainer
from ..utils import unsqueeze

__all__ = ['VMFCACGMM', 'VMFCACGMMTrainer']


@modelclass
class VMFCACGMM(Model):
    weight: jnp.ndarray = None
    vmf: VonMisesFisher = None
    cacg: ComplexAngularCentralGaussian = None
    weight_constant_axis: tuple = static_field((-1,))
    spatial_weight: float = static_field(1.)
    spectral_weight: float = static_field(1.)

    def predict(self, observation, embedding):
        """observation: (F, T, D) complex; embedding: (F, T, E) real."""
        observation = jnp.asarray(observation)
        embedding = jnp.asarray(embedding)
        assert jnp.iscomplexobj(observation), observation.dtype
        assert not jnp.iscomplexobj(embedding), embedding.dtype
        observation = observation / jnp.maximum(
            jnp.linalg.norm(observation, axis=-1, keepdims=True),
            _tiny(observation),
        )
        embedding = embedding / jnp.maximum(
            jnp.linalg.norm(embedding, axis=-1, keepdims=True),
            jnp.finfo(embedding.dtype).tiny,
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
        # (reference vmfcacgmm.py:60-68); leading batch axes carry
        # their own spectral state
        embedding_ = jnp.reshape(embedding, (*batch, 1, F * T, E))
        vmf_log_pdf = self.vmf.log_pdf(embedding_)
        num_classes = vmf_log_pdf.shape[-2]
        vmf_log_pdf = jnp.moveaxis(
            jnp.reshape(vmf_log_pdf, (*batch, num_classes, F, T)),
            -3, -2)

        weight = unsqueeze(self.weight, self.weight_constant_axis)
        if inline_permutation_alignment:
            affiliation = \
                log_pdf_to_affiliation_for_integration_models_with_inline_pa(
                    weight=weight,
                    spatial_log_pdf=self.spatial_weight * cacg_log_pdf,
                    spectral_log_pdf=self.spectral_weight * vmf_log_pdf,
                    affiliation_eps=affiliation_eps,
                )
        else:
            affiliation = log_pdf_to_affiliation(
                weight=weight,
                log_pdf=(self.spatial_weight * cacg_log_pdf
                         + self.spectral_weight * vmf_log_pdf),
                affiliation_eps=affiliation_eps,
            )
        return affiliation, quadratic_form


def _fused_integration_eligible(
        observation, embedding, num_classes, saliency,
        weight_constant_axis, inline_permutation_alignment):
    """Route the EM to the fused per-iteration Pallas E+stats kernel
    (ops/pallas_integration_em.py)? Non-CPU backend, c64 (F, T, D)
    observations (a leading batch axis folds into the bin axis),
    knobs the kernel implements exactly (saliency is handled
    in-kernel)."""
    from ..ops.pallas_integration_em import choose_tile_f
    F, T, D = observation.shape[-3:]
    E = embedding.shape[-1]
    return (
        jax.default_backend() != 'cpu'
        and observation.ndim in (3, 4)
        and observation.dtype == jnp.dtype(jnp.complex64)
        and D <= 16
        and not inline_permutation_alignment
        and weight_constant_axis in ((-1,), -1)
        and bool(choose_tile_f(D, E, num_classes, -(-T // 8) * 8,
                               has_sal=saliency is not None))
    )


def _whole_fit_integration_eligible(
        observation, embedding, num_classes, saliency,
        weight_constant_axis, inline_permutation_alignment,
        iterations, covariance_norm, hermitize, spectral_mode):
    """Route the EM to the WHOLE-FIT single-launch kernel
    (ops/pallas_integration_em_loop.py)? Stricter than the
    per-iteration gate: the in-kernel cACG M-step implements only the
    'eigenvalue' covariance norm with hermitization, and the per-tile
    persistent scratch must fit VMEM."""
    from ..ops.pallas_integration_em_loop import choose_tile_f_loop
    if not _fused_integration_eligible(
            observation, embedding, num_classes, saliency,
            weight_constant_axis, inline_permutation_alignment):
        return False
    # the whole-fit loop kernel (unlike the per-iteration kernel)
    # does not implement saliency weighting
    if saliency is not None:
        return False
    if iterations < 2 or covariance_norm != 'eigenvalue' \
            or not hermitize:
        return False
    *batch, F, T, D = observation.shape
    E = embedding.shape[-1]
    fold = 1
    for b in batch:
        fold *= b
    if fold > 128:
        return False
    fits = choose_tile_f_loop(
        D, E, num_classes, -(-T // 8) * 8, fold, spectral_mode)
    fb = fold * F
    return any(fits(tf, -(-fb // tf) * tf) for tf in (256, 128))


def _resolve_fused_mode(use_fused_em, step_eligible, loop_eligible):
    """'auto' picks the per-iteration kernel; the whole-fit kernel
    ('loop') is an explicit opt-in — measured on device it is ~13x
    SLOWER than the per-iteration path (205 vs 15 ms per VMFCACGMM
    EM-20 fit at the benchmark shape): re-streaming the observation
    tiles from HBM every iteration under a sequential (iteration,
    tile) grid costs far more than the per-iteration launch + XLA glue
    it removes. True keeps its historical meaning (force the
    per-iteration kernel, interpret mode on CPU — for tests);
    'loop'/'step' force a specific kernel."""
    del loop_eligible  # 'auto' never picks 'loop' (see above)
    if use_fused_em == 'auto':
        return 'step' if step_eligible else 'off'
    if use_fused_em == 'loop':
        return 'loop'
    if use_fused_em is True or use_fused_em == 'step':
        return 'step'
    assert use_fused_em is False, use_fused_em
    return 'off'


class VMFCACGMMTrainer:
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
            min_concentration=1e-10,
            max_concentration=500,
            hermitize=True,
            covariance_norm='eigenvalue',
            eigenvalue_floor=1e-10,
            affiliation_eps=1e-10,
            weight_constant_axis=(-1,),
            spatial_weight=1.,
            spectral_weight=1.,
            inline_permutation_alignment=False,
            use_fused_em='auto',
    ) -> VMFCACGMM:
        """EM on (F, T, D) observations + (F, T, E) embeddings
        (reference vmfcacgmm.py:101-203). Leading batch axes (e.g.
        (B, F, T, D)) fit independent models per utterance — an
        extension over the reference's fixed 3D shapes.

        use_fused_em: run each EM iteration's E-step + M-statistics as
            ONE Pallas kernel pass (bins in lanes; the posterior is
            never materialized to HBM). 'auto' enables it on TPU for
            eligible inputs; True forces it (interpret mode on CPU,
            slow — for tests); False keeps the pure-XLA scan.
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

        use_fused_em = _resolve_fused_mode(
            use_fused_em,
            _fused_integration_eligible(
                observation, embedding,
                initialization.shape[-2], saliency_arg,
                weight_constant_axis, inline_permutation_alignment),
            _whole_fit_integration_eligible(
                observation, embedding,
                initialization.shape[-2], saliency_arg,
                weight_constant_axis, inline_permutation_alignment,
                int(iterations), covariance_norm, bool(hermitize),
                'vmf'))

        return _vmfcacgmm_fit_em(
            observation, embedding, initialization, saliency,
            iterations=int(iterations),
            min_concentration=float(min_concentration),
            max_concentration=float(max_concentration),
            hermitize=bool(hermitize),
            covariance_norm=covariance_norm,
            eigenvalue_floor=float(eigenvalue_floor),
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
                    *, key=None, min_concentration=1e-10,
                    max_concentration=500, hermitize=True,
                    covariance_norm='eigenvalue', eigenvalue_floor=1e-10,
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
            min_concentration=min_concentration,
            max_concentration=max_concentration,
            hermitize=hermitize,
            covariance_norm=covariance_norm,
            eigenvalue_floor=eigenvalue_floor,
            affiliation_eps=affiliation_eps,
            weight_constant_axis=weight_constant_axis,
            spatial_weight=spatial_weight,
            spectral_weight=spectral_weight,
            inline_permutation_alignment=inline_permutation_alignment,
            use_fused_em=use_fused_em,
        )
        return model.predict(observation=observation, embedding=embedding)


@functools.partial(
    jax.jit,
    static_argnames=(
        'iterations', 'min_concentration', 'max_concentration',
        'hermitize', 'covariance_norm', 'eigenvalue_floor',
        'affiliation_eps', 'weight_constant_axis', 'spatial_weight',
        'spectral_weight', 'inline_permutation_alignment',
        'use_fused_em', 'has_saliency'),
)
def _vmfcacgmm_fit_em(observation, embedding, affiliation, saliency, *,
                      iterations, min_concentration, max_concentration,
                      hermitize, covariance_norm, eigenvalue_floor,
                      affiliation_eps, weight_constant_axis,
                      spatial_weight, spectral_weight,
                      inline_permutation_alignment,
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
        # NOTE: like the reference (vmfcacgmm.py:280-284) the vMF
        # M-step runs on the *raw* embedding (``_fit`` assumes unit
        # norm; the resulting resultant length r_bar reflects the
        # embedding magnitudes) — kept for exact semantic parity.
        vmf = VonMisesFisherTrainer()._fit(
            y=embedding_,
            saliency=masked_affiliation_,
            min_concentration=min_concentration,
            max_concentration=max_concentration,
        )
        cacg = ComplexAngularCentralGaussianTrainer()._fit(
            y=jnp.swapaxes(observation[..., None, :, :], -1, -2),
            saliency=masked_affiliation,
            quadratic_form=quadratic_form,
            hermitize=hermitize,
            covariance_norm=covariance_norm,
            eigenvalue_floor=eigenvalue_floor,
        )
        return VMFCACGMM(
            weight=weight,
            vmf=vmf,
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
        # WHOLE-FIT single-launch kernel: every E-step, cACG M-step
        # (warm Jacobi) and spectral M-step ([Banerjee2005] + logC
        # table) runs inside ONE Pallas launch; only the initial
        # M-step (above) and the final spectral finish (below, from
        # the returned accumulator rows) are XLA.
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

        def to_bins(x):
            return jnp.reshape(x, (fold * F,) + x.shape[len(batch) + 1:])

        def from_bins(x):
            return jnp.reshape(x, (*batch, F) + x.shape[1:])

        def spec_cols(x):  # (*batch, K[, E]) -> rows over (fold,)
            x = jnp.reshape(x, (fold,) + x.shape[len(batch):])
            if x.ndim == 3:  # (fold, K, E) -> (E*K, fold), e-major
                return jnp.reshape(
                    jnp.transpose(x, (2, 1, 0)), (E * K, fold))
            return jnp.transpose(x)  # (K, fold)

        spec0 = jnp.concatenate([
            spec_cols(model.vmf.mean),
            spec_cols(model.vmf.concentration),
            spec_cols(model.vmf.log_norm()),
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
            min_concentration=min_concentration,
            max_concentration=max_concentration,
            spectral_mode='vmf',
            interpret=jax.default_backend() == 'cpu')
        # spectral finish of the last E-step's statistics (exactly the
        # fused_step XLA closed form)
        r = jnp.transpose(
            jnp.reshape(acc[:E * K], (E, K, fold)), (2, 1, 0))
        n = jnp.transpose(acc[E * K:])  # (fold, K)
        norm = jnp.linalg.norm(r, axis=-1)
        mean = r / jnp.maximum(norm, tiny)[..., None]
        r_bar = norm / jnp.maximum(n, tiny)
        concentration = jnp.clip(
            (r_bar * E - r_bar ** 3) / (1 - r_bar ** 2),
            min_concentration, max_concentration)

        def spec_shape(x):  # (fold, K[, E]) -> (*batch, K[, E])
            return jnp.reshape(x, tuple(batch) + x.shape[1:])

        return VMFCACGMM(
            weight=from_bins(weight),
            vmf=VonMisesFisher(
                mean=spec_shape(mean),
                concentration=spec_shape(concentration)),
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
        # leading batch axes fold into the (independent) bin axis;
        # each utterance's global spectral state rides along as
        # per-lane columns and the resultants un-fold per utterance
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

        def to_bins(x):
            # (*batch, F, ...) -> (fold*F, ...)
            return jnp.reshape(x, (fold * F,) + x.shape[len(batch) + 1:])

        def spectral_to_bins(x):
            # (*batch, K[, E]) -> broadcast over F -> (fold*F, K[, E])
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
            # (Pallas Jacobi eigh, Banerjee closed form) stays in XLA.
            eigenvalues = model.cacg.covariance_eigenvalues
            scatter, asum, r = e_stats_staged(
                *staged,
                to_bins(model.cacg.covariance_eigenvectors.real),
                to_bins(model.cacg.covariance_eigenvectors.imag),
                to_bins(1. / eigenvalues),
                to_bins(jnp.sum(jnp.log(eigenvalues), axis=-1)),
                to_bins(model.weight),
                spectral_to_bins(model.vmf.mean),
                spectral_to_bins(model.vmf.concentration),
                spectral_to_bins(model.vmf.log_norm()),
                sal_s,
                f_real=fold * F, t_real=T,
                spatial_weight=spatial_weight,
                spectral_weight=spectral_weight,
                affiliation_eps=affiliation_eps,
                tile_f=tile_f, interpret=interpret)
            scatter = from_bins(scatter)  # (*batch, F, K, D, D)
            asum = from_bins(asum)  # (*batch, F, K)
            r = jnp.sum(from_bins(r), axis=-3)  # (*batch, K, E)
            tiny = jnp.finfo(f32).tiny
            # weight M-step (reference gcacgmm.py:287-295 for (-1,))
            weight = asum / jnp.maximum(
                jnp.sum(asum, axis=-1, keepdims=True), tiny)
            # vMF M-step, [Banerjee2005] closed form on the summed
            # resultants (reference von_mises_fisher.py:122-144)
            norm = jnp.linalg.norm(r, axis=-1)
            mean = r / jnp.maximum(norm, tiny)[..., None]
            r_bar = norm / jnp.maximum(jnp.sum(asum, axis=-2), tiny)
            concentration = jnp.clip(
                (r_bar * E - r_bar ** 3) / (1 - r_bar ** 2),
                min_concentration, max_concentration)
            # cACG M-step: scatter is built hermitian in-kernel
            covariance = D * scatter / jnp.maximum(
                asum, tiny)[..., None, None].astype(scatter.dtype)
            cacg = ComplexAngularCentralGaussian.from_covariance(
                covariance,
                eigenvalue_floor=eigenvalue_floor,
                covariance_norm=covariance_norm,
            )
            return VMFCACGMM(
                weight=weight,
                vmf=VonMisesFisher(
                    mean=mean, concentration=concentration),
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
