"""Complex Watson mixture model.

Capability parity with ``pb_bss/distribution/cwmm.py`` (predict :21-52,
EM trainer with inline permutation alignment :55-240); the EM loop is
the shared jitted ``lax.scan`` engine.
"""
from __future__ import annotations

import functools
from operator import xor

import jax
import jax.numpy as jnp

from ._em import run_em
from .._dtypes import real_dtype as _real_dtype
from .base import Model, modelclass
from .complex_watson import (
    ComplexWatson,
    ComplexWatsonTrainer,
    normalize_observation,
)
from .mixture_model_utils import (
    estimate_mixture_weight,
    log_pdf_to_affiliation,
)

__all__ = ['CWMM', 'CWMMTrainer']


@jax.jit
def _cwmm_predict_jit(model, y):
    return model._predict(normalize_observation(y))


@modelclass
class CWMM(Model):
    weight: jnp.ndarray = None  # (..., K, 1)
    complex_watson: ComplexWatson = None

    def predict(self, y):
        """y: (..., N, D) complex -> affiliations (..., K, N)."""
        y = jnp.asarray(y)
        assert jnp.iscomplexobj(y), y.dtype
        return _cwmm_predict_jit(self, y)

    def _predict(self, y):
        return log_pdf_to_affiliation(
            self.weight,
            self.complex_watson.log_pdf(y[..., None, :, :]),
            source_activity_mask=None,
            affiliation_eps=0.,
        )


class CWMMTrainer:
    def __init__(self, dimension=None, max_concentration=500,
                 spline_markers=1000):
        """
        Args:
            dimension: feature dimension (inferred at fit if None).
            max_concentration: 500 is stable for dimension <= 60
                (reference cwmm.py:61-70).
            spline_markers: concentration lookup-table resolution.
        """
        self.dimension = dimension
        self.max_concentration = max_concentration
        self.spline_markers = spline_markers
        self._watson_trainer = None

    @property
    def complex_watson_trainer(self):
        if self._watson_trainer is None:
            self._watson_trainer = ComplexWatsonTrainer(
                self.dimension,
                max_concentration=self.max_concentration,
                spline_markers=self.spline_markers,
            )
        return self._watson_trainer

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
            affiliation_eps=0,
            inline_permutation_aligner=None,
            use_fused_em='auto',
            _return_affiliation=False,
    ) -> CWMM:
        """EM for CWMMs with any number of independent dimensions
        (reference cwmm.py:76-150).

        ``use_fused_em``: run the whole loop as one Pallas kernel
        (ops/pallas_cwmm_loop.py). ``'auto'`` enables it on non-CPU
        backends for c64 (F, N, D) inputs when the knobs are supported
        (saliency is handled in-kernel; inline PA and non-per-bin
        weight axes fall back to the scan path); the concentration
        inverse then uses a uniform-grid linear table (~1e-3 relative
        vs the scan path's log-spaced table — quality-equivalent)."""
        assert xor(initialization is None, num_classes is None), (
            'Provide either `initialization` or `num_classes` — not '
            'both and not neither. Got initialization is None: '
            f'{initialization is None}, num_classes is None: '
            f'{num_classes is None}.'
        )
        y = jnp.asarray(y)
        assert jnp.iscomplexobj(y), y.dtype
        assert y.shape[-1] > 1
        # Plausibility guard in the spirit of the reference's cACGMM
        # (cacgmm.py:249-250): catches (F, D, T)-layout mistakes that
        # would otherwise compile a huge per-bin program.
        assert y.shape[-1] < 35, f'Channels: {y.shape[-1]}, sure?'
        y = normalize_observation(y)

        if initialization is None and num_classes is not None:
            *independent, num_observations, _ = y.shape
            if key is None:
                key = jax.random.key(0)
            affiliation_shape = (
                *independent, num_classes, num_observations)
            initialization = jax.random.uniform(
                key, affiliation_shape, _real_dtype(y))
            initialization = initialization / jnp.einsum(
                '...kn->...n', initialization)[..., None, :]
        initialization = jnp.asarray(initialization)

        if self.dimension is None:
            self.dimension = y.shape[-1]
        else:
            assert self.dimension == y.shape[-1], (
                'You initialized the trainer with a different dimension '
                'than you are using to fit a model. Use a new trainer, '
                'when you change the dimension.'
            )
        if isinstance(weight_constant_axis, list):
            weight_constant_axis = tuple(weight_constant_axis)
        assert affiliation_eps == 0, affiliation_eps

        from ..ops.pallas_cwmm_loop import choose_tile_f_cwmm
        from ..ops.pallas_mm_stream import choose_tiles_mm

        def _whole_fit_feasible():
            return bool(choose_tile_f_cwmm(
                y.shape[-1], initialization.shape[-2],
                -(-y.shape[-2] // 8) * 8,
                has_sal=saliency is not None))

        def _stream_feasible():
            return bool(choose_tiles_mm(
                y.shape[-1], initialization.shape[-2],
                family='watson', has_sal=saliency is not None)[1])

        wca_per_bin = weight_constant_axis in ((-1,), -1)
        wca_fc = weight_constant_axis in ((-3, -1), (-1, -3))
        if use_fused_em == 'auto':
            use_fused_em = (
                jax.default_backend() != 'cpu'
                and y.ndim in (3, 4)
                and y.dtype == jnp.dtype(jnp.complex64)
                and y.shape[-1] <= 16
                and inline_permutation_aligner is None
                and (wca_per_bin or wca_fc)
                and ((wca_per_bin and _whole_fit_feasible())
                     or _stream_feasible())
            )
        if use_fused_em:
            assert y.ndim in (3, 4)
            assert inline_permutation_aligner is None
            assert wca_per_bin or wca_fc, weight_constant_axis
            y_dt = jnp.swapaxes(y, -2, -1)  # (F, D, T)
            fused_saliency = saliency
            if fused_saliency is not None:
                fused_saliency = jnp.broadcast_to(
                    jnp.asarray(fused_saliency, _real_dtype(y)),
                    (*y.shape[:-2], y.shape[-2]))
            if wca_per_bin and _whole_fit_feasible():
                from ..ops.pallas_cwmm_loop import cwmm_em_full
                weight, mode, concentration, affiliation = cwmm_em_full(
                    y_dt.real, y_dt.imag,
                    jnp.asarray(initialization, jnp.float32),
                    iterations=int(iterations),
                    # warm-started Jacobi (see pallas_em_loop): 2
                    # sweeps from the previous eigenbasis, first
                    # iteration cold
                    warm_sweeps=2,
                    max_concentration=float(self.max_concentration),
                    interpret=jax.default_backend() == 'cpu',
                    saliency=fused_saliency,
                )
                weight = weight[..., None]
            else:
                # long T and/or frequency-constant weights: streamed
                # per-iteration kernel (frequency tiles x time
                # blocks; ops/pallas_mm_stream.py). Its concentration
                # inverse is the scan path's log-spaced interp table,
                # so parity is with the scan path.
                from ..ops.pallas_mm_stream import cwmm_em_long
                weight, mode, concentration = cwmm_em_long(
                    y_dt.real, y_dt.imag,
                    jnp.asarray(initialization, jnp.float32),
                    iterations=int(iterations),
                    max_concentration=float(self.max_concentration),
                    spline_markers=int(self.spline_markers),
                    weight_mode='per_bin' if wca_per_bin else 'fc',
                    interpret=jax.default_backend() == 'cpu',
                    saliency=fused_saliency,
                )
                # estimate_mixture_weight keepdims shapes
                weight = (weight[..., None] if wca_per_bin
                          else weight[..., None, :, None])
                affiliation = None
            model = CWMM(
                weight=weight,
                complex_watson=ComplexWatson(
                    mode=mode, concentration=concentration),
            )
            if _return_affiliation:
                if affiliation is None:
                    affiliation = _cwmm_predict_jit(model, y)
                return model, affiliation
            return model

        if saliency is None:
            saliency = jnp.ones_like(initialization[..., 0, :])

        # Materialize the concentration lookup table (host) before
        # tracing so it is a constant inside the compiled loop.
        _ = self.complex_watson_trainer.grid

        model = _cwmm_fit_em(
            y, initialization, saliency,
            watson_trainer=self.complex_watson_trainer,
            iterations=int(iterations),
            weight_constant_axis=weight_constant_axis,
            aligner=inline_permutation_aligner,
        )
        if _return_affiliation:
            return model, _cwmm_predict_jit(model, y)
        return model

    def fit_predict(
            self,
            y,
            initialization=None,
            num_classes=None,
            iterations=100,
            *,
            key=None,
            saliency=None,
            weight_constant_axis=(-1,),
            affiliation_eps=0,
            inline_permutation_aligner=None,
            use_fused_em='auto',
    ):
        """Fit a model, then return the posterior affiliations (from
        the fused kernel's final E-step when it runs)."""
        _, affiliation = self.fit(
            y=y,
            initialization=initialization,
            num_classes=num_classes,
            iterations=iterations,
            key=key,
            saliency=saliency,
            weight_constant_axis=weight_constant_axis,
            affiliation_eps=affiliation_eps,
            inline_permutation_aligner=inline_permutation_aligner,
            use_fused_em=use_fused_em,
            _return_affiliation=True,
        )
        return affiliation


@functools.partial(
    jax.jit,
    static_argnames=(
        'watson_trainer', 'iterations', 'weight_constant_axis', 'aligner'),
)
def _cwmm_fit_em(y, affiliation, saliency, *, watson_trainer, iterations,
                 weight_constant_axis, aligner):
    def m_step(affiliation):
        weight = estimate_mixture_weight(
            affiliation=affiliation,
            saliency=saliency,
            weight_constant_axis=weight_constant_axis,
        )
        complex_watson = watson_trainer._fit(
            y=y[..., None, :, :],
            saliency=affiliation * saliency[..., None, :],
        )
        return CWMM(weight=weight, complex_watson=complex_watson)

    return run_em(
        affiliation=affiliation,
        iterations=iterations,
        m_step=m_step,
        e_step=lambda model: model._predict(y),
        aligner=aligner,
        weight_constant_axis=weight_constant_axis,
    )
