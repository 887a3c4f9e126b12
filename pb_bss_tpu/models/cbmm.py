"""Complex Bingham mixture model.

Capability parity with ``pb_bss/distribution/cbmm.py`` (predict with
``affiliation_eps`` :21-55, EM trainer :58-237); the per-(F,K) moment
inversion of the M-step runs as the batched Newton of
:func:`pb_bss_tpu.models.complex_bingham.find_eigenvalues` inside the
shared jitted EM loop.
"""
from __future__ import annotations

import functools
from operator import xor

import jax
import jax.numpy as jnp
import numpy as np

from ._em import run_em
from .._dtypes import real_dtype as _real_dtype
from .base import Model, modelclass
from .complex_bingham import (
    ComplexBingham,
    ComplexBinghamTrainer,
    normalize_observation,
)
from .mixture_model_utils import (
    estimate_mixture_weight,
    log_pdf_to_affiliation,
)

__all__ = ['CBMM', 'CBMMTrainer']


@functools.partial(jax.jit, static_argnames=('affiliation_eps',))
def _cbmm_predict_jit(model, y, *, affiliation_eps):
    return model._predict(
        normalize_observation(y), affiliation_eps=affiliation_eps)


@modelclass
class CBMM(Model):
    weight: jnp.ndarray = None  # (..., K, 1)
    complex_bingham: ComplexBingham = None

    def predict(self, y, affiliation_eps=0):
        """y: (..., N, D) complex -> affiliations (..., K, N)."""
        y = jnp.asarray(y)
        assert jnp.iscomplexobj(y), y.dtype
        return _cbmm_predict_jit(
            self, y, affiliation_eps=float(affiliation_eps))

    def _predict(self, y, affiliation_eps):
        return log_pdf_to_affiliation(
            self.weight,
            self.complex_bingham.log_pdf(y[..., None, :, :]),
            source_activity_mask=None,
            affiliation_eps=affiliation_eps,
        )


def _fit_fused_cbmm(y, affiliation, *, iterations, affiliation_eps,
                    spacing_eps, saliency=None,
                    max_concentration=np.inf,
                    return_affiliation=False):
    """Whole-fit fast path: ONE Pallas kernel launch runs every CBMM
    EM iteration with the observation tile resident in VMEM (see
    ops/pallas_cbmm_loop.py). The kernel's final unclipped E-step
    equals ``model.predict(y)``, so ``fit_predict`` gets its
    affiliations for free."""
    from ..ops.pallas_cbmm_loop import cbmm_em_full

    y_t = jnp.swapaxes(y, -2, -1)  # (..., D, T) planes
    if saliency is not None:
        saliency = jnp.broadcast_to(
            jnp.asarray(saliency, jnp.float32),
            (*y.shape[:-2], y.shape[-2]))
    weight, eigenvalues, vectors, _, aff = cbmm_em_full(
        y_t.real, y_t.imag, affiliation.astype(jnp.float32),
        iterations=int(iterations),
        spacing_eps=float(spacing_eps),
        affiliation_eps=float(affiliation_eps),
        interpret=jax.default_backend() == 'cpu',
        saliency=saliency,
        max_concentration=(float(max_concentration)
                           if np.isfinite(max_concentration)
                           else np.inf),
    )
    fitted = CBMM(
        weight=weight[..., None],
        complex_bingham=ComplexBingham(
            covariance_eigenvectors=vectors,
            covariance_eigenvalues=eigenvalues,
        ),
    )
    if return_affiliation:
        return fitted, aff
    return fitted


class CBMMTrainer:
    def __init__(self, dimension=None, max_concentration=np.inf,
                 eigenvalue_eps=1e-8):
        """Bingham fitting is float64-sensitive; run under x64
        (reference cbmm.py:58-77)."""
        self.dimension = dimension
        self.max_concentration = max_concentration
        self.eigenvalue_eps = eigenvalue_eps

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
    ) -> CBMM:
        """EM for CBMMs with any number of independent dimensions
        (reference cbmm.py:79-146).

        ``use_fused_em``: run the WHOLE EM loop as one Pallas kernel
        (ops/pallas_cbmm_loop.py — in-kernel scatter/eigh/chord
        moment inversion/log-norm/E-step). ``'auto'`` (default)
        enables it on non-CPU backends for c64 (F, N, D) inputs when
        the knobs are supported (saliency and a finite
        ``max_concentration`` are handled in-kernel; inline PA and
        non-per-bin weight axes fall back to the scan path); ``True``
        forces it (interpret mode on CPU, slow — for tests; the
        kernel computes in f32, so c128 observations are downcast);
        ``False`` keeps the scan path."""
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
        # (cacgmm.py:249-250): a (F, D, T) layout mistake puts T in
        # the channel slot and the Bingham log-norm cascade is
        # O(D^2) per bin — fail fast instead of compiling a
        # hundreds-of-GB program.
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

        user_saliency = saliency
        if saliency is None:
            saliency = jnp.ones_like(initialization[..., 0, :])

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

        from ..ops.pallas_cbmm_loop import choose_tile_f_cbmm
        from ..ops.pallas_mm_stream import choose_tiles_mm

        def _whole_fit_feasible():
            return bool(choose_tile_f_cbmm(
                y.shape[-1], initialization.shape[-2],
                -(-y.shape[-2] // 8) * 8,
                has_sal=user_saliency is not None))

        def _stream_feasible():
            return bool(choose_tiles_mm(
                y.shape[-1], initialization.shape[-2],
                family='bingham',
                has_sal=user_saliency is not None)[1])

        wca_per_bin = weight_constant_axis in ((-1,), -1)
        wca_fc = weight_constant_axis in ((-3, -1), (-1, -3))
        if use_fused_em == 'auto':
            use_fused_em = (
                jax.default_backend() != 'cpu'
                and y.ndim in (3, 4)
                and y.dtype == jnp.dtype(jnp.complex64)
                and 2 <= y.shape[-1] <= 8
                and inline_permutation_aligner is None
                and (wca_per_bin or wca_fc)
                and ((wca_per_bin and _whole_fit_feasible())
                     or _stream_feasible())
            )
        if use_fused_em:
            # The kernels implement only the supported knobs — forcing
            # them with unsupported ones would silently fit a different
            # model (no inline PA).
            assert inline_permutation_aligner is None and (
                wca_per_bin or wca_fc), (
                'use_fused_em=True requires '
                'inline_permutation_aligner=None and '
                'weight_constant_axis=(-1,) or (-3, -1); got '
                f'{inline_permutation_aligner=}, '
                f'{weight_constant_axis=}'
            )
            if wca_per_bin and _whole_fit_feasible():
                return _fit_fused_cbmm(
                    y, initialization,
                    iterations=int(iterations),
                    affiliation_eps=float(affiliation_eps),
                    # the reference's 1e-8 spacing is sub-ulp at f32
                    # concentration scale; the kernel needs >= 1e-3
                    spacing_eps=max(float(self.eigenvalue_eps), 1e-3),
                    saliency=user_saliency,
                    max_concentration=self.max_concentration,
                    return_affiliation=_return_affiliation,
                )
            # long T and/or frequency-constant weights: streamed
            # per-iteration kernel (frequency tiles x time blocks;
            # ops/pallas_mm_stream.py). The M finish (eigh + warm
            # chord-Newton moment inversion) is the scan path's own
            # XLA code, so parity is with the scan path.
            from ..ops.pallas_mm_stream import cbmm_em_long
            y_t = jnp.swapaxes(y, -2, -1)  # (..., D, T) planes
            fused_saliency = user_saliency
            if fused_saliency is not None:
                fused_saliency = jnp.broadcast_to(
                    jnp.asarray(fused_saliency, jnp.float32),
                    (*y.shape[:-2], y.shape[-2]))
            weight, eigenvalues, vectors = cbmm_em_long(
                y_t.real, y_t.imag,
                jnp.asarray(initialization, jnp.float32),
                iterations=int(iterations),
                max_concentration=(
                    float(self.max_concentration)
                    if np.isfinite(self.max_concentration)
                    else np.inf),
                spacing_eps=(None if self.eigenvalue_eps is None
                             else float(self.eigenvalue_eps)),
                affiliation_eps=float(affiliation_eps),
                weight_mode='per_bin' if wca_per_bin else 'fc',
                interpret=jax.default_backend() == 'cpu',
                saliency=fused_saliency,
            )
            # estimate_mixture_weight keepdims shapes
            weight = (weight[..., None] if wca_per_bin
                      else weight[..., None, :, None])
            fitted = CBMM(
                weight=weight,
                complex_bingham=ComplexBingham(
                    covariance_eigenvectors=vectors,
                    covariance_eigenvalues=eigenvalues,
                ),
            )
            if _return_affiliation:
                return fitted, fitted._predict(y, affiliation_eps=0.)
            return fitted

        fitted = _cbmm_fit_em(
            y, initialization, saliency,
            iterations=int(iterations),
            weight_constant_axis=weight_constant_axis,
            affiliation_eps=float(affiliation_eps),
            max_concentration=float(self.max_concentration)
            if np.isfinite(self.max_concentration) else np.inf,
            eigenvalue_eps=float(self.eigenvalue_eps),
            aligner=inline_permutation_aligner,
        )
        if _return_affiliation:
            return fitted, fitted._predict(
                y, affiliation_eps=0.)
        return fitted

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
        """Fit a model, then return the posterior affiliations (on
        the fused-kernel path these come from the kernel's final
        unclipped E-step for free)."""
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
        'iterations', 'weight_constant_axis', 'affiliation_eps',
        'max_concentration', 'eigenvalue_eps', 'aligner'),
)
def _cbmm_fit_em(y, affiliation, saliency, *, iterations,
                 weight_constant_axis, affiliation_eps,
                 max_concentration, eigenvalue_eps, aligner):
    trainer = ComplexBinghamTrainer(
        dimension=y.shape[-1],
        max_concentration=max_concentration,
        eignevalue_eps=eigenvalue_eps,
    )

    def m_step(affiliation, previous_model):
        weight = estimate_mixture_weight(
            affiliation=affiliation,
            saliency=saliency,
            weight_constant_axis=weight_constant_axis,
        )
        # warm-start the inverse-moment Newton from the previous EM
        # iteration's Bingham eigenvalues: the moments move little
        # between iterations, so 16 chord steps (one residual
        # evaluation each, shared Jacobian) match the cold solver's
        # 50 damped exact-Newton steps (the first M-step stays cold)
        complex_bingham = trainer._fit(
            y=y[..., None, :, :],
            saliency=affiliation * saliency[..., None, :],
            warm_start=(
                None if previous_model is None
                else previous_model.complex_bingham
                .covariance_eigenvalues),
            solver_iterations=(
                None if previous_model is None else 16),
        )
        return CBMM(weight=weight, complex_bingham=complex_bingham)

    return run_em(
        affiliation=affiliation,
        iterations=iterations,
        m_step=m_step,
        e_step=lambda model: model._predict(
            y, affiliation_eps=affiliation_eps),
        aligner=aligner,
        weight_constant_axis=weight_constant_axis,
    )
