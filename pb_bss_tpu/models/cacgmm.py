"""cACGMM — the flagship spatial mixture model.

Capability parity with reference ``pb_bss/distribution/cacgmm.py``
(predict :64-95, log_likelihood :97-138, trainer with all three init
modes, saliency/source-activity-mask/weight_constant_axis knobs and
optional inline permutation alignment :141-345).

TPU-first realization: the whole EM loop is a single jitted program —
one ``lax.scan`` over iterations whose carry is the model pytree. Each
iteration is (E-step: batched quadratic-form matmul + posterior; M-step:
batched scatter matmul + Jacobi eigh). The independent frequency axis
broadcasts through every op, so sharding y over a device mesh
data-parallelizes the whole loop (weights with a frequency-constant
``weight_constant_axis`` induce the only cross-shard reduction, which
XLA lowers to a psum over ICI).
"""
from __future__ import annotations

import functools
from operator import xor

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .base import Model, force_hermitian, modelclass
from .complex_angular_central_gaussian import (
    ComplexAngularCentralGaussian,
    ComplexAngularCentralGaussianTrainer,
    normalize_observation,
)
from .mixture_model_utils import (
    apply_inline_permutation_alignment,
    estimate_mixture_weight,
    log_pdf_to_affiliation,
)

__all__ = ['CACGMM', 'CACGMMTrainer', 'sample_cacgmm']


from .._dtypes import real_dtype as _real_dtype, tiny as _tiny
from ._precision import em_matmul_precision


def sample_cacgmm(size, weight, covariance, return_label=False, key=None):
    """Draw samples from a cACG mixture; explicit PRNG key."""
    weight = np.asarray(weight)
    assert weight.ndim == 1, weight
    assert isinstance(size, int), size
    covariance = jnp.asarray(covariance)
    assert covariance.ndim == 3, covariance.shape
    num_classes, = weight.shape
    D = covariance.shape[-1]
    assert covariance.shape == (num_classes, D, D), (
        covariance.shape, num_classes, D)

    if key is None:
        key = jax.random.key(0)
    key_label, *keys = jax.random.split(key, num_classes + 1)
    labels = jax.random.choice(
        key_label, num_classes, shape=(size,),
        p=jnp.asarray(weight, jnp.float32))

    from .complex_angular_central_gaussian import (
        sample_complex_angular_central_gaussian,
    )
    # Sample every class for every slot, select by label (static shapes).
    samples = jnp.stack([
        sample_complex_angular_central_gaussian(
            (size,),
            ComplexAngularCentralGaussian.from_covariance(
                covariance=covariance[k]).covariance,
            key=keys[k],
        )
        for k in range(num_classes)
    ])  # (K, size, D)
    x = jnp.take_along_axis(samples, labels[None, :, None], axis=0)[0]
    if return_label:
        return x, labels
    return x


@modelclass
class CACGMM(Model):
    weight: jnp.ndarray = None  # (..., K, 1) or 1/K etc.
    cacg: ComplexAngularCentralGaussian = None

    def predict(self, y, return_quadratic_form=False,
                source_activity_mask=None):
        """y: (..., N, D) complex observations."""
        y = jnp.asarray(y)
        assert jnp.iscomplexobj(y), y.dtype
        affiliation, quadratic_form = _cacgmm_predict_jit(
            self, y, source_activity_mask)
        if return_quadratic_form:
            return affiliation, quadratic_form
        return affiliation

    def _predict(self, y, source_activity_mask=None, affiliation_eps=0.):
        """Internal E-step; y in time-last layout (..., D, N).

        Returns (affiliation (..., K, N), quadratic_form, log_pdf).
        """
        log_pdf, quadratic_form = self.cacg._log_pdf(y[..., None, :, :])
        affiliation = log_pdf_to_affiliation(
            self.weight,
            log_pdf,
            source_activity_mask=source_activity_mask,
            affiliation_eps=affiliation_eps,
        )
        return affiliation, quadratic_form, log_pdf

    def log_likelihood(self, y):
        """Sum log-likelihood over all leading dims and samples."""
        y = jnp.asarray(y)
        assert jnp.iscomplexobj(y), y.dtype
        return _cacgmm_log_likelihood_jit(self, y)


@jax.jit
def _cacgmm_predict_jit(model, y, source_activity_mask=None):
    y = normalize_observation(y)
    affiliation, quadratic_form, _ = model._predict(
        y, source_activity_mask=source_activity_mask)
    return affiliation, quadratic_form


@jax.jit
def _predict_time_last_jit(model, y, source_activity_mask=None):
    """Final E-step on already-normalized time-last observations
    (predict semantics: affiliation_eps=0)."""
    affiliation, quadratic_form, _ = model._predict(
        y, source_activity_mask=source_activity_mask)
    return affiliation, quadratic_form


@jax.jit
def _cacgmm_log_likelihood_jit(model, y):
    y = normalize_observation(y)
    _, _, log_pdf = model._predict(y)
    return jnp.sum(jax.scipy.special.logsumexp(log_pdf, axis=-2))


def _fused_em_eligible(y, num_classes, saliency, source_activity_mask,
                       aligner, weight_constant_axis, hermitize,
                       covariance_norm):
    """Route the fit to the single-kernel Pallas EM loop
    (ops/pallas_em_loop.py)? Only on a non-CPU backend for c64
    (F, D, T) observations with the default knobs the kernel
    implements exactly."""
    from ..ops.pallas_em_loop import choose_tile_f
    return (
        jax.default_backend() != 'cpu'
        # a leading batch axis folds into the (independent) bin axis
        and y.ndim in (3, 4)
        and y.dtype == jnp.dtype(jnp.complex64)
        and y.shape[-2] <= 16
        and _fused_knobs(
            aligner, weight_constant_axis, hermitize, covariance_norm)
        # the whole time axis must fit in VMEM alongside the tile
        and bool(choose_tile_f(
            y.shape[-2], num_classes, -(-y.shape[-1] // 8) * 8,
            has_sal=saliency is not None,
            has_mask=source_activity_mask is not None))
    )


def _fit_fused(y, model, affiliation, quadratic_form, *, iterations,
               eigenvalue_floor, affiliation_eps, eigh_sweeps,
               saliency=None, source_activity_mask=None,
               return_affiliation=False):
    """Whole-fit fast path: ONE Pallas kernel launch runs every EM
    iteration with the observation tile resident in VMEM (see
    ops/pallas_em_loop.py). Same trajectory semantics as the scan
    path: ``iterations`` M-steps, E-step between them; the kernel's
    final (unclipped) E-step equals ``model.predict(y)``, so
    ``fit_predict`` gets its affiliations for free."""
    from ..ops.pallas_em_loop import cacgmm_em_full

    if model is not None:
        affiliation, quadratic_form, _ = model._predict(
            y, source_activity_mask=source_activity_mask,
            affiliation_eps=affiliation_eps)
    D = y.shape[-2]
    if saliency is not None:
        saliency = jnp.broadcast_to(
            jnp.asarray(saliency, _real_dtype(y)),
            (*y.shape[:-2], y.shape[-1]))
    if source_activity_mask is not None:
        source_activity_mask = jnp.broadcast_to(
            jnp.asarray(source_activity_mask, _real_dtype(y)),
            affiliation.shape)
    sweeps = eigh_sweeps if eigh_sweeps is not None else (
        6 if D <= 8 else 8)
    weight, eigenvalues, eigenvectors, affiliation = cacgmm_em_full(
        y.real, y.imag, affiliation, quadratic_form,
        iterations=iterations, sweeps=sweeps,
        # warm-started Jacobi: rotate each scatter into the previous
        # iteration's eigenbasis, 2 sweeps suffice (quality-equivalent
        # to cold 6 sweeps, measured; first iteration stays cold)
        warm_sweeps=2,
        eigenvalue_floor=eigenvalue_floor,
        affiliation_eps=affiliation_eps,
        interpret=jax.default_backend() == 'cpu',
        saliency=saliency,
        source_activity_mask=source_activity_mask,
    )
    fitted = CACGMM(
        weight=weight[..., None],
        cacg=ComplexAngularCentralGaussian(
            covariance_eigenvectors=eigenvectors,
            covariance_eigenvalues=eigenvalues,
        ),
    )
    if return_affiliation:
        return fitted, affiliation
    return fitted


T_BLOCK_AUTO_THRESHOLD = 8192
T_BLOCK_AUTO = 2048


def _fused_knobs(aligner, weight_constant_axis, hermitize,
                 covariance_norm):
    """Knobs the whole-fit kernel implements (it supports saliency and
    source-activity masks natively; inline PA couples bins globally
    and stays on the scan path; frequency-constant weights get their
    own per-iteration-fused path, ``_fused_fc_knobs``)."""
    return (
        aligner is None
        and weight_constant_axis in ((-1,), -1)
        and hermitize
        and covariance_norm == 'eigenvalue'
    )


def _fused_fc_knobs(aligner, weight_constant_axis, hermitize,
                    covariance_norm, *, allow_aligner=False):
    """Knobs of the FREQUENCY-CONSTANT-weight fused path
    (ops/pallas_em_step.py): each iteration is one kernel pass plus
    one XLA weight reduction over the bin axis (a psum under a
    sharded 'f' mesh axis). Since r5 the per-iteration architecture
    also hosts the inline permutation aligner (``allow_aligner``,
    unbatched only — the kernel emits the posterior, the mapping
    permutes the per-class state between kernel calls); the streamed
    long-T variant does not."""
    return (
        (aligner is None or allow_aligner)
        and weight_constant_axis in ((-3, -1), (-1, -3))
        and hermitize
        and covariance_norm == 'eigenvalue'
    )


def _fc_init_weight(model, y_ndim):
    """Extract the global per-class weight from a model for the
    fc-fused resume path: (K,) (or (B, K) for batched input) when the
    model's weight is frequency-constant, else None (per-bin weights
    fall back to the scan path)."""
    w = jnp.asarray(model.weight)
    if w.ndim < 2 or w.shape[-1] != 1:
        return None
    batched = y_ndim == 4
    squeezed = w[..., 0]                       # drop the T axis
    lead = squeezed.shape[:-1]
    if batched:
        if all(n == 1 for n in lead):          # (K,), (1, K), (1, 1, K)
            return squeezed.reshape(1, -1)     # broadcast over B
        if len(lead) == 2 and lead[-1] == 1:
            return squeezed[:, 0, :]           # (B, 1, K) -> (B, K)
        return None
    if all(n == 1 for n in lead):
        return squeezed.reshape(-1)            # (K,)
    return None


def _fused_em_fc_eligible(y, num_classes, saliency,
                          source_activity_mask, aligner,
                          weight_constant_axis, hermitize,
                          covariance_norm, model):
    """Route the fit to the per-iteration-fused fc-EM
    (ops/pallas_em_step.py)? Same runtime gates as the whole-fit
    kernel, plus a model init must carry a frequency-constant weight.
    An inline aligner is hosted too (unbatched input only)."""
    from ..ops.pallas_em_step import choose_tile_f
    return (
        jax.default_backend() != 'cpu'
        and y.ndim in (3, 4)
        and y.dtype == jnp.dtype(jnp.complex64)
        and y.shape[-2] <= 16
        and _fused_fc_knobs(
            aligner, weight_constant_axis, hermitize, covariance_norm,
            allow_aligner=y.ndim == 3)
        and (model is None or _fc_init_weight(model, y.ndim) is not None)
        and bool(choose_tile_f(
            y.shape[-2], num_classes, -(-y.shape[-1] // 8) * 8,
            has_sal=saliency is not None,
            has_mask=source_activity_mask is not None,
            has_aligner=aligner is not None))
    )


def _stream_feasible(y, num_classes, saliency, source_activity_mask):
    """Shape feasibility of the streamed long-T kernel
    (ops/pallas_em_stream.py)."""
    from ..ops.pallas_em_stream import choose_tiles
    _, tiles_f = choose_tiles(
        y.shape[-2], num_classes,
        has_sal=saliency is not None,
        has_mask=source_activity_mask is not None)
    return y.ndim in (3, 4) and y.shape[-2] <= 16 and bool(tiles_f)


def _fused_em_stream_eligible(y, num_classes, saliency,
                              source_activity_mask, aligner,
                              weight_constant_axis, hermitize,
                              covariance_norm, model):
    """Auto-route long signals to the streamed per-iteration kernel
    when the VMEM-resident kernels cannot take them."""
    per_bin = _fused_knobs(
        aligner, weight_constant_axis, hermitize, covariance_norm)
    fc = _fused_fc_knobs(
        aligner, weight_constant_axis, hermitize, covariance_norm)
    return (
        jax.default_backend() != 'cpu'
        and y.dtype == jnp.dtype(jnp.complex64)
        and (per_bin or fc)
        and (not fc or model is None
             or _fc_init_weight(model, y.ndim) is not None)
        and _stream_feasible(
            y, num_classes, saliency, source_activity_mask)
    )


def _fit_fused_stream(y, model, affiliation, quadratic_form, *,
                      iterations, eigenvalue_floor, affiliation_eps,
                      eigh_sweeps, weight_mode, saliency=None,
                      source_activity_mask=None,
                      return_affiliation=False):
    """Long-T fast path: one streamed Pallas E+stats pass per EM
    iteration (grid over frequency tiles x time blocks, statistics
    accumulated in VMEM, posterior never materialized), M-step finish
    in XLA (ops/pallas_em_stream.py)."""
    from ..ops.pallas_em_stream import cacgmm_em_long

    rdtype = _real_dtype(y)
    *independent, D, T = y.shape
    K = (affiliation.shape[-2] if affiliation is not None
         else model.weight.shape[-2])
    if saliency is not None:
        saliency = jnp.broadcast_to(
            jnp.asarray(saliency, rdtype), (*independent, T))
    if source_activity_mask is not None:
        source_activity_mask = jnp.broadcast_to(
            jnp.asarray(source_activity_mask, rdtype),
            (*independent, K, T))
    common = dict(
        iterations=int(iterations),
        sweeps=None if eigh_sweeps is None else int(eigh_sweeps),
        eigenvalue_floor=float(eigenvalue_floor),
        affiliation_eps=float(affiliation_eps),
        weight_mode=weight_mode,
        interpret=jax.default_backend() == 'cpu',
        saliency=saliency,
        source_activity_mask=source_activity_mask,
    )
    if model is not None:
        if weight_mode == 'per_bin':
            init_weight = jnp.broadcast_to(
                jnp.asarray(model.weight)[..., 0], (*independent, K))
        else:
            init_weight = _fc_init_weight(model, y.ndim)
        w, eigenvalues, eigenvectors = cacgmm_em_long(
            y.real, y.imag, None, None, first_e_step=True,
            init_weight=init_weight,
            init_eigenvalues=model.cacg.covariance_eigenvalues,
            init_eigenvectors=model.cacg.covariance_eigenvectors,
            **common)
    else:
        w, eigenvalues, eigenvectors = cacgmm_em_long(
            y.real, y.imag, affiliation, quadratic_form, **common)
    if weight_mode == 'per_bin':
        weight = w[..., None]                    # (.., F, K, 1)
    else:
        weight = w[..., None, :, None]           # estimate_mixture_weight shape
    fitted = CACGMM(
        weight=weight,
        cacg=ComplexAngularCentralGaussian(
            covariance_eigenvectors=eigenvectors,
            covariance_eigenvalues=eigenvalues,
        ),
    )
    if return_affiliation:
        if source_activity_mask is None and T > T_BLOCK_AUTO:
            affiliation = _predict_time_last_blocked(
                fitted, y, t_block=T_BLOCK_AUTO)
        else:
            affiliation, _ = _predict_time_last_jit(
                fitted, y, source_activity_mask)
        return fitted, affiliation
    return fitted


def _fit_fused_fc(y, model, affiliation, quadratic_form, *, iterations,
                  eigenvalue_floor, affiliation_eps, eigh_sweeps,
                  saliency=None, source_activity_mask=None,
                  return_affiliation=False, aligner=None):
    """Frequency-constant-weight fast path: one fused Pallas pass per
    EM iteration (E-step + M-statistics + warm in-kernel Jacobi), with
    the global weight finished by one XLA reduction over bins between
    kernel calls (ops/pallas_em_step.py). An inline permutation
    aligner runs between kernel calls on the emitted posterior
    (reference cacgmm.py:260-267 semantics)."""
    from ..ops.pallas_em_step import cacgmm_em_fc

    D = y.shape[-2]
    rdtype = _real_dtype(y)
    if saliency is not None:
        saliency = jnp.broadcast_to(
            jnp.asarray(saliency, rdtype),
            (*y.shape[:-2], y.shape[-1]))
    if source_activity_mask is not None:
        source_activity_mask = jnp.broadcast_to(
            jnp.asarray(source_activity_mask, rdtype),
            (*y.shape[:-2],
             affiliation.shape[-2] if affiliation is not None
             else model.weight.shape[-2],
             y.shape[-1]))
    sweeps = eigh_sweeps if eigh_sweeps is not None else (
        6 if D <= 8 else 8)
    common = dict(
        iterations=int(iterations), sweeps=sweeps, warm_sweeps=2,
        eigenvalue_floor=float(eigenvalue_floor),
        affiliation_eps=float(affiliation_eps),
        interpret=jax.default_backend() == 'cpu',
        saliency=saliency, source_activity_mask=source_activity_mask,
        aligner=aligner,
    )
    if model is not None:
        w, eigenvalues, eigenvectors = cacgmm_em_fc(
            y.real, y.imag, None, None, first_e_step=True,
            init_weight=_fc_init_weight(model, y.ndim),
            init_eigenvalues=model.cacg.covariance_eigenvalues,
            init_eigenvectors=model.cacg.covariance_eigenvectors,
            **common)
    else:
        w, eigenvalues, eigenvectors = cacgmm_em_fc(
            y.real, y.imag, affiliation, quadratic_form, **common)
    # estimate_mixture_weight keepdims shape for axes (-3, -1):
    # (K,) -> (1, K, 1); (B, K) -> (B, 1, K, 1).
    weight = w[..., None, :, None]
    fitted = CACGMM(
        weight=weight,
        cacg=ComplexAngularCentralGaussian(
            covariance_eigenvectors=eigenvectors,
            covariance_eigenvalues=eigenvalues,
        ),
    )
    if return_affiliation:
        affiliation, _ = _predict_time_last_jit(
            fitted, y, source_activity_mask)
        return fitted, affiliation
    return fitted


def _standard_knobs(saliency, source_activity_mask, aligner,
                    weight_constant_axis, hermitize, covariance_norm):
    return (
        saliency is None
        and source_activity_mask is None
        and _fused_knobs(
            aligner, weight_constant_axis, hermitize, covariance_norm)
    )


def _t_blocks(x, t_block, pad_value=0.0):
    """(..., C, T) -> (nb, ..., C, t_block) leading-block layout."""
    *lead, c, t = x.shape
    nb = -(-t // t_block)
    x = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, nb * t_block - t)],
        constant_values=pad_value)
    x = x.reshape(*lead, c, nb, t_block)
    return jnp.moveaxis(x, -2, 0)


@functools.partial(
    jax.jit,
    static_argnames=('iterations', 'eigenvalue_floor',
                     'affiliation_eps', 'first_e_step', 'eigh_sweeps',
                     't_block'))
def _fit_em_t_blocked(y, model, affiliation, quadratic_form, *,
                      iterations, eigenvalue_floor, affiliation_eps,
                      first_e_step, eigh_sweeps, t_block):
    """EM with the time axis processed in blocks (SURVEY §5
    long-context row; VERDICT r1 item 7).

    The scan-path E-step materializes ``z = V^H y`` of shape
    (..., K, D, T) — at T ~ 30k that is gigabytes. Here each EM
    iteration is one ``lax.scan`` over T-blocks whose body computes
    the block's posterior from the current parameters and immediately
    folds it into the M-step accumulators (scatter (..., K, D, D) and
    affiliation sums (..., K)); the (..., K, T) posterior and the
    (..., K, D, T) projection never exist at full length, so the
    working set is O(F K D^2 + F D t_block) regardless of T.
    Trajectory-equivalent to the scan path (same M/E ordering and
    guards; only the reduction order differs).

    Standard knobs only (no saliency/mask/aligner,
    ``weight_constant_axis=-1``, hermitize, eigenvalue norm) — the
    caller gates on ``_standard_knobs``.
    """
    *independent, D, T = y.shape
    rdtype = _real_dtype(y)

    y_blocks = _t_blocks(y, t_block)  # (nb, ..., D, tb)
    nb = y_blocks.shape[0]
    valid = (jnp.arange(nb * t_block) < T).astype(rdtype)
    valid_blocks = valid.reshape(nb, t_block)

    def block_stats(aff, qf, y_block):
        """M-step contribution of one block (cacg Trainer._fit
        weighting: w = affiliation / quadratic_form)."""
        w = aff / jnp.maximum(qf, 10 * _tiny(qf))
        scatter = jnp.einsum(
            '...kt,...dt,...et->...kde',
            w.astype(y_block.dtype), y_block, y_block.conj(),
            precision=em_matmul_precision())
        return scatter, jnp.sum(aff, axis=-1)

    def m_from_stats(scatter, aff_sum):
        covariance = D * scatter / jnp.maximum(
            aff_sum, _tiny(aff_sum))[..., None, None].astype(
                scatter.dtype)
        covariance = force_hermitian(covariance)
        cacg = ComplexAngularCentralGaussian.from_covariance(
            covariance,
            eigenvalue_floor=eigenvalue_floor,
            covariance_norm='eigenvalue',
            eigh_sweeps=eigh_sweeps,
        )
        weight = (aff_sum / T)[..., None]
        return CACGMM(weight=weight, cacg=cacg)

    K = (affiliation.shape[-2] if affiliation is not None
         else model.weight.shape[-2])
    zeros = (
        jnp.zeros((*independent, K, D, D), y.dtype),
        jnp.zeros((*independent, K), rdtype),
    )

    def e_then_m(model):
        def body(carry, inp):
            y_block, v = inp
            aff, qf, _ = model._predict(
                y_block, affiliation_eps=affiliation_eps)
            aff = aff * v  # zero the padded tail columns
            s, n = block_stats(aff, qf, y_block)
            return (carry[0] + s, carry[1] + n), None
        (s, n), _ = lax.scan(body, zeros, (y_blocks, valid_blocks))
        return m_from_stats(s, n)

    if not first_e_step:
        # First M-step from the provided initialization (padded
        # affiliations are zero -> contribute nothing).
        aff_blocks = _t_blocks(affiliation, t_block)
        qf_blocks = _t_blocks(quadratic_form, t_block, pad_value=1.0)

        def body0(carry, inp):
            y_block, aff, qf = inp
            s, n = block_stats(aff, qf, y_block)
            return (carry[0] + s, carry[1] + n), None
        (s, n), _ = lax.scan(
            body0, zeros, (y_blocks, aff_blocks, qf_blocks))
        model = m_from_stats(s, n)
        n_steps = iterations - 1
    else:
        n_steps = iterations

    if n_steps > 0:
        model, _ = lax.scan(
            lambda m, _: (e_then_m(m), None), model, None,
            length=n_steps)
    return model


@functools.partial(jax.jit, static_argnames=('t_block',))
def _predict_time_last_blocked(model, y, *, t_block):
    """Blocked final E-step: the (..., K, D, T) projection only ever
    exists per block; returns the full (..., K, T) affiliation."""
    *independent, D, T = y.shape
    y_blocks = _t_blocks(y, t_block)

    def body(_, y_block):
        aff, _, _ = model._predict(y_block)
        return None, aff
    _, aff = lax.scan(body, None, y_blocks)  # (nb, ..., K, tb)
    aff = jnp.moveaxis(aff, 0, -2)  # (..., K, nb, tb)
    aff = aff.reshape(*aff.shape[:-2], -1)
    return aff[..., :T]


def _m_step(y, quadratic_form, affiliation, saliency, *,
            hermitize, covariance_norm, eigenvalue_floor,
            weight_constant_axis, eigh_sweeps=None):
    weight = estimate_mixture_weight(
        affiliation=affiliation,
        saliency=saliency,
        weight_constant_axis=weight_constant_axis,
    )
    if saliency is None:
        masked_affiliation = affiliation
    else:
        masked_affiliation = affiliation * saliency[..., None, :]
    cacg = ComplexAngularCentralGaussianTrainer()._fit(
        y=y[..., None, :, :],
        saliency=masked_affiliation,
        quadratic_form=quadratic_form,
        hermitize=hermitize,
        covariance_norm=covariance_norm,
        eigenvalue_floor=eigenvalue_floor,
        eigh_sweeps=eigh_sweeps,
    )
    return CACGMM(weight=weight, cacg=cacg)


@functools.partial(
    jax.jit,
    static_argnames=(
        'iterations', 'weight_constant_axis', 'hermitize', 'covariance_norm',
        'eigenvalue_floor', 'affiliation_eps', 'aligner', 'first_e_step',
        'use_pallas_em', 'eigh_sweeps',
    ),
)
def _fit_em(y, model, affiliation, quadratic_form, saliency,
            source_activity_mask, *, iterations, weight_constant_axis,
            hermitize, covariance_norm, eigenvalue_floor, affiliation_eps,
            aligner, first_e_step, use_pallas_em=False, eigh_sweeps=None):
    """The full EM loop as one compiled program.

    When ``first_e_step`` is False the loop starts from the provided
    affiliations with one M-step (the reference's array/num_classes init
    path, cacgmm.py:252-278); otherwise it starts from the provided
    model with an E-step.
    """
    m_step = functools.partial(
        _m_step,
        saliency=saliency,
        hermitize=hermitize,
        covariance_norm=covariance_norm,
        eigenvalue_floor=eigenvalue_floor,
        weight_constant_axis=weight_constant_axis,
        eigh_sweeps=eigh_sweeps,
    )

    def e_then_m(model):
        affiliation, quadratic_form, _ = model._predict(
            y,
            source_activity_mask=source_activity_mask,
            affiliation_eps=affiliation_eps,
        )
        if aligner is not None:
            affiliation, quadratic_form = apply_inline_permutation_alignment(
                affiliation=affiliation,
                quadratic_form=quadratic_form,
                weight_constant_axis=weight_constant_axis,
                aligner=aligner,
            )
        return m_step(y, quadratic_form, affiliation)

    def e_then_m_fused(model):
        # Fused Pallas E+M: one HBM pass over y per iteration; the
        # (F, K, T) posterior never round-trips through HBM. Valid for
        # (F, D, T) inputs without saliency/mask/aligner and
        # weight_constant_axis=(-1,) (checked by the caller). ~1.4x
        # over the XLA path at large T; prefer XLA for short signals.
        from ..ops.pallas_em import cacgmm_em_scatter
        cacg = model.cacg
        F, D, T = y.shape
        weight = jnp.broadcast_to(
            model.weight[..., 0], (F, model.weight.shape[-2]))
        s_re, s_im, aff_sum = cacgmm_em_scatter(
            y.real, y.imag,
            cacg.covariance_eigenvectors.real,
            cacg.covariance_eigenvectors.imag,
            1.0 / cacg.covariance_eigenvalues,
            cacg.log_determinant,
            weight,
            # pallas on CPU backends runs in interpreter mode
            interpret=jax.default_backend() == 'cpu',
        )
        covariance = (s_re + 1j * s_im) / jnp.maximum(
            aff_sum, _tiny(s_re))[..., None, None]
        if hermitize:
            from .base import force_hermitian
            covariance = force_hermitian(covariance)
        new_cacg = ComplexAngularCentralGaussian.from_covariance(
            covariance,
            eigenvalue_floor=eigenvalue_floor,
            covariance_norm=covariance_norm,
            eigh_sweeps=eigh_sweeps,
        )
        new_weight = (aff_sum / T)[..., None]
        return CACGMM(weight=new_weight, cacg=new_cacg)

    if use_pallas_em:
        e_then_m = e_then_m_fused

    if not first_e_step:
        model = m_step(y, quadratic_form, affiliation)
        n_steps = iterations - 1
    else:
        n_steps = iterations

    if n_steps > 0:
        def step(model, _):
            return e_then_m(model), None
        if first_e_step:
            # A resume model may carry broadcast (size-1 or absent)
            # leading dims relative to y (reference cacgmm.py:229-236
            # accepts any broadcastable model); the scan carry must
            # already have the shapes one EM step produces.
            target = jax.eval_shape(e_then_m, model)
            model = jax.tree_util.tree_map(
                lambda x, s: jnp.broadcast_to(
                    jnp.asarray(x, s.dtype), s.shape),
                model, target)
        model, _ = lax.scan(step, model, None, length=n_steps)
    return model


class CACGMMTrainer:
    def fit(
            self,
            y,
            initialization=None,
            num_classes=None,
            iterations=100,
            *,
            key=None,
            saliency=None,
            source_activity_mask=None,
            weight_constant_axis=(-1,),
            hermitize=True,
            covariance_norm='eigenvalue',
            affiliation_eps=1e-10,
            eigenvalue_floor=1e-10,
            inline_permutation_aligner=None,
            use_pallas_em=False,
            use_fused_em='auto',
            eigh_sweeps=None,
            t_block='auto',
            _return_affiliation=False,
    ) -> CACGMM:
        """Fit a cACGMM with EM.

        Args:
            y: (..., N, D) complex observations.
            initialization: affiliations (..., K, N), a CACGMM, or None
                (then ``num_classes`` + ``key`` drive a random init).
            num_classes: K (exclusive with initialization).
            iterations: number of M-steps.
            key: jax PRNG key for the random affiliation init
                (default: ``jax.random.key(0)``).
            saliency: (..., N) importance weights.
            source_activity_mask: bool (..., K, N).
            weight_constant_axis: axis/axes averaged for the weight;
                -2 fixes weights to 1/K (reference semantics).
            hermitize / covariance_norm / affiliation_eps /
            eigenvalue_floor: numeric guards, reference semantics.
            inline_permutation_aligner: optional aligner run after each
                E-step (jit-compatible, runs inside the compiled loop).
            use_pallas_em: use the fused Pallas E+M TPU kernel
                (pb_bss_tpu.ops.pallas_em, experimental); requires
                (F, N, D) input without saliency/mask/aligner and
                weight_constant_axis=(-1,).
            use_fused_em: run the EM through the fused Pallas kernels.
                Per-bin weights (``weight_constant_axis=(-1,)``) use
                the whole-fit single-launch kernel
                (ops/pallas_em_loop.py, ~7x over the scan path on
                TPU); frequency-constant weights
                (``weight_constant_axis=(-3, -1)``) use the
                per-iteration-fused kernels (ops/pallas_em_step.py —
                same per-iteration cost, with the global weight as
                one XLA reduction over bins that shards as a psum);
                signals too LONG for either (T beyond the VMEM
                ceiling, ~600 frames at 6 channels) stream time
                blocks through a per-iteration kernel
                (ops/pallas_em_stream.py — 1.9-3x over the scan path
                at T=2000-6000, measured). ``'auto'`` (default)
                routes among them on non-CPU backends for c64
                (F, N, D) inputs when the knobs are supported —
                saliency and source_activity_mask are handled
                natively; inline PA, other weight axes,
                hermitize=False or a non-eigenvalue covariance norm
                fall back to the scan path. ``True`` forces the
                routing (interpreter mode on CPU, slow — for tests);
                ``False`` keeps the scan path.
            eigh_sweeps: Jacobi sweeps for the per-iteration batched
                eigendecomposition (default: dtype-dependent machine
                precision, 6 for f32). The EM is self-correcting;
                ``eigh_sweeps=4`` (~1e-3 eigenvalue accuracy) is
                ~1.3-1.4x faster per iteration on TPU at unchanged
                separation quality.
            t_block: time-blocked EM for long signals: each iteration
                scans T-blocks and folds posteriors straight into the
                M-step accumulators, bounding the working set at
                O(F K D^2 + F D t_block) instead of O(F K D T).
                ``'auto'`` (default) enables it with block 2048 for
                T > 8192 when the fused kernel is not used and the
                knobs are standard; an int forces that block length;
                ``None`` disables.

        Minimal example (mirrors the reference doctest, cacgmm.py:100-107,
        with an explicit jax key instead of a global seed):

        >>> import jax, jax.numpy as jnp
        >>> k1, k2 = jax.random.split(jax.random.key(0))
        >>> y = (jax.random.normal(k1, (5, 100, 3))
        ...      + 1j * jax.random.normal(k2, (5, 100, 3))
        ...      ).astype(jnp.complex64)  # (F, T, D)
        >>> mm = CACGMMTrainer().fit(y, num_classes=2, iterations=2)
        >>> mm.weight.shape, mm.cacg.covariance_eigenvalues.shape
        ((5, 2, 1), (5, 2, 3))
        >>> mm.predict(y).shape  # affiliations (F, K, T)
        (5, 2, 100)
        >>> refit = CACGMMTrainer().fit(y, mm, iterations=1)  # resume
        >>> type(refit).__name__
        'CACGMM'
        """
        assert xor(initialization is None, num_classes is None), (
            'Provide either `initialization` or `num_classes` — not '
            'both and not neither. Got initialization is None: '
            f'{initialization is None}, num_classes is None: '
            f'{num_classes is None}.'
        )
        y = jnp.asarray(y)
        assert jnp.iscomplexobj(y), y.dtype
        assert y.shape[-1] > 1, y.shape
        y = normalize_observation(y)  # (..., D, N)
        assert iterations > 0, iterations

        *independent, D, num_observations = y.shape

        model = None
        affiliation = None
        quadratic_form = None
        if initialization is None:
            assert num_classes is not None, num_classes
            if key is None:
                key = jax.random.key(0)
            affiliation_shape = (*independent, num_classes, num_observations)
            affiliation = jax.random.uniform(
                key, affiliation_shape, _real_dtype(y))
            affiliation = affiliation / jnp.sum(
                affiliation, axis=-2, keepdims=True)
            quadratic_form = jnp.ones(affiliation_shape, _real_dtype(y))
        elif isinstance(initialization, CACGMM):
            num_classes = \
                initialization.cacg.covariance_eigenvectors.shape[-3]
            model = initialization
        elif isinstance(initialization, (np.ndarray, jnp.ndarray)):
            initialization = jnp.asarray(initialization)
            num_classes = initialization.shape[-2]
            assert num_classes > 1, num_classes
            affiliation_shape = (*independent, num_classes, num_observations)
            assert initialization.ndim == len(affiliation_shape), (
                initialization.shape, affiliation_shape)
            assert initialization.shape[-2:] == affiliation_shape[-2:], (
                initialization.shape, affiliation_shape)
            affiliation = jnp.broadcast_to(
                initialization.astype(_real_dtype(y)), affiliation_shape)
            quadratic_form = jnp.ones(affiliation_shape, _real_dtype(y))
        else:
            raise TypeError('No sufficient initialization.')

        if isinstance(weight_constant_axis, list):
            weight_constant_axis = tuple(weight_constant_axis)

        if source_activity_mask is not None:
            source_activity_mask = jnp.asarray(source_activity_mask)
            assert source_activity_mask.dtype == jnp.bool_, \
                source_activity_mask.dtype
            assert source_activity_mask.shape[-2:] == (
                num_classes, num_observations), (
                source_activity_mask.shape, independent, num_classes,
                num_observations)

        assert num_classes < 20, f'num_classes: {num_classes}, sure?'
        assert D < 35, f'Channels: {D}, sure?'

        fc_knobs = _fused_fc_knobs(
            inline_permutation_aligner, weight_constant_axis,
            hermitize, covariance_norm, allow_aligner=y.ndim == 3)
        per_bin_knobs = _fused_knobs(
            inline_permutation_aligner, weight_constant_axis,
            hermitize, covariance_norm)
        if use_fused_em == 'auto':
            use_fused_em = not use_pallas_em and (
                _fused_em_eligible(
                    y, num_classes, saliency, source_activity_mask,
                    inline_permutation_aligner, weight_constant_axis,
                    hermitize, covariance_norm)
                or _fused_em_fc_eligible(
                    y, num_classes, saliency, source_activity_mask,
                    inline_permutation_aligner, weight_constant_axis,
                    hermitize, covariance_norm, model)
                or _fused_em_stream_eligible(
                    y, num_classes, saliency, source_activity_mask,
                    inline_permutation_aligner, weight_constant_axis,
                    hermitize, covariance_norm, model))
        if use_fused_em:
            assert y.ndim in (3, 4), (
                'use_fused_em requires (F, N, D) or (B, F, N, D) '
                'observations', y.shape)
            assert per_bin_knobs or fc_knobs, (
                'use_fused_em=True requires weight_constant_axis='
                '(-1,) or (-3, -1), hermitize=True and '
                "covariance_norm='eigenvalue' (an inline aligner is "
                'supported only with (-3, -1) and unbatched (F, N, D) '
                'input); got '
                f'{inline_permutation_aligner=}, '
                f'{weight_constant_axis=}, {hermitize=}, '
                f'{covariance_norm=}')
            fused_kwargs = dict(
                iterations=int(iterations),
                eigenvalue_floor=float(eigenvalue_floor),
                affiliation_eps=float(affiliation_eps),
                eigh_sweeps=(
                    None if eigh_sweeps is None else int(eigh_sweeps)),
                saliency=saliency,
                source_activity_mask=source_activity_mask,
                return_affiliation=_return_affiliation,
            )
            from ..ops.pallas_em_loop import (
                choose_tile_f as _whole_tiles,
            )
            from ..ops.pallas_em_step import (
                choose_tile_f as _fc_tiles,
            )
            t_pad8 = -(-num_observations // 8) * 8
            has_sal = saliency is not None
            has_mask = source_activity_mask is not None
            fc_init_ok = (model is None
                          or _fc_init_weight(model, y.ndim) is not None)
            if (per_bin_knobs and D <= 16 and bool(_whole_tiles(
                    D, num_classes, t_pad8, has_sal=has_sal,
                    has_mask=has_mask))):
                # short T: the whole fit in one kernel launch
                return _fit_fused(
                    y, model, affiliation, quadratic_form,
                    **fused_kwargs)
            if (fc_knobs and D <= 16 and fc_init_ok
                    and bool(_fc_tiles(
                        D, num_classes, t_pad8, has_sal=has_sal,
                        has_mask=has_mask,
                        has_aligner=(
                            inline_permutation_aligner is not None)))):
                # frequency-constant weights: per-iteration-fused
                # kernels + one XLA weight reduction over bins (and
                # the inline aligner between kernel calls, if any)
                return _fit_fused_fc(
                    y, model, affiliation, quadratic_form,
                    aligner=inline_permutation_aligner,
                    **fused_kwargs)
            assert (_stream_feasible(
                y, num_classes, saliency, source_activity_mask)
                and (per_bin_knobs or fc_init_ok)
                and inline_permutation_aligner is None), (
                'no fused-kernel variant feasible for this shape',
                y.shape)
            # long T: streamed per-iteration kernel (grid over
            # frequency tiles x time blocks)
            return _fit_fused_stream(
                y, model, affiliation, quadratic_form,
                weight_mode='per_bin' if per_bin_knobs else 'fc',
                **fused_kwargs)

        standard = _standard_knobs(
            saliency, source_activity_mask, inline_permutation_aligner,
            weight_constant_axis, hermitize, covariance_norm)
        if t_block == 'auto':
            t_block = (
                T_BLOCK_AUTO
                if (standard and not use_pallas_em
                    and num_observations > T_BLOCK_AUTO_THRESHOLD)
                else None)
        if t_block is not None:
            assert standard, (
                't_block requires standard knobs (no saliency/mask/'
                'aligner, weight_constant_axis=-1, hermitize, '
                'eigenvalue covariance norm)')
            fitted = _fit_em_t_blocked(
                y, model, affiliation, quadratic_form,
                iterations=int(iterations),
                eigenvalue_floor=float(eigenvalue_floor),
                affiliation_eps=float(affiliation_eps),
                first_e_step=model is not None,
                eigh_sweeps=(
                    None if eigh_sweeps is None else int(eigh_sweeps)),
                t_block=int(t_block),
            )
            if _return_affiliation:
                return fitted, _predict_time_last_blocked(
                    fitted, y, t_block=int(t_block))
            return fitted

        if use_pallas_em:
            assert y.ndim == 3, (
                'use_pallas_em requires (F, N, D) observations',
                y.shape)
            assert saliency is None and source_activity_mask is None
            assert inline_permutation_aligner is None
            assert weight_constant_axis in ((-1,), -1), \
                weight_constant_axis
            assert affiliation_eps == 0 or affiliation_eps <= 1e-9, (
                'the fused kernel does not clip affiliations',
                affiliation_eps)
            weight_constant_axis = (-1,)

        fitted = _fit_em(
            y, model, affiliation, quadratic_form, saliency,
            source_activity_mask,
            iterations=int(iterations),
            weight_constant_axis=weight_constant_axis,
            hermitize=bool(hermitize),
            covariance_norm=covariance_norm,
            eigenvalue_floor=float(eigenvalue_floor),
            affiliation_eps=float(affiliation_eps),
            aligner=inline_permutation_aligner,
            first_e_step=model is not None,
            use_pallas_em=bool(use_pallas_em),
            eigh_sweeps=None if eigh_sweeps is None else int(eigh_sweeps),
        )
        if _return_affiliation:
            affiliation, _ = _predict_time_last_jit(
                fitted, y, source_activity_mask)
            return fitted, affiliation
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
            source_activity_mask=None,
            weight_constant_axis=(-1,),
            hermitize=True,
            covariance_norm='eigenvalue',
            affiliation_eps=1e-10,
            eigenvalue_floor=1e-10,
            inline_permutation_aligner=None,
            use_pallas_em=False,
            use_fused_em='auto',
            eigh_sweeps=None,
            t_block='auto',
    ):
        """Fit, then return the posterior affiliations for ``y``.

        On the fused-kernel path (``use_fused_em``, auto on TPU) the
        affiliations come from the kernel's final E-step for free — no
        separate predict pass over the observations. They equal
        ``fit(...).predict(y)`` mathematically; in f32 the two
        evaluations of the ill-conditioned whitening ``z = V^H y``
        (catastrophic cancellation along small-eigenvalue directions)
        can differ visibly in ambiguous T-F bins — quality-equivalent
        (measured), not bit-equal."""
        _, affiliation = self.fit(
            y=y,
            initialization=initialization,
            num_classes=num_classes,
            iterations=iterations,
            key=key,
            saliency=saliency,
            source_activity_mask=source_activity_mask,
            weight_constant_axis=weight_constant_axis,
            hermitize=hermitize,
            covariance_norm=covariance_norm,
            affiliation_eps=affiliation_eps,
            eigenvalue_floor=eigenvalue_floor,
            inline_permutation_aligner=inline_permutation_aligner,
            use_pallas_em=use_pallas_em,
            use_fused_em=use_fused_em,
            eigh_sweeps=eigh_sweeps,
            t_block=t_block,
            _return_affiliation=True,
        )
        return affiliation

    def fit_predict_model(self, *args, **kwargs):
        """Like :meth:`fit_predict` but returns ``(model,
        affiliation)`` — what a pipeline that also beamforms needs."""
        return self.fit(*args, _return_affiliation=True, **kwargs)
