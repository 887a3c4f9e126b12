"""Pallas TPU kernels: per-iteration fused cACGMM EM for
FREQUENCY-CONSTANT mixture weights.

The whole-fit kernel (ops/pallas_em_loop.py) runs every EM iteration
inside one launch — possible because with ``weight_constant_axis=(-1,)``
every frequency bin is independent. With frequency-constant weights
(``weight_constant_axis=(-3, -1)``, reference
pb_bss/distribution/mixture_model_utils.py:180-203) each iteration's
M-step reduces the affiliation sums over ALL bins, so the loop cannot
stay tile-local: the whole-fit kernel's grid runs tile-major (tile 0
finishes all its iterations before tile 1 starts) and can never see
another tile's statistics.

This module keeps the fused-kernel economics anyway by splitting at
the one global reduction (the architecture of
ops/pallas_integration_em.py, which faces the same coupling through
its global spectral model):

* ``_m_init_kernel`` — the first M-step from the initial affiliations
  (cold in-kernel Jacobi), per frequency tile.
* ``_em_step_kernel`` — one full EM iteration: E-step posterior from
  the previous model (with the global weight as a lane-broadcast
  input), M-step scatter, and the WARM-started in-kernel Jacobi (the
  input eigenbasis is the previous iteration's — the pallas_em_loop
  recipe), per frequency tile. The (F, K, T) posterior never leaves
  VMEM; only the per-bin affiliation sums do.
* XLA between kernel calls finishes the weight: one masked mean over
  the bin axis (+ T), which under a sharded 'f' mesh axis is exactly
  one psum over ICI. The inter-iteration state (eigenvector planes,
  eigenvalues, global weight) stays in the kernel's lane-tiled layout
  across a ``lax.scan``, so per-iteration XLA work is a handful of
  elementwise ops on (D, K, f_pad) planes.

Numerics replicate the scan path's guard ladder exactly (see
pallas_em_loop's module docstring); parity is tested in
tests/test_ops/test_pallas_em_step.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_eigh import _sort_ascending
from .pallas_em_loop import _jacobi_rounds, _warm_rotate

__all__ = ['cacgmm_em_fc', 'choose_tile_f']

_TINY = float(np.finfo(np.float32).tiny)


def choose_tile_f(d, k, t_pad, *, has_sal=False, has_mask=False,
                  has_aligner=False, vmem_budget=12 * 2 ** 20):
    """Feasible lane-tile widths for the step kernel (the larger of
    the two). Pallas double-buffers in/out blocks across grid steps
    (count 2x); scratch counts once. ``has_aligner`` adds the
    double-buffered posterior output block of the emit_aff mode."""
    per_lane = 4 * (
        2 * (2 * d * t_pad                      # y planes in
             + 2 * d * d * k + d * k + 2 * k    # V, inv, logdet, w in
             + (t_pad if has_sal else 0)
             + (k * t_pad if has_mask else 0)
             + 2 * k * t_pad)                   # aff/qf in (init kernel)
        + 2 * (2 * d * d * k + d * k + k       # V, eig, asum out
               + (k * t_pad if has_aligner else 0))  # posterior out
        + (2 * k * t_pad + 4 * d * d * k)       # aff/qf + jacobi scratch
    )
    return [tf for tf in (512, 256, 128)
            if tf * per_lane <= vmem_budget]


def _m_stats(y_re_ref, y_im_ref, aff, qf, asum_ref, ar, ai, *,
             d, k, tiny, lane_valid):
    """Shared M-step statistics: asum_ref[kk] = sum_t aff[kk] (lane
    masked), scatter S_k = D/denom sum_t (a/q) y y^H built Hermitian
    from its upper triangle into ar/ai. ``aff``/``qf`` are lists of
    (T, F') values (already saliency-masked / t-masked)."""
    w = []
    scale = []
    for kk in range(k):
        wsum = jnp.sum(aff[kk], axis=0)          # (F',)
        # select, don't multiply: padding lanes carry NaN statistics
        # (at D >= 5 the per-bin scale d/tiny overflows f32 to inf and
        # 0 * inf = NaN there) and NaN * 0 would still leak NaN into
        # the global weight reduction
        asum_ref[kk] = jnp.where(lane_valid > 0, wsum, 0.0)
        w.append(aff[kk] / jnp.maximum(qf[kk], 10 * tiny))
        scale.append(d / jnp.maximum(wsum, tiny))
    for dd in range(d):
        y_rd = y_re_ref[dd]
        y_id = y_im_ref[dd]
        for ee in range(dd, d):
            p_re = y_rd * y_re_ref[ee] + y_id * y_im_ref[ee]
            p_im = (None if ee == dd
                    else y_id * y_re_ref[ee] - y_rd * y_im_ref[ee])
            for kk in range(k):
                s_re = jnp.sum(w[kk] * p_re, axis=0) * scale[kk]
                ar[dd, ee, kk] = s_re
                if ee == dd:
                    ai[dd, dd, kk] = jnp.zeros_like(s_re)
                else:
                    s_im = jnp.sum(w[kk] * p_im, axis=0) * scale[kk]
                    ar[ee, dd, kk] = s_re
                    ai[dd, ee, kk] = s_im
                    ai[ee, dd, kk] = -s_im


def _floor_eigenvalues(ar, eig_ref, *, d, eigenvalue_floor, tiny):
    """from_covariance 'eigenvalue' semantics: max-normalize + floor
    the Jacobi diagonal into eig_ref."""
    lam = [ar[dd, dd] for dd in range(d)]
    lam_max = lam[0]
    for dd in range(1, d):
        lam_max = jnp.maximum(lam_max, lam[dd])
    lam_max = jnp.maximum(lam_max, tiny)
    for dd in range(d):
        eig_ref[dd] = jnp.maximum(lam[dd] / lam_max, eigenvalue_floor)


def _lane_valid(tile_f, f_real, shape2):
    """(F',) 0/1 mask of lanes holding real bins (padding lanes must
    not pollute the global weight reduction)."""
    start = pl.program_id(0) * tile_f
    lane = start + lax.broadcasted_iota(jnp.int32, shape2, 1)[0]
    return (lane < f_real).astype(jnp.float32)


def _m_init_kernel(*refs, d, k, sweeps, t_real, f_real, tile_f,
                   eigenvalue_floor, tiny, has_sal=False):
    """First M-step from the initial affiliations (cold Jacobi)."""
    it = iter(refs)
    y_re_ref, y_im_ref, aff0_ref, qf0_ref = (
        next(it), next(it), next(it), next(it))
    sal_ref = next(it) if has_sal else None
    vre_ref, vim_ref, eig_ref, asum_ref = (
        next(it), next(it), next(it), next(it))
    ar, ai = next(it), next(it)

    lane_valid = _lane_valid(tile_f, f_real, y_re_ref.shape[1:])
    sal = sal_ref[...] if has_sal else None
    # staged affiliations are zero-padded along T, so no t-mask needed
    aff = [aff0_ref[kk] * sal if has_sal else aff0_ref[kk]
           for kk in range(k)]
    qf = [qf0_ref[kk] for kk in range(k)]
    _m_stats(y_re_ref, y_im_ref, aff, qf, asum_ref, ar, ai,
             d=d, k=k, tiny=tiny, lane_valid=lane_valid)

    row = lax.broadcasted_iota(jnp.int32, ar.shape, 0)
    col = lax.broadcasted_iota(jnp.int32, ar.shape, 1)
    vre_ref[...] = jnp.where(row == col, 1.0, 0.0)
    vim_ref[...] = jnp.zeros(ar.shape, jnp.float32)
    _jacobi_rounds(ar, ai, vre_ref, vim_ref, d=d, sweeps=sweeps,
                   tiny=tiny)
    _floor_eigenvalues(ar, eig_ref, d=d,
                       eigenvalue_floor=eigenvalue_floor, tiny=tiny)


def _em_step_kernel(*refs, d, k, warm_sweeps, t_real, f_real, tile_f,
                    eigenvalue_floor, affiliation_eps, tiny,
                    has_sal=False, has_mask=False, emit_aff=False):
    """One EM iteration: E-step from the previous model (global weight
    lane-broadcast), M-step scatter, warm-started Jacobi. With
    ``emit_aff`` the E-step posterior is additionally written out
    (K, T', F') — the inline permutation aligner needs it."""
    it = iter(refs)
    y_re_ref, y_im_ref, vre_in, vim_in, inv_ref, logdet_ref, \
        weight_ref = (next(it), next(it), next(it), next(it),
                      next(it), next(it), next(it))
    sal_ref = next(it) if has_sal else None
    sam_ref = next(it) if has_mask else None
    vre_ref, vim_ref, eig_ref, asum_ref = (
        next(it), next(it), next(it), next(it))
    aff_ref = next(it) if emit_aff else None
    ar, ai, br, bi = next(it), next(it), next(it), next(it)

    t_pad = y_re_ref.shape[1]
    if t_pad == t_real:
        t_mask = None
    else:
        t_mask = (lax.broadcasted_iota(
            jnp.int32, (t_pad, y_re_ref.shape[2]), 0) < t_real
        ).astype(jnp.float32)
    lane_valid = _lane_valid(tile_f, f_real, (2, y_re_ref.shape[2]))

    # ---- E-step: quadratic form via the assembled inverse covariance
    # (shared pair products; the pallas_em_loop recipe) ---------------
    cinv_r = {}
    cinv_i = {}
    for dd in range(d):
        for ee in range(dd, d):
            cr = None
            ci = None
            for i_ in range(d):
                vrd = vre_in[dd, i_]
                vid = vim_in[dd, i_]
                vre_ = vre_in[ee, i_]
                vie = vim_in[ee, i_]
                tr = inv_ref[i_] * (vrd * vre_ + vid * vie)
                cr = tr if cr is None else cr + tr
                if ee != dd:
                    ti = inv_ref[i_] * (vid * vre_ - vrd * vie)
                    ci = ti if ci is None else ci + ti
            cinv_r[dd, ee] = cr
            cinv_i[dd, ee] = ci

    qf_acc = [None] * k
    for dd in range(d):
        y_rd = y_re_ref[dd]
        y_id = y_im_ref[dd]
        for ee in range(dd, d):
            p_re = y_rd * y_re_ref[ee] + y_id * y_im_ref[ee]
            p_im = (None if ee == dd
                    else y_id * y_re_ref[ee] - y_rd * y_im_ref[ee])
            for kk in range(k):
                if ee == dd:
                    term = cinv_r[dd, dd][kk] * p_re
                else:
                    term = 2 * (cinv_r[dd, ee][kk] * p_re
                                + cinv_i[dd, ee][kk] * p_im)
                qf_acc[kk] = (term if qf_acc[kk] is None
                              else qf_acc[kk] + term)

    qf = []
    log_pdf = []
    for kk in range(k):
        q = jnp.maximum(qf_acc[kk], tiny)
        qf.append(q)
        log_pdf.append(-d * jnp.log(q) - logdet_ref[kk])

    max_k = log_pdf[0]
    for kk in range(1, k):
        max_k = jnp.maximum(max_k, log_pdf[kk])
    num = [jnp.exp(log_pdf[kk] - max_k) * weight_ref[kk]
           for kk in range(k)]
    if has_mask:
        num = [num[kk] * sam_ref[kk] for kk in range(k)]
    den = num[0]
    for kk in range(1, k):
        den = den + num[kk]
    den = jnp.maximum(den, tiny)

    sal = sal_ref[...] if has_sal else None
    aff = []
    for kk in range(k):
        a = num[kk] / den
        if affiliation_eps:
            a = jnp.clip(a, affiliation_eps, 1 - affiliation_eps)
        if t_mask is not None:
            a = a * t_mask
        if emit_aff:
            # the aligner sees the posterior the scan path's
            # model._predict returns: clipped, pre-saliency
            aff_ref[kk] = a
        if has_sal:
            a = a * sal
        aff.append(a)

    # ---- M-step + warm eigendecomposition ---------------------------
    _m_stats(y_re_ref, y_im_ref, aff, qf, asum_ref, ar, ai,
             d=d, k=k, tiny=tiny, lane_valid=lane_valid)
    vre_ref[...] = vre_in[...]
    vim_ref[...] = vim_in[...]
    _warm_rotate(ar, ai, vre_ref, vim_ref, br, bi, d=d)
    _jacobi_rounds(ar, ai, vre_ref, vim_ref, d=d, sweeps=warm_sweeps,
                   tiny=tiny)
    _floor_eigenvalues(ar, eig_ref, d=d,
                       eigenvalue_floor=eigenvalue_floor, tiny=tiny)


def _stage(x, t_pad, f_pad, constant_values=0.0):
    """(F, C, T) -> (C, t_pad, f_pad) float32 lane-tiled planes."""
    F, C, T = x.shape
    x = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))
    return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, f_pad - F)),
                   constant_values=constant_values)


@functools.partial(
    jax.jit,
    static_argnames=('iterations', 'sweeps', 'warm_sweeps',
                     'eigenvalue_floor', 'affiliation_eps', 'tile_f',
                     'interpret', 'first_e_step', 'aligner'))
def cacgmm_em_fc(y_re, y_im, affiliation, quadratic_form, *,
                 iterations, sweeps=6, warm_sweeps=2,
                 eigenvalue_floor=1e-10, affiliation_eps=1e-10,
                 tile_f=None, interpret=False, saliency=None,
                 source_activity_mask=None, first_e_step=False,
                 init_weight=None, init_eigenvalues=None,
                 init_eigenvectors=None, aligner=None):
    """cACGMM EM with FREQUENCY-CONSTANT mixture weights
    (``weight_constant_axis=(-3, -1)``), per-iteration fused.

    Args:
        y_re / y_im: (F, D, T) observation planes (unit-norm,
            time-last). A leading batch axis (B, F, D, T) is folded
            into the bin axis for the kernels; the weight reduction
            stays per-utterance.
        affiliation / quadratic_form: (.., F, K, T) initial state
            (ignored when ``first_e_step`` — then ``init_*`` carry the
            starting model).
        saliency: optional (.., F, T) frame weights (then the weight is
            the L1-normalized masked affiliation sum — reference
            estimate_mixture_weight semantics).
        source_activity_mask: optional (.., F, K, T) 0/1 gate.
        first_e_step: start from the model in ``init_weight`` ((K,)
            global, or (B, K) / (1, K) for batched input — per-bin
            weights are not a frequency-constant state; the caller
            falls back to the scan path for those),
            ``init_eigenvalues`` ((.., F, K, D), already
            normalized+floored) and ``init_eigenvectors``
            ((.., F, K, D, D) complex) with an E-step (the
            resume-from-model path).
    Returns:
        (weight (.., K), eigenvalues (.., F, K, D), eigenvectors
        (.., F, K, D, D) complex64); eigenpairs sorted ascending.
    """
    batched = y_re.ndim == 4
    if batched:
        B, F, D, T = y_re.shape
    else:
        F, D, T = y_re.shape
        B = 1
    K = (affiliation.shape[-2] if affiliation is not None
         else init_eigenvalues.shape[-2])
    has_sal = saliency is not None
    has_mask = source_activity_mask is not None
    assert aligner is None or not batched, (
        'the inline permutation aligner needs the real frequency '
        'axis — fold the batch yourself or use per-utterance calls')

    fold = lambda x: (x.reshape((B * F,) + x.shape[2:])
                      if batched and x is not None else x)
    y_re_f, y_im_f = fold(y_re), fold(y_im)
    affiliation = fold(affiliation)
    quadratic_form = fold(quadratic_form)
    saliency = fold(saliency)
    source_activity_mask = fold(source_activity_mask)

    FB = B * F if batched else F
    t_pad = -(-T // 8) * 8
    if tile_f is None:
        candidates = choose_tile_f(
            D, K, t_pad, has_sal=has_sal, has_mask=has_mask,
            has_aligner=aligner is not None)
        if not candidates:
            raise ValueError(
                f'signal too long for the fused fc-EM kernels '
                f'(T={T}, D={D}, K={K}); use the scan path')
        f_pads = [-(-FB // tf) * tf for tf in candidates]
        best = min(zip(f_pads, [-tf for tf in candidates]))
        tile_f = -best[1]
    f_pad = -(-FB // tile_f) * tile_f
    grid = (f_pad // tile_f,)
    rdtype = jnp.float32

    y_re_s = _stage(y_re_f, t_pad, f_pad)
    y_im_s = _stage(y_im_f, t_pad, f_pad)
    sal_s = (None if saliency is None else jnp.pad(
        jnp.transpose(saliency.astype(rdtype), (1, 0)),
        ((0, t_pad - T), (0, f_pad - FB))))
    sam_s = (None if source_activity_mask is None
             else _stage(source_activity_mask.astype(rdtype),
                         t_pad, f_pad))

    state_specs = [
        pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
        pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
        pl.BlockSpec((D, K, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((K, tile_f), lambda i: (0, i)),
    ]
    state_shapes = [
        jax.ShapeDtypeStruct((D, D, K, f_pad), rdtype),
        jax.ShapeDtypeStruct((D, D, K, f_pad), rdtype),
        jax.ShapeDtypeStruct((D, K, f_pad), rdtype),
        jax.ShapeDtypeStruct((K, f_pad), rdtype),
    ]
    y_specs = [
        pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
    ]
    sal_spec = [pl.BlockSpec((t_pad, tile_f), lambda i: (0, i))]
    sam_spec = [pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i))]

    def weight_from_asum(asum):
        """Global (per-utterance) weight from the lane-masked
        affiliation sums (K, f_pad) — the ONE cross-bin reduction
        (a psum over a sharded 'f' axis)."""
        if batched:
            a = jnp.transpose(asum)[:FB].reshape(B, F, K)  # (B, F, K)
            sums = jnp.sum(a, axis=1)                      # (B, K)
        else:
            sums = jnp.sum(asum, axis=-1)                  # (K,)
        if has_sal:
            denom = jnp.sum(sums, axis=-1, keepdims=True)
            denom = jnp.where(denom == 0, rdtype(1e-10), denom)
            return sums / denom
        return sums / (F * T)

    def weight_planes(w):
        """(K,) or (B, K) global weight -> (K, f_pad) lane broadcast."""
        if batched:
            full = jnp.broadcast_to(w[:, None, :], (B, F, K))
            return jnp.pad(
                jnp.transpose(full.reshape(FB, K)),
                ((0, 0), (0, f_pad - FB)))
        return jnp.broadcast_to(w[:, None], (K, f_pad))

    if not first_e_step:
        aff_s = _stage(affiliation, t_pad, f_pad)
        qf_s = _stage(quadratic_form, t_pad, f_pad,
                      constant_values=1.0)
        operands = [y_re_s, y_im_s, aff_s, qf_s]
        in_specs = y_specs + [
            pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)),
        ]
        if has_sal:
            operands.append(sal_s)
            in_specs += sal_spec
        kernel = functools.partial(
            _m_init_kernel, d=D, k=K, sweeps=sweeps, t_real=T,
            f_real=FB, tile_f=tile_f,
            eigenvalue_floor=float(eigenvalue_floor), tiny=_TINY,
            has_sal=has_sal)
        vre, vim, eig, asum = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs,
            out_specs=state_specs, out_shape=state_shapes,
            scratch_shapes=[
                pltpu.VMEM((D, D, K, tile_f), rdtype),
                pltpu.VMEM((D, D, K, tile_f), rdtype),
            ],
            interpret=interpret,
        )(*operands)
        w = weight_from_asum(asum)
        n_steps = iterations - 1
    else:
        assert init_weight is not None
        # stage the model state into kernel layout
        ev = fold(init_eigenvalues)               # (FB, K, D)
        vec = fold(init_eigenvectors)             # (FB, K, D, D)
        eig = jnp.pad(jnp.transpose(
            ev.astype(rdtype), (2, 1, 0)),
            ((0, 0), (0, 0), (0, f_pad - FB)), constant_values=1.0)
        vre = jnp.pad(jnp.transpose(
            vec.real.astype(rdtype), (2, 3, 1, 0)),
            ((0, 0),) * 3 + ((0, f_pad - FB),))
        vim = jnp.pad(jnp.transpose(
            vec.imag.astype(rdtype), (2, 3, 1, 0)),
            ((0, 0),) * 3 + ((0, f_pad - FB),))
        w = init_weight.astype(rdtype)
        if batched:
            # A (1, K) weight ('broadcast over B', _fc_init_weight)
            # must widen now: the scan carry below must match
            # weight_from_asum's (B, K) output type.
            w = jnp.broadcast_to(w, (B, K))
        n_steps = iterations

    step_kernel = functools.partial(
        _em_step_kernel, d=D, k=K, warm_sweeps=warm_sweeps, t_real=T,
        f_real=FB, tile_f=tile_f,
        eigenvalue_floor=float(eigenvalue_floor),
        affiliation_eps=float(affiliation_eps), tiny=_TINY,
        has_sal=has_sal, has_mask=has_mask,
        emit_aff=aligner is not None)
    step_in_specs = y_specs + state_specs[:3] + [
        pl.BlockSpec((K, tile_f), lambda i: (0, i)),   # logdet
        pl.BlockSpec((K, tile_f), lambda i: (0, i)),   # weight
    ]
    if has_sal:
        step_in_specs += sal_spec
    if has_mask:
        step_in_specs += sam_spec

    extra = ([sal_s] if has_sal else []) + ([sam_s] if has_mask else [])

    step_out_specs = list(state_specs)
    step_out_shapes = list(state_shapes)
    if aligner is not None:
        step_out_specs.append(
            pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)))
        step_out_shapes.append(
            jax.ShapeDtypeStruct((K, t_pad, f_pad), rdtype))

    def align_state(vre, vim, eig, asum, aff):
        """Inline permutation alignment, applied to the per-class
        STATE instead of the posterior: the M-statistics are linear
        in the affiliations per class and the eigendecomposition
        commutes with class relabeling, so permuting the kernel's
        outputs with the mapping computed from the emitted posterior
        is exactly the scan path's align-then-M
        (mixture_model_utils.apply_inline_permutation_alignment;
        reference cacgmm.py:260-267)."""
        a_kft = jnp.transpose(aff[:, :T, :FB], (0, 2, 1))  # (K, F, T)
        mapping = aligner.calculate_mapping(a_kft)          # (K, F)
        # identity mapping on padding lanes keeps their state inert
        id_map = jnp.broadcast_to(
            jnp.arange(K, dtype=mapping.dtype)[:, None],
            (K, f_pad - FB))
        mapping = jnp.concatenate([mapping, id_map], axis=1)
        # aligned[k, f] = x[mapping[k, f], f] as a one-hot einsum
        # (TPU gathers lower to slow dynamic slices)
        perm = (mapping[..., None] == jnp.arange(K)).astype(rdtype)
        return (
            jnp.einsum('kfj,abjf->abkf', perm, vre),
            jnp.einsum('kfj,abjf->abkf', perm, vim),
            jnp.einsum('kfj,djf->dkf', perm, eig),
            jnp.einsum('kfj,jf->kf', perm, asum),
        )

    def step(carry, _):
        vre, vim, eig, w = carry
        inv = 1.0 / eig                                   # (D, K, f_pad)
        logdet = jnp.sum(jnp.log(eig), axis=0)            # (K, f_pad)
        out = pl.pallas_call(
            step_kernel, grid=grid, in_specs=step_in_specs,
            out_specs=step_out_specs, out_shape=step_out_shapes,
            scratch_shapes=[
                pltpu.VMEM((D, D, K, tile_f), rdtype),
                pltpu.VMEM((D, D, K, tile_f), rdtype),
                pltpu.VMEM((D, D, K, tile_f), rdtype),
                pltpu.VMEM((D, D, K, tile_f), rdtype),
            ],
            interpret=interpret,
        )(y_re_s, y_im_s, vre, vim, inv, logdet, weight_planes(w),
          *extra)
        if aligner is not None:
            vre2, vim2, eig2, asum, aff = out
            vre2, vim2, eig2, asum = align_state(
                vre2, vim2, eig2, asum, aff)
        else:
            vre2, vim2, eig2, asum = out
        return (vre2, vim2, eig2, weight_from_asum(asum)), None

    if n_steps > 0:
        (vre, vim, eig, w), _ = lax.scan(
            step, (vre, vim, eig, w), None, length=n_steps)

    eigenvalues = jnp.transpose(eig, (2, 1, 0))[:FB]      # (FB, K, D)
    vectors = (jnp.transpose(vre, (3, 2, 0, 1))
               + 1j * jnp.transpose(vim, (3, 2, 0, 1)))[:FB]
    eigenvalues, vectors = _sort_ascending(eigenvalues, vectors)
    if batched:
        return (w,
                eigenvalues.reshape(B, F, K, D),
                vectors.reshape(B, F, K, D, D))
    return w, eigenvalues, vectors
