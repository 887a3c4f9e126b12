"""Pallas TPU kernels: streamed per-iteration EM for LONG signals —
complex Watson and complex Bingham mixtures.

Same architecture as the flagship's ``ops/pallas_em_stream.py``: the
whole-fit kernels (ops/pallas_cwmm_loop.py, ops/pallas_cbmm_loop.py)
need the full time axis resident in VMEM next to a frequency tile,
capping T around a few hundred frames; beyond that the scan paths
materialize the (F, K, T) posterior in HBM every iteration. Here each
EM iteration is ONE kernel launch over (frequency tiles x TIME
BLOCKS): the E-step posterior of every (f-tile, t-block) is folded
immediately into the scatter / affiliation-sum accumulators living in
the revisited output block, so per-iteration HBM traffic is one read
of y plus the tiny model state.

Both families share the kernel — their E-steps are quadratic forms in
y against a Hermitian parameter matrix:

* Watson  (reference pb_bss/distribution/cwmm.py:168-215):
  ``log p = kappa |<y, mode>|^2 - log Z(kappa)`` — rank-1 form,
* Bingham (reference pb_bss/distribution/cbmm.py:58-237):
  ``log p = y^H V diag(lambda) V^H y - log c(lambda)`` — full form,

and their M-step statistics are the SAME affiliation-weighted scatter
(no 1/quadratic-form reweighting, unlike cACG). The M-step finish
(dominant eigenpair + concentration-table inverse for Watson; eigh +
warm chord-Newton moment inversion for Bingham) runs in XLA between
kernel launches inside the surrounding ``lax.scan``, reusing the scan
paths' exact finishing code for parity.

Parity is tested in tests/test_ops/test_pallas_mm_stream.py
(interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

__all__ = ['cwmm_em_long', 'cbmm_em_long', 'choose_tiles_mm']

_TINY = float(np.finfo(np.float32).tiny)


def _per_lane_floats_mm(d, k, tile_t, *, family, has_sal, init):
    """f32 values per lane live in VMEM for one launch layout
    (double-buffered blocks count 2x)."""
    common = (
        2 * (2 * d * tile_t                       # y blocks
             + (tile_t if has_sal else 0))
        + 2 * (2 * d * d * k + k)                 # scatter + asum out
        + k * tile_t                              # aff live values
    )
    if family == 'watson':
        step_in = 2 * (2 * d * k + 3 * k)         # mode, kappa/logz/w
    else:
        step_in = 2 * (2 * d * d * k + d * k + 2 * k)  # V, lam, c, w
    init_in = 2 * (k * tile_t)                    # aff0 block
    return common + (init_in if init else step_in)


def choose_tiles_mm(d, k, *, family, has_sal=False,
                    vmem_budget=10 * 2 ** 20):
    """(tile_t, feasible tile_f list) for the streamed E+stats kernel.

    Same policy as pallas_em_stream.choose_tiles: 512-frame time
    blocks, widest lane tile feasible for the PER-ITERATION layout;
    the one-shot from-init launch (which streams the aff0 block on
    top) is budgeted separately via `choose_init_tile_t_mm` and
    shrinks its own time block instead of narrowing the lane tile
    every iteration pays for.
    """
    assert family in ('watson', 'bingham'), family
    tile_t = 512
    per_lane = 4 * _per_lane_floats_mm(
        d, k, tile_t, family=family, has_sal=has_sal, init=False)
    tiles_f = [tf for tf in (512, 256, 128)
               if tf * per_lane <= vmem_budget
               and choose_init_tile_t_mm(
                   d, k, family=family, tile_f=tf, tile_t=tile_t,
                   has_sal=has_sal,
                   vmem_budget=vmem_budget) is not None]
    return (tile_t, tiles_f)


def choose_init_tile_t_mm(d, k, *, family, tile_f, tile_t=512,
                          has_sal=False, vmem_budget=10 * 2 ** 20):
    """Largest time block (a divisor of ``tile_t``) whose from-init
    layout fits the budget at ``tile_f``; None if no DIVIDING
    candidate fits (halving stops at the first odd value so a
    non-power-of-two ``tile_t`` never yields a non-divisor)."""
    tt = tile_t
    while tt >= 8:
        per_lane = 4 * _per_lane_floats_mm(
            d, k, tt, family=family, has_sal=has_sal, init=True)
        if tile_f * per_lane <= vmem_budget:
            return tt
        if tt % 2:
            break
        tt //= 2
    return None


def _mm_stats_stream_kernel(*refs, family, d, k, t_real, f_real,
                            tile_t, tile_f, affiliation_eps, tiny,
                            has_sal=False, from_init=False):
    """One (f-tile, t-block) step: E-step posterior (or the provided
    initial affiliations when ``from_init``) folded straight into the
    affiliation-weighted scatter / affiliation-sum accumulators."""
    it = iter(refs)
    y_re_ref, y_im_ref = next(it), next(it)
    if from_init:
        aff0_ref = next(it)
    elif family == 'watson':
        m_re_ref, m_im_ref, kappa_ref, cval_ref, weight_ref = (
            next(it), next(it), next(it), next(it), next(it))
    else:
        vre_in, vim_in, lam_ref, cval_ref, weight_ref = (
            next(it), next(it), next(it), next(it), next(it))
    sal_ref = next(it) if has_sal else None
    s_re_ref, s_im_ref, asum_ref = next(it), next(it), next(it)

    i_t = pl.program_id(1)

    t0 = i_t * tile_t
    trow = t0 + lax.broadcasted_iota(jnp.int32, (tile_t, tile_f), 0)
    t_mask = (trow < t_real).astype(jnp.float32)
    lane = (pl.program_id(0) * tile_f
            + lax.broadcasted_iota(jnp.int32, (2, tile_f), 1)[0])
    lane_valid = lane < f_real

    if from_init:
        aff = [aff0_ref[kk] * t_mask for kk in range(k)]
    else:
        # ---- E-step log-density per class ------------------------
        if family == 'watson':
            # kappa |<y, mode>|^2 - log Z
            log_pdf = []
            for kk in range(k):
                s_re = None
                s_im = None
                for dd in range(d):
                    m_r = m_re_ref[dd, kk]
                    m_i = m_im_ref[dd, kk]
                    y_r = y_re_ref[dd]
                    y_i = y_im_ref[dd]
                    tr = y_r * m_r + y_i * m_i
                    ti = y_i * m_r - y_r * m_i
                    s_re = tr if s_re is None else s_re + tr
                    s_im = ti if s_im is None else s_im + ti
                log_pdf.append(
                    kappa_ref[kk] * (s_re * s_re + s_im * s_im)
                    - cval_ref[kk])
        else:
            # assemble B = V diag(lam) V^H (upper triangle), then
            # y^H B y - log c (same assembly as the cACG stream
            # kernel with 1/eigenvalue -> lambda)
            b_r = {}
            b_i = {}
            for dd in range(d):
                for ee in range(dd, d):
                    cr = None
                    ci = None
                    for i_ in range(d):
                        vrd = vre_in[dd, i_]
                        vid = vim_in[dd, i_]
                        vre_ = vre_in[ee, i_]
                        vie = vim_in[ee, i_]
                        tr = lam_ref[i_] * (vrd * vre_ + vid * vie)
                        cr = tr if cr is None else cr + tr
                        if ee != dd:
                            ti = lam_ref[i_] * (vid * vre_ - vrd * vie)
                            ci = ti if ci is None else ci + ti
                    b_r[dd, ee] = cr
                    b_i[dd, ee] = ci

            qf_acc = [None] * k
            for dd in range(d):
                y_rd = y_re_ref[dd]
                y_id = y_im_ref[dd]
                for ee in range(dd, d):
                    p_re = y_rd * y_re_ref[ee] + y_id * y_im_ref[ee]
                    p_im = (None if ee == dd
                            else y_id * y_re_ref[ee]
                            - y_rd * y_im_ref[ee])
                    for kk in range(k):
                        if ee == dd:
                            term = b_r[dd, dd][kk] * p_re
                        else:
                            term = 2 * (b_r[dd, ee][kk] * p_re
                                        + b_i[dd, ee][kk] * p_im)
                        qf_acc[kk] = (term if qf_acc[kk] is None
                                      else qf_acc[kk] + term)
            log_pdf = [qf_acc[kk] - cval_ref[kk] for kk in range(k)]

        max_k = log_pdf[0]
        for kk in range(1, k):
            max_k = jnp.maximum(max_k, log_pdf[kk])
        num = [jnp.exp(log_pdf[kk] - max_k) * weight_ref[kk]
               for kk in range(k)]
        den = num[0]
        for kk in range(1, k):
            den = den + num[kk]
        den = jnp.maximum(den, tiny)
        aff = []
        for kk in range(k):
            a = num[kk] / den
            if affiliation_eps:
                a = jnp.clip(a, affiliation_eps, 1 - affiliation_eps)
            aff.append(a * t_mask)

    if has_sal:
        sal = sal_ref[...]
        aff = [a * sal for a in aff]

    # ---- statistics, accumulated across time blocks ----------------
    @pl.when(i_t == 0)
    def _init():
        s_re_ref[...] = jnp.zeros_like(s_re_ref)
        s_im_ref[...] = jnp.zeros_like(s_im_ref)
        asum_ref[...] = jnp.zeros_like(asum_ref)

    for kk in range(k):
        wsum = jnp.sum(aff[kk], axis=0)
        asum_ref[kk] = asum_ref[kk] + jnp.where(lane_valid, wsum, 0.0)
    for dd in range(d):
        y_rd = y_re_ref[dd]
        y_id = y_im_ref[dd]
        for ee in range(dd, d):
            p_re = y_rd * y_re_ref[ee] + y_id * y_im_ref[ee]
            p_im = (None if ee == dd
                    else y_id * y_re_ref[ee] - y_rd * y_im_ref[ee])
            for kk in range(k):
                s_re = jnp.sum(aff[kk] * p_re, axis=0)
                s_re_ref[dd, ee, kk] = s_re_ref[dd, ee, kk] + s_re
                if ee != dd:
                    s_im = jnp.sum(aff[kk] * p_im, axis=0)
                    s_im_ref[dd, ee, kk] = s_im_ref[dd, ee, kk] + s_im


def _stage_planes(x, t_pad, f_pad, constant_values=0.0):
    """(F, C, T) -> (C, t_pad, f_pad) float32."""
    F, C, T = x.shape
    x = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))
    return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, f_pad - F)),
                   constant_values=constant_values)


def _stream_machinery(y_re, y_im, affiliation, saliency, *, family,
                      K, tile_t, tile_f, affiliation_eps, interpret,
                      weight_mode='per_bin'):
    """Shared per-family launch plumbing.

    Returns (run_stats, scatter_of, weight_of, stage_planes_of,
    fold, unfold metadata...) closed over the staged observation.
    """
    batched = y_re.ndim == 4
    if batched:
        B, F, D, T = y_re.shape
    else:
        F, D, T = y_re.shape
        B = 1
    has_sal = saliency is not None

    fold = lambda x: (x.reshape((B * F,) + x.shape[2:])
                      if batched and x is not None else x)
    y_re_f, y_im_f = fold(y_re), fold(y_im)
    affiliation = fold(affiliation)
    saliency = fold(saliency)
    FB = B * F if batched else F

    if tile_t is None or tile_f is None:
        tt, tfs = choose_tiles_mm(D, K, family=family, has_sal=has_sal)
        if not tfs:
            raise ValueError(
                f'no feasible lane tile for the streamed {family} EM '
                f'kernel (D={D}, K={K})')
        tile_t = tile_t or tt
        if tile_f is None:
            f_pads = [-(-FB // tf) * tf for tf in tfs]
            tile_f = -min(zip(f_pads, [-tf for tf in tfs]))[1]
    t_pad = -(-T // tile_t) * tile_t
    f_pad = -(-FB // tile_f) * tile_f
    grid = (f_pad // tile_f, t_pad // tile_t)
    # the one-shot from-init launch uses its own (smaller) time block
    # so both launch layouts honor the same VMEM budget
    tile_t_init = choose_init_tile_t_mm(
        D, K, family=family, tile_f=tile_f, tile_t=tile_t,
        has_sal=has_sal)
    if tile_t_init is None:
        raise ValueError(
            f'no from-init time block dividing tile_t={tile_t} fits '
            f'the VMEM budget at tile_f={tile_f} ({family}, D={D}, '
            f'K={K}) — pass a power-of-two tile_t or a smaller '
            f'tile_f')
    assert tile_t % tile_t_init == 0, (tile_t, tile_t_init)
    grid_init = (f_pad // tile_f, t_pad // tile_t_init)

    y_re_s = _stage_planes(y_re_f, t_pad, f_pad)
    y_im_s = _stage_planes(y_im_f, t_pad, f_pad)
    sal_s = (None if saliency is None else jnp.pad(
        jnp.transpose(saliency.astype(jnp.float32), (1, 0)),
        ((0, t_pad - T), (0, f_pad - FB))))

    def y_specs_of(tt):
        return [
            pl.BlockSpec((D, tt, tile_f), lambda i, j: (0, j, i)),
            pl.BlockSpec((D, tt, tile_f), lambda i, j: (0, j, i)),
        ]

    def extra_specs_of(tt):
        return ([pl.BlockSpec((tt, tile_f), lambda i, j: (j, i))]
                if has_sal else [])

    out_specs = [
        pl.BlockSpec((D, D, K, tile_f), lambda i, j: (0, 0, 0, i)),
        pl.BlockSpec((D, D, K, tile_f), lambda i, j: (0, 0, 0, i)),
        pl.BlockSpec((K, tile_f), lambda i, j: (0, i)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
        jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
        jax.ShapeDtypeStruct((K, f_pad), jnp.float32),
    ]
    extra = [sal_s] if has_sal else []

    def run_stats(operands, in_specs, from_init):
        tt = tile_t_init if from_init else tile_t
        kernel = functools.partial(
            _mm_stats_stream_kernel, family=family, d=D, k=K, t_real=T,
            f_real=FB, tile_t=tt, tile_f=tile_f,
            affiliation_eps=float(affiliation_eps), tiny=_TINY,
            has_sal=has_sal, from_init=from_init)
        return pl.pallas_call(
            kernel, grid=grid_init if from_init else grid,
            in_specs=y_specs_of(tt) + in_specs + extra_specs_of(tt),
            out_specs=out_specs, out_shape=out_shapes,
            interpret=interpret,
        )(y_re_s, y_im_s, *operands, *extra)

    def scatter_of(s_re, s_im, asum):
        """Planes -> normalized Hermitian scatter (FB, K, D, D) +
        (FB, K) affiliation sums. The kernel accumulates the upper
        triangle only (real diagonal; lower stays zero) — mirror and
        un-double the diagonal."""
        upper = (jnp.transpose(s_re, (3, 2, 0, 1))
                 + 1j * jnp.transpose(s_im, (3, 2, 0, 1)))[:FB]
        diag = jnp.einsum('...dd->...d', upper)
        scatter = (upper + jnp.swapaxes(upper, -1, -2).conj()
                   - jnp.eye(D, dtype=upper.dtype)
                   * diag[..., :, None])
        asum_b = jnp.transpose(asum)[:FB]               # (FB, K)
        denom = jnp.maximum(asum_b, _TINY)[..., None, None]
        return scatter / denom.astype(scatter.dtype), asum_b

    def weight_of(asum_b):
        """Mixture weight from the (FB, K) affiliation sums —
        'per_bin' (``weight_constant_axis=(-1,)``) or 'fc'
        (``(-3, -1)``: one cross-bin reduction, a psum under a
        sharded 'f' axis); saliency-aware
        (estimate_mixture_weight semantics)."""
        if weight_mode == 'per_bin':
            if has_sal:
                denom = jnp.sum(asum_b, axis=-1, keepdims=True)
                denom = jnp.where(denom == 0, jnp.float32(1e-10), denom)
                return asum_b / denom
            return asum_b / T
        if batched:
            sums = jnp.sum(asum_b.reshape(B, F, K), axis=1)
        else:
            sums = jnp.sum(asum_b, axis=0)
        if has_sal:
            denom = jnp.sum(sums, axis=-1, keepdims=True)
            denom = jnp.where(denom == 0, jnp.float32(1e-10), denom)
            return sums / denom
        return sums / (F * T)

    def pad_planes(x, extra_dims):
        """(FB, K, ...) model leaf -> (..., K, f_pad) kernel plane."""
        perm = tuple(range(2, 2 + extra_dims)) + (1, 0)
        return jnp.pad(
            jnp.transpose(x.astype(jnp.float32), perm),
            ((0, 0),) * (extra_dims + 1) + ((0, f_pad - FB),))

    def weight_planes(w):
        """Weight -> (K, f_pad) lane planes: per-bin (FB, K) weights
        transpose; fc (K,)/(B, K) weights broadcast over bins."""
        if weight_mode == 'per_bin':
            return pad_planes(w, 0)
        if batched:
            full = jnp.broadcast_to(
                w[:, None, :], (B, F, K)).reshape(FB, K)
        else:
            full = jnp.broadcast_to(w[None, :], (FB, K))
        return pad_planes(full, 0)

    meta = dict(batched=batched, B=B, F=F, D=D, T=T, FB=FB,
                f_pad=f_pad, tile_f=tile_f, tile_t=tile_t,
                tile_t_init=tile_t_init,
                affiliation=affiliation, weight_planes=weight_planes)
    return run_stats, scatter_of, weight_of, pad_planes, fold, meta


_AFF_SPEC = lambda K, tile_t, tile_f: [
    pl.BlockSpec((K, tile_t, tile_f), lambda i, j: (0, j, i))]


@functools.partial(
    jax.jit,
    static_argnames=('iterations', 'sweeps', 'max_concentration',
                     'spline_markers', 'weight_mode', 'tile_t',
                     'tile_f', 'interpret'))
def cwmm_em_long(y_re, y_im, affiliation, *, iterations,
                 max_concentration=500.0, spline_markers=1000,
                 weight_mode='per_bin', sweeps=None, tile_t=None,
                 tile_f=None, interpret=False, saliency=None):
    """Streamed complex-Watson-MM EM for signals too long for the
    whole-fit kernel (ops/pallas_cwmm_loop.py).

    Semantics match the scan path (models/cwmm.py:_cwmm_fit_em):
    ``iterations`` M-steps from the given affiliations with an E-step
    between; per-bin OR frequency-constant mixture weights
    (``weight_mode`` — 'fc' reduces the affiliation sums over bins,
    a psum under a sharded 'f' axis); the concentration inverse uses
    the scan path's log-spaced ``jnp.interp`` table (NOT the whole-fit
    kernel's uniform grid), so parity with the scan path is tight.

    Args:
        y_re / y_im: (F, D, T) unit-norm observation planes,
            time-last; a leading batch axis (B, F, D, T) folds into
            the bin axis.
        affiliation: (.., F, K, T) initial posteriors.
        saliency: optional (.., F, T) frame weights.
    Returns:
        (weight — (.., F, K) for 'per_bin', (K,)/(B, K) for 'fc' —
        mode (.., F, K, D) complex64, concentration (.., F, K)).
    """
    from ..models.complex_watson import (
        ComplexWatson, _hypergeometric_ratio_grid,
    )
    from .linalg import eigh

    K = affiliation.shape[-2]
    run_stats, scatter_of, weight_of, pad_planes, fold, meta = (
        _stream_machinery(
            y_re, y_im, affiliation, saliency, family='watson', K=K,
            tile_t=tile_t, tile_f=tile_f, affiliation_eps=0.0,
            interpret=interpret, weight_mode=weight_mode))
    D, T = meta['D'], meta['T']
    tile_tt, tile_ff = meta['tile_t'], meta['tile_f']
    t_pad = -(-T // tile_tt) * tile_tt
    ratio_grid, kappa_grid = _hypergeometric_ratio_grid(
        D, max_concentration, spline_markers)

    def finish_m(s_re, s_im, asum):
        scatter, asum_b = scatter_of(s_re, s_im, asum)
        ev, vec = eigh(scatter, sweeps=sweeps)
        mode = vec[..., :, -1]                      # dominant (FB,K,D)
        kappa = jnp.interp(
            ev[..., -1], ratio_grid, kappa_grid).astype(jnp.float32)
        return mode, kappa, weight_of(asum_b)

    aff_s = _stage_planes(
        meta['affiliation'], t_pad, meta['f_pad'])
    s_re, s_im, asum = run_stats(
        [aff_s], _AFF_SPEC(K, meta['tile_t_init'], tile_ff),
        from_init=True)
    mode, kappa, weight = finish_m(s_re, s_im, asum)

    step_specs = [
        pl.BlockSpec((D, K, tile_ff), lambda i, j: (0, 0, i)),
        pl.BlockSpec((D, K, tile_ff), lambda i, j: (0, 0, i)),
        pl.BlockSpec((K, tile_ff), lambda i, j: (0, i)),
        pl.BlockSpec((K, tile_ff), lambda i, j: (0, i)),
        pl.BlockSpec((K, tile_ff), lambda i, j: (0, i)),
    ]

    def step(carry, _):
        mode, kappa, weight = carry
        logz = ComplexWatson.log_norm_tran_vu(
            kappa, D).astype(jnp.float32)
        planes = [
            pad_planes(mode.real, 1), pad_planes(mode.imag, 1),
            pad_planes(kappa, 0), pad_planes(logz, 0),
            meta['weight_planes'](weight),
        ]
        s_re, s_im, asum = run_stats(planes, step_specs,
                                     from_init=False)
        return finish_m(s_re, s_im, asum), None

    if iterations > 1:
        (mode, kappa, weight), _ = lax.scan(
            step, (mode, kappa, weight), None, length=iterations - 1)

    if meta['batched']:
        B, F = meta['B'], meta['F']
        if weight_mode == 'per_bin':
            weight = weight.reshape(B, F, K)
        return (weight, mode.reshape(B, F, K, D),
                kappa.reshape(B, F, K))
    return weight, mode, kappa


@functools.partial(
    jax.jit,
    static_argnames=('iterations', 'max_concentration', 'spacing_eps',
                     'affiliation_eps', 'weight_mode', 'sweeps',
                     'tile_t', 'tile_f', 'interpret'))
def cbmm_em_long(y_re, y_im, affiliation, *, iterations,
                 max_concentration=np.inf, spacing_eps=None,
                 affiliation_eps=0.0, weight_mode='per_bin',
                 sweeps=None, tile_t=None, tile_f=None,
                 interpret=False, saliency=None):
    """Streamed complex-Bingham-MM EM for signals too long for the
    whole-fit kernel (ops/pallas_cbmm_loop.py).

    Semantics match the scan path (models/cbmm.py:_cbmm_fit_em):
    per-bin or frequency-constant weights (``weight_mode``), E-step
    ``affiliation_eps`` clip, and the SAME
    moment inversion — cold 50-step damped Newton on the first
    M-step, 16 warm chord steps after (models/complex_bingham.py:
    find_eigenvalues) — so parity with the scan path is tight.

    Args / returns mirror :func:`cwmm_em_long`, with
    (weight (.., F, K), eigenvalues (.., F, K, D) — max pinned to 0,
    ascending with the scatter eigh — and eigenvectors
    (.., F, K, D, D) complex64).
    """
    from ..models.complex_bingham import ComplexBingham, find_eigenvalues
    from .linalg import eigh

    K = affiliation.shape[-2]
    run_stats, scatter_of, weight_of, pad_planes, fold, meta = (
        _stream_machinery(
            y_re, y_im, affiliation, saliency, family='bingham', K=K,
            tile_t=tile_t, tile_f=tile_f,
            affiliation_eps=affiliation_eps, interpret=interpret,
            weight_mode=weight_mode))
    D, T = meta['D'], meta['T']
    tile_tt, tile_ff = meta['tile_t'], meta['tile_f']
    t_pad = -(-T // tile_tt) * tile_tt
    mc = (float(max_concentration)
          if np.isfinite(max_concentration) else np.inf)

    def finish_m(s_re, s_im, asum, warm_start=None):
        scatter, asum_b = scatter_of(s_re, s_im, asum)
        sev, vec = eigh(scatter, sweeps=sweeps)
        sev = jnp.maximum(sev, 0.0)
        lam = find_eigenvalues(
            sev, max_concentration=mc, eps=spacing_eps,
            iterations=50 if warm_start is None else 16,
            warm_start=warm_start)
        return lam, vec, weight_of(asum_b)

    aff_s = _stage_planes(
        meta['affiliation'], t_pad, meta['f_pad'])
    s_re, s_im, asum = run_stats(
        [aff_s], _AFF_SPEC(K, meta['tile_t_init'], tile_ff),
        from_init=True)
    lam, vec, weight = finish_m(s_re, s_im, asum)

    step_specs = [
        pl.BlockSpec((D, D, K, tile_ff), lambda i, j: (0, 0, 0, i)),
        pl.BlockSpec((D, D, K, tile_ff), lambda i, j: (0, 0, 0, i)),
        pl.BlockSpec((D, K, tile_ff), lambda i, j: (0, 0, i)),
        pl.BlockSpec((K, tile_ff), lambda i, j: (0, i)),
        pl.BlockSpec((K, tile_ff), lambda i, j: (0, i)),
    ]

    def step(carry, _):
        lam, vec, weight = carry
        lognorm = ComplexBingham(
            covariance_eigenvectors=vec,
            covariance_eigenvalues=lam,
        ).log_norm().astype(jnp.float32)
        planes = [
            pad_planes(vec.real, 2), pad_planes(vec.imag, 2),
            # kernel assembles B with lam indexed (direction, K, lane):
            # transpose (FB, K, D) -> (D, K, f_pad)
            pad_planes(lam, 1),
            pad_planes(lognorm, 0), meta['weight_planes'](weight),
        ]
        s_re, s_im, asum = run_stats(planes, step_specs,
                                     from_init=False)
        return finish_m(s_re, s_im, asum, warm_start=lam), None

    if iterations > 1:
        (lam, vec, weight), _ = lax.scan(
            step, (lam, vec, weight), None, length=iterations - 1)

    if meta['batched']:
        B, F = meta['B'], meta['F']
        if weight_mode == 'per_bin':
            weight = weight.reshape(B, F, K)
        return (weight, lam.reshape(B, F, K, D),
                vec.reshape(B, F, K, D, D))
    return weight, lam, vec
