"""Pallas TPU kernels: streamed per-iteration cACGMM EM for LONG
signals.

The whole-fit kernel (ops/pallas_em_loop.py) needs the entire time
axis resident in VMEM next to a frequency tile — at the 6-channel
3-class shape that caps T around ~600 frames. Longer signals fell
back to scan paths that materialize the (F, K, D, T) whitened
projection and the (F, K, T) posterior in HBM every iteration
(measured 8.9 ms/iteration at T=6000 — roughly 4x the pure-HBM floor
of reading y once).

Here each EM iteration is ONE kernel launch with grid
(frequency tiles x TIME BLOCKS): the scatter and affiliation-sum
accumulators live in the revisited output block (the last grid
dimension iterates fastest, so for a fixed frequency tile the time
blocks hit the same VMEM-resident block back to back — the standard
matmul accumulation pattern), the E-step posterior of each
(f-tile, t-block) is consumed into the statistics immediately, and
per-iteration HBM traffic is ONE read of y plus the tiny model state.
The M-step finish (batched Pallas Jacobi eigh via ops/pallas_eigh.py,
eigenvalue floor, weight) runs in XLA inside the surrounding
``lax.scan``; both weight modes are supported — per-bin
(``weight_constant_axis=(-1,)``: weight = asum / T per lane) and
frequency-constant (``(-3, -1)``: one cross-bin reduction, a psum
under a sharded 'f' axis).

Numerics replicate the scan path's guard ladder (see
pallas_em_loop's docstring); parity is tested in
tests/test_ops/test_pallas_em_stream.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from .pallas_eigh import eigh_jacobi_pallas

__all__ = ['cacgmm_em_long', 'choose_tiles']

_TINY = float(np.finfo(np.float32).tiny)


def _per_lane_floats(d, k, tile_t, *, has_sal, has_mask, init):
    """f32 values per lane live in VMEM for one launch layout
    (double-buffered blocks count 2x). The per-iteration pass streams
    the model planes; the one-shot from_init pass streams aff0/qf0 as
    (K, tile_t, tile_f) blocks instead."""
    common = (
        2 * (2 * d * tile_t                       # y blocks
             + (tile_t if has_sal else 0)
             + (k * tile_t if has_mask else 0))
        + 2 * (2 * d * d * k + k)                 # scatter + asum out
        + 2 * k * tile_t                          # aff/qf live values
    )
    step_in = 2 * (2 * d * d * k + d * k + 2 * k)  # V, inv, logdet, w
    init_in = 2 * (2 * k * tile_t)                 # aff0 + qf0 blocks
    return common + (init_in if init else step_in)


def choose_tiles(d, k, *, has_sal=False, has_mask=False,
                 vmem_budget=10 * 2 ** 20):
    """(tile_t, tile_f) for the streamed E+stats kernel: fix a
    512-frame time block (large enough to amortize block switches,
    small enough to leave lanes) and take the widest feasible lane
    tile against the PER-ITERATION layout. The one-shot from_init
    launch is budgeted separately (`choose_init_tile_t`): it shrinks
    its own time block rather than shrinking the lane tile every
    iteration pays for."""
    tile_t = 512
    per_lane = 4 * _per_lane_floats(
        d, k, tile_t, has_sal=has_sal, has_mask=has_mask, init=False)
    tiles_f = [tf for tf in (512, 256, 128)
               if tf * per_lane <= vmem_budget
               and choose_init_tile_t(
                   d, k, has_sal=has_sal, has_mask=has_mask,
                   vmem_budget=vmem_budget, tile_f=tf,
                   tile_t=tile_t) is not None]
    return (tile_t, tiles_f)


def choose_init_tile_t(d, k, *, tile_f, tile_t=512, has_sal=False,
                       has_mask=False, vmem_budget=10 * 2 ** 20):
    """Largest time block (a divisor of ``tile_t``, so the staged
    padding serves both launches) whose from_init layout fits the
    budget at ``tile_f``; None if no DIVIDING candidate fits (for a
    non-power-of-two ``tile_t`` the halving chain stops at the first
    odd value — blind halving could land on a feasible size that does
    not divide ``tile_t`` and corrupt the shared staging)."""
    tt = tile_t
    while tt >= 8:
        per_lane = 4 * _per_lane_floats(
            d, k, tt, has_sal=has_sal, has_mask=has_mask, init=True)
        if tile_f * per_lane <= vmem_budget:
            return tt
        if tt % 2:
            break
        tt //= 2
    return None


def _e_stats_stream_kernel(*refs, d, k, t_real, f_real, tile_t,
                           tile_f, affiliation_eps, tiny,
                           has_sal=False, has_mask=False,
                           from_init=False):
    """One (f-tile, t-block) step: E-step posterior (or the provided
    initial affiliations when ``from_init``) folded straight into the
    scatter / affiliation-sum accumulators."""
    it = iter(refs)
    y_re_ref, y_im_ref = next(it), next(it)
    if from_init:
        aff0_ref, qf0_ref = next(it), next(it)
        vre_in = vim_in = inv_ref = logdet_ref = weight_ref = None
    else:
        aff0_ref = qf0_ref = None
        vre_in, vim_in, inv_ref, logdet_ref, weight_ref = (
            next(it), next(it), next(it), next(it), next(it))
    sal_ref = next(it) if has_sal else None
    sam_ref = next(it) if has_mask else None
    s_re_ref, s_im_ref, asum_ref = next(it), next(it), next(it)

    i_t = pl.program_id(1)

    # global time validity of this block's columns
    t0 = i_t * tile_t
    trow = t0 + lax.broadcasted_iota(
        jnp.int32, (tile_t, tile_f), 0)
    t_mask = (trow < t_real).astype(jnp.float32)
    # lane validity (padding bins must not pollute the global weight)
    lane = (pl.program_id(0) * tile_f
            + lax.broadcasted_iota(jnp.int32, (2, tile_f), 1)[0])
    lane_valid = lane < f_real

    if from_init:
        aff = [aff0_ref[kk] * t_mask for kk in range(k)]
        qf = [qf0_ref[kk] for kk in range(k)]
    else:
        # ---- E-step via the assembled inverse covariance ----------
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

    w = [aff[kk] / jnp.maximum(qf[kk], 10 * tiny) for kk in range(k)]
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
                s_re = jnp.sum(w[kk] * p_re, axis=0)
                s_re_ref[dd, ee, kk] = s_re_ref[dd, ee, kk] + s_re
                if ee != dd:
                    s_im = jnp.sum(w[kk] * p_im, axis=0)
                    s_im_ref[dd, ee, kk] = s_im_ref[dd, ee, kk] + s_im


def _stage_planes(x, t_pad, f_pad, constant_values=0.0):
    """(F, C, T) -> (C, t_pad, f_pad) float32."""
    F, C, T = x.shape
    x = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))
    return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, f_pad - F)),
                   constant_values=constant_values)


@functools.partial(
    jax.jit,
    static_argnames=('iterations', 'sweeps', 'eigenvalue_floor',
                     'affiliation_eps', 'weight_mode', 'tile_t',
                     'tile_f', 'interpret', 'first_e_step'))
def cacgmm_em_long(y_re, y_im, affiliation, quadratic_form, *,
                   iterations, sweeps=None, eigenvalue_floor=1e-10,
                   affiliation_eps=1e-10, weight_mode='per_bin',
                   tile_t=None, tile_f=None, interpret=False,
                   saliency=None, source_activity_mask=None,
                   first_e_step=False, init_weight=None,
                   init_eigenvalues=None, init_eigenvectors=None):
    """Streamed cACGMM EM for signals too long for the whole-fit
    kernel.

    Args:
        y_re / y_im: (F, D, T) observation planes (unit-norm,
            time-last); a leading batch axis (B, F, D, T) folds into
            the bin axis (for ``weight_mode='fc'`` the weight
            reduction stays per-utterance).
        weight_mode: 'per_bin' (``weight_constant_axis=(-1,)``) or
            'fc' (``(-3, -1)`` — frequency-constant, the cross-shard
            psum mode).
        first_e_step: resume from the model given by ``init_*``
            (weights per-bin (.., F, K) for 'per_bin', global (K,) /
            (B, K) for 'fc').
    Returns:
        (weight, eigenvalues (.., F, K, D), eigenvectors
        (.., F, K, D, D) c64), eigenpairs ascending; weight shaped
        (.., F, K) for 'per_bin' and (K,)/(B, K) for 'fc'.
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
    if sweeps is None:
        sweeps = 6 if D <= 8 else 8

    fold = lambda x: (x.reshape((B * F,) + x.shape[2:])
                      if batched and x is not None else x)
    y_re_f, y_im_f = fold(y_re), fold(y_im)
    affiliation = fold(affiliation)
    quadratic_form = fold(quadratic_form)
    saliency = fold(saliency)
    source_activity_mask = fold(source_activity_mask)
    FB = B * F if batched else F

    if tile_t is None or tile_f is None:
        tt, tfs = choose_tiles(D, K, has_sal=has_sal,
                               has_mask=has_mask)
        if not tfs:
            raise ValueError(
                f'no feasible lane tile for the streamed EM kernel '
                f'(D={D}, K={K})')
        tile_t = tile_t or tt
        if tile_f is None:
            f_pads = [-(-FB // tf) * tf for tf in tfs]
            tile_f = -min(zip(f_pads, [-tf for tf in tfs]))[1]
    t_pad = -(-T // tile_t) * tile_t
    f_pad = -(-FB // tile_f) * tile_f
    grid = (f_pad // tile_f, t_pad // tile_t)
    # the one-shot from_init launch streams aff0/qf0 blocks on top of
    # the y blocks; it takes a smaller time block (a divisor of
    # tile_t, so t_pad serves both launches) to stay inside the same
    # VMEM budget instead of narrowing the per-iteration lane tile
    tile_t_init = choose_init_tile_t(
        D, K, tile_f=tile_f, tile_t=tile_t,
        has_sal=has_sal, has_mask=has_mask)
    if tile_t_init is None:
        raise ValueError(
            f'no from_init time block dividing tile_t={tile_t} fits '
            f'the VMEM budget at tile_f={tile_f} (D={D}, K={K}) — '
            f'pass a power-of-two tile_t or a smaller tile_f')
    assert tile_t % tile_t_init == 0, (tile_t, tile_t_init)
    grid_init = (f_pad // tile_f, t_pad // tile_t_init)
    rdtype = jnp.float32

    y_re_s = _stage_planes(y_re_f, t_pad, f_pad)
    y_im_s = _stage_planes(y_im_f, t_pad, f_pad)
    sal_s = (None if saliency is None else jnp.pad(
        jnp.transpose(saliency.astype(rdtype), (1, 0)),
        ((0, t_pad - T), (0, f_pad - FB))))
    sam_s = (None if source_activity_mask is None
             else _stage_planes(source_activity_mask.astype(rdtype),
                                t_pad, f_pad))

    def y_specs_of(tt):
        return [
            pl.BlockSpec((D, tt, tile_f), lambda i, j: (0, j, i)),
            pl.BlockSpec((D, tt, tile_f), lambda i, j: (0, j, i)),
        ]

    def extra_specs_of(tt):
        sal_spec = [pl.BlockSpec((tt, tile_f), lambda i, j: (j, i))]
        sam_spec = [
            pl.BlockSpec((K, tt, tile_f), lambda i, j: (0, j, i))]
        return (sal_spec if has_sal else []) + (
            sam_spec if has_mask else [])

    model_specs = [
        pl.BlockSpec((D, D, K, tile_f), lambda i, j: (0, 0, 0, i)),
        pl.BlockSpec((D, D, K, tile_f), lambda i, j: (0, 0, 0, i)),
        pl.BlockSpec((D, K, tile_f), lambda i, j: (0, 0, i)),
        pl.BlockSpec((K, tile_f), lambda i, j: (0, i)),
        pl.BlockSpec((K, tile_f), lambda i, j: (0, i)),
    ]
    out_specs = [
        pl.BlockSpec((D, D, K, tile_f), lambda i, j: (0, 0, 0, i)),
        pl.BlockSpec((D, D, K, tile_f), lambda i, j: (0, 0, 0, i)),
        pl.BlockSpec((K, tile_f), lambda i, j: (0, i)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((D, D, K, f_pad), rdtype),
        jax.ShapeDtypeStruct((D, D, K, f_pad), rdtype),
        jax.ShapeDtypeStruct((K, f_pad), rdtype),
    ]
    extra = ([sal_s] if has_sal else []) + ([sam_s] if has_mask else [])

    def run_stats(operands, in_specs, from_init, tt, launch_grid):
        kernel = functools.partial(
            _e_stats_stream_kernel, d=D, k=K, t_real=T, f_real=FB,
            tile_t=tt, tile_f=tile_f,
            affiliation_eps=float(affiliation_eps), tiny=_TINY,
            has_sal=has_sal, has_mask=has_mask, from_init=from_init)
        s_re, s_im, asum = pl.pallas_call(
            kernel, grid=launch_grid, in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shapes,
            interpret=interpret,
        )(*operands)
        return s_re, s_im, asum

    def finish_m(s_re, s_im, asum):
        """XLA M-step finish: weight + covariance eigh."""
        # planes -> (FB, K, D, D) Hermitian scatter: the kernel
        # accumulates only the upper triangle (incl. the real
        # diagonal; the lower triangle stays at its zero init), so
        # mirror it and subtract the once-double-counted diagonal.
        upper = (jnp.transpose(s_re, (3, 2, 0, 1))
                 + 1j * jnp.transpose(s_im, (3, 2, 0, 1)))[:FB]
        diag = jnp.einsum('...dd->...d', upper)
        scatter = (upper + jnp.swapaxes(upper, -1, -2).conj()
                   - jnp.eye(D, dtype=upper.dtype)
                   * diag[..., :, None])
        asum_b = jnp.transpose(asum)[:FB]              # (FB, K)
        denom = jnp.maximum(asum_b, _TINY)[..., None, None]
        covariance = D * scatter / denom.astype(scatter.dtype)
        eigenvalues, eigenvectors = eigh_jacobi_pallas(
            covariance, sweeps=sweeps, interpret=interpret)
        lam_max = jnp.maximum(
            jnp.max(eigenvalues, axis=-1, keepdims=True), _TINY)
        eigenvalues = jnp.maximum(
            eigenvalues / lam_max, eigenvalue_floor)
        return eigenvalues, eigenvectors, asum_b

    def weight_of(asum_b):
        if weight_mode == 'per_bin':
            if has_sal:
                # saliency-weighted sums, L1-normalized over classes
                # ('where' eps style — estimate_mixture_weight)
                denom = jnp.sum(asum_b, axis=-1, keepdims=True)
                denom = jnp.where(denom == 0, rdtype(1e-10), denom)
                return asum_b / denom
            return asum_b / T                          # (FB, K)
        if batched:
            sums = jnp.sum(asum_b.reshape(B, F, K), axis=1)
        else:
            sums = jnp.sum(asum_b, axis=0)
        if has_sal:
            denom = jnp.sum(sums, axis=-1, keepdims=True)
            denom = jnp.where(denom == 0, rdtype(1e-10), denom)
            return sums / denom
        return sums / (F * T)

    def stage_model(eigenvalues, eigenvectors, weight):
        """(FB, K, D[, D]) model -> kernel-layout planes."""
        vre = jnp.pad(jnp.transpose(
            eigenvectors.real.astype(rdtype), (2, 3, 1, 0)),
            ((0, 0),) * 3 + ((0, f_pad - FB),))
        vim = jnp.pad(jnp.transpose(
            eigenvectors.imag.astype(rdtype), (2, 3, 1, 0)),
            ((0, 0),) * 3 + ((0, f_pad - FB),))
        inv = jnp.pad(jnp.transpose(
            (1.0 / eigenvalues).astype(rdtype), (2, 1, 0)),
            ((0, 0),) * 2 + ((0, f_pad - FB),), constant_values=1.0)
        logdet = jnp.pad(jnp.transpose(
            jnp.sum(jnp.log(eigenvalues), axis=-1).astype(rdtype)),
            ((0, 0), (0, f_pad - FB)))
        if weight_mode == 'per_bin':
            w_planes = jnp.pad(
                jnp.transpose(weight.astype(rdtype)),
                ((0, 0), (0, f_pad - FB)))
        else:
            if batched:
                full = jnp.broadcast_to(
                    weight[:, None, :], (B, F, K)).reshape(FB, K)
            else:
                full = jnp.broadcast_to(weight[None, :], (FB, K))
            w_planes = jnp.pad(jnp.transpose(full.astype(rdtype)),
                               ((0, 0), (0, f_pad - FB)))
        return vre, vim, inv, logdet, w_planes

    if not first_e_step:
        aff_s = _stage_planes(affiliation, t_pad, f_pad)
        qf_s = _stage_planes(quadratic_form, t_pad, f_pad,
                             constant_values=1.0)
        tti = tile_t_init
        in_specs = y_specs_of(tti) + [
            pl.BlockSpec((K, tti, tile_f), lambda i, j: (0, j, i)),
            pl.BlockSpec((K, tti, tile_f), lambda i, j: (0, j, i)),
        ] + extra_specs_of(tti)
        s_re, s_im, asum = run_stats(
            [y_re_s, y_im_s, aff_s, qf_s] + extra, in_specs,
            from_init=True, tt=tti, launch_grid=grid_init)
        eigenvalues, eigenvectors, asum_b = finish_m(s_re, s_im, asum)
        weight = weight_of(asum_b)
        n_steps = iterations - 1
    else:
        assert init_weight is not None
        eigenvalues = fold(init_eigenvalues)
        eigenvectors = fold(init_eigenvectors)
        if weight_mode == 'per_bin':
            weight = fold(init_weight)
        elif batched:
            # widen a (1, K) 'broadcast over B' weight now: the scan
            # carry must match weight_of's (B, K) output type
            weight = jnp.broadcast_to(init_weight, (B, K))
        else:
            weight = init_weight
        n_steps = iterations

    step_in_specs = (y_specs_of(tile_t) + model_specs
                     + extra_specs_of(tile_t))

    def step(carry, _):
        eigenvalues, eigenvectors, weight = carry
        planes = stage_model(eigenvalues, eigenvectors, weight)
        s_re, s_im, asum = run_stats(
            [y_re_s, y_im_s, *planes] + extra, step_in_specs,
            from_init=False, tt=tile_t, launch_grid=grid)
        eigenvalues, eigenvectors, asum_b = finish_m(s_re, s_im, asum)
        return (eigenvalues, eigenvectors, weight_of(asum_b)), None

    if n_steps > 0:
        (eigenvalues, eigenvectors, weight), _ = lax.scan(
            step, (eigenvalues, eigenvectors, weight), None,
            length=n_steps)

    if batched:
        eigenvalues = eigenvalues.reshape(B, F, K, D)
        eigenvectors = eigenvectors.reshape(B, F, K, D, D)
        if weight_mode == 'per_bin':
            weight = weight.reshape(B, F, K)
    return weight, eigenvalues, eigenvectors
