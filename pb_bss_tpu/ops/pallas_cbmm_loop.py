"""Pallas TPU kernel: the ENTIRE CBMM EM loop in one kernel launch.

The scan-based CBMM EM (models/cbmm.py:_cbmm_fit_em) is the slowest
spatial model (~1.7 ms/EM-iteration warm at the benchmark shape): per
iteration it pays the XLA glue around the Pallas chord solver (staging
transposes), the XLA ``_expm_bidiagonal`` log-norm (27 sequential
HIGHEST batched matmuls), the full-covariance E-step einsum and the
per-iteration Pallas eigh launch.

This kernel applies the ops/pallas_em_loop.py architecture to the
Bingham mixture: frequency bins in the lane dimension (layout
(D, T, F_tile)), the observation tile resident in VMEM across ALL
iterations, and a statically-unrolled loop running per iteration

  * M-step scatter ``S_k = sum_t a_kt y y^H / sum_t a_kt`` built
    Hermitian from its upper triangle (NO quadratic-form weighting and
    no ``D`` factor — Bingham scatter, reference
    pb_bss/distribution/complex_bingham.py:427-447),
  * in-kernel cyclic Jacobi eigendecomposition (warm-started in the
    previous iteration's eigenbasis after the first iteration),
  * an ascending bubble sort of the scatter eigenvalues with paired
    eigenvector-column swaps + minimum-spacing regularization
    (reference :166-203; the solver's diff parameterization needs
    ascending nodes),
  * the warm chord Gauss-Newton moment inversion — the
    ops/pallas_bingham.py cascade/chord machinery on (K, F_tile)
    planes; iteration 0 runs the cold ``-1/s`` init with
    ``cold_rounds`` Jacobian refreshes, later iterations one refresh
    warm-started from the previous Bingham eigenvalues (resident in
    scratch),
  * the log normalizer from one extra divided-difference cascade
    (``log Z = log 2 + D log pi + log exp[lambda_1..lambda_D]``,
    models/complex_bingham.py:_log_norm_dd) — no XLA expm,
  * the E-step ``log_pdf = y^H (V diag(lambda) V^H) y - log Z`` via
    shared pair products (the ops/pallas_em_loop.py E-step with
    weights ``lambda`` instead of ``1/lambda`` and the analytic log
    normalizer instead of the determinant).

Numerics replicate the scan path (same guards): scatter eigenvalue
floor at 0, minimum spacing (dtype-aware 1e-3 at f32 — the reference's
1e-8 is sub-ulp at f32 concentration scale), chord bounds
``u in [-32768/(D-1), -1e-3]``, max-shift softmax with optional
affiliation_eps clipping (final E-step unclipped = ``model.predict``).

Parity with the scan path is tested in
tests/test_ops/test_pallas_cbmm_loop.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_bingham import (
    _chord_round,
    _grad_cascade,
    _lam_of_u,
)
from .pallas_em_loop import _jacobi_rounds, _warm_rotate

__all__ = ['cbmm_em_full', 'choose_tile_f_cbmm']

_TINY = float(np.finfo(np.float32).tiny)
_LOG_2PI_D = lambda d: float(np.log(2.0) + d * np.log(np.pi))


def _cbmm_loop_kernel(*refs, d, k, iterations, sweeps, warm_sweeps,
                      t_real, spacing_eps, lower, upper, fd_step,
                      cold_rounds, cold_steps, warm_steps,
                      affiliation_eps, tiny, has_sal=False,
                      cap_init=32768.0, max_concentration=None):
    """One frequency tile: all CBMM EM iterations, y resident in VMEM.

    Blocks (lane dim = frequency tile F'): y (D, T, F') planes,
    aff0 (K, T, F'); optional saliency (T, F') when ``has_sal``.
    Outputs: aff (K, T, F'), V (D, D, K, F') planes,
    Bingham eigenvalues (D, K, F') ascending (max pinned to 0),
    weight (K, F'), log normalizer (K, F').
    """
    it = iter(refs)
    y_re_ref, y_im_ref, aff0_ref = next(it), next(it), next(it)
    sal_ref = next(it) if has_sal else None
    (aff_ref, vre_ref, vim_ref, lamb_out_ref, weight_ref,
     logz_ref) = (next(it), next(it), next(it), next(it), next(it),
                  next(it))
    (ar, ai, br, bi, u_ref, j_ref, m_ref, g_ref,
     t6, tx, e6, xm, e6b, xmb, lamb_ref) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it))
    t_pad = y_re_ref.shape[1]
    if t_pad == t_real:
        mask = None
    else:
        mask = (lax.broadcasted_iota(
            jnp.int32, (t_pad, y_re_ref.shape[2]), 0) < t_real
        ).astype(jnp.float32)

    aff_ref[...] = (aff0_ref[...] if mask is None
                    else aff0_ref[...] * mask[None])

    sal = sal_ref[...] if has_sal else None  # (T, F')

    plane = (k,) + tuple(y_re_ref.shape[2:])  # (K, F')

    def body(i, carry, *, warm):
        # ---- M-step scatter + weight -------------------------------
        # With saliency the scatter statistics weight by a*s and the
        # mixture weight is L1-normalized over classes
        # (estimate_mixture_weight semantics, reference
        # mixture_model_utils.py:133-203).
        a_eff = []
        wsums = []
        wsum = []
        for kk in range(k):
            a = aff_ref[kk]  # (T, F')
            if has_sal:
                a = a * sal
            a_eff.append(a)
            s = jnp.sum(a, axis=0)  # (F',)
            wsums.append(s)
            wsum.append(1.0 / jnp.maximum(s, tiny))
        if has_sal:
            norm = wsums[0]
            for kk in range(1, k):
                norm = norm + wsums[kk]
            norm = jnp.where(norm == 0, jnp.float32(1e-10), norm)
            for kk in range(k):
                weight_ref[kk] = wsums[kk] / norm
        else:
            for kk in range(k):
                weight_ref[kk] = wsums[kk] / t_real
        for dd in range(d):
            y_rd = y_re_ref[dd]
            y_id = y_im_ref[dd]
            for ee in range(dd, d):
                p_re = y_rd * y_re_ref[ee] + y_id * y_im_ref[ee]
                p_im = (None if ee == dd
                        else y_id * y_re_ref[ee] - y_rd * y_im_ref[ee])
                for kk in range(k):
                    a = a_eff[kk]
                    s_re = jnp.sum(a * p_re, axis=0) * wsum[kk]
                    ar[dd, ee, kk] = s_re
                    if ee == dd:
                        ai[dd, dd, kk] = jnp.zeros_like(s_re)
                    else:
                        s_im = jnp.sum(a * p_im, axis=0) * wsum[kk]
                        ar[ee, dd, kk] = s_re
                        ai[dd, ee, kk] = s_im
                        ai[ee, dd, kk] = -s_im

        # ---- eigendecomposition (in-kernel Jacobi) ----------------
        if warm:
            _warm_rotate(ar, ai, vre_ref, vim_ref, br, bi, d=d)
            _jacobi_rounds(ar, ai, vre_ref, vim_ref,
                           d=d, sweeps=warm_sweeps, tiny=tiny)
        else:
            row = lax.broadcasted_iota(jnp.int32, ar.shape, 0)
            col = lax.broadcasted_iota(jnp.int32, ar.shape, 1)
            vre_ref[...] = jnp.where(row == col, 1.0, 0.0)
            vim_ref[...] = jnp.zeros(ar.shape, jnp.float32)
            _jacobi_rounds(ar, ai, vre_ref, vim_ref,
                           d=d, sweeps=sweeps, tiny=tiny)

        # ---- ascending sort (paired eigenvector columns) ----------
        # Bubble compare-exchange network; scatter moments are the
        # floored eigenvalues (reference _fit: max(eigh, 0)).
        s_nodes = [jnp.maximum(ar[dd, dd], 0.0) for dd in range(d)]
        for pass_ in range(d - 1):
            for j in range(d - 1 - pass_):
                a_, b_ = s_nodes[j], s_nodes[j + 1]
                swap = a_ > b_  # (K, F')
                s_nodes[j] = jnp.where(swap, b_, a_)
                s_nodes[j + 1] = jnp.where(swap, a_, b_)
                sw = swap[None]  # broadcast over the row axis
                cj_r = vre_ref[:, j]
                cj_i = vim_ref[:, j]
                cn_r = vre_ref[:, j + 1]
                cn_i = vim_ref[:, j + 1]
                vre_ref[:, j] = jnp.where(sw, cn_r, cj_r)
                vim_ref[:, j] = jnp.where(sw, cn_i, cj_i)
                vre_ref[:, j + 1] = jnp.where(sw, cj_r, cn_r)
                vim_ref[:, j + 1] = jnp.where(sw, cj_i, cn_i)

        # minimum-spacing regularization (ascending cumsum form)
        s_reg = [s_nodes[0]]
        for j in range(1, d):
            s_reg.append(s_reg[j - 1] + jnp.maximum(
                s_nodes[j] - s_nodes[j - 1], spacing_eps))
        s = jnp.stack(s_reg, axis=0)  # (D, K, F') ascending

        # ---- moment inversion (chord Gauss-Newton) -----------------
        if warm:
            lamb0 = lamb_ref[...]  # previous iteration, ascending
            u_ref[...] = jnp.clip(
                lamb0[:-1] - lamb0[1:], lower, upper)
            rounds, steps = 1, warm_steps
        else:
            # cold: lambda ~ -1/s, largest pinned to 0, floored into
            # the cascade's exact domain (find_eigenvalues:382-389)
            x0 = [-1.0 / jnp.maximum(s_reg[j], 1e-12)
                  for j in range(d - 1)] + [
                jnp.zeros(plane, jnp.float32)]
            x0 = [jnp.maximum(x0[j], -(cap_init - j)) for j in range(d)]
            u0 = jnp.stack(
                [x0[j] - x0[j + 1] for j in range(d - 1)], axis=0)
            u_ref[...] = jnp.clip(u0, lower, upper)
            rounds, steps = cold_rounds, cold_steps
        for _ in range(rounds):
            _chord_round(
                s, u_ref, j_ref, m_ref, g_ref,
                t6, tx, e6, xm, e6b, xmb,
                d=d, iterations=steps, lower=lower, upper=upper,
                fd_step=fd_step)
        lamb = _lam_of_u(u_ref[...], d)  # (D, K, F'), max pinned 0
        if max_concentration is not None:
            # floor at -max_concentration, then re-apply the minimum
            # spacing (find_eigenvalues: est = max(est, -mc) followed
            # by _remove_duplicate_eigenvalues) — the floor can
            # collapse the lowest eigenvalues onto -mc
            nodes = [jnp.maximum(lamb[dd], -max_concentration)
                     for dd in range(d)]
            reg = [nodes[0]]
            for j in range(1, d):
                reg.append(reg[j - 1] + jnp.maximum(
                    nodes[j] - nodes[j - 1], spacing_eps))
            lamb = jnp.stack(reg, axis=0)
        lamb_ref[...] = lamb
        for dd in range(d):
            lamb_out_ref[dd] = lamb[dd]

        # ---- log normalizer: one divided-difference cascade --------
        dd_val = _grad_cascade(
            lamb, g_ref=g_ref, t6=t6, tx=tx, e6=e6, xm=xm,
            e6b=e6b, xmb=xmb, d=d)
        logz_ref[...] = _LOG_2PI_D(d) + jnp.log(dd_val)

        # ---- E-step -------------------------------------------------
        # B = V diag(lambda) V^H per class (lane-tile sized entries);
        # quad_t = sum_de B_de conj(y_d) y_e via shared pair products.
        b_r = {}
        b_i = {}
        for dd in range(d):
            for ee in range(dd, d):
                cr = None
                ci = None
                for i_ in range(d):
                    vrd = vre_ref[dd, i_]  # (K, F')
                    vid = vim_ref[dd, i_]
                    vre_ = vre_ref[ee, i_]
                    vie = vim_ref[ee, i_]
                    tr = lamb[i_] * (vrd * vre_ + vid * vie)
                    cr = tr if cr is None else cr + tr
                    if ee != dd:
                        ti = lamb[i_] * (vid * vre_ - vrd * vie)
                        ci = ti if ci is None else ci + ti
                b_r[dd, ee] = cr
                b_i[dd, ee] = ci

        quad = [None] * k
        for dd in range(d):
            y_rd = y_re_ref[dd]
            y_id = y_im_ref[dd]
            for ee in range(dd, d):
                p_re = y_rd * y_re_ref[ee] + y_id * y_im_ref[ee]
                p_im = (None if ee == dd
                        else y_id * y_re_ref[ee] - y_rd * y_im_ref[ee])
                for kk in range(k):
                    if ee == dd:
                        term = b_r[dd, dd][kk] * p_re
                    else:
                        term = 2 * (b_r[dd, ee][kk] * p_re
                                    + b_i[dd, ee][kk] * p_im)
                    quad[kk] = (term if quad[kk] is None
                                else quad[kk] + term)
        log_pdf = [quad[kk] - logz_ref[kk] for kk in range(k)]

        max_k = log_pdf[0]
        for kk in range(1, k):
            max_k = jnp.maximum(max_k, log_pdf[kk])
        num = [jnp.exp(log_pdf[kk] - max_k) * weight_ref[kk]
               for kk in range(k)]
        den = num[0]
        for kk in range(1, k):
            den = den + num[kk]
        den = jnp.maximum(den, tiny)
        eps = jnp.where(i == iterations - 1, 0.0,
                        jnp.float32(affiliation_eps))
        for kk in range(k):
            a = num[kk] / den
            if affiliation_eps:
                a = jnp.clip(a, eps, 1 - eps)
            aff_ref[kk] = a if mask is None else a * mask
        return carry

    # run_em semantics: M(aff0) first, then (iterations-1) x (E, M);
    # a final E-step fills aff_ref with model.predict-equivalent
    # posteriors (unclipped).
    body(0, 0, warm=False)
    if iterations > 1:
        lax.fori_loop(
            1, iterations, lambda i, c: body(i, c, warm=True), 0)
    else:
        # body() already ran the trailing E-step at i == 0 with
        # eps = 0 only when iterations == 1; nothing further.
        pass


def choose_tile_f_cbmm(d, k, t_pad, *, has_sal=False,
                       vmem_budget=14 * 2 ** 20):
    """Feasible frequency-tile widths (empty for very long signals —
    the caller then falls back to the scan path). Same double-buffered
    VMEM accounting as ops/pallas_em_loop.py:choose_tile_f."""
    d1 = d - 1
    per_lane = 4 * (
        2 * (2 * d * t_pad + k * t_pad       # in blocks, 2 buffers
             + (t_pad if has_sal else 0))
        + 2 * (k * t_pad + 2 * d * d * k + d * k + 2 * k)  # out blocks
        + (4 * d * d * k                      # jacobi ar/ai/br/bi
           + d1 * k + d1 * d * k + d1 * d1 * k + d * k  # u/J/Minv/g
           + 6 * d * d * k + d * k)           # cascades + lamb
    )
    return [tf for tf in (512, 256, 128)
            if tf * per_lane <= vmem_budget]


@functools.partial(
    jax.jit,
    static_argnames=('iterations', 'sweeps', 'warm_sweeps',
                     'spacing_eps', 'affiliation_eps', 'cold_rounds',
                     'cold_steps', 'warm_steps', 'tile_f', 'interpret',
                     'max_concentration'))
def cbmm_em_full(y_re, y_im, affiliation, *,
                 iterations, sweeps=6, warm_sweeps=2,
                 spacing_eps=1e-3, affiliation_eps=0.0,
                 cold_rounds=3, cold_steps=10, warm_steps=16,
                 tile_f=None, interpret=False, saliency=None,
                 max_concentration=np.inf):
    """Run a full CBMM EM fit as ONE Pallas kernel launch.

    Semantics match models/cbmm.py:_cbmm_fit_em with standard knobs
    (no aligner, ``weight_constant_axis=(-1,)``): ``iterations``
    M-steps starting from the given affiliations, E-steps between,
    and a final unclipped E-step so the returned affiliations equal
    ``model.predict(y)``. A finite ``max_concentration`` bounds the
    chord diffs and floors the fitted eigenvalues at ``-mc`` with
    re-spacing (find_eigenvalues semantics).

    Args:
        y_re / y_im: (F, D, T) unit-norm observation planes, time-last.
            A leading batch axis (B, F, D, T) folds into the bin axis.
        affiliation: (F, K, T) initial posteriors.
        saliency: optional (F, T) per-frame importance weights
            (scan-path semantics: weights the scatter statistics and
            L1-normalizes the mixture weight over classes).
    Returns:
        (weight (F, K), bingham_eigenvalues (F, K, D) ascending,
        eigenvectors (F, K, D, D) complex64, log_norm (F, K),
        affiliation (F, K, T)).
    """
    if y_re.ndim == 4:
        B, F, D, T = y_re.shape
        K = affiliation.shape[-2]
        w, ev, vec, lz, aff = cbmm_em_full(
            y_re.reshape(B * F, D, T), y_im.reshape(B * F, D, T),
            affiliation.reshape(B * F, K, T),
            iterations=iterations, sweeps=sweeps,
            warm_sweeps=warm_sweeps, spacing_eps=spacing_eps,
            affiliation_eps=affiliation_eps, cold_rounds=cold_rounds,
            cold_steps=cold_steps, warm_steps=warm_steps,
            tile_f=tile_f, interpret=interpret,
            saliency=(None if saliency is None
                      else saliency.reshape(B * F, T)),
            max_concentration=max_concentration)
        return (w.reshape(B, F, K), ev.reshape(B, F, K, D),
                vec.reshape(B, F, K, D, D), lz.reshape(B, F, K),
                aff.reshape(B, F, K, T))

    F, D, T = y_re.shape
    K = affiliation.shape[1]
    has_sal = saliency is not None

    t_pad = -(-T // 8) * 8
    if tile_f is None:
        candidates = choose_tile_f_cbmm(D, K, t_pad, has_sal=has_sal)
        if not candidates:
            raise ValueError(
                f'signal too long for the fused CBMM kernel '
                f'(T={T}, D={D}, K={K} exceeds the VMEM budget); '
                f'use the scan path')
        f_pads = [-(-F // tf) * tf for tf in candidates]
        best = min(zip(f_pads, [-tf for tf in candidates]))
        tile_f = -best[1]
    f_pad = -(-F // tile_f) * tile_f

    def stage(x):
        x = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, f_pad - F)))

    operands = [stage(y_re), stage(y_im), stage(affiliation)]
    in_specs = [
        pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)),
    ]
    if has_sal:
        operands.append(jnp.pad(
            jnp.transpose(saliency.astype(jnp.float32), (1, 0)),
            ((0, t_pad - T), (0, f_pad - F))))
        in_specs.append(
            pl.BlockSpec((t_pad, tile_f), lambda i: (0, i)))

    # chord bounds: |lambda| <= 32768 total spread after the cumsum
    # (the cascade's exact domain), diffs <= -spacing_eps; a finite
    # max_concentration tightens the diff bound and the cold-init
    # floor (find_eigenvalues: mc_eff, cap_total)
    mc = float(max_concentration)
    user_bounded = np.isfinite(mc)
    lower = -min(mc, 32768.0 / (D - 1))
    cap_init = min(mc, 32768.0)
    upper = -float(spacing_eps)

    kernel = functools.partial(
        _cbmm_loop_kernel, d=D, k=K, iterations=int(iterations),
        sweeps=sweeps, warm_sweeps=warm_sweeps, t_real=T,
        spacing_eps=float(spacing_eps), lower=lower, upper=upper,
        fd_step=-1e-2, cold_rounds=cold_rounds, cold_steps=cold_steps,
        warm_steps=warm_steps,
        affiliation_eps=float(affiliation_eps), tiny=_TINY,
        has_sal=has_sal, cap_init=cap_init,
        max_concentration=mc if user_bounded else None)

    d1 = D - 1
    grid = (f_pad // tile_f,)
    aff, v_re, v_im, lamb, weight, logz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((D, K, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((K, tile_f), lambda i: (0, i)),
            pl.BlockSpec((K, tile_f), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, t_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, f_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # ar
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # ai
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # br
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # bi
            pltpu.VMEM((d1, K, tile_f), jnp.float32),     # u
            pltpu.VMEM((d1, D, K, tile_f), jnp.float32),  # J
            pltpu.VMEM((d1, d1, K, tile_f), jnp.float32),  # Minv
            pltpu.VMEM((D, K, tile_f), jnp.float32),      # g
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # t6
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # tx
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # e6
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # xm
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # e6b
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),   # xmb
            pltpu.VMEM((D, K, tile_f), jnp.float32),      # lamb
        ],
        interpret=interpret,
    )(*operands)

    weight = jnp.transpose(weight)[:F]  # (F, K)
    logz = jnp.transpose(logz)[:F]
    eigenvalues = jnp.transpose(lamb, (2, 1, 0))[:F]  # (F, K, D)
    vectors = (jnp.transpose(v_re, (3, 2, 0, 1))
               + 1j * jnp.transpose(v_im, (3, 2, 0, 1)))[:F]
    affiliation = jnp.transpose(aff, (2, 0, 1))[:F, :, :T]
    return weight, eigenvalues, vectors, logz, affiliation
