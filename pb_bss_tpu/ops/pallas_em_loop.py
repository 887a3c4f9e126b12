"""Pallas TPU kernel: the ENTIRE cACGMM EM loop in one kernel launch.

The scan-based EM (models/cacgmm.py:_fit_em) already fuses each
iteration into one XLA program, but every iteration still round-trips
the (F, K, E, T) whitened observations, the (F, K, T) posteriors and
the (F, K, D, D) scatter matrices through HBM and pays per-HLO
dispatch inside the scan (~0.44 ms/iteration on top of the 0.27 ms
Pallas eigh at the benchmark shape).

This kernel removes all of that: frequency bins live in the lane
dimension (layout (D, T, F_tile)), the observation tile is loaded into
VMEM ONCE, and a `lax.fori_loop` runs every EM iteration — M-step
scatter (built directly in Hermitian form from its upper triangle),
cyclic Jacobi eigendecomposition (the ops/pallas_eigh.py recipe, here
on (D, D, K, F_tile) scratch), eigenvalue flooring, and the E-step
posterior — without touching HBM. Total HBM traffic for a 20-iteration
fit is one read of y plus one write of the results.

Numerics replicate the XLA path exactly (same formulas, same guard
ladder): quadratic-form floor at tiny (E-step) / 10*tiny (M-step
weights), scatter denominator floor, eigenvalue max-normalization +
floor (ComplexAngularCentralGaussian.from_covariance semantics,
reference pb_bss/distribution/complex_angular_central_gaussian.py:
81-132), linear-domain weight multiplication with max-shift softmax
and affiliation_eps clipping (reference mixture_model_utils.py:7-55),
time-constant mixture weights (weight_constant_axis=(-1,), reference
mixture_model_utils.py:133-203). Eigenpairs are left unsorted inside
the loop (the density is invariant under joint (eigenvalue,
eigenvector) permutations); the final model is sorted ascending
outside the kernel for user-facing parity with numpy conventions.

Parity with the scan path is tested in
tests/test_ops/test_pallas_em_loop.py (interpret mode on CPU, compiled
on TPU).
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

__all__ = ['cacgmm_em_full', 'choose_tile_f']

_TINY = float(np.finfo(np.float32).tiny)


def _jacobi_rounds(ar, ai, vr, vi, *, d, sweeps, tiny):
    """Cyclic Jacobi on Hermitian matrices in (D, D, ...) scratch.

    Same rotation algebra as ops/pallas_eigh.py:_eigh_kernel; here the
    trailing dims are (K, F_tile) instead of a flat batch.
    """
    for _ in range(sweeps):
        for p in range(d - 1):
            for q in range(p + 1, d):
                apq_r = ar[p, q]
                apq_i = ai[p, q]
                absa = jnp.sqrt(apq_r * apq_r + apq_i * apq_i)
                app = ar[p, p]
                aqq = ar[q, q]
                safe = jnp.maximum(absa, tiny)
                tau = (aqq - app) / (2 * safe)
                t = jnp.where(
                    tau == 0,
                    jnp.ones_like(tau),
                    jnp.sign(tau)
                    / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau)),
                )
                c = lax.rsqrt(1 + t * t)
                sr = t * c
                s_r = sr * apq_r / safe
                s_i = sr * apq_i / safe
                active = absa > 0
                c = jnp.where(active, c, 1.0)
                s_r = jnp.where(active, s_r, 0.0)
                s_i = jnp.where(active, s_i, 0.0)

                rp_r, rp_i = ar[p], ai[p]
                rq_r, rq_i = ar[q], ai[q]
                ar[p] = c * rp_r - (s_r * rq_r - s_i * rq_i)
                ai[p] = c * rp_i - (s_r * rq_i + s_i * rq_r)
                ar[q] = (s_r * rp_r + s_i * rp_i) + c * rq_r
                ai[q] = (s_r * rp_i - s_i * rp_r) + c * rq_i

                cp_r, cp_i = ar[:, p], ai[:, p]
                cq_r, cq_i = ar[:, q], ai[:, q]
                ar[:, p] = c * cp_r - (s_r * cq_r + s_i * cq_i)
                ai[:, p] = c * cp_i - (s_r * cq_i - s_i * cq_r)
                ar[:, q] = (s_r * cp_r - s_i * cp_i) + c * cq_r
                ai[:, q] = (s_r * cp_i + s_i * cp_r) + c * cq_i

                vp_r, vp_i = vr[:, p], vi[:, p]
                vq_r, vq_i = vr[:, q], vi[:, q]
                vr[:, p] = c * vp_r - (s_r * vq_r + s_i * vq_i)
                vi[:, p] = c * vp_i - (s_r * vq_i - s_i * vq_r)
                vr[:, q] = (s_r * vp_r - s_i * vp_i) + c * vq_r
                vi[:, q] = (s_r * vp_i + s_i * vp_r) + c * vq_i


def _warm_rotate(ar, ai, vr, vi, br, bi, *, d):
    """B = V^H S V: rotate the fresh scatter (in ar/ai) into the
    previous iteration's eigenbasis (in vr/vi). The EM's scatter
    changes slowly between iterations, so B is near-diagonal and the
    Jacobi needs ~2 sweeps instead of 4-6; the accumulated transform
    (Jacobi keeps updating vr/vi) stays the eigenbasis of S. Written
    Hermitian from the upper triangle (exact hermitization)."""
    # C = S @ V into br/bi
    for a in range(d):
        for j in range(d):
            cr = None
            ci = None
            for b in range(d):
                tr = ar[a, b] * vr[b, j] - ai[a, b] * vi[b, j]
                ti = ar[a, b] * vi[b, j] + ai[a, b] * vr[b, j]
                cr = tr if cr is None else cr + tr
                ci = ti if ci is None else ci + ti
            br[a, j] = cr
            bi[a, j] = ci
    # B = V^H @ C back into ar/ai (upper triangle + mirror)
    for i_ in range(d):
        for j in range(i_, d):
            b_re = None
            for a in range(d):
                tr = vr[a, i_] * br[a, j] + vi[a, i_] * bi[a, j]
                b_re = tr if b_re is None else b_re + tr
            ar[i_, j] = b_re
            if j == i_:
                ai[i_, i_] = jnp.zeros_like(b_re)
            else:
                b_im = None
                for a in range(d):
                    ti = vr[a, i_] * bi[a, j] - vi[a, i_] * br[a, j]
                    b_im = ti if b_im is None else b_im + ti
                ar[j, i_] = b_re
                ai[i_, j] = b_im
                ai[j, i_] = -b_im


def _em_loop_kernel(*refs, d, k, iterations, sweeps, warm_sweeps,
                    t_real, eigenvalue_floor, affiliation_eps, tiny,
                    has_sal=False, has_mask=False):
    """One frequency tile: all EM iterations with y resident in VMEM.

    Blocks (lane dim = frequency tile F'):
        y: (D, T, F') real/imag planes; aff0/qf0: (K, T, F');
        optional saliency (T, F') and source-activity mask (K, T, F')
        (0/1 floats) when ``has_sal`` / ``has_mask``.
    Outputs: aff (K, T, F'), V (D, D, K, F') planes (row, eigvec
    column, class), eig (D, K, F'), weight (K, F').
    Scratch: qf (K, T, F'), Jacobi working planes ar/ai (D, D, K, F').
    """
    it = iter(refs)
    y_re_ref, y_im_ref, aff0_ref, qf0_ref = (
        next(it), next(it), next(it), next(it))
    sal_ref = next(it) if has_sal else None
    sam_ref = next(it) if has_mask else None
    aff_ref, vre_ref, vim_ref, eig_ref, weight_ref = (
        next(it), next(it), next(it), next(it), next(it))
    qf_ref, ar, ai, br, bi = (
        next(it), next(it), next(it), next(it), next(it))

    t_pad = y_re_ref.shape[1]
    # Valid-frame mask: padded time steps must not contribute to the
    # weight / scatter statistics.
    if t_pad == t_real:
        mask = None
    else:
        mask = (lax.broadcasted_iota(
            jnp.int32, (t_pad, y_re_ref.shape[2]), 0) < t_real
        ).astype(jnp.float32)

    aff_ref[...] = (aff0_ref[...] if mask is None
                    else aff0_ref[...] * mask[None])
    qf_ref[...] = qf0_ref[...]

    sal = sal_ref[...] if has_sal else None  # (T, F')

    def body(i, carry, *, warm):
        # ---- M-step -----------------------------------------------
        # weight = mean_t affiliation (with saliency: saliency-weighted
        # sums, L1-normalized over classes — estimate_mixture_weight
        # semantics, reference mixture_model_utils.py:133-203); scatter
        # S_k = D/denom * sum_t (a_kt s_t/q_kt) y_t y_t^H, built
        # Hermitian from its upper triangle (exactly Hermitian, so
        # force_hermitian is implicit). The pair product
        # p_de = y_d conj(y_e) is computed once per (d, e) and reduced
        # against every class's weights — K-fold less elementwise work
        # than per-class whitening.
        w = []
        scale = []
        wsums = []
        for kk in range(k):
            a = aff_ref[kk]  # (T, F')
            if has_sal:
                a = a * sal
            wsum = jnp.sum(a, axis=0)  # (F',)
            wsums.append(wsum)
            w.append(a / jnp.maximum(qf_ref[kk], 10 * tiny))
            scale.append(d / jnp.maximum(wsum, tiny))  # (F',)
        if has_sal:
            # L1-normalize over classes; 'where' eps style (zero
            # vectors stay zero up to the 1e-10 divisor).
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
                    s_re = jnp.sum(w[kk] * p_re, axis=0) * scale[kk]
                    ar[dd, ee, kk] = s_re
                    if ee == dd:
                        ai[dd, dd, kk] = jnp.zeros_like(s_re)
                    else:
                        s_im = jnp.sum(
                            w[kk] * p_im, axis=0) * scale[kk]
                        ar[ee, dd, kk] = s_re
                        ai[dd, ee, kk] = s_im
                        ai[ee, dd, kk] = -s_im

        # ---- eigendecomposition (in-kernel Jacobi) ----------------
        if warm:
            # start from the previous iteration's eigenbasis; the
            # rotated scatter is near-diagonal -> fewer sweeps
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

        # eigenvalue normalization + floor
        # (from_covariance 'eigenvalue' semantics)
        lam = [ar[dd, dd] for dd in range(d)]  # each (K, F')
        lam_max = lam[0]
        for dd in range(1, d):
            lam_max = jnp.maximum(lam_max, lam[dd])
        lam_max = jnp.maximum(lam_max, tiny)
        inv = []
        logdet = None
        for dd in range(d):
            l = jnp.maximum(lam[dd] / lam_max, eigenvalue_floor)
            eig_ref[dd] = l
            inv.append(1.0 / l)
            logdet = jnp.log(l) if logdet is None else logdet + jnp.log(l)

        # ---- E-step ------------------------------------------------
        # Quadratic form via the assembled inverse covariance:
        # qf = sum_de Cinv_de conj(y_d) y_e with Cinv = V diag(1/l) V^H
        # — the (K, F') Cinv entries are cheap (lane-tile sized), and
        # the (T, F') pair products are shared across classes instead
        # of whitening every class separately.
        cinv_r = {}
        cinv_i = {}
        for dd in range(d):
            for ee in range(dd, d):
                cr = None
                ci = None
                for i_ in range(d):
                    vrd = vre_ref[dd, i_]  # (K, F')
                    vid = vim_ref[dd, i_]
                    vre_ = vre_ref[ee, i_]
                    vie = vim_ref[ee, i_]
                    tr = inv[i_] * (vrd * vre_ + vid * vie)
                    cr = tr if cr is None else cr + tr
                    if ee != dd:
                        ti = inv[i_] * (vid * vre_ - vrd * vie)
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
                        # 2 Re(Cinv_de conj(y_d) y_e); with
                        # p = y_d conj(y_e): re += ci * p_im
                        term = 2 * (cinv_r[dd, ee][kk] * p_re
                                    + cinv_i[dd, ee][kk] * p_im)
                    qf_acc[kk] = (term if qf_acc[kk] is None
                                  else qf_acc[kk] + term)
        log_pdf = []
        for kk in range(k):
            qf_new = jnp.maximum(qf_acc[kk], tiny)
            qf_ref[kk] = qf_new
            log_pdf.append(-d * jnp.log(qf_new) - logdet[kk])

        max_k = log_pdf[0]
        for kk in range(1, k):
            max_k = jnp.maximum(max_k, log_pdf[kk])
        num = [jnp.exp(log_pdf[kk] - max_k) * weight_ref[kk]
               for kk in range(k)]
        if has_mask:
            # boolean source-activity gating in the linear domain
            # (log_pdf_to_affiliation semantics, reference
            # mixture_model_utils.py:7-55)
            num = [num[kk] * sam_ref[kk] for kk in range(k)]
        den = num[0]
        for kk in range(1, k):
            den = den + num[kk]
        den = jnp.maximum(den, tiny)
        # in-loop E-steps clip with affiliation_eps (feeding the next
        # M-step, scan-path semantics); the FINAL E-step is unclipped
        # so the returned affiliations equal model.predict() exactly
        # (predict uses affiliation_eps=0).
        eps = jnp.where(i == iterations - 1, 0.0,
                        jnp.float32(affiliation_eps))
        for kk in range(k):
            a = num[kk] / den
            if affiliation_eps:
                a = jnp.clip(a, eps, 1 - eps)
            aff_ref[kk] = a if mask is None else a * mask
        return carry

    if warm_sweeps is None:
        lax.fori_loop(
            0, iterations, lambda i, c: body(i, c, warm=False), 0)
    else:
        # peel iteration 0: cold eigendecomposition at full sweeps,
        # warm-started iterations after
        body(0, 0, warm=False)
        if iterations > 1:
            lax.fori_loop(
                1, iterations, lambda i, c: body(i, c, warm=True), 0)


def choose_tile_f(d, k, t_pad, *, has_sal=False, has_mask=False,
                  vmem_budget=14 * 2 ** 20):
    """Feasible frequency-tile widths (possibly empty for very long
    signals — then the caller must fall back to the scan path).
    Lane-dim padding dominates the wasted compute (the kernel is VPU
    bound), so the wrapper prefers the candidate minimizing padded F,
    tie-broken toward wider tiles.

    VMEM accounting: Pallas DOUBLE-BUFFERS input and output blocks
    across grid steps (measured: tile_f=256 at the benchmark shape
    wants 17.2 MB against the 16 MB scoped limit), so blocks count
    twice; scratch counts once. Optional saliency (T lanes) and
    source-activity-mask (K*T lanes) inputs count as blocks.
    """
    per_lane = 4 * (
        2 * (2 * d * t_pad + 2 * k * t_pad        # in blocks, 2 bufs
             + (t_pad if has_sal else 0)
             + (k * t_pad if has_mask else 0))
        + 2 * (k * t_pad + 2 * d * d * k + d * k + k)  # out blocks
        + (k * t_pad + 4 * d * d * k)              # scratch
    )
    return [tf for tf in (512, 256, 128)
            if tf * per_lane <= vmem_budget]


@functools.partial(
    jax.jit,
    static_argnames=('iterations', 'sweeps', 'warm_sweeps',
                     'eigenvalue_floor', 'affiliation_eps', 'tile_f',
                     'interpret'))
def cacgmm_em_full(y_re, y_im, affiliation, quadratic_form, *,
                   iterations, sweeps=6, warm_sweeps=None,
                   eigenvalue_floor=1e-10,
                   affiliation_eps=1e-10, tile_f=None, interpret=False,
                   saliency=None, source_activity_mask=None):
    """Run a full cACGMM EM fit as ONE Pallas kernel launch.

    Semantics: ``iterations`` M-steps starting from the given
    affiliations/quadratic forms (the reference's array-init path,
    pb_bss/distribution/cacgmm.py:252-278), with an E-step after each
    M-step. The final E-step is computed with ``affiliation_eps=0``,
    so the returned affiliations equal ``model.predict(y)`` on the
    returned model exactly (what ``fit_predict`` needs).

    Args:
        y_re / y_im: (F, D, T) observation planes, unit-norm, time-last.
            A leading batch axis (B, F, D, T) is folded into the bin
            axis (bins are independent; folding fills lane tiles ~6x
            better than vmap's extra grid dimension, which pads every
            example separately).
        affiliation: (F, K, T) initial posteriors.
        quadratic_form: (F, K, T) initial quadratic forms (ones for a
            fresh fit).
        saliency: optional (F, T) per-frame importance weights —
            weights the M-step statistics and L1-normalizes the
            mixture weight over classes (scan-path semantics).
        source_activity_mask: optional (F, K, T) 0/1 floats gating the
            E-step posterior numerator per class and frame.
    Returns:
        (weight (F, K), eigenvalues (F, K, D), eigenvectors
        (F, K, D, D) complex64, affiliation (F, K, T));
        eigenpairs sorted ascending.
    """
    if y_re.ndim == 4:
        B, F, D, T = y_re.shape
        K = affiliation.shape[-2]
        weight, eigenvalues, vectors, aff = cacgmm_em_full(
            y_re.reshape(B * F, D, T), y_im.reshape(B * F, D, T),
            affiliation.reshape(B * F, K, T),
            quadratic_form.reshape(B * F, K, T),
            iterations=iterations, sweeps=sweeps,
            warm_sweeps=warm_sweeps,
            eigenvalue_floor=eigenvalue_floor,
            affiliation_eps=affiliation_eps, tile_f=tile_f,
            interpret=interpret,
            saliency=(None if saliency is None
                      else saliency.reshape(B * F, T)),
            source_activity_mask=(
                None if source_activity_mask is None
                else source_activity_mask.reshape(B * F, K, T)))
        return (weight.reshape(B, F, K),
                eigenvalues.reshape(B, F, K, D),
                vectors.reshape(B, F, K, D, D),
                aff.reshape(B, F, K, T))

    F, D, T = y_re.shape
    K = affiliation.shape[1]
    has_sal = saliency is not None
    has_mask = source_activity_mask is not None

    t_pad = -(-T // 8) * 8
    if tile_f is None:
        candidates = choose_tile_f(
            D, K, t_pad, has_sal=has_sal, has_mask=has_mask)
        if not candidates:
            raise ValueError(
                f'signal too long for the fused EM kernel '
                f'(T={T}, D={D}, K={K} exceeds the VMEM budget); '
                f'use the scan path')
        f_pads = [-(-F // tf) * tf for tf in candidates]
        best = min(zip(f_pads, [-tf for tf in candidates]))
        tile_f = -best[1]
    f_pad = -(-F // tile_f) * tile_f

    def stage(x):
        # (F, C, T) -> (C, t_pad, f_pad) float32
        x = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, f_pad - F)))

    y_re_s = stage(y_re)
    y_im_s = stage(y_im)
    aff_s = stage(affiliation)
    # pad quadratic form with ones (it sits in denominators)
    qf_s = jnp.pad(
        jnp.transpose(quadratic_form.astype(jnp.float32), (1, 2, 0)),
        ((0, 0), (0, t_pad - T), (0, f_pad - F)), constant_values=1.0)

    operands = [y_re_s, y_im_s, aff_s, qf_s]
    in_specs = [
        pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)),
    ]
    if has_sal:
        sal_s = jnp.pad(
            jnp.transpose(saliency.astype(jnp.float32), (1, 0)),
            ((0, t_pad - T), (0, f_pad - F)))
        operands.append(sal_s)
        in_specs.append(
            pl.BlockSpec((t_pad, tile_f), lambda i: (0, i)))
    if has_mask:
        operands.append(stage(source_activity_mask))
        in_specs.append(
            pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)))

    kernel = functools.partial(
        _em_loop_kernel, d=D, k=K, iterations=iterations,
        sweeps=sweeps, warm_sweeps=warm_sweeps, t_real=T,
        eigenvalue_floor=float(eigenvalue_floor),
        affiliation_eps=float(affiliation_eps), tiny=_TINY,
        has_sal=has_sal, has_mask=has_mask)

    grid = (f_pad // tile_f,)
    aff, v_re, v_im, eig, weight = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((D, K, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((K, tile_f), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, t_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, f_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, t_pad, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    weight = jnp.transpose(weight)[:F]  # (F, K)
    eigenvalues = jnp.transpose(eig, (2, 1, 0))[:F]  # (F, K, D)
    vectors = (jnp.transpose(v_re, (3, 2, 0, 1))
               + 1j * jnp.transpose(v_im, (3, 2, 0, 1)))[:F]
    eigenvalues, vectors = _sort_ascending(eigenvalues, vectors)
    affiliation = jnp.transpose(aff, (2, 0, 1))[:F, :, :T]
    return weight, eigenvalues, vectors, affiliation


def cacgmm_em_full_reference(y_re, y_im, affiliation, quadratic_form, *,
                             iterations, sweeps=6,
                             eigenvalue_floor=1e-10,
                             affiliation_eps=1e-10,
                             saliency=None, source_activity_mask=None):
    """XLA reference of the same loop (parity tests): the scan-EM path
    restated with one trailing E-step, NumPy-convention sorting."""
    from ..models.cacgmm import CACGMM, _m_step
    from ..models.complex_angular_central_gaussian import (
        ComplexAngularCentralGaussian,
    )

    y = y_re.astype(jnp.float32) + 1j * y_im.astype(jnp.float32)
    model = None
    for i in range(iterations):
        model = _m_step(
            y, quadratic_form, affiliation, saliency,
            hermitize=True, covariance_norm='eigenvalue',
            eigenvalue_floor=eigenvalue_floor,
            weight_constant_axis=(-1,), eigh_sweeps=sweeps)
        affiliation, quadratic_form, _ = model._predict(
            y, source_activity_mask=source_activity_mask,
            affiliation_eps=(
                0. if i == iterations - 1 else affiliation_eps))
    return (model.weight[..., 0],
            model.cacg.covariance_eigenvalues,
            model.cacg.covariance_eigenvectors,
            affiliation)
