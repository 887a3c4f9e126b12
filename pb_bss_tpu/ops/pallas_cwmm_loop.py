"""Pallas TPU kernel: the ENTIRE complex-Watson-MM EM loop in one
kernel launch.

Same architecture as ops/pallas_em_loop.py (frequency bins in the lane
dimension, observations resident in VMEM across all iterations via an
in-kernel ``lax.fori_loop``, M-step scatter built Hermitian from its
upper triangle, in-kernel cyclic Jacobi), specialized to the complex
Watson mixture (reference pb_bss/distribution/cwmm.py,
complex_watson.py):

* the M-step keeps only the DOMINANT eigenpair (gather-free one-hot
  selection by comparison-counting ranks),
* the eigenvalue-ratio -> concentration inverse (reference's scipy
  spline, complex_watson.py:237-274) becomes a uniform-grid
  piecewise-linear table evaluated as a dense hat-function sum — no
  per-lane gathers, exact linear interpolation on the uniform grid,
* the E-step log-density is ``kappa |<y, mode>|^2 - log Z(kappa)``
  with the Tran-Vu switched log-norm evaluated branchlessly in-kernel
  (Taylor series below 1/D, Mardia Eq. 3 elsewhere; reference
  complex_watson.py:170-213).

Parity with the scan path is tested in
tests/test_ops/test_pallas_cwmm_loop.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_em_loop import _jacobi_rounds, _warm_rotate

__all__ = ['cwmm_em_full', 'concentration_table', 'choose_tile_f_cwmm']

_TINY = float(np.finfo(np.float32).tiny)
_TABLE_SIZE = 512


@functools.lru_cache(maxsize=None)
def concentration_table(dimension, max_concentration=500.0,
                        size=_TABLE_SIZE):
    """Uniform-in-ratio concentration lookup table.

    Returns ``(r0, dr, kappa_values)`` such that the eigenvalue ratio
    ``r`` (the dominant eigenvalue of the unit-trace scatter, in
    [1/D, 1]) maps to ``kappa = interp(r)``. Built by inverting the
    hypergeometric ratio ``M(2, D+1, k) / (D M(1, D, k))`` on a dense
    log-spaced kappa grid (reference complex_watson.py:237-274).
    """
    from scipy.special import hyp1f1
    kappa_dense = np.concatenate(
        [[0.0], np.logspace(-3, np.log10(max_concentration), 4096)])
    ratio_dense = np.concatenate([
        [1.0 / dimension],
        hyp1f1(2, dimension + 1, kappa_dense[1:])
        / (dimension * hyp1f1(1, dimension, kappa_dense[1:])),
    ])
    r0 = 1.0 / dimension
    r1 = float(ratio_dense[-1])
    grid = np.linspace(r0, r1, size)
    kappa = np.interp(grid, ratio_dense, kappa_dense)
    dr = (r1 - r0) / (size - 1)
    return float(r0), float(dr), kappa.astype(np.float32)


def _log_norm_tran_vu_terms(dimension):
    """Host-side constants for the in-kernel switched log-norm."""
    log2_pi_d = math.log(2.0) + dimension * math.log(math.pi)
    lgamma_d = math.lgamma(dimension)
    inv_fact = [1.0 / math.factorial(r) for r in range(dimension - 1)]
    return log2_pi_d, lgamma_d, inv_fact


def _log_norm(kappa, dimension, consts):
    """Branchless Tran-Vu switched log-norm on (K, F') values
    (ComplexWatson.log_norm_tran_vu semantics)."""
    log2_pi_d, lgamma_d, inv_fact = consts
    # low concentration: log 2 pi^D - lgamma(D) + log1p(sum cumprod)
    term = jnp.ones_like(kappa)
    acc = jnp.zeros_like(kappa)
    for j in range(20):
        term = term * (kappa / (dimension + j))
        acc = acc + term
    low = log2_pi_d - lgamma_d + jnp.log1p(acc)
    # medium/high: log 2 pi^D + (1-D) log k + k + log(1 - sum_r k^r e^-k / r!)
    k_safe = jnp.maximum(kappa, 1e-2)
    e = jnp.exp(-k_safe)
    p = e  # k^0 e^-k / 0!
    s = p * inv_fact[0]
    kr = jnp.ones_like(kappa)
    for r in range(1, dimension - 1):
        kr = kr * k_safe
        s = s + kr * e * inv_fact[r]
    medium = (log2_pi_d + (1.0 - dimension) * jnp.log(k_safe)
              + k_safe + jnp.log(1.0 - s))
    return jnp.where(kappa < 1.0 / dimension, low, medium)


def _cwmm_kernel(*refs, d, k, iterations, sweeps, warm_sweeps, t_real,
                 r0, dr, table_size, dimension_consts, tiny,
                 has_sal=False):
    """One frequency tile: all CWMM EM iterations in VMEM.

    Blocks: y (D, T, F'); aff0 (K, T, F'); table (table_size, 1)
    resident; optional saliency (T, F') when ``has_sal``.
    Outputs: aff (K, T, F'), mode planes (D, K, F'),
    kappa/weight (K, F'). Scratch: Jacobi planes (D, D, K, F') x4.
    """
    it = iter(refs)
    y_re_ref, y_im_ref, aff0_ref, table_ref = (
        next(it), next(it), next(it), next(it))
    sal_ref = next(it) if has_sal else None
    aff_ref, m_re_ref, m_im_ref, kappa_ref, weight_ref = (
        next(it), next(it), next(it), next(it), next(it))
    ar, ai, vr, vi, br, bi = (
        next(it), next(it), next(it), next(it), next(it), next(it))

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

    def body(i, carry, *, warm):
        # ---- M-step: weight + scatter + dominant eigenpair ---------
        # shared pair products p_de = y_d conj(y_e), reduced against
        # every class's affiliations (see pallas_em_loop.py). With
        # saliency the statistics weight by a*s and the mixture weight
        # is L1-normalized over classes (estimate_mixture_weight
        # semantics, reference mixture_model_utils.py:133-203).
        scale = []
        a_eff = []
        wsums = []
        for kk in range(k):
            a = aff_ref[kk]
            if has_sal:
                a = a * sal
            a_eff.append(a)
            wsum = jnp.sum(a, axis=0)
            wsums.append(wsum)
            scale.append(1.0 / jnp.maximum(wsum, tiny))
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
                    s_re = jnp.sum(a * p_re, axis=0) * scale[kk]
                    ar[dd, ee, kk] = s_re
                    if ee == dd:
                        ai[dd, dd, kk] = jnp.zeros_like(s_re)
                    else:
                        s_im = jnp.sum(a * p_im, axis=0) * scale[kk]
                        ar[ee, dd, kk] = s_re
                        ai[dd, ee, kk] = s_im
                        ai[ee, dd, kk] = -s_im

        if warm:
            _warm_rotate(ar, ai, vr, vi, br, bi, d=d)
            _jacobi_rounds(
                ar, ai, vr, vi, d=d, sweeps=warm_sweeps, tiny=tiny)
        else:
            row = lax.broadcasted_iota(jnp.int32, ar.shape, 0)
            col = lax.broadcasted_iota(jnp.int32, ar.shape, 1)
            vr[...] = jnp.where(row == col, 1.0, 0.0)
            vi[...] = jnp.zeros(ar.shape, jnp.float32)
            _jacobi_rounds(
                ar, ai, vr, vi, d=d, sweeps=sweeps, tiny=tiny)

        # dominant eigenpair, gather-free: one-hot of the max by
        # comparison counting (index tie-break)
        lam = [ar[dd, dd] for dd in range(d)]  # each (K, F')
        onehot = []
        for i_ in range(d):
            greater = None
            for j_ in range(d):
                if j_ == i_:
                    continue
                gij = ((lam[i_] > lam[j_])
                       | ((lam[i_] == lam[j_]) & (i_ > j_)))
                greater = gij if greater is None else (greater & gij)
            onehot.append(greater.astype(jnp.float32))
        lam_sel = None
        for i_ in range(d):
            t = lam[i_] * onehot[i_]
            lam_sel = t if lam_sel is None else lam_sel + t

        # concentration: uniform-grid piecewise-linear table as a
        # dense hat-function sum (no per-lane gathers)
        idx = jnp.clip((lam_sel - r0) / dr, 0.0, table_size - 1.0)
        kappa = None
        for g in range(table_size):
            w_g = jnp.maximum(0.0, 1.0 - jnp.abs(idx - g))
            t = table_ref[g, 0] * w_g
            kappa = t if kappa is None else kappa + t
        kappa_ref[...] = kappa  # (K, F')

        # mode = eigenvector of the dominant eigenvalue
        for dd in range(d):
            mr = None
            mi = None
            for i_ in range(d):
                tr = vr[dd, i_] * onehot[i_]
                ti = vi[dd, i_] * onehot[i_]
                mr = tr if mr is None else mr + tr
                mi = ti if mi is None else mi + ti
            m_re_ref[dd] = mr  # (K, F')
            m_im_ref[dd] = mi

        # ---- E-step: kappa |<y, mode>|^2 - log Z ------------------
        log_z = _log_norm(kappa, d, dimension_consts)  # (K, F')
        log_pdf = []
        for kk in range(k):
            s_re = None
            s_im = None
            for dd in range(d):
                # <y, m> = sum_d y_d conj(m_d)
                m_r = m_re_ref[dd, kk]
                m_i = m_im_ref[dd, kk]
                y_r = y_re_ref[dd]
                y_i = y_im_ref[dd]
                tr = y_r * m_r + y_i * m_i
                ti = y_i * m_r - y_r * m_i
                s_re = tr if s_re is None else s_re + tr
                s_im = ti if s_im is None else s_im + ti
            log_pdf.append(
                kappa[kk] * (s_re * s_re + s_im * s_im) - log_z[kk])

        max_k = log_pdf[0]
        for kk in range(1, k):
            max_k = jnp.maximum(max_k, log_pdf[kk])
        num = [jnp.exp(log_pdf[kk] - max_k) * weight_ref[kk]
               for kk in range(k)]
        den = num[0]
        for kk in range(1, k):
            den = den + num[kk]
        den = jnp.maximum(den, tiny)
        for kk in range(k):
            a = num[kk] / den
            aff_ref[kk] = a if mask is None else a * mask
        return carry

    if warm_sweeps is None:
        lax.fori_loop(
            0, iterations, lambda i, c: body(i, c, warm=False), 0)
    else:
        body(0, 0, warm=False)
        if iterations > 1:
            lax.fori_loop(
                1, iterations, lambda i, c: body(i, c, warm=True), 0)


def choose_tile_f_cwmm(d, k, t_pad, *, has_sal=False,
                       vmem_budget=14 * 2 ** 20):
    """Feasible tile widths (double-buffered blocks count twice)."""
    per_lane = 4 * (
        2 * (2 * d * t_pad + k * t_pad             # in blocks, 2 bufs
             + (t_pad if has_sal else 0))
        + 2 * (k * t_pad + 2 * d * k + 2 * k)      # out blocks
        + 6 * d * d * k                            # Jacobi scratch
    )
    return [tf for tf in (512, 256, 128)
            if tf * per_lane <= vmem_budget]


@functools.partial(
    jax.jit,
    static_argnames=('iterations', 'sweeps', 'warm_sweeps',
                     'max_concentration', 'tile_f', 'interpret'))
def cwmm_em_full(y_re, y_im, affiliation, *, iterations, sweeps=6,
                 warm_sweeps=None, max_concentration=500.0,
                 tile_f=None, interpret=False, saliency=None):
    """Run a full CWMM EM fit as ONE Pallas kernel launch.

    Semantics match the scan path (models/_em.py:run_em via
    models/cwmm.py): ``iterations`` M-steps from the given
    affiliations with an E-step between, plus a final E-step whose
    affiliations equal ``model.predict(y)`` (CWMM predict uses
    affiliation_eps=0, so no final-step special-casing is needed).

    Args:
        y_re / y_im: (F, D, T) unit-norm observation planes, time-last.
            A leading batch axis (B, F, D, T) folds into the bin axis
            (bins independent; see pallas_em_loop.cacgmm_em_full).
        affiliation: (F, K, T) initial posteriors.
        saliency: optional (F, T) per-frame importance weights
            (scan-path semantics: weights the Watson statistics and
            L1-normalizes the mixture weight over classes).
    Returns:
        (weight (F, K), mode (F, K, D) complex64,
        concentration (F, K), affiliation (F, K, T)).
    """
    if y_re.ndim == 4:
        B, F, D, T = y_re.shape
        K = affiliation.shape[-2]
        weight, mode, kappa, aff = cwmm_em_full(
            y_re.reshape(B * F, D, T), y_im.reshape(B * F, D, T),
            affiliation.reshape(B * F, K, T),
            iterations=iterations, sweeps=sweeps,
            warm_sweeps=warm_sweeps,
            max_concentration=max_concentration, tile_f=tile_f,
            interpret=interpret,
            saliency=(None if saliency is None
                      else saliency.reshape(B * F, T)))
        return (weight.reshape(B, F, K), mode.reshape(B, F, K, D),
                kappa.reshape(B, F, K), aff.reshape(B, F, K, T))

    F, D, T = y_re.shape
    K = affiliation.shape[1]
    has_sal = saliency is not None

    r0, dr, table = concentration_table(D, float(max_concentration))
    table_j = jnp.asarray(table)[:, None]  # (G, 1)

    t_pad = -(-T // 8) * 8
    if tile_f is None:
        candidates = choose_tile_f_cwmm(D, K, t_pad, has_sal=has_sal)
        if not candidates:
            raise ValueError(
                f'signal too long for the fused CWMM kernel '
                f'(T={T}, D={D}, K={K}); use the scan path')
        f_pads = [-(-F // tf) * tf for tf in candidates]
        best = min(zip(f_pads, [-tf for tf in candidates]))
        tile_f = -best[1]
    f_pad = -(-F // tile_f) * tile_f

    def stage(x):
        x = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, f_pad - F)))

    operands = [stage(y_re), stage(y_im), stage(affiliation), table_j]
    in_specs = [
        pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)),
        pl.BlockSpec((table.shape[0], 1), lambda i: (0, 0)),
    ]
    if has_sal:
        operands.append(jnp.pad(
            jnp.transpose(saliency.astype(jnp.float32), (1, 0)),
            ((0, t_pad - T), (0, f_pad - F))))
        in_specs.append(
            pl.BlockSpec((t_pad, tile_f), lambda i: (0, i)))

    kernel = functools.partial(
        _cwmm_kernel, d=D, k=K, iterations=iterations, sweeps=sweeps,
        warm_sweeps=warm_sweeps,
        t_real=T, r0=r0, dr=dr, table_size=table.shape[0],
        dimension_consts=_log_norm_tran_vu_terms(D), tiny=_TINY,
        has_sal=has_sal)

    aff, m_re, m_im, kappa, weight = pl.pallas_call(
        kernel,
        grid=(f_pad // tile_f,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((K, t_pad, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((D, K, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((D, K, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((K, tile_f), lambda i: (0, i)),
            pl.BlockSpec((K, tile_f), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, t_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, f_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    weight = jnp.transpose(weight)[:F]  # (F, K)
    mode = (jnp.transpose(m_re, (2, 1, 0))
            + 1j * jnp.transpose(m_im, (2, 1, 0)))[:F]  # (F, K, D)
    concentration = jnp.transpose(kappa)[:F]  # (F, K)
    affiliation = jnp.transpose(aff, (2, 0, 1))[:F, :, :T]
    return weight, mode, concentration, affiliation
