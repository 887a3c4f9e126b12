"""Pallas TPU kernel: the ENTIRE integration-model EM fit (VMFCACGMM /
GCACGMM) in one kernel launch.

The per-iteration fused kernel (ops/pallas_integration_em.py) already
keeps the posterior out of HBM, but each EM iteration still pays one
kernel launch plus XLA glue (stage/unstage transposes, the Pallas
Jacobi eigh launch, the closed-form spectral M-step) — measured ~0.6
ms/iteration at the benchmark shape of which the E+stats kernel itself
is a fraction.

This kernel runs the whole fit on a grid ``(iterations, n_tiles)``
(iteration-major). TPU grids execute SEQUENTIALLY, so VMEM scratch is
legal cross-step state:

* per-tile cACG state (eigenvector planes, eigenvalues, weights)
  persists in tile-indexed scratch — the E-step at ``(it+1, i)`` reads
  what ``(it, i)``'s in-kernel M-step (warm-started Jacobi, the
  ops/pallas_em_loop recipe) wrote;
* the GLOBAL spectral model (the reference fits one vMF/Gaussian over
  ALL frequencies, pb_bss/distribution/vmfcacgmm.py:280-284 /
  gcacgmm.py:307-333) lives in small scratch: per-utterance statistics
  are accumulated across tiles with one MXU matmul against a one-hot
  utterance mask (gather-free; leading batch axes folded into the bin
  axis keep their own spectral state), and the closed-form spectral
  M-step ([Banerjee2005] vMF / Gaussian moment matching) runs in-kernel
  at the first tile of the next iteration;
* the vMF log-normalizer of the NEW concentrations is evaluated
  in-kernel from a sqrt-spaced piecewise-linear table as a dense
  hat-function sum (the ops/pallas_cwmm_loop recipe — no gathers).

The observation/embedding tiles stream from HBM once per iteration
(double-buffered block fetches; VMEM cannot hold all tiles), which is
~20 us/iteration of bandwidth at the benchmark shape — the launch and
glue overhead it replaces is ~30x larger.

The final model: cACG/weight come from the last in-kernel M-step; the
spectral finish of the LAST iteration's accumulators runs once in XLA
on the returned accumulator rows (exactly the per-iteration path's
finish code in models/vmfcacgmm.py / models/gcacgmm.py).

Numerics replicate the fused per-iteration path: quadratic-form floor
at tiny / 10*tiny, scatter scale D/max(asum, tiny), eigenvalue
max-normalization + floor (``from_covariance`` 'eigenvalue' semantics),
per-bin class-normalized weights (reference gcacgmm.py:287-295 for
``weight_constant_axis=(-1,)``), linear-domain max-shift softmax with
``affiliation_eps`` clipping. Affiliation trajectories are
exponentially sensitive to small-eigenvalue rounding (see
docs/DESIGN.md), so parity with the per-iteration path is tested at
quality level plus tight few-iteration trajectory checks.
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

__all__ = ['integration_em_full', 'choose_tile_f_loop',
           'vmf_log_norm_table', 'spec_rows', 'acc_rows']

_TINY = float(np.finfo(np.float32).tiny)
_TABLE_SIZE = 1024


def spec_rows(e_dim, k, spectral_mode):
    """Row count of the packed spectral-state matrix (rows, n_utt).

    'vmf': [mean (E*K rows, e-major), concentration (K), log_norm (K)].
    'gaussian': [precision*mean (E*K), precision (E*K), const (K)]
    where const = 0.5*E*log(2 pi) - ldpc + 0.5 sum_e mean^2 * prec.
    """
    if spectral_mode == 'vmf':
        return e_dim * k + 2 * k
    assert spectral_mode == 'gaussian', spectral_mode
    return 2 * e_dim * k + k


def acc_rows(e_dim, k, spectral_mode):
    """Row count of the per-utterance accumulator matrix (rows, n_utt).

    'vmf': [resultants sum_t a*e (E*K, e-major), sum_t a (K)].
    'gaussian': additionally [second moments sum_t a*e^2 (E*K)].
    """
    if spectral_mode == 'vmf':
        return e_dim * k + k
    assert spectral_mode == 'gaussian', spectral_mode
    return 2 * e_dim * k + k


def vmf_log_norm_table(dim, min_concentration, max_concentration,
                       size=_TABLE_SIZE):
    """Piecewise-linear table of the vMF log-normalizer on a
    sqrt-spaced concentration grid (denser where the curvature is).

    Returns ``(s0, ds, values)`` with ``values[g] =
    log_norm(kappa=(s0 + g*ds)^2)`` so the kernel evaluates
    ``idx = (sqrt(kappa) - s0) / ds`` and hat-sums. Max abs error at
    size=1024 over [1e-10, 500] is ~1e-6 for E>=2 (tested in
    tests/test_ops/test_pallas_integration_em_loop.py).
    """
    from scipy.special import ive
    nu = dim / 2 - 1
    s0 = float(np.sqrt(min_concentration))
    s1 = float(np.sqrt(max_concentration))
    ds = (s1 - s0) / (size - 1)
    kappa = (s0 + ds * np.arange(size)) ** 2
    kappa = np.clip(kappa, min_concentration, max_concentration)
    values = ((dim / 2) * np.log(2 * np.pi)
              + np.log(ive(nu, kappa)) + kappa - nu * np.log(kappa))
    return s0, ds, values.astype(np.float32)


def choose_tile_f_loop(d, e_dim, k, t_pad, n_utt, spectral_mode,
                       *, vmem_budget=14 * 2 ** 20):
    """Feasible (tile_f, n_tiles-independent) VMEM check; returns the
    widest feasible lane tile given padded F, or a callable check.

    Per-tile persistent scratch scales with n_tiles, so feasibility
    depends on f_pad too — this returns a function
    ``fits(tile_f, f_pad) -> bool`` plus the candidate list, used by
    :func:`integration_em_full` and the trainers' eligibility gates.
    """
    s_rows = spec_rows(e_dim, k, spectral_mode)
    a_rows = acc_rows(e_dim, k, spectral_mode)
    u_lanes = max(n_utt, 128)  # lane padding of (rows, n_utt) blocks

    def fits(tile_f, f_pad):
        n_tiles = f_pad // tile_f
        blocks = 4 * 2 * (
            (2 * d + e_dim) * t_pad * tile_f      # y planes + embedding
            + 2 * d * d * k * tile_f              # V0 planes
            + (d * k + k) * tile_f                # eig0, weight0
            + s_rows * u_lanes                    # spec0
            + n_utt * tile_f + tile_f * u_lanes   # umask, umask_t
            + _TABLE_SIZE                         # logC table
            + 2 * d * d * k * tile_f              # V out planes
            + (d * k + k) * tile_f                # eig/weight out
            + a_rows * u_lanes                    # acc out
        )
        scratch = 4 * (
            n_tiles * (2 * d * d * k + d * k + k) * tile_f
            + 6 * d * d * k * tile_f              # wvr/wvi/ar/ai/br/bi
            + a_rows * tile_f                     # stats rows
            + (a_rows + s_rows) * u_lanes         # acc + spec scratch
        )
        return blocks + scratch <= vmem_budget

    return fits


def _finish_rows_vmf(stats_val, *, e_dim, k, min_concentration,
                     max_concentration, table_ref, s0, ds,
                     table_size, tiny):
    """Closed-form [Banerjee2005] vMF M-step on packed accumulator
    rows: returns (mu rows (E*K, U), kappa (K, U), logc (K, U))."""
    r = [stats_val[ee * k + kk] for ee in range(e_dim)
         for kk in range(k)]  # e-major list of (U,)
    n = [stats_val[e_dim * k + kk] for kk in range(k)]
    mu = []
    kappa_list = []
    for kk in range(k):
        norm2 = None
        for ee in range(e_dim):
            v = r[ee * k + kk]
            norm2 = v * v if norm2 is None else norm2 + v * v
        norm = jnp.sqrt(norm2)
        inv_norm = 1.0 / jnp.maximum(norm, tiny)
        for ee in range(e_dim):
            mu.append(r[ee * k + kk] * inv_norm)
        r_bar = norm / jnp.maximum(n[kk], tiny)
        kappa_list.append(jnp.clip(
            (r_bar * e_dim - r_bar ** 3) / (1 - r_bar * r_bar),
            min_concentration, max_concentration))
    # mu list is k-major inside e loop; reorder to e-major rows
    mu_rows = [mu[kk * e_dim + ee] for ee in range(e_dim)
               for kk in range(k)]
    kappa = jnp.stack(kappa_list)  # (K, U)
    # logC via dense hat sum over the sqrt-spaced table
    idx = jnp.clip((jnp.sqrt(kappa) - s0) / ds, 0.0,
                   table_size - 1.0)
    logc = None
    for g in range(table_size):
        w_g = jnp.maximum(1.0 - jnp.abs(idx - g), 0.0)
        t = table_ref[g // 128, g % 128] * w_g
        logc = t if logc is None else logc + t
    return mu_rows, kappa, logc


def _finish_rows_gaussian(stats_val, *, e_dim, k, spherical, tiny):
    """Gaussian moment-matching M-step on packed accumulator rows:
    returns (pm rows (E*K), prec rows (E*K), const (K, U))."""
    log2pi = float(np.log(2 * np.pi))
    pm_rows = [None] * (e_dim * k)
    prec_rows = [None] * (e_dim * k)
    const_list = []
    for kk in range(k):
        n = jnp.maximum(stats_val[e_dim * k + kk], tiny)
        mean = []
        centered = []
        for ee in range(e_dim):
            m = stats_val[ee * k + kk] / n
            m2 = stats_val[e_dim * k + k + ee * k + kk] / n
            mean.append(m)
            centered.append(jnp.maximum(m2 - m * m, tiny))
        if spherical:
            cov = centered[0]
            for ee in range(1, e_dim):
                cov = cov + centered[ee]
            cov = cov / e_dim
            prec = [1.0 / cov] * e_dim
            ldpc = -0.5 * e_dim * jnp.log(cov)
        else:
            prec = [1.0 / c for c in centered]
            ldpc = None
            for c in centered:
                l = jnp.log(c)
                ldpc = l if ldpc is None else ldpc + l
            ldpc = -0.5 * ldpc
        quad = None
        for ee in range(e_dim):
            pm_rows[ee * k + kk] = prec[ee] * mean[ee]
            prec_rows[ee * k + kk] = prec[ee]
            q = mean[ee] * mean[ee] * prec[ee]
            quad = q if quad is None else quad + q
        const_list.append(0.5 * e_dim * log2pi - ldpc + 0.5 * quad)
    return pm_rows, prec_rows, jnp.stack(const_list)


def _loop_kernel(*refs, d, e_dim, k, n_utt, iterations, sweeps,
                 warm_sweeps, t_real, spatial_weight, spectral_weight,
                 affiliation_eps, eigenvalue_floor, min_concentration,
                 max_concentration, s0, ds, table_size, tiny,
                 spectral_mode, spherical, ablate=''):
    """One grid step = one (iteration, frequency-tile) E+M pass."""
    if spectral_mode == 'vmf':
        (y_re_ref, y_im_ref, emb_ref, vre0_ref, vim0_ref, eig0_ref,
         w0_ref, spec0_ref, umask_ref, umask_t_ref, table_ref,
         vre_o, vim_o, eig_o, w_o, acc_o,
         vre_s, vim_s, eig_s, w_s, wvr, wvi, ar, ai, br, bi,
         stats_s, acc_s, spec_s) = refs
    else:
        (y_re_ref, y_im_ref, emb_ref, vre0_ref, vim0_ref, eig0_ref,
         w0_ref, spec0_ref, umask_ref, umask_t_ref,
         vre_o, vim_o, eig_o, w_o, acc_o,
         vre_s, vim_s, eig_s, w_s, wvr, wvi, ar, ai, br, bi,
         stats_s, acc_s, spec_s) = refs
        table_ref = None

    it = pl.program_id(0)
    i = pl.program_id(1)
    if ablate == 'staticidx':
        i = 0
    t_pad = y_re_ref.shape[1]
    tile_f = y_re_ref.shape[2]
    a_rows = acc_rows(e_dim, k, spectral_mode)

    # ---- cross-step state management --------------------------------
    @pl.when(it == 0)
    def _init_tile():
        vre_s[i] = vre0_ref[...]
        vim_s[i] = vim0_ref[...]
        eig_s[i] = eig0_ref[...]
        w_s[i] = w0_ref[...]

    @pl.when((it == 0) & (i == 0))
    def _init_spec():
        spec_s[...] = spec0_ref[...]

    @pl.when((it > 0) & (i == 0) & (ablate != 'nospec'))
    def _spectral_m_step():
        stats_val = acc_s[...]  # (A_rows, n_utt)
        if spectral_mode == 'vmf':
            mu_rows, kappa, logc = _finish_rows_vmf(
                stats_val, e_dim=e_dim, k=k,
                min_concentration=min_concentration,
                max_concentration=max_concentration,
                table_ref=table_ref, s0=s0, ds=ds,
                table_size=table_size, tiny=tiny)
            for row, v in enumerate(mu_rows):
                spec_s[row] = v
            for kk in range(k):
                spec_s[e_dim * k + kk] = kappa[kk]
                spec_s[e_dim * k + k + kk] = logc[kk]
        else:
            pm_rows, prec_rows, const = _finish_rows_gaussian(
                stats_val, e_dim=e_dim, k=k, spherical=spherical,
                tiny=tiny)
            for row in range(e_dim * k):
                spec_s[row] = pm_rows[row]
                spec_s[e_dim * k + row] = prec_rows[row]
            for kk in range(k):
                spec_s[2 * e_dim * k + kk] = const[kk]

    @pl.when(i == 0)
    def _reset_acc():
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    # working copies of this tile's cACG state (static indices for the
    # Jacobi helpers; one dynamic-leading-dim block read each)
    wvr[...] = vre_s[i]
    wvi[...] = vim_s[i]
    eig_blk = eig_s[i]  # (D, K, F')
    w_blk = w_s[i]      # (K, F')

    # per-lane spectral state: one MXU matmul against the one-hot
    # utterance mask (gather-free batch-folding broadcast)
    spec_lane = jnp.dot(
        spec_s[...], umask_ref[...],
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)  # (S_rows, F')

    if t_pad == t_real:
        mask = None
    else:
        mask = (lax.broadcasted_iota(
            jnp.int32, (t_pad, tile_f), 0) < t_real
        ).astype(jnp.float32)

    # ---- E-step: spectral log-pdf -----------------------------------
    # (emb*emb is recomputed where needed instead of cached: a cached
    # E-plane list is ~3 MB of live VMEM stack at E=20)
    if ablate == 'nospec':
        spectral = [0.0] * k
    elif spectral_mode == 'vmf':
        en = None
        for ee in range(e_dim):
            e_ = emb_ref[ee]
            en = e_ * e_ if en is None else en + e_ * e_
        inv_norm = lax.rsqrt(jnp.maximum(en, tiny))  # (T, F')
        spectral = []
        for kk in range(k):
            dot = None
            for ee in range(e_dim):
                t = spec_lane[ee * k + kk][None] * emb_ref[ee]
                dot = t if dot is None else dot + t
            spectral.append(
                spec_lane[e_dim * k + kk][None] * dot * inv_norm
                - spec_lane[e_dim * k + k + kk][None])
    else:
        spectral = []
        for kk in range(k):
            acc = None
            for ee in range(e_dim):
                e_ = emb_ref[ee]
                t = (spec_lane[ee * k + kk][None] * e_
                     - 0.5 * spec_lane[e_dim * k + ee * k + kk][None]
                     * e_ * e_)
                acc = t if acc is None else acc + t
            spectral.append(acc - spec_lane[2 * e_dim * k + kk][None])

    # ---- E-step: spatial log-pdf via Cinv pair products --------------
    inv = [None] * d
    logdet = None
    for dd in range(d):
        l = eig_blk[dd]  # (K, F')
        inv[dd] = 1.0 / l
        logdet = jnp.log(l) if logdet is None else logdet + jnp.log(l)

    cinv_r = {}
    cinv_i = {}
    for dd in range(d):
        for ee in range(dd, d):
            cr = None
            ci = None
            for i_ in range(d):
                vrd = wvr[dd, i_]
                vid = wvi[dd, i_]
                vre_ = wvr[ee, i_]
                vie = wvi[ee, i_]
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
                    term = 2 * (cinv_r[dd, ee][kk] * p_re
                                + cinv_i[dd, ee][kk] * p_im)
                qf_acc[kk] = (term if qf_acc[kk] is None
                              else qf_acc[kk] + term)

    log_pdf = []
    qf = []
    for kk in range(k):
        q = jnp.maximum(qf_acc[kk], tiny)
        qf.append(q)
        spatial = -d * jnp.log(q) - logdet[kk]
        log_pdf.append(spatial_weight * spatial
                       + spectral_weight * spectral[kk])

    max_k = log_pdf[0]
    for kk in range(1, k):
        max_k = jnp.maximum(max_k, log_pdf[kk])
    num = [jnp.exp(log_pdf[kk] - max_k) * w_blk[kk] for kk in range(k)]
    den = num[0]
    for kk in range(1, k):
        den = den + num[kk]
    den = jnp.maximum(den, tiny)

    aff = []
    asum = []
    for kk in range(k):
        a = num[kk] / den
        if affiliation_eps:
            a = jnp.clip(a, affiliation_eps, 1 - affiliation_eps)
        if mask is not None:
            a = a * mask
        aff.append(a)
        asum.append(jnp.sum(a, axis=0))  # (F',)

    # ---- statistics ---------------------------------------------------
    # spectral rows into stats scratch, then one MXU reduction to the
    # per-utterance accumulators
    if ablate not in ('noacc', 'nospec'):
        for ee in range(e_dim):
            em = emb_ref[ee]
            for kk in range(k):
                stats_s[ee * k + kk] = jnp.sum(aff[kk] * em, axis=0)
        for kk in range(k):
            stats_s[e_dim * k + kk] = asum[kk]
        if spectral_mode == 'gaussian':
            for ee in range(e_dim):
                e_ = emb_ref[ee]
                sq_e = e_ * e_
                for kk in range(k):
                    stats_s[e_dim * k + k + ee * k + kk] = jnp.sum(
                        aff[kk] * sq_e, axis=0)
        acc_s[...] = acc_s[...] + jnp.dot(
            stats_s[...], umask_t_ref[...],
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)

    # ---- M-step: per-bin weight + cACG scatter -> warm Jacobi --------
    den_w = asum[0]
    for kk in range(1, k):
        den_w = den_w + asum[kk]
    den_w = jnp.maximum(den_w, tiny)
    new_w = [asum[kk] / den_w for kk in range(k)]

    w_q = [aff[kk] / jnp.maximum(qf[kk], 10 * tiny) for kk in range(k)]
    scale = [d / jnp.maximum(asum[kk], tiny) for kk in range(k)]
    for dd in range(d):
        y_rd = y_re_ref[dd]
        y_id = y_im_ref[dd]
        for ee in range(dd, d):
            p_re = y_rd * y_re_ref[ee] + y_id * y_im_ref[ee]
            p_im = (None if ee == dd
                    else y_id * y_re_ref[ee] - y_rd * y_im_ref[ee])
            for kk in range(k):
                s_re = jnp.sum(w_q[kk] * p_re, axis=0) * scale[kk]
                ar[dd, ee, kk] = s_re
                if ee == dd:
                    ai[dd, dd, kk] = jnp.zeros_like(s_re)
                else:
                    s_im = jnp.sum(w_q[kk] * p_im, axis=0) * scale[kk]
                    ar[ee, dd, kk] = s_re
                    ai[dd, ee, kk] = s_im
                    ai[ee, dd, kk] = -s_im

    # warm-started Jacobi: rotate into the previous eigenbasis; the
    # first kernel iteration refines with extra sweeps (the host init
    # basis is further from the fresh scatter's)
    if ablate != 'nojacobi':
        _warm_rotate(ar, ai, wvr, wvi, br, bi, d=d)
        if sweeps > warm_sweeps:
            @pl.when(it == 0)
            def _extra_sweeps():
                _jacobi_rounds(ar, ai, wvr, wvi, d=d,
                               sweeps=sweeps - warm_sweeps, tiny=tiny)
        _jacobi_rounds(ar, ai, wvr, wvi, d=d, sweeps=warm_sweeps,
                       tiny=tiny)

    # eigenvalue normalization + floor (from_covariance 'eigenvalue')
    lam = [ar[dd, dd] for dd in range(d)]
    lam_max = lam[0]
    for dd in range(1, d):
        lam_max = jnp.maximum(lam_max, lam[dd])
    lam_max = jnp.maximum(lam_max, tiny)

    # ---- persist + outputs -------------------------------------------
    vre_s[i] = wvr[...]
    vim_s[i] = wvi[...]
    for dd in range(d):
        l = jnp.maximum(lam[dd] / lam_max, eigenvalue_floor)
        eig_s[i, dd] = l
        eig_o[dd] = l
    for kk in range(k):
        w_s[i, kk] = new_w[kk]
        w_o[kk] = new_w[kk]
    if ablate != 'noout':
        vre_o[...] = wvr[...]
        vim_o[...] = wvi[...]
        acc_o[...] = acc_s[...]
    else:
        @pl.when(it == 0)
        def _out_once():
            vre_o[...] = wvr[...]
            vim_o[...] = wvi[...]
            acc_o[...] = acc_s[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        'n_utt', 'iterations', 'sweeps', 'warm_sweeps', 't_real',
        'spatial_weight', 'spectral_weight', 'affiliation_eps',
        'eigenvalue_floor', 'min_concentration', 'max_concentration',
        'tile_f', 'table_size', 'spectral_mode', 'spherical',
        'interpret', '_ablate'))
def integration_em_full(y_re, y_im, emb, v_re0, v_im0, eig0, weight0,
                        spec0, *, n_utt, iterations, t_real=None,
                        sweeps=6, warm_sweeps=2, spatial_weight=1.,
                        spectral_weight=1., affiliation_eps=1e-10,
                        eigenvalue_floor=1e-10, min_concentration=1e-10,
                        max_concentration=500., tile_f=None,
                        table_size=_TABLE_SIZE,
                        spectral_mode='vmf', spherical=True,
                        interpret=False, _ablate=''):
    """Run ``iterations`` fused integration-model EM steps (E-step +
    full M-step) as ONE Pallas kernel launch.

    Semantics match ``iterations`` steps of the per-iteration fused
    scan (models/vmfcacgmm.py / models/gcacgmm.py ``fused_step``)
    given the same initial model: the returned cACG/weight are the
    final model's; the spectral finish of the LAST E-step's
    accumulators is returned as packed rows for the caller's XLA
    closed form.

    Args:
        y_re / y_im: (FB, D, T) unit-norm observation planes, FB =
            n_utt * F (leading batch folded into the bin axis).
        emb: (FB, E, T) raw embedding, time-last.
        v_re0 / v_im0: (FB, K, D, D) initial cACG eigenvector planes.
        eig0: (FB, K, D) initial eigenvalues (floored/normalized).
        weight0: (FB, K) initial per-bin weights.
        spec0: (S_rows, n_utt) packed initial spectral state
            (:func:`spec_rows` layout).
    Returns:
        (eigenvalues (FB, K, D) ascending, eigenvectors (FB, K, D, D)
        complex64, weight (FB, K), acc (A_rows, n_utt) packed last
        E-step spectral statistics (:func:`acc_rows` layout)).
    """
    FB, D, T = y_re.shape
    E = emb.shape[1]
    K = weight0.shape[-1]
    if t_real is None:
        t_real = T
    t_pad = -(-T // 8) * 8
    assert iterations >= 1

    if tile_f is None:
        fits = choose_tile_f_loop(
            D, E, K, t_pad, n_utt, spectral_mode)
        for tf in (256, 128):
            if fits(tf, -(-FB // tf) * tf):
                tile_f = tf
                break
        if tile_f is None:
            raise ValueError(
                f'shape exceeds the whole-fit integration kernel VMEM '
                f'budget (FB={FB}, T={T}, D={D}, E={E}, K={K})')
    f_pad = -(-FB // tile_f) * tile_f
    n_tiles = f_pad // tile_f

    def stage_planes(x):
        # (FB, C, T) -> (C, t_pad, f_pad)
        x = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, f_pad - FB)))

    y_re_s = stage_planes(y_re)
    y_im_s = stage_planes(y_im)
    emb_s = stage_planes(emb)
    v_re_s = jnp.pad(jnp.transpose(
        v_re0.astype(jnp.float32), (2, 3, 1, 0)),
        ((0, 0),) * 3 + ((0, f_pad - FB),))
    v_im_s = jnp.pad(jnp.transpose(
        v_im0.astype(jnp.float32), (2, 3, 1, 0)),
        ((0, 0),) * 3 + ((0, f_pad - FB),))
    # padded lanes get unit eigenvalues: log/1-over stay finite there
    # (their garbage would otherwise poison the masked accumulator
    # matmul — 0 * nan = nan)
    eig_s = jnp.pad(jnp.transpose(
        eig0.astype(jnp.float32), (2, 1, 0)),
        ((0, 0),) * 2 + ((0, f_pad - FB),), constant_values=1.0)
    w_s = jnp.pad(jnp.transpose(weight0.astype(jnp.float32)),
                  ((0, 0), (0, f_pad - FB)))
    spec0 = spec0.astype(jnp.float32)

    # one-hot utterance masks (lane u of umask row r is 1 iff bin u
    # belongs to utterance r); padded bins belong to no utterance
    f_per_utt = FB // max(n_utt, 1)
    assert n_utt * f_per_utt == FB, (n_utt, FB)
    bin_utt = jnp.arange(f_pad) // f_per_utt
    valid = jnp.arange(f_pad) < FB
    umask = ((bin_utt[None, :] == jnp.arange(n_utt)[:, None])
             & valid[None, :]).astype(jnp.float32)  # (n_utt, f_pad)
    umask_t = jnp.transpose(umask)  # (f_pad, n_utt)

    s_rows = spec_rows(E, K, spectral_mode)
    a_rows = acc_rows(E, K, spectral_mode)
    assert spec0.shape == (s_rows, n_utt), (spec0.shape, s_rows, n_utt)

    if spectral_mode == 'vmf':
        assert table_size % 128 == 0, table_size
        s0, ds, table = vmf_log_norm_table(
            E, min_concentration, max_concentration, size=table_size)
        table_in = [jnp.asarray(table).reshape(table_size // 128, 128)]
        table_specs = [pl.BlockSpec(
            (table_size // 128, 128), lambda it, i: (0, 0))]
    else:
        s0 = ds = 0.0
        table_in = []
        table_specs = []

    kernel = functools.partial(
        _loop_kernel, d=D, e_dim=E, k=K, n_utt=n_utt,
        iterations=iterations, sweeps=sweeps, warm_sweeps=warm_sweeps,
        t_real=t_real, spatial_weight=float(spatial_weight),
        spectral_weight=float(spectral_weight),
        affiliation_eps=float(affiliation_eps),
        eigenvalue_floor=float(eigenvalue_floor),
        min_concentration=float(min_concentration),
        max_concentration=float(max_concentration),
        s0=float(s0), ds=float(ds), table_size=int(table_size),
        tiny=_TINY,
        spectral_mode=spectral_mode, spherical=bool(spherical),
        ablate=_ablate)

    tile_spec = lambda *shape: pl.BlockSpec(
        shape + (tile_f,), lambda it, i: (0,) * len(shape) + (i,))

    v_re_o, v_im_o, eig_o, w_o, acc_o = pl.pallas_call(
        kernel,
        grid=(iterations, n_tiles),
        in_specs=[
            tile_spec(D, t_pad),
            tile_spec(D, t_pad),
            tile_spec(E, t_pad),
            tile_spec(D, D, K),
            tile_spec(D, D, K),
            tile_spec(D, K),
            tile_spec(K),
            pl.BlockSpec((s_rows, n_utt), lambda it, i: (0, 0)),
            tile_spec(n_utt),
            pl.BlockSpec((tile_f, n_utt), lambda it, i: (i, 0)),
            *table_specs,
        ],
        out_specs=[
            tile_spec(D, D, K),
            tile_spec(D, D, K),
            tile_spec(D, K),
            tile_spec(K),
            pl.BlockSpec((a_rows, n_utt), lambda it, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((a_rows, n_utt), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_tiles, D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((n_tiles, D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((n_tiles, D, K, tile_f), jnp.float32),
            pltpu.VMEM((n_tiles, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((D, D, K, tile_f), jnp.float32),
            pltpu.VMEM((a_rows, tile_f), jnp.float32),
            pltpu.VMEM((a_rows, n_utt), jnp.float32),
            pltpu.VMEM((s_rows, n_utt), jnp.float32),
        ],
        interpret=interpret,
    )(y_re_s, y_im_s, emb_s, v_re_s, v_im_s, eig_s, w_s, spec0,
      umask, umask_t, *table_in)

    eigenvalues = jnp.transpose(eig_o, (2, 1, 0))[:FB]  # (FB, K, D)
    vectors = (jnp.transpose(v_re_o, (3, 2, 0, 1))
               + 1j * jnp.transpose(v_im_o, (3, 2, 0, 1)))[:FB]
    eigenvalues, vectors = _sort_ascending(eigenvalues, vectors)
    weight = jnp.transpose(w_o)[:FB]  # (FB, K)
    return eigenvalues, vectors, weight, acc_o
