"""Pallas TPU kernel: fused E-step + M-statistics for the vMF x cACG
integration model (VMFCACGMM).

The integration models couple a per-frequency spatial cACG with a
GLOBAL spectral model over the (F*T) embedding frames (reference
pb_bss/distribution/vmfcacgmm.py): the vMF M-step reduces over ALL
frequencies, so the whole EM cannot be bin-local like
ops/pallas_em_loop.py. Instead each iteration runs ONE kernel pass
over the observation/embedding tiles (bins in lanes) producing every
statistic the M-step needs —

* the posterior (never materialized to HBM),
* the cACG weighted scatter ``sum_t (a/q) y y^H`` and ``sum_t a``,
* the vMF resultants ``sum_t a e`` (reduced over the tile's frames;
  the tiny cross-frequency reduction finishes in XLA),

— and XLA finishes the M-step (Pallas Jacobi eigh via
ops/pallas_eigh.py, Banerjee closed-form vMF update, weight) inside
the same ``lax.scan``. The E-step evaluates the spatial quadratic
form via the assembled inverse covariance over shared pair products
(the pallas_em_loop recipe) plus the spectral term
``kappa mu . e / |e| - log C`` with the global vMF parameters
resident as lane-tile-sized side tables.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

__all__ = ['vmfcacgmm_e_stats', 'choose_tile_f', 'stage_observation',
           'stage_saliency', 'e_stats_staged']

_TINY = float(np.finfo(np.float32).tiny)


def choose_tile_f(d, e_dim, k, t_pad, *, has_sal=False):
    """Largest lane tile whose double-buffered blocks fit the VMEM
    budget, or None if even 128 lanes do not fit (then the fused
    integration path is ineligible)."""
    per_lane = 4 * 2 * (
        (2 * d + e_dim) * t_pad           # y_re, y_im, emb in-blocks
        + (t_pad if has_sal else 0)       # saliency in-block
        + 2 * d * d * k + d * k + 2 * k   # V planes, inv, logdet, weight
        + 2 * d * d * k + k + e_dim * k   # scatter, asum, resultants out
        + e_dim * k + 2 * k               # per-lane mu, kappa/const in
        + 2 * e_dim * k                   # gaussian-mode prec in, m2 out
    )
    return next(
        (tf for tf in (256, 128) if tf * per_lane <= 12 * 2 ** 20),
        None)


def _e_stats_kernel(*refs, d, e_dim, k, t_real, spatial_weight,
                    spectral_weight, affiliation_eps, tiny,
                    spectral_mode, has_sal=False):
    """One frequency tile, one EM iteration's E-step + statistics.

    Blocks: y (D, T, F'); emb (E, T, F'); V planes (D, D, K, F');
    inv eigenvalues (D, K, F'); logdet/weight (K, F'); optional
    saliency (T, F') appended after the spectral state when
    ``has_sal``; spectral state PER LANE (constant over lanes for a
    single fit; folding leading batch axes into the bin axis gives
    each utterance its own columns):
      'vmf':      mu (E, K, F'), kappa/logC (2, K, F')
      'gaussian': precision-scaled mean (E, K, F'), per-dim
                  precisions (E, K, F'), log-norm constants (1, K, F')
    Outputs: scatter planes (D, D, K, F'), affiliation sums (K, F'),
    resultants ``sum_t a e`` (E, K, F'); 'gaussian' additionally the
    per-dim second moments ``sum_t a e^2`` (E, K, F').
    """
    refs = list(refs)
    if spectral_mode == 'vmf':
        n_in = 10 + int(has_sal)
        if has_sal:
            (y_re_ref, y_im_ref, emb_ref, vre_ref, vim_ref, inv_ref,
             logdet_ref, weight_ref, mu_ref, kappa_ref,
             sal_ref) = refs[:n_in]
        else:
            (y_re_ref, y_im_ref, emb_ref, vre_ref, vim_ref, inv_ref,
             logdet_ref, weight_ref, mu_ref, kappa_ref) = refs[:n_in]
            sal_ref = None
        (s_re_ref, s_im_ref, asum_ref, r_ref) = refs[n_in:]
    else:
        n_in = 11 + int(has_sal)
        if has_sal:
            (y_re_ref, y_im_ref, emb_ref, vre_ref, vim_ref, inv_ref,
             logdet_ref, weight_ref, mu_ref, prec_ref, const_ref,
             sal_ref) = refs[:n_in]
        else:
            (y_re_ref, y_im_ref, emb_ref, vre_ref, vim_ref, inv_ref,
             logdet_ref, weight_ref, mu_ref, prec_ref,
             const_ref) = refs[:n_in]
            sal_ref = None
        (s_re_ref, s_im_ref, asum_ref, r_ref, m2_ref) = refs[n_in:]

    t_pad = y_re_ref.shape[1]
    if t_pad == t_real:
        mask = None
    else:
        mask = (lax.broadcasted_iota(
            jnp.int32, (t_pad, y_re_ref.shape[2]), 0) < t_real
        ).astype(jnp.float32)

    sq = [emb_ref[ee] * emb_ref[ee] for ee in range(e_dim)]
    if spectral_mode == 'vmf':
        # ---- spectral log-pdf: kappa mu . e/|e| - log C ------------
        en = sq[0]
        for ee in range(1, e_dim):
            en = en + sq[ee]
        inv_norm = lax.rsqrt(jnp.maximum(en, tiny))  # (T, F')

        spectral = []
        for kk in range(k):
            dot = None
            for ee in range(e_dim):
                t = mu_ref[ee, kk] * emb_ref[ee]
                dot = t if dot is None else dot + t
            spectral.append(
                kappa_ref[0, kk] * dot * inv_norm - kappa_ref[1, kk])
    else:
        # ---- Gaussian: (P m).e - 0.5 e.diag(P).e - const -----------
        # (const folds 0.5 m.P.m + the log-norm; diagonal/spherical
        # precisions P cover GaussianTrainer's two vector covariance
        # types, reference gaussian.py:146-167)
        spectral = []
        for kk in range(k):
            acc = None
            for ee in range(e_dim):
                t = (mu_ref[ee, kk] * emb_ref[ee]
                     - 0.5 * prec_ref[ee, kk] * sq[ee])
                acc = t if acc is None else acc + t
            spectral.append(acc - const_ref[0, kk])

    # ---- spatial log-pdf via Cinv pair products --------------------
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

    log_pdf = []
    qf = []
    for kk in range(k):
        q = jnp.maximum(qf_acc[kk], tiny)
        qf.append(q)
        spatial = -d * jnp.log(q) - logdet_ref[kk]
        log_pdf.append(spatial_weight * spatial
                       + spectral_weight * spectral[kk])

    max_k = log_pdf[0]
    for kk in range(1, k):
        max_k = jnp.maximum(max_k, log_pdf[kk])
    num = [jnp.exp(log_pdf[kk] - max_k) * weight_ref[kk]
           for kk in range(k)]
    den = num[0]
    for kk in range(1, k):
        den = den + num[kk]
    den = jnp.maximum(den, tiny)

    # With saliency the M-statistics weight by a*s (scan-path
    # masked_affiliation = affiliation * saliency, reference
    # gcacgmm.py:266 / vmfcacgmm.py:253); the posterior itself is
    # never materialized, so only the masked sums leave the kernel.
    sal = sal_ref[...] if has_sal else None  # (T, F')
    aff = []
    for kk in range(k):
        a = num[kk] / den
        if affiliation_eps:
            a = jnp.clip(a, affiliation_eps, 1 - affiliation_eps)
        if mask is not None:
            a = a * mask
        if has_sal:
            a = a * sal
        aff.append(a)
        asum_ref[kk] = jnp.sum(a, axis=0)

    # ---- statistics ------------------------------------------------
    # cACG scatter sum_t (a/q) y y^H (upper triangle + mirror)
    w = [aff[kk] / jnp.maximum(qf[kk], 10 * tiny) for kk in range(k)]
    for dd in range(d):
        y_rd = y_re_ref[dd]
        y_id = y_im_ref[dd]
        for ee in range(dd, d):
            p_re = y_rd * y_re_ref[ee] + y_id * y_im_ref[ee]
            p_im = (None if ee == dd
                    else y_id * y_re_ref[ee] - y_rd * y_im_ref[ee])
            for kk in range(k):
                s_re = jnp.sum(w[kk] * p_re, axis=0)
                s_re_ref[dd, ee, kk] = s_re
                if ee == dd:
                    s_im_ref[dd, dd, kk] = jnp.zeros_like(s_re)
                else:
                    s_im = jnp.sum(w[kk] * p_im, axis=0)
                    s_re_ref[ee, dd, kk] = s_re
                    s_im_ref[dd, ee, kk] = s_im
                    s_im_ref[ee, dd, kk] = -s_im

    # resultants sum_t a * e (RAW embedding, reference semantics)
    for ee in range(e_dim):
        em = emb_ref[ee]
        for kk in range(k):
            r_ref[ee, kk] = jnp.sum(aff[kk] * em, axis=0)
    if spectral_mode == 'gaussian':
        for ee in range(e_dim):
            for kk in range(k):
                m2_ref[ee, kk] = jnp.sum(aff[kk] * sq[ee], axis=0)


@functools.partial(jax.jit, static_argnames=('tile_f',))
def stage_observation(y_re, y_im, embedding, *, tile_f):
    """One-time staging of the iteration-invariant kernel inputs:
    (F, D, T) observation planes and the (F, E, T) embedding become
    lane-tiled (D, t_pad, f_pad) / (E, t_pad, f_pad) f32 arrays.
    Hoisted out of the EM scan so per-iteration HBM traffic is only
    the kernel's own reads."""
    F, D, T = y_re.shape
    t_pad = -(-T // 8) * 8
    f_pad = -(-F // tile_f) * tile_f

    def stage(x):
        x = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, f_pad - F)))

    return stage(y_re), stage(y_im), jnp.pad(
        jnp.transpose(embedding.astype(jnp.float32), (1, 2, 0)),
        ((0, 0), (0, t_pad - T), (0, f_pad - F)))


@functools.partial(jax.jit, static_argnames=('tile_f',))
def stage_saliency(saliency, *, tile_f):
    """Stage (F, T) per-frame importance weights into the kernel's
    lane-tiled (t_pad, f_pad) layout (iteration-invariant, hoisted
    like :func:`stage_observation`)."""
    F, T = saliency.shape
    t_pad = -(-T // 8) * 8
    f_pad = -(-F // tile_f) * tile_f
    return jnp.pad(
        jnp.transpose(saliency.astype(jnp.float32), (1, 0)),
        ((0, t_pad - T), (0, f_pad - F)))


@functools.partial(
    jax.jit,
    static_argnames=('f_real', 't_real', 'spatial_weight',
                     'spectral_weight', 'affiliation_eps', 'tile_f',
                     'interpret', 'spectral_mode'))
def e_stats_staged(y_re_s, y_im_s, emb_s, v_re, v_im,
                   inv_eigenvalues, logdet, weight, mu, kappa,
                   log_c, saliency_s=None, *, f_real, t_real,
                   spatial_weight=1.,
                   spectral_weight=1., affiliation_eps=1e-10,
                   tile_f, interpret=False, spectral_mode='vmf'):
    """Fused E-step + M-statistics over all frequency tiles.

    Args:
        y_re_s / y_im_s / emb_s: pre-staged (D/E, t_pad, f_pad) planes
            from :func:`stage_observation`.
        v_re / v_im: (F, K, D, D) covariance eigenvector planes.
        inv_eigenvalues: (F, K, D); logdet / weight: (F, K).
        mu / kappa / log_c — per-bin spectral state (constant over
        the F axis for a single fit; leading batch axes folded into
        F carry each utterance's own state), by mode:
            'vmf': vMF means (F, K, E); concentrations (F, K); log
                norms (F, K).
            'gaussian': precision-scaled means ``P mu`` (F, K, E);
                per-dim precisions (F, K, E) (spherical: broadcast
                the scalar); constants ``0.5 mu.P.mu + log_norm``
                (F, K).
    ``saliency_s``: optional pre-staged (t_pad, f_pad) per-frame
    importance weights from :func:`stage_saliency` — when given,
    every statistic weights by ``a * s`` (the scan path's
    ``masked_affiliation``).

    Returns:
        (scatter (F, K, D, D) complex64 = sum_t (a/q) y y^H,
        affiliation_sum (F, K), resultants (F, K, E) = sum_t a e
        [, second moments (F, K, E) = sum_t a e^2 in 'gaussian'
        mode]; the caller reduces resultants/moments over its
        per-utterance bin ranges).
    """
    has_sal = saliency_s is not None
    D, t_pad, f_pad = y_re_s.shape
    E = emb_s.shape[0]
    K = weight.shape[1]
    F, T = f_real, t_real

    # (F, K, D, D) -> (D, D, K, f_pad)
    v_re_s = jnp.pad(jnp.transpose(
        v_re.astype(jnp.float32), (2, 3, 1, 0)),
        ((0, 0),) * 3 + ((0, f_pad - F),))
    v_im_s = jnp.pad(jnp.transpose(
        v_im.astype(jnp.float32), (2, 3, 1, 0)),
        ((0, 0),) * 3 + ((0, f_pad - F),))
    inv_s = jnp.pad(jnp.transpose(
        inv_eigenvalues.astype(jnp.float32), (2, 1, 0)),
        ((0, 0),) * 2 + ((0, f_pad - F),))
    logdet_s = jnp.pad(jnp.transpose(logdet.astype(jnp.float32)),
                       ((0, 0), (0, f_pad - F)))
    weight_s = jnp.pad(jnp.transpose(weight.astype(jnp.float32)),
                       ((0, 0), (0, f_pad - F)))
    def stage_fke(x):
        # (F, K, E) -> (E, K, f_pad)
        x = jnp.transpose(x.astype(jnp.float32), (2, 1, 0))
        return jnp.pad(x, ((0, 0), (0, 0), (0, f_pad - F)))

    def stage_fk(x):
        # (F, K) -> (K, f_pad)
        x = jnp.transpose(x.astype(jnp.float32))
        return jnp.pad(x, ((0, 0), (0, f_pad - F)))

    mu_s = stage_fke(mu)  # (E, K, f_pad)
    if spectral_mode == 'vmf':
        extra_in = [jnp.stack([stage_fk(kappa),
                               stage_fk(log_c)], 0)]  # (2, K, f_pad)
        extra_in_specs = [
            pl.BlockSpec((2, K, tile_f), lambda i: (0, 0, i))]
        extra_out_specs = []
        extra_out_shape = []
    else:
        assert spectral_mode == 'gaussian', spectral_mode
        extra_in = [stage_fke(kappa),  # precisions (E, K, f_pad)
                    stage_fk(log_c)[None]]  # (1, K, f_pad)
        extra_in_specs = [
            pl.BlockSpec((E, K, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((1, K, tile_f), lambda i: (0, 0, i))]
        extra_out_specs = [
            pl.BlockSpec((E, K, tile_f), lambda i: (0, 0, i))]
        extra_out_shape = [
            jax.ShapeDtypeStruct((E, K, f_pad), jnp.float32)]

    kernel = functools.partial(
        _e_stats_kernel, d=D, e_dim=E, k=K, t_real=T,
        spatial_weight=float(spatial_weight),
        spectral_weight=float(spectral_weight),
        affiliation_eps=float(affiliation_eps), tiny=_TINY,
        spectral_mode=spectral_mode, has_sal=has_sal)

    sal_in = [saliency_s] if has_sal else []
    sal_in_specs = (
        [pl.BlockSpec((t_pad, tile_f), lambda i: (0, i))]
        if has_sal else [])
    s_re, s_im, asum, r, *extra = pl.pallas_call(
        kernel,
        grid=(f_pad // tile_f,),
        in_specs=[
            pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((D, t_pad, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((E, t_pad, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((D, K, tile_f), lambda i: (0, 0, i)),
            pl.BlockSpec((K, tile_f), lambda i: (0, i)),
            pl.BlockSpec((K, tile_f), lambda i: (0, i)),
            pl.BlockSpec((E, K, tile_f), lambda i: (0, 0, i)),
            *extra_in_specs,
            *sal_in_specs,
        ],
        out_specs=[
            pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((D, D, K, tile_f), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((K, tile_f), lambda i: (0, i)),
            pl.BlockSpec((E, K, tile_f), lambda i: (0, 0, i)),
            *extra_out_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, D, K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((E, K, f_pad), jnp.float32),
            *extra_out_shape,
        ],
        interpret=interpret,
    )(y_re_s, y_im_s, emb_s, v_re_s, v_im_s, inv_s, logdet_s,
      weight_s, mu_s, *extra_in, *sal_in)

    scatter = (jnp.transpose(s_re, (3, 2, 0, 1))
               + 1j * jnp.transpose(s_im, (3, 2, 0, 1)))[:F]
    affiliation_sum = jnp.transpose(asum)[:F]  # (F, K)
    resultants = jnp.transpose(r, (2, 1, 0))[:F]  # (F, K, E)
    if spectral_mode == 'gaussian':
        second_moments = jnp.transpose(extra[0], (2, 1, 0))[:F]
        return scatter, affiliation_sum, resultants, second_moments
    return scatter, affiliation_sum, resultants


def vmfcacgmm_e_stats(y_re, y_im, embedding, v_re, v_im,
                      inv_eigenvalues, logdet, weight, mu, kappa,
                      log_c, *, spatial_weight=1., spectral_weight=1.,
                      affiliation_eps=1e-10, tile_f=None,
                      interpret=False, saliency=None):
    """Convenience one-shot: stage, then run one fused E+stats pass.

    Args: y_re / y_im: (F, D, T); embedding: (F, E, T) raw; saliency:
    optional (F, T); the rest as :func:`e_stats_staged`. The EM scan
    in ``models/vmfcacgmm.py`` uses the split functions instead so
    the observation staging happens once per fit.
    """
    F, D, T = y_re.shape
    E = embedding.shape[1]
    K = weight.shape[1]
    if tile_f is None:
        tile_f = choose_tile_f(D, E, K, -(-T // 8) * 8,
                               has_sal=saliency is not None)
        if tile_f is None:
            raise ValueError(
                f'signal too long for the fused integration E-step '
                f'(T={T}, D={D}, E={E})')
    staged = stage_observation(y_re, y_im, embedding, tile_f=tile_f)
    sal_s = (None if saliency is None
             else stage_saliency(saliency, tile_f=tile_f))
    scatter, asum, r = e_stats_staged(
        *staged, v_re, v_im, inv_eigenvalues, logdet, weight,
        jnp.broadcast_to(mu[None], (F,) + mu.shape),
        jnp.broadcast_to(kappa[None], (F,) + kappa.shape),
        jnp.broadcast_to(log_c[None], (F,) + log_c.shape),
        sal_s,
        f_real=F, t_real=T,
        spatial_weight=spatial_weight, spectral_weight=spectral_weight,
        affiliation_eps=affiliation_eps, tile_f=tile_f,
        interpret=interpret)
    return scatter, asum, jnp.sum(r, axis=0)  # global resultants
