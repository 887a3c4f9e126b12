"""Pallas TPU kernel: fused cACGMM E-step.

The EM E-step is the framework's hottest kernel (SURVEY §3.1): per
frequency bin f and class k, whiten the observations with the
covariance eigenvectors, evaluate the quadratic form, and turn the
per-class log-densities into posteriors. The XLA path materializes the
(F, K, E, T) whitened tensor and several (F, K, T) intermediates in
HBM; this kernel keeps everything for one frequency bin in VMEM and
writes only the (K, T) posterior + quadratic form — one HBM pass over
the observations.

Complex arithmetic is expressed on real/imag planes (TPU has no native
complex): ``z = V^H y`` becomes two real MXU matmuls per plane.

Used as an optional fast path; parity with the XLA implementation is
tested in tests/test_ops/test_pallas_em.py (interpret mode on CPU,
compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = [
    'cacgmm_e_step',
    'cacgmm_e_step_reference',
    'cacgmm_em_scatter',
    'cacgmm_em_scatter_reference',
]


def _e_step_kernel(y_re_ref, y_im_ref, v_re_ref, v_im_ref,
                   inv_eig_ref, logdet_ref, weight_ref,
                   aff_ref, qf_ref, *, num_classes, tiny):
    """One frequency bin: posterior + quadratic form for all classes.

    Block shapes: y: (1, D, T); v: (1, K, D, D); inv_eig: (1, K, D);
    logdet/weight: full (F, K) resident (scalar side-tables);
    outputs: (1, K, T).
    """
    f = pl.program_id(0)
    y_re = y_re_ref[0]  # (D, T)
    y_im = y_im_ref[0]

    log_pdfs = []
    qfs = []
    for k in range(num_classes):
        v_re = v_re_ref[0, k]  # (D, E)
        v_im = v_im_ref[0, k]
        # z = V^H y  (E, T): re = Vre^T yre + Vim^T yim,
        #                    im = Vre^T yim - Vim^T yre
        dot = functools.partial(
            jnp.dot, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        z_re = dot(v_re.T, y_re) + dot(v_im.T, y_im)
        z_im = dot(v_re.T, y_im) - dot(v_im.T, y_re)
        power = z_re * z_re + z_im * z_im  # (E, T)
        inv_eig = inv_eig_ref[0, k][:, None]  # (E, 1)
        qf = jnp.maximum(jnp.sum(power * inv_eig, axis=0), tiny)  # (T,)
        D = y_re.shape[0]
        log_pdf = -D * jnp.log(qf) - logdet_ref[f, k]
        qfs.append(qf)
        log_pdfs.append(log_pdf)

    log_pdf = jnp.stack(log_pdfs)  # (K, T)
    qf = jnp.stack(qfs)

    # posterior: max-shift softmax with linear-domain weights
    shifted = jnp.exp(
        log_pdf - jnp.max(log_pdf, axis=0, keepdims=True))
    weighted = shifted * weight_ref[f][:, None]
    denominator = jnp.maximum(
        jnp.sum(weighted, axis=0, keepdims=True), tiny)
    aff_ref[0] = weighted / denominator
    qf_ref[0] = qf


@functools.partial(jax.jit, static_argnames=('interpret',))
def cacgmm_e_step(y_re, y_im, v_re, v_im, inv_eigenvalues, logdet,
                  weight, *, interpret=False):
    """Fused cACGMM E-step over all frequency bins.

    Args:
        y_re / y_im: (F, D, T) observation planes (time-last).
        v_re / v_im: (F, K, D, D) covariance eigenvector planes.
        inv_eigenvalues: (F, K, D) reciprocal eigenvalues.
        logdet: (F, K) log-determinants (sum of log eigenvalues).
        weight: (F, K) linear-domain mixture weights.
        interpret: run in interpreter mode (CPU testing).
    Returns:
        (affiliation (F, K, T), quadratic_form (F, K, T)).
    """
    F, D, T = y_re.shape
    K = v_re.shape[1]
    tiny = float(np.finfo(np.float32).tiny)

    kernel = functools.partial(
        _e_step_kernel, num_classes=K, tiny=tiny)

    grid = (F,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, T), lambda f: (f, 0, 0)),
            pl.BlockSpec((1, D, T), lambda f: (f, 0, 0)),
            pl.BlockSpec((1, K, D, D), lambda f: (f, 0, 0, 0)),
            pl.BlockSpec((1, K, D, D), lambda f: (f, 0, 0, 0)),
            pl.BlockSpec((1, K, D), lambda f: (f, 0, 0)),
            # (F, K) scalars: small, keep the full array resident
            pl.BlockSpec((F, K), lambda f: (0, 0)),
            pl.BlockSpec((F, K), lambda f: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, K, T), lambda f: (f, 0, 0)),
            pl.BlockSpec((1, K, T), lambda f: (f, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, K, T), jnp.float32),
            jax.ShapeDtypeStruct((F, K, T), jnp.float32),
        ],
        interpret=interpret,
    )(
        y_re.astype(jnp.float32), y_im.astype(jnp.float32),
        v_re.astype(jnp.float32), v_im.astype(jnp.float32),
        inv_eigenvalues.astype(jnp.float32),
        logdet.astype(jnp.float32), weight.astype(jnp.float32),
    )


def _em_iteration_kernel(y_re_ref, y_im_ref, v_re_ref, v_im_ref,
                         inv_eig_ref, logdet_ref, weight_ref,
                         s_re_ref, s_im_ref, aff_sum_ref,
                         *, num_classes, tiny):
    """Fused E-step + M-step scatter for one frequency bin.

    One pass over the observations in VMEM produces the per-class
    weighted scatter ``S_k = D * sum_t (a_kt / q_kt) y_t y_t^H`` and
    the affiliation sums — the only quantities the M-step needs — so
    the (F, K, T) posterior never round-trips through HBM.

    Blocks: y: (1, D, T); v: (1, K, D, D); inv_eig: (1, K, D);
    logdet/weight: full (F, K); outputs: scatter (1, K, D, D) x2,
    aff_sum (1, K, 1, 1).
    """
    f = pl.program_id(0)
    y_re = y_re_ref[0]  # (D, T)
    y_im = y_im_ref[0]
    D = y_re.shape[0]

    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    log_pdfs = []
    qfs = []
    for k in range(num_classes):
        v_re = v_re_ref[0, k]
        v_im = v_im_ref[0, k]
        z_re = dot(v_re.T, y_re) + dot(v_im.T, y_im)
        z_im = dot(v_re.T, y_im) - dot(v_im.T, y_re)
        power = z_re * z_re + z_im * z_im
        inv_eig = inv_eig_ref[0, k][:, None]
        qf = jnp.maximum(jnp.sum(power * inv_eig, axis=0), tiny)
        log_pdfs.append(-D * jnp.log(qf) - logdet_ref[f, k])
        qfs.append(qf)

    log_pdf = jnp.stack(log_pdfs)  # (K, T)
    qf = jnp.stack(qfs)

    shifted = jnp.exp(
        log_pdf - jnp.max(log_pdf, axis=0, keepdims=True))
    weighted = shifted * weight_ref[f][:, None]
    affiliation = weighted / jnp.maximum(
        jnp.sum(weighted, axis=0, keepdims=True), tiny)  # (K, T)

    m = affiliation / qf  # (K, T)
    for k in range(num_classes):
        ywr = y_re * m[k][None, :]
        ywi = y_im * m[k][None, :]
        # S = D * (y m) y^H ; re = ywr yre^T + ywi yim^T,
        #                     im = ywi yre^T - ywr yim^T
        s_re_ref[0, k] = D * (dot(ywr, y_re.T) + dot(ywi, y_im.T))
        s_im_ref[0, k] = D * (dot(ywi, y_re.T) - dot(ywr, y_im.T))
    aff_sum_ref[0, :, 0, 0] = jnp.sum(affiliation, axis=-1)


@functools.partial(jax.jit, static_argnames=('interpret',))
def cacgmm_em_scatter(y_re, y_im, v_re, v_im, inv_eigenvalues, logdet,
                      weight, *, interpret=False):
    """Fused E+M scatter over all frequency bins.

    Returns:
        (scatter_re (F, K, D, D), scatter_im (F, K, D, D),
        affiliation_sum (F, K)) — the unnormalized weighted scatter
        ``D * sum_t (a/q) y y^H`` and ``sum_t a``.
    """
    F, D, T = y_re.shape
    K = v_re.shape[1]
    tiny = float(np.finfo(np.float32).tiny)

    kernel = functools.partial(
        _em_iteration_kernel, num_classes=K, tiny=tiny)

    s_re, s_im, aff_sum = pl.pallas_call(
        kernel,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, D, T), lambda f: (f, 0, 0)),
            pl.BlockSpec((1, D, T), lambda f: (f, 0, 0)),
            pl.BlockSpec((1, K, D, D), lambda f: (f, 0, 0, 0)),
            pl.BlockSpec((1, K, D, D), lambda f: (f, 0, 0, 0)),
            pl.BlockSpec((1, K, D), lambda f: (f, 0, 0)),
            pl.BlockSpec((F, K), lambda f: (0, 0)),
            pl.BlockSpec((F, K), lambda f: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, K, D, D), lambda f: (f, 0, 0, 0)),
            pl.BlockSpec((1, K, D, D), lambda f: (f, 0, 0, 0)),
            pl.BlockSpec((1, K, 1, 1), lambda f: (f, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, K, D, D), jnp.float32),
            jax.ShapeDtypeStruct((F, K, D, D), jnp.float32),
            jax.ShapeDtypeStruct((F, K, 1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        y_re.astype(jnp.float32), y_im.astype(jnp.float32),
        v_re.astype(jnp.float32), v_im.astype(jnp.float32),
        inv_eigenvalues.astype(jnp.float32),
        logdet.astype(jnp.float32), weight.astype(jnp.float32),
    )
    return s_re, s_im, aff_sum[..., 0, 0]


def cacgmm_em_scatter_reference(y_re, y_im, v_re, v_im,
                                inv_eigenvalues, logdet, weight):
    """XLA reference of the fused E+M scatter (parity tests)."""
    affiliation, qf = cacgmm_e_step_reference(
        y_re, y_im, v_re, v_im, inv_eigenvalues, logdet, weight)
    y = y_re.astype(jnp.float32) + 1j * y_im.astype(jnp.float32)
    D = y_re.shape[-2]
    m = affiliation / qf
    scatter = D * jnp.einsum(
        'fkt,fdt,fet->fkde', m, y, y.conj(),
        precision=jax.lax.Precision.HIGHEST)
    return (scatter.real, scatter.imag,
            jnp.sum(affiliation, axis=-1))


def cacgmm_e_step_reference(y_re, y_im, v_re, v_im, inv_eigenvalues,
                            logdet, weight):
    """XLA reference implementation of the same computation (used for
    parity tests and as the fallback path)."""
    y = y_re.astype(jnp.float32) + 1j * y_im.astype(jnp.float32)
    v = v_re.astype(jnp.float32) + 1j * v_im.astype(jnp.float32)
    z = jnp.einsum('fkde,fdt->fket', v.conj(), y)
    qf = jnp.maximum(
        jnp.einsum('fket,fke->fkt',
                   z.real ** 2 + z.imag ** 2, inv_eigenvalues),
        np.finfo(np.float32).tiny,
    )
    D = y_re.shape[-2]
    log_pdf = -D * jnp.log(qf) - logdet[..., None]
    shifted = jnp.exp(
        log_pdf - jnp.max(log_pdf, axis=1, keepdims=True))
    weighted = shifted * weight[..., None]
    denominator = jnp.maximum(
        jnp.sum(weighted, axis=1, keepdims=True),
        np.finfo(np.float32).tiny,
    )
    return weighted / denominator, qf
