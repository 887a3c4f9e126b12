"""Pallas TPU kernel: the ENTIRE GEV beamformer in one launch.

The XLA path (ops/linalg.py:gev_max_eigvec — the TPU-native
replacement for the reference's per-bin LAPACK ``zhegvd`` loop,
pb_bss/extraction/cythonized/get_gev_vector.pyx:42) runs four separate
batched stages per call: Cholesky of the noise PSD, two triangular
solves for the whitening, the Pallas Jacobi eigh, and a final
triangular back-substitution. At BSS sizes ((513, 6, 6) pencils) the
Cholesky/triangular-solve HLOs dominate: they lower to sequential
small-matrix code the same way the HLO-level Jacobi did, leaving the
beamformer at ~2.6 ms standalone while the eigh kernel alone is
~0.4 ms.

This kernel fuses all four stages with the batch in the lane
dimension (layout (D, D, TILE_B), the ops/pallas_eigh.py recipe):

* unrolled complex Cholesky ``phi_nn = L L^H`` (D <= 16, so the
  ~D^2/2 lane-vector ops are trivial),
* in-place forward substitution ``X = L^-1 phi_xx`` (row-vectorized)
  and ``C = X L^-H`` (column-vectorized) in VMEM scratch,
* exact hermitization of C from its upper triangle,
* the shared cyclic-Jacobi sweeps (ops/pallas_em_loop._jacobi_rounds),
* gather-free dominant-eigenvector selection by comparison counting,
* triangular back-substitution ``beam = L^-H u``.

The result is B-normalized (``beam^H phi_nn beam = 1``) like LAPACK's
``zhegvd`` convention, matching the XLA path. Bins whose noise PSD is
not positive definite produce non-finite lanes (sqrt of a negative
pivot), exactly like the XLA Cholesky — the branchless
diagonal-loading retry in extraction/beamformer.py:get_gev_vector
handles them unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_em_loop import _jacobi_rounds

__all__ = ['gev_pallas']

_TILE_B = 256


def _gev_kernel(xx_re, xx_im, nn_re, nn_im, b_re_ref, b_im_ref,
                lr, li, cr, ci, vr, vi, *, d, sweeps, tiny):
    """One batch tile: Cholesky-whitened GEV, everything in VMEM.

    Blocks: inputs (d, d, TILE_B) real/imag planes of phi_xx / phi_nn;
    outputs (d, TILE_B) planes of the beamforming vector. Scratch:
    L (lr/li), the whitened matrix C (cr/ci, later overwritten with
    Jacobi diagonals), eigenvectors V (vr/vi).
    """
    # ---- Cholesky phi_nn = L L^H (lower; unrolled static indices) ----
    for j in range(d):
        s = nn_re[j, j]
        for k in range(j):
            s = s - (lr[j, k] * lr[j, k] + li[j, k] * li[j, k])
        dj = jnp.sqrt(s)  # negative pivot -> NaN lane (non-PD bin)
        lr[j, j] = dj
        li[j, j] = jnp.zeros_like(dj)
        inv = 1.0 / dj
        for i in range(j + 1, d):
            tr_ = nn_re[i, j]
            ti_ = nn_im[i, j]
            for k in range(j):
                # t -= L[i,k] * conj(L[j,k])
                tr_ = tr_ - (lr[i, k] * lr[j, k] + li[i, k] * li[j, k])
                ti_ = ti_ - (li[i, k] * lr[j, k] - lr[i, k] * li[j, k])
            lr[i, j] = tr_ * inv
            li[i, j] = ti_ * inv

    # ---- X = L^-1 phi_xx, rows in place (row-vectorized) -------------
    for i in range(d):
        rr = xx_re[i]  # (d, TILE_B)
        ri = xx_im[i]
        for k in range(i):
            a_r = lr[i, k]  # (TILE_B,) broadcasts over the row dim
            a_i = li[i, k]
            pr = cr[k]
            pi_ = ci[k]
            rr = rr - (a_r * pr - a_i * pi_)
            ri = ri - (a_r * pi_ + a_i * pr)
        inv = 1.0 / lr[i, i]
        cr[i] = rr * inv
        ci[i] = ri * inv

    # ---- C = X L^-H, columns in place (column-vectorized) ------------
    for j in range(d):
        qr = cr[:, j]  # (d, TILE_B)
        qi = ci[:, j]
        for k in range(j):
            b_r = lr[j, k]
            b_i = li[j, k]
            pr = cr[:, k]
            pi_ = ci[:, k]
            # subtract C[:,k] * conj(L[j,k])
            qr = qr - (pr * b_r + pi_ * b_i)
            qi = qi - (pi_ * b_r - pr * b_i)
        inv = 1.0 / lr[j, j]
        cr[:, j] = qr * inv
        ci[:, j] = qi * inv

    # ---- hermitize C from the upper triangle -------------------------
    for i in range(d):
        ci[i, i] = jnp.zeros_like(ci[i, i])
        for j in range(i + 1, d):
            hr = 0.5 * (cr[i, j] + cr[j, i])
            hi = 0.5 * (ci[i, j] - ci[j, i])
            cr[i, j] = hr
            cr[j, i] = hr
            ci[i, j] = hi
            ci[j, i] = -hi

    # ---- Jacobi eigendecomposition of C in place ----------------------
    row = jax.lax.broadcasted_iota(jnp.int32, vr.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, vr.shape, 1)
    vr[...] = jnp.where(row == col, 1.0, 0.0).astype(cr.dtype)
    vi[...] = jnp.zeros(vr.shape, cr.dtype)
    _jacobi_rounds(cr, ci, vr, vi, d=d, sweeps=sweeps, tiny=tiny)

    # ---- dominant eigenvector, gather-free (comparison counting) -----
    sel = []
    for e in range(d):
        cnt = None
        we = cr[e, e]
        for j in range(d):
            if j == e:
                continue
            g = ((cr[j, j] > we)
                 | ((cr[j, j] == we) & (j < e))).astype(we.dtype)
            cnt = g if cnt is None else cnt + g
        sel.append((cnt == 0).astype(we.dtype) if d > 1
                   else jnp.ones_like(we))

    ur = []
    ui = []
    for i in range(d):
        sr_ = None
        si_ = None
        for e in range(d):
            tr_ = sel[e] * vr[i, e]
            ti_ = sel[e] * vi[i, e]
            sr_ = tr_ if sr_ is None else sr_ + tr_
            si_ = ti_ if si_ is None else si_ + ti_
        ur.append(sr_)
        ui.append(si_)

    # ---- back-substitute beam = L^-H u --------------------------------
    br_ = [None] * d
    bi_ = [None] * d
    for i in range(d - 1, -1, -1):
        rr = ur[i]
        ri = ui[i]
        for k in range(i + 1, d):
            # subtract conj(L[k,i]) * beam[k]
            a_r = lr[k, i]
            a_i = li[k, i]
            rr = rr - (a_r * br_[k] + a_i * bi_[k])
            ri = ri - (a_r * bi_[k] - a_i * br_[k])
        inv = 1.0 / lr[i, i]
        br_[i] = rr * inv
        bi_[i] = ri * inv
    for i in range(d):
        b_re_ref[i] = br_[i]
        b_im_ref[i] = bi_[i]


@functools.partial(
    jax.jit, static_argnames=('sweeps', 'interpret', 'tile_b'))
def gev_pallas(target_psd_matrix, noise_psd_matrix, *, sweeps=None,
               interpret=False, tile_b=_TILE_B):
    """Fused GEV: dominant generalized eigenvector of batched
    Hermitian pencils ``(phi_xx, phi_nn)`` in ONE Pallas launch.

    Args:
        target_psd_matrix: (..., D, D) Hermitian (f32/c64).
        noise_psd_matrix: (..., D, D) Hermitian positive definite.
    Returns:
        (..., D) complex64 beamforming vectors, B-normalized
        (``beam^H phi_nn beam = 1``). Non-PD bins yield non-finite
        lanes (callers retry with diagonal loading, see
        extraction/beamformer.py:get_gev_vector).
    """
    phi_xx = jnp.asarray(target_psd_matrix)
    phi_nn = jnp.asarray(noise_psd_matrix)
    assert phi_xx.shape == phi_nn.shape, (phi_xx.shape, phi_nn.shape)
    d = phi_xx.shape[-1]
    batch_shape = phi_xx.shape[:-2]
    if sweeps is None:
        sweeps = 6 if d <= 8 else 8

    xx = phi_xx.reshape((-1, d, d))
    nn = phi_nn.reshape((-1, d, d))
    B = xx.shape[0]
    pad = (-B) % tile_b
    if pad:
        eye = jnp.broadcast_to(jnp.eye(d, dtype=xx.dtype), (pad, d, d))
        xx = jnp.concatenate([xx, eye], axis=0)
        nn = jnp.concatenate([nn, eye.astype(nn.dtype)], axis=0)
    Bp = xx.shape[0]

    xx_re = jnp.moveaxis(xx.real, 0, -1).astype(jnp.float32)
    xx_im = jnp.moveaxis(xx.imag, 0, -1).astype(jnp.float32)
    nn_re = jnp.moveaxis(nn.real, 0, -1).astype(jnp.float32)
    nn_im = jnp.moveaxis(nn.imag, 0, -1).astype(jnp.float32)

    kernel = functools.partial(
        _gev_kernel, d=d, sweeps=sweeps,
        tiny=float(np.finfo(np.float32).tiny))

    b_re, b_im = pl.pallas_call(
        kernel,
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((d, d, tile_b), lambda i: (0, 0, i)),
            pl.BlockSpec((d, d, tile_b), lambda i: (0, 0, i)),
            pl.BlockSpec((d, d, tile_b), lambda i: (0, 0, i)),
            pl.BlockSpec((d, d, tile_b), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((d, tile_b), lambda i: (0, i)),
            pl.BlockSpec((d, tile_b), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, Bp), jnp.float32),
            jax.ShapeDtypeStruct((d, Bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, d, tile_b), jnp.float32),
            pltpu.VMEM((d, d, tile_b), jnp.float32),
            pltpu.VMEM((d, d, tile_b), jnp.float32),
            pltpu.VMEM((d, d, tile_b), jnp.float32),
            pltpu.VMEM((d, d, tile_b), jnp.float32),
            pltpu.VMEM((d, d, tile_b), jnp.float32),
        ],
        interpret=interpret,
    )(xx_re, xx_im, nn_re, nn_im)

    beam = (jnp.moveaxis(b_re, -1, 0)
            + 1j * jnp.moveaxis(b_im, -1, 0))[:B]
    return beam.reshape(batch_shape + (d,))
