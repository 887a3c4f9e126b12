"""Pallas TPU kernel: batched warm-start Bingham moment inversion.

The CBMM M-step inverts ``grad log Z(lambda) = scatter_eigenvalues``
per (frequency, class) bin (reference pb_bss/distribution/
complex_bingham.py:303-425 solves each bin with scipy least_squares).
The XLA chord Gauss-Newton (models/complex_bingham.py:
find_eigenvalues) is correct but op-overhead-bound on the TPU: every
residual evaluation is a 28-matmul divided-difference cascade, and 16
chord steps plus the Jacobian emit ~500 sequential tiny HLO ops per
EM iteration.

This kernel runs the WHOLE warm solve in one launch with bins in the
lane dimension:

* The cascade is evaluated in block-Frechet form. The doubled-node
  bidiagonal matrix is ``[[J, C], [0, J]]`` with ``C = e_D e_1^T``,
  so its ``expm`` is ``[[E, X], [0, E]]`` with ``E = expm(J)`` and
  ``X`` the Frechet derivative of ``expm`` at ``J`` in direction
  ``C``. By Opitz' theorem ``E[0, D-1] = exp[lambda_1..lambda_D]``
  and ``X[i, i] = exp[lambda_1..lambda_D, lambda_i]``, hence
  ``grad_i log Z = X[i, i] / E[0, D-1]``. Because ``J`` is
  BIDIAGONAL, every Taylor-phase product ``M @ J`` is an O(D^2)
  column shift-and-scale instead of an O(D^3) matmul; only the
  squaring phase multiplies full (upper-triangular) matrices. All
  intermediates are nonnegative confluent divided differences — no
  cancellation, f32-safe (same argument as
  models/complex_bingham.py:_expm_bidiagonal; f32 flush-to-zero only
  drops relatively-negligible nonnegative terms).
* Cascade state lives in VMEM SCRATCH refs ((row, col, lane)
  layout); every operation is a whole-row plane op or a lane-plane
  broadcast, the access pattern of ops/pallas_eigh.py. A first cut
  kept the matrices as register values and sublane-extracted entries
  (``value[i][m]``) — measured ~17x slower (each extract is a
  relayout; wide tiles crash the Mosaic vector_extract rule).
* The chord Jacobian is a one-sided finite difference with a
  RELATIVE step (5 extra cascade evaluations; in the saturated
  regime ``|u| ~ 1e3`` the gradient is exponentially flat and an
  absolute step sits below the f32 cascade noise). A mostly-clipped
  step contributes a ZERO column — the two cascades can differ by an
  ulp even for identical inputs when XLA fuses them differently, and
  1 ulp / h is a phantom Jacobian entry that corrupts the normal
  matrix. The chord fixed point is ``residual = 0`` independent of
  the Jacobian, so FD accuracy only affects convergence RATE.
* The 5x5 normal-equation inverse is an unrolled Cholesky on lane
  slices, computed once; each of the ``iterations`` chord steps is
  then one cascade plus ~60 elementwise ops.

Parity with the XLA warm chord path is tested in
tests/test_ops/test_pallas_bingham.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['bingham_chord_solve']

_TINY = float(np.finfo(np.float32).tiny)
_SQUARINGS = 15  # exact domain |lambda| <= 2**15 = 32768
_TAYLOR_TERMS = 13

# The cascade/chord helpers below are shape-generic: ``lam`` and every
# scratch ref carry an arbitrary trailing batch shape (the standalone
# solver uses (L,) lanes; the fused CBMM loop kernel
# (ops/pallas_cbmm_loop.py) uses (K, F_tile) planes).


def _onehot_row(i, shape):
    return (lax.broadcasted_iota(jnp.int32, shape, 0)
            == i).astype(jnp.float32)


def _shift_cols(row):
    """(cols, L) -> same with columns shifted down one (col 0 zero)."""
    return jnp.concatenate(
        [jnp.zeros_like(row[:1]), row[:-1]], axis=0)


def _grad_cascade(lam, g_ref, t6, tx, e6, xm, e6b, xmb, *, d):
    """Writes ``grad log Z`` at nodes ``lam`` into ``g_ref`` and
    returns ``dd = exp[lambda_1..lambda_D]`` (L,).

    ``lam``: (D, *batch) value, each column <= 0 with max pinned to 0
    (node j in sublane j). Scratch refs t6/tx/e6/xm/e6b/xmb are
    (D, D, *batch) row-major cascade state (contents clobbered).
    """
    row_shape = (d,) + tuple(lam.shape[1:])
    cs = 2.0 ** -_SQUARINGS
    e1 = _onehot_row(0, row_shape)
    # Taylor init: term_1 = A_big; accumulators E = I + A, X = C part
    for i in range(d):
        row = cs * (lam[i][None] * _onehot_row(i, row_shape)
                    + (_onehot_row(i + 1, row_shape)
                       if i + 1 < d else 0.0))
        t6[i] = row
        e6[i] = _onehot_row(i, row_shape) + row
        txrow = (cs * e1 if i == d - 1
                 else jnp.zeros(row_shape, jnp.float32))
        tx[i] = txrow
        xm[i] = txrow
    for k in range(2, _TAYLOR_TERMS + 1):
        csk = cs / k
        for i in range(d):
            t_old = t6[i]
            x_old = tx[i]
            # rows are independent under right-multiplication by the
            # bidiagonal A: M @ A = cs * (M * lam_cols + shift(M))
            x_new = (t_old[d - 1][None] * e1
                     + x_old * lam + _shift_cols(x_old)) * csk
            t_new = (t_old * lam + _shift_cols(t_old)) * csk
            t6[i] = t_new
            tx[i] = x_new
            e6[i] = e6[i] + t_new
            xm[i] = xm[i] + x_new
    # squaring phase: (E, X) <- (E @ E, E @ X + X @ E), double
    # buffered; E stays upper triangular so row i of E @ M only
    # needs m >= i
    src_e, src_x, dst_e, dst_x = e6, xm, e6b, xmb
    for _ in range(_SQUARINGS):
        for i in range(d):
            acc_e = None
            acc_x = None
            for m in range(i, d):
                w = src_e[i, m][None]
                te = w * src_e[m]
                txm = w * src_x[m]
                acc_e = te if acc_e is None else acc_e + te
                acc_x = txm if acc_x is None else acc_x + txm
            for m in range(d):
                acc_x = acc_x + src_x[i, m][None] * src_e[m]
            dst_e[i] = acc_e
            dst_x[i] = acc_x
        src_e, src_x, dst_e, dst_x = dst_e, dst_x, src_e, src_x
    dd = jnp.maximum(src_e[0, d - 1], _TINY)
    inv_dd = 1.0 / dd
    for i in range(d):
        g_ref[i] = src_x[i, i] * inv_dd
    return dd


def _lam_of_u(u, d):
    """lambda_j = sum_{i >= j} u_i (ascending, max pinned to 0);
    u: (D-1, L) -> (D, L)."""
    rows = [jnp.zeros_like(u[0])]
    acc = jnp.zeros_like(u[0])
    for j in range(d - 2, -1, -1):
        acc = acc + u[j]
        rows.insert(0, acc)
    return jnp.stack(rows, axis=0)


def _chord_round(s, u_ref, j_ref, m_ref, g_ref, t6, tx, e6, xm, e6b,
                 xmb, *, d, iterations, lower, upper, fd_step):
    """One Jacobian refresh + ``iterations`` chord steps on ``u_ref``
    (in place). ``s``: (D, *batch) target moments; scratch refs as in
    :func:`_grad_cascade` plus ``u_ref`` (D-1, *batch), ``j_ref``
    (D-1, D, *batch), ``m_ref`` (D-1, D-1, *batch)."""
    batch = tuple(u_ref.shape[1:])
    d1 = d - 1
    casc = functools.partial(
        _grad_cascade, g_ref=g_ref, t6=t6, tx=tx, e6=e6, xm=xm,
        e6b=e6b, xmb=xmb, d=d)

    def clip_u(u):
        return jnp.clip(u, lower, upper)

    u0 = u_ref[...]

    # ---- residual at u0 + FD Jacobian (D-1 shifted cascades) -------
    casc(_lam_of_u(u0, d))
    g0 = g_ref[...]  # (D, *batch)

    # relative FD step: in the saturated regime (|u| ~ 1e3+) the
    # gradient is exponentially flat and an absolute step sits below
    # the f32 cascade noise; a ~1% relative secant resolves it
    h_scale = jnp.maximum(1.0, jnp.abs(u0))

    def fd_body(i, carry):
        shift = fd_step * h_scale * (lax.broadcasted_iota(
            jnp.int32, (d1,) + batch, 0) == i).astype(jnp.float32)
        u_s = clip_u(u0 + shift)
        h_i = jnp.sum(u_s - u0, axis=0)  # effective (clipping-safe)
        h_int = jnp.sum(shift, axis=0)  # intended
        casc(_lam_of_u(u_s, d))
        # a mostly-clipped step carries no slope information (and the
        # two cascades can differ by an ulp even at h == 0 when the
        # compiler fuses them differently): zero the column; the
        # normal-matrix regularization owns that direction
        dead = jnp.abs(h_i) < 0.01 * jnp.abs(h_int)
        inv_h = jnp.where(dead, 0.0,
                          1.0 / jnp.where(dead, 1.0, h_i))
        col = (g_ref[...] - g0) * inv_h[None]
        mask = (lax.broadcasted_iota(
            jnp.int32, (d1, d) + batch, 0) == i).astype(jnp.float32)
        j_ref[...] = j_ref[...] + mask * col[None]
        return carry

    j_ref[...] = jnp.zeros((d1, d) + batch, jnp.float32)
    lax.fori_loop(0, d1, fd_body, 0)

    # ---- (J^T J + reg)^{-1} via unrolled Cholesky ------------------
    jmat = j_ref[...]  # (D-1, D, *batch)
    jtj = [[None] * d1 for _ in range(d1)]
    for a in range(d1):
        for b in range(a, d1):
            acc = None
            for dd_ in range(d):
                t = jmat[a, dd_] * jmat[b, dd_]
                acc = t if acc is None else acc + t
            jtj[a][b] = acc
            jtj[b][a] = acc
    for a in range(d1):
        jtj[a][a] = jtj[a][a] * (1.0 + 1e-5) + 1e-20

    chol = [[None] * d1 for _ in range(d1)]
    for a in range(d1):
        acc = jtj[a][a]
        for k in range(a):
            acc = acc - chol[a][k] * chol[a][k]
        inv_diag = lax.rsqrt(jnp.maximum(acc, _TINY))
        chol[a][a] = 1.0 / inv_diag
        for b in range(a + 1, d1):
            acc = jtj[b][a]
            for k in range(a):
                acc = acc - chol[b][k] * chol[a][k]
            chol[b][a] = acc * inv_diag

    # columns of (J^T J)^{-1} by forward+back substitution
    minv = [[None] * d1 for _ in range(d1)]
    for col_i in range(d1):
        y = [None] * d1
        for a in range(d1):
            acc = jnp.full_like(
                chol[0][0], 1.0 if a == col_i else 0.0)
            for k in range(a):
                acc = acc - chol[a][k] * y[k]
            y[a] = acc / chol[a][a]
        x = [None] * d1
        for a in range(d1 - 1, -1, -1):
            acc = y[a]
            for k in range(a + 1, d1):
                acc = acc - chol[k][a] * x[k]
            x[a] = acc / chol[a][a]
        for a in range(d1):
            minv[a][col_i] = x[a]
    m_ref[...] = jnp.stack(
        [jnp.stack(minv[a], axis=0) for a in range(d1)], axis=0)

    # ---- chord steps: u <- clip(u - Minv J^T (g(u) - s)) -----------
    def chord_body(i, carry):
        u = u_ref[...]
        casc(_lam_of_u(u, d))
        r = g_ref[...] - s  # (D, *batch)
        jm = j_ref[...]
        b = None
        for dd_ in range(d):
            t = jm[:, dd_] * r[dd_][None]
            b = t if b is None else b + t  # (D-1, *batch)
        mm = m_ref[...]
        delta = None
        for k in range(d1):
            t = mm[:, k] * b[k][None]
            delta = t if delta is None else delta + t
        delta = jnp.clip(delta, -1e3, 1e3)
        u_ref[...] = clip_u(u - delta)
        return carry

    lax.fori_loop(0, iterations, chord_body, 0)


def _bingham_kernel(s_ref, x0_ref, lam_ref, u_ref, j_ref, m_ref,
                    g_ref, t6, tx, e6, xm, e6b, xmb,
                    *, d, iterations, lower, upper, fd_step):
    x0 = x0_ref[...]
    u_ref[...] = jnp.clip(x0[:-1] - x0[1:], lower, upper)
    _chord_round(
        s_ref[...], u_ref, j_ref, m_ref, g_ref, t6, tx, e6, xm, e6b,
        xmb, d=d, iterations=iterations, lower=lower, upper=upper,
        fd_step=fd_step)
    lam_ref[...] = _lam_of_u(u_ref[...], d)


@functools.partial(
    jax.jit,
    static_argnames=('iterations', 'lower', 'upper', 'fd_step',
                     'tile', 'interpret'))
def bingham_chord_solve(s_sorted, x0, *, iterations, lower, upper,
                        fd_step=-1e-2, tile=None, interpret=False):
    """Warm chord Gauss-Newton Bingham moment inversion, one kernel.

    Args:
        s_sorted: (B, D) ascending, duplicate-regularized scatter
            eigenvalue moments (unit trace).
        x0: (B, D) warm-start Bingham eigenvalues, ascending, max
            pinned to 0.
        iterations: chord steps (one cascade evaluation each).
        lower / upper: bounds on the diff parameterization
            ``u_i = lambda_i - lambda_{i+1}`` (static floats).
    Returns:
        (B, D) Bingham eigenvalues, ascending, max pinned to 0.
    """
    s_sorted = jnp.asarray(s_sorted, jnp.float32)
    x0 = jnp.asarray(x0, jnp.float32)
    b, d = s_sorted.shape
    assert 2 <= d <= 8, d

    if tile is None:
        candidates = (128, 256, 512)
        padded = [-(-b // t) * t for t in candidates]
        tile = candidates[int(np.argmin(padded))]
    b_pad = -(-b // tile) * tile

    # benign padding lanes: uniform moments, spread warm start
    s_stage = jnp.full((d, b_pad), 1.0 / d, jnp.float32)
    s_stage = lax.dynamic_update_slice(
        s_stage, s_sorted.T, (0, 0))
    x_stage = jnp.tile(
        jnp.arange(-(d - 1.0), 1.0, dtype=jnp.float32)[:, None],
        (1, b_pad))
    x_stage = lax.dynamic_update_slice(x_stage, x0.T, (0, 0))

    kernel = functools.partial(
        _bingham_kernel, d=d, iterations=int(iterations),
        lower=float(lower), upper=float(upper),
        fd_step=float(fd_step))

    lam = pl.pallas_call(
        kernel,
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((d, tile), lambda i: (0, i)),
            pl.BlockSpec((d, tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((d, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((d, b_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d - 1, tile), jnp.float32),       # u
            pltpu.VMEM((d - 1, d, tile), jnp.float32),    # J
            pltpu.VMEM((d - 1, d - 1, tile), jnp.float32),  # Minv
            pltpu.VMEM((d, tile), jnp.float32),           # g
            pltpu.VMEM((d, d, tile), jnp.float32),        # t6
            pltpu.VMEM((d, d, tile), jnp.float32),        # tx
            pltpu.VMEM((d, d, tile), jnp.float32),        # e6
            pltpu.VMEM((d, d, tile), jnp.float32),        # xm
            pltpu.VMEM((d, d, tile), jnp.float32),        # e6b
            pltpu.VMEM((d, d, tile), jnp.float32),        # xmb
        ],
        interpret=interpret,
    )(s_stage, x_stage)
    return lam[:, :b].T
