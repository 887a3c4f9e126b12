"""Complex Bingham distribution.

Capability parity with ``pb_bss/distribution/complex_bingham.py``:
eigen-parameterized density (:28-79), closed-form norm
``2 pi^D sum_d a_d exp(lambda_d)`` with duplicate-eigenvalue
regularization (:80-203), and the trainer that inverts the moment
equations ``grad log c(lambda) = scatter_eigenvalues`` per (frequency,
class) (:225-425, :567-594).

TPU-first realization:

* the reference codegens the gradient of the log-norm for D in [2, 6]
  from MATLAB/sympy (complex_bingham_utils.py) and solves per bin with
  ``scipy.optimize.least_squares`` inside an ``np.ndindex`` loop. Here
  the gradient is obtained by **autodiff of the closed-form log-norm**
  (any D, no codegen) and the moment inversion is a **batched damped
  Newton** in the same diff parameterization as the reference's
  ``find_eigenvalues_v3`` (diffs bounded in [-max_concentration,
  -1e-8], which keeps eigenvalues distinct by construction) — one
  vmapped jit program over all (F, K) bins instead of a Python loop.
* fitting is float64-sensitive (the norm suffers cancellation for
  close eigenvalues, same as the reference); run under x64 for
  production-grade accuracy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .base import Model, modelclass
from .._dtypes import real_dtype as _real_dtype, tiny as _tiny
from ..ops.linalg import eigh, force_hermitian
from ..utils import is_broadcast_compatible

__all__ = [
    'ComplexBingham',
    'ComplexBinghamTrainer',
    'normalize_observation',
]


@jax.jit
def normalize_observation(observation):
    """Unit-norm over the channel axis; (..., N, D) -> (..., N, D)."""
    observation = jnp.asarray(observation)
    return observation / jnp.maximum(
        jnp.linalg.norm(observation, axis=-1, keepdims=True),
        _tiny(observation),
    )


def _default_spacing_eps(dtype):
    """Minimum eigenvalue spacing: the reference's 1e-8 (f64,
    complex_bingham.py:166-203) is BELOW the f32 ulp at
    concentration scale (ulp(500) ~ 3e-5), which leaves exact
    duplicates and 1/0 in the partial-fraction norm — use 1e-3 at
    f32 (a numeric guard; the reference path is f64-only)."""
    return 1e-8 if jnp.finfo(dtype).bits >= 64 else 1e-3


def _remove_duplicate_eigenvalues(covariance_eigenvalues, eps=None):
    """Sort ascending and force a minimum spacing of ``eps`` between
    adjacent eigenvalues (reference :166-203).

    Returns (inverse_permutation, regularized_eigenvalues).
    """
    covariance_eigenvalues = jnp.asarray(covariance_eigenvalues)
    if eps is None:
        eps = _default_spacing_eps(covariance_eigenvalues.dtype)
    permutation = jnp.argsort(covariance_eigenvalues, axis=-1)
    sorted_vals = jnp.take_along_axis(
        covariance_eigenvalues, permutation, axis=-1)
    diff = jnp.maximum(jnp.diff(sorted_vals, axis=-1), eps)
    regularized = jnp.concatenate([
        sorted_vals[..., :1],
        sorted_vals[..., :1] + jnp.cumsum(diff, axis=-1),
    ], axis=-1)
    inverse_permutation = jnp.argsort(permutation, axis=-1)
    return inverse_permutation, regularized


def _log_norm_distinct(eigenvalues):
    """log of ``2 pi^D sum_d exp(lambda_d) / prod_{d'!=d}(lambda_d -
    lambda_{d'})`` for eigenvalues with pairwise-distinct entries
    (reference :159-163). The sum is the divided difference of ``exp``
    over the eigenvalues in partial-fraction form — it cancels
    catastrophically in f32 when eigenvalues are close (the sum can
    even round to a negative number -> NaN log); use
    :func:`_log_norm_dd` on f32 paths."""
    D = eigenvalues.shape[-1]
    deltas = eigenvalues[..., None] - eigenvalues[..., None, :]
    eye = jnp.eye(D, dtype=eigenvalues.dtype)
    deltas = deltas * (1 - eye) + eye
    a = 1.0 / jnp.prod(deltas, axis=-1)
    return jnp.log(2.0) + D * jnp.log(jnp.pi) + jnp.log(
        jnp.sum(a * jnp.exp(eigenvalues), axis=-1))


def _expm_bidiagonal(nodes):
    """``expm`` of the upper-bidiagonal matrix with ``nodes`` on the
    diagonal and ones on the superdiagonal, by scaling-and-squaring
    with a Taylor kernel. By Opitz' theorem entry (j, k), j <= k, is
    the (confluent) divided difference ``exp[nodes_j, ..., nodes_k]``
    — every intermediate is a nonnegative confluent divided
    difference, so there is NO cancellation — f32-safe for any node
    spacing (including exact duplicates). Accurate for max-shifted
    ``|nodes| <~ 32768`` (static squaring count)."""
    n = nodes.shape[-1]
    eye = jnp.eye(n, dtype=nodes.dtype)
    J = jnp.eye(n, k=1, dtype=nodes.dtype) + nodes[..., None] * eye
    squarings = 15  # 2^15 = 32768
    A = J * (2.0 ** -squarings)
    # exp(A) by Taylor: ||A|| <= ~1, 13 terms -> ~1e-10 relative
    # HIGHEST: the default TPU bf16 matmul precision destroys the
    # squaring cascade (measured NaN affiliations on device)
    E = eye + A
    term = A
    for k in range(2, 14):
        term = jnp.einsum('...ij,...jk->...ik', term, A,
                          precision=jax.lax.Precision.HIGHEST) / k
        E = E + term
    for _ in range(squarings):
        E = jnp.einsum('...ij,...jk->...ik', E, E,
                       precision=jax.lax.Precision.HIGHEST)
    return E


def _log_norm_dd(eigenvalues):
    """Cancellation-free Bingham log norm.

    ``Z / (2 pi^D)`` is the divided difference ``exp[lambda_1, ...,
    lambda_D]`` = the (0, D-1) entry of the bidiagonal ``expm``
    (:func:`_expm_bidiagonal`); the partial-fraction form
    (:func:`_log_norm_distinct`) cancels catastrophically in f32 when
    eigenvalues are close. :func:`find_eigenvalues` clamps its
    iterates to the cascade's exact domain (|lambda| <= 32768).
    """
    eigenvalues = jnp.asarray(eigenvalues)
    D = eigenvalues.shape[-1]
    lmax = jnp.max(eigenvalues, axis=-1, keepdims=True)
    lam = eigenvalues - lmax  # <= 0
    E = _expm_bidiagonal(lam)
    dd = jnp.maximum(E[..., 0, D - 1], _tiny(lam))
    return (jnp.log(2.0) + D * jnp.log(jnp.pi)
            + lmax[..., 0] + jnp.log(dd))


@modelclass
class ComplexBingham(Model):
    covariance_eigenvectors: jnp.ndarray = None  # (..., D, D)
    covariance_eigenvalues: jnp.ndarray = None  # (..., D)

    @property
    def covariance(self):
        eigenvalues = jnp.asarray(self.covariance_eigenvalues)
        eigenvectors = jnp.asarray(self.covariance_eigenvectors)
        return jnp.einsum(
            '...wx,...x,...zx->...wz',
            eigenvectors,
            eigenvalues.astype(eigenvectors.dtype),
            eigenvectors.conj(),
        )

    def pdf(self, y):
        return jnp.exp(self.log_pdf(y))

    def log_pdf(self, y):
        """y: (..., N, D) complex unit vectors."""
        y = jnp.asarray(y)
        result = jnp.einsum(
            '...td,...dD,...tD->...t', y.conj(), self.covariance, y)
        result = result.real
        result = result - self.log_norm()[..., None]
        return result

    def log_norm(self, remove_duplicate_eigenvalues=True, eps=None):
        eigenvalues = jnp.asarray(self.covariance_eigenvalues)
        if remove_duplicate_eigenvalues:
            _, eigenvalues = _remove_duplicate_eigenvalues(
                eigenvalues, eps=eps)
        return _log_norm_dd(eigenvalues)

    def norm(self, remove_duplicate_eigenvalues=True, eps=None):
        return jnp.exp(self.log_norm(
            remove_duplicate_eigenvalues=remove_duplicate_eigenvalues,
            eps=eps))


def _grad_log_norm(eigenvalues):
    """Gradient of the log norm w.r.t. the eigenvalues — analytic
    replacement of the codegen'd rational functions (reference
    complex_bingham_utils.py:5-346).

    ``d log Z / d lambda_i = exp[lambda_1..lambda_D, lambda_i] /
    exp[lambda_1..lambda_D]`` (differentiating a divided difference
    appends the node). Over the DOUBLED node sequence ``(lambda_1..
    lambda_D, lambda_1..lambda_D)`` the bidiagonal ``expm`` yields
    both at once: entry ``(i, i+D)`` spans nodes ``lambda_i..lambda_D,
    lambda_1..lambda_i`` — by symmetry of divided differences exactly
    ``exp[lambda_1..lambda_D, lambda_i]`` — and entry ``(0, D-1)`` is
    the plain ``exp[lambda_1..lambda_D]``. One ``2D x 2D`` cascade
    (28 matmuls) replaces autodiff forward+backward through the
    ``D x D`` cascade; equally cancellation-free (all confluent
    divided differences are positive), f32-accurate at HIGHEST matmul
    precision (validated against f64 ground truth at near-duplicate
    high-concentration nodes)."""
    lam = jnp.asarray(eigenvalues)
    D = lam.shape[-1]
    lmax = jnp.max(lam, axis=-1, keepdims=True)
    shifted = lam - lmax  # shift-invariant ratio; keeps the cascade
    # inside its exact domain
    nodes = jnp.concatenate([shifted, shifted], axis=-1)
    E = _expm_bidiagonal(nodes)
    dd = jnp.maximum(E[..., 0, D - 1], _tiny(shifted))
    idx = jnp.arange(D)
    grad_dd = E[..., idx, idx + D]
    return grad_dd / dd[..., None]


def _pallas_solver_default(dtype, d):
    """Auto-gate for the fused Pallas warm solver: non-CPU backend,
    f32, sublane-sized D (same policy as ops/pallas_eigh.py)."""
    return (jax.default_backend() != 'cpu'
            and jnp.finfo(dtype).bits == 32
            and 2 <= d <= 8)


@functools.partial(
    jax.jit, static_argnames=('max_concentration', 'eps', 'iterations',
                              'use_pallas'))
def find_eigenvalues(scatter_eigenvalues, *, max_concentration=np.inf,
                     eps=None, iterations=50, warm_start=None,
                     use_pallas=None):
    """Invert the moment equations: find Bingham eigenvalues ``lambda``
    (max pinned to 0) with ``grad log c(lambda) = scatter_eigenvalues``.

    Batched replacement of the reference's per-bin
    ``scipy.optimize.least_squares`` ``find_eigenvalues_v3``
    (complex_bingham.py:303-425): damped Newton in the diff
    parameterization ``u_i = lambda_i - lambda_{i+1} in
    [-max_concentration, -1e-8]`` with the Jacobian from ``jacfwd``.

    Args:
        scatter_eigenvalues: (..., D) nonnegative moments (rows sum to
            one when the scatter has unit trace).
        warm_start: optional (..., D) previous solution (ascending,
            max pinned to 0) used as the Newton initialization — EM
            loops converge in a handful of steps from the previous
            iteration's eigenvalues instead of the cold 50
            (pass a matching small ``iterations``).
        use_pallas: run the chord solve as Pallas kernel launches
            (ops/pallas_bingham.py) instead of ~30 HLO ops per step:
            warm solves are ONE launch, cold solves THREE (a finite-
            difference Jacobian refresh per launch, from the -1/s
            init). None = auto (TPU, f32, D <= 8); True on CPU runs
            the kernel in interpret mode.
    Returns:
        (..., D) Bingham eigenvalues in the input's element order.
    """
    s = jnp.asarray(scatter_eigenvalues)
    dtype = jnp.result_type(s.dtype, jnp.float32)
    s = s.astype(dtype)
    D = s.shape[-1]

    inverse_permutation, s_sorted = _remove_duplicate_eigenvalues(
        s, eps=eps)

    # the diff lower bound must stay representable after cumsum at
    # concentration scale -> dtype-aware like the spacing eps
    upper = -_default_spacing_eps(dtype)
    # Keep every iterate inside _log_norm_dd's exact domain:
    # |lambda| <= 32768 after the cumsum over D-1 diffs. The cap only
    # binds for moments <~ 3e-5 (lambda ~ -1/s), where eigh noise
    # dominates anyway; the reference's unbounded f64
    # scipy.least_squares can return e.g. -1e12 for a zero moment —
    # in f32 that initialization alone produced NaNs.
    cap_total = 32768.0
    mc_eff = min(float(max_concentration), cap_total / (D - 1))
    lower = -mc_eff
    user_bounded = np.isfinite(max_concentration)

    def solve_one(s_vec, x_warm=None):
        if x_warm is None:
            # init: lambda ~ -1/s (exact in the high-concentration
            # limit), largest pinned to 0 (reference :371-383)
            x0 = -1.0 / jnp.maximum(s_vec, 1e-12)
            x0 = x0.at[-1].set(0.0)
            x0 = jnp.maximum(
                x0,
                -(min(float(max_concentration), cap_total)
                  - jnp.arange(D, dtype=dtype)),
            )
        else:
            x0 = jnp.sort(x_warm.astype(dtype))
        u0 = -jnp.diff(x0)  # (D-1,), all <= 0

        def lam_of(u):
            # lambda_j = sum_{i >= j} of [u, 0]; ascending, max = 0
            full = jnp.concatenate([u, jnp.zeros((1,), dtype)])
            return jnp.cumsum(full[::-1])[::-1]

        def residual(u):
            return _grad_log_norm(lam_of(u)) - s_vec

        def clip(u):
            return jnp.maximum(jnp.minimum(u, upper), lower)

        jac = jax.jacfwd(residual)
        u0 = clip(u0)

        if x_warm is not None:
            # chord Gauss-Newton: warm starts sit close to the
            # solution, so ONE Jacobian (factorized once) and full
            # undamped steps converge — ~5x fewer expm evaluations
            # per M-step than the damped exact-Newton cold solver
            J0 = jac(u0)
            JtJ0 = jnp.einsum(
                'ij,ik->jk', J0, J0,
                precision=jax.lax.Precision.HIGHEST,
            ) + 1e-12 * jnp.eye(D - 1, dtype=dtype)
            JtJ0_inv = jnp.linalg.inv(JtJ0)

            def chord_step(u, _):
                r = residual(u)
                delta = JtJ0_inv @ jnp.einsum(
                    'ij,i->j', J0, r,
                    precision=jax.lax.Precision.HIGHEST)
                return clip(u - jnp.clip(delta, -1e3, 1e3)), None

            u, _ = lax.scan(chord_step, u0, None, length=iterations)
            est = lam_of(u)
            if user_bounded:
                est = jnp.maximum(est, -max_concentration)
                _, est = _remove_duplicate_eigenvalues(est, eps=eps)
            return est

        def newton_step(u, _):
            r = residual(u)  # (D,), but only D-1 free variables
            J = jac(u)  # (D, D-1)
            # Gauss-Newton step for the overdetermined square-ish
            # system (residual sums to zero, so rank is D-1).
            JtJ = jnp.einsum(
                'ij,ik->jk', J, J,
                precision=jax.lax.Precision.HIGHEST,
            ) + 1e-12 * jnp.eye(D - 1, dtype=dtype)
            delta = jnp.linalg.solve(JtJ, jnp.einsum(
                'ij,i->j', J, r,
                precision=jax.lax.Precision.HIGHEST))
            # trust region: limit the step magnitude
            delta = jnp.clip(delta, -1e3, 1e3)
            u_full = clip(u - delta)
            u_half = clip(u - 0.5 * delta)
            better = jnp.sum(residual(u_full) ** 2) \
                <= jnp.sum(residual(u_half) ** 2)
            return jnp.where(better, u_full, u_half), None

        u, _ = lax.scan(newton_step, u0, None, length=iterations)
        est = lam_of(u)
        if user_bounded:
            est = jnp.maximum(est, -max_concentration)
            _, est = _remove_duplicate_eigenvalues(est, eps=eps)
        return est

    flat = s_sorted.reshape((-1, D))
    if use_pallas is None:
        use_pallas = _pallas_solver_default(dtype, D)
    # f32 matmul precision for the embedded LU inverse/solve — the
    # TPU default bf16 passes corrupt small linear solves (see
    # ops/linalg.py stable_solve)
    with jax.default_matmul_precision('float32'):
        if warm_start is None and use_pallas:
            from ..ops.pallas_bingham import bingham_chord_solve
            # cold: -1/s init (exact in the high-concentration limit,
            # reference :371-383), then chord rounds with a Jacobian
            # REFRESH per kernel launch — 3 launches replace the 50
            # damped-Newton HLO steps (same fixed point; ~60x fewer
            # sequential ops)
            x0 = -1.0 / jnp.maximum(flat, 1e-12)
            x0 = jnp.concatenate(
                [x0[:, :-1], jnp.zeros_like(x0[:, :1])], axis=-1)
            x0 = jnp.maximum(
                x0,
                -(min(float(max_concentration), cap_total)
                  - jnp.arange(D, dtype=dtype)),
            )
            est = x0.astype(jnp.float32)
            for _ in range(3):
                est = bingham_chord_solve(
                    flat, est, iterations=10,
                    lower=lower, upper=float(upper),
                    interpret=jax.default_backend() == 'cpu')
            est = est.astype(dtype)
            if user_bounded:
                est = jnp.maximum(est, -max_concentration)
                _, est = _remove_duplicate_eigenvalues(est, eps=eps)
            solved = est
        elif warm_start is None:
            solved = jax.vmap(solve_one)(flat)
        elif use_pallas:
            from ..ops.pallas_bingham import bingham_chord_solve
            warm_flat = jnp.sort(
                jnp.asarray(warm_start).reshape((-1, D)), axis=-1)
            est = bingham_chord_solve(
                flat, warm_flat.astype(jnp.float32),
                iterations=iterations, lower=lower, upper=float(upper),
                interpret=jax.default_backend() == 'cpu',
            ).astype(dtype)
            if user_bounded:
                est = jnp.maximum(est, -max_concentration)
                _, est = _remove_duplicate_eigenvalues(est, eps=eps)
            solved = est
        else:
            warm_flat = jnp.asarray(warm_start).reshape((-1, D))
            solved = jax.vmap(solve_one)(flat, warm_flat)
    solved = solved.reshape(s_sorted.shape)
    return jnp.take_along_axis(solved, inverse_permutation, axis=-1)


class ComplexBinghamTrainer:
    def __init__(self, dimension=None, max_concentration=np.inf,
                 eignevalue_eps=None):
        """
        Args:
            dimension: feature dimension (inferred at fit if None).
            max_concentration: bound on the eigenvalue spread.
            eignevalue_eps: duplicate-eigenvalue regularizer (the
                misspelling mirrors the reference API,
                complex_bingham.py:208).
        """
        self.dimension = dimension
        assert max_concentration > 0, max_concentration
        self.max_concentration = max_concentration
        self.eignevalue_eps = eignevalue_eps

    # Reference-compatible aliases (v2/v3 differ only in the solver
    # parameterization; the batched Newton uses the v3 diff form).
    @classmethod
    def find_eigenvalues_v3(cls, scatter_eigenvalues, eps=None,
                            max_concentration=np.inf):
        return find_eigenvalues(
            jnp.asarray(scatter_eigenvalues),
            max_concentration=float(max_concentration)
            if np.isfinite(max_concentration) else np.inf,
            eps=eps,
        )

    find_eigenvalues_v2 = find_eigenvalues_v3

    def fit(self, y, saliency=None) -> ComplexBingham:
        y = jnp.asarray(y)
        assert jnp.iscomplexobj(y), y.dtype
        assert y.shape[-1] > 1
        y = normalize_observation(y)
        if saliency is not None:
            assert is_broadcast_compatible(
                y.shape[:-1], jnp.asarray(saliency).shape), (
                y.shape, jnp.asarray(saliency).shape)
        if self.dimension is None:
            self.dimension = y.shape[-1]
        else:
            assert self.dimension == y.shape[-1], (
                'You initialized the trainer with a different dimension '
                'than you are using to fit a model. Use a new trainer, '
                'when you change the dimension.'
            )
        return self._fit(y, saliency=saliency)

    def _fit(self, y, saliency, warm_start=None,
             solver_iterations=None) -> ComplexBingham:
        if saliency is None:
            covariance = jnp.einsum(
                '...nd,...nD->...dD', y, y.conj(),
                precision=jax.lax.Precision.HIGHEST)
            denominator = jnp.asarray(y.shape[-2], _real_dtype(y))
        else:
            covariance = jnp.einsum(
                '...n,...nd,...nD->...dD', saliency, y, y.conj(),
                precision=jax.lax.Precision.HIGHEST)
            denominator = jnp.einsum(
                '...n->...', saliency)[..., None, None]
        covariance = covariance / jnp.maximum(
            denominator, _tiny(y))
        covariance = force_hermitian(covariance)
        scatter_eigenvalues, eigenvecs = eigh(covariance)
        scatter_eigenvalues = jnp.maximum(scatter_eigenvalues, 0.0)
        eigenvalues = find_eigenvalues(
            scatter_eigenvalues,
            max_concentration=float(self.max_concentration)
            if np.isfinite(self.max_concentration) else np.inf,
            eps=self.eignevalue_eps,
            iterations=(50 if solver_iterations is None
                        else solver_iterations),
            warm_start=warm_start,
        )
        return ComplexBingham(
            covariance_eigenvectors=eigenvecs,
            covariance_eigenvalues=eigenvalues,
        )
