"""Complex Watson distribution.

Capability parity with ``pb_bss/distribution/complex_watson.py``:
log-pdf ``kappa |<y, mode>|^2 - log Z`` (reference :73-87), the four
log-norm approximations (low/medium/high concentration + exact
``hyp1f1``; reference :89-217) and the trainer whose M-step inverts the
eigenvalue-ratio -> concentration mapping (reference :237-315).

TPU-first realization:

* ``log_norm`` is the Tran-Vu switched form (reference :170-213)
  expressed with ``jnp.where`` — one branchless program valid over the
  whole concentration range,
* the reference's ``scipy.interpolate.interp1d`` spline inverse
  (reference :237-256) becomes a device-resident ``jnp.interp`` lookup
  table precomputed once on the host (``scipy.special.hyp1f1`` at
  trainer construction), so the M-step stays inside the compiled EM
  loop.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from .base import Model, modelclass
from .._dtypes import real_dtype as _real_dtype, tiny as _tiny
from ..ops.linalg import eigh
from ..utils import is_broadcast_compatible

__all__ = ['ComplexWatson', 'ComplexWatsonTrainer', 'normalize_observation']


@jax.jit
def normalize_observation(observation):
    """Unit-norm over the channel axis; (..., N, D) -> (..., N, D)."""
    observation = jnp.asarray(observation)
    return observation / jnp.maximum(
        jnp.linalg.norm(observation, axis=-1, keepdims=True),
        _tiny(observation),
    )


@modelclass
class ComplexWatson(Model):
    mode: jnp.ndarray = None  # (..., D)
    concentration: jnp.ndarray = None  # (...,)

    def pdf(self, y):
        return jnp.exp(self.log_pdf(y))

    def log_pdf(self, y):
        """y: (..., D) complex unit vectors."""
        y = jnp.asarray(y)
        result = jnp.einsum(
            '...d,...d', y, self.mode[..., None, :].conj())
        result = result.real ** 2 + result.imag ** 2
        result = result * self.concentration[..., None]
        result = result - self.log_norm()[..., None]
        return result

    @staticmethod
    def log_norm_low_concentration(scale, dimension):
        """Taylor series [Mardia1999Watson Eq. 4] — accurate below ~20
        (reference :90-110)."""
        scale = jnp.asarray(scale, jnp.result_type(scale, jnp.float32))
        b_range = jnp.arange(dimension, dimension + 20, dtype=scale.dtype)
        return (
            jnp.log(2.)
            + dimension * jnp.log(jnp.pi)
            # trace-time host constant in the input dtype: a bare f64
            # gammaln would upcast the whole E-step under x64 and
            # break dtype-stable scan carries for c64 inputs
            - jnp.asarray(math.lgamma(dimension), scale.dtype)
            + jnp.log1p(jnp.sum(
                jnp.cumprod(scale[..., None] / b_range, -1), -1))
        )

    @staticmethod
    def log_norm_medium_concentration(scale, dimension):
        """[Mardia1999Watson Eq. 3] — most of the range, D < 8
        (reference :112-141)."""
        scale = jnp.asarray(scale, jnp.result_type(scale, jnp.float32))
        scale = jnp.maximum(scale, 1e-2)  # unstable at zero
        r_range = jnp.arange(dimension - 2 + 1, dtype=scale.dtype)
        # r! as a trace-time host constant (static range)
        factorials = jnp.asarray(
            [math.factorial(r) for r in range(dimension - 2 + 1)],
            scale.dtype)
        temp = (
            scale[..., None] ** r_range
            * jnp.exp(-scale[..., None])
            / factorials
        )
        return (
            jnp.log(2.)
            + dimension * jnp.log(jnp.pi)
            + (1. - dimension) * jnp.log(scale)
            + scale
            + jnp.log(1. - jnp.sum(temp, -1))
        )

    @staticmethod
    def log_norm_high_concentration(scale, dimension):
        """Above ~10, D < 8 (reference :143-157)."""
        scale = jnp.asarray(scale, jnp.result_type(scale, jnp.float32))
        return (
            jnp.log(2.)
            + dimension * jnp.log(jnp.pi)
            + (1. - dimension) * jnp.log(scale)
            + scale
        )

    @staticmethod
    def log_norm_tran_vu(scale, dimension):
        """Branchless switched form (reference :170-213): the Taylor
        series below ``1/dimension``, the Mardia Eq. 3 form elsewhere
        (which equals the high-concentration form as the correction
        vanishes)."""
        scale = jnp.asarray(scale, jnp.result_type(scale, jnp.float32))
        low = ComplexWatson.log_norm_low_concentration(scale, dimension)
        medium = ComplexWatson.log_norm_medium_concentration(
            scale, dimension)
        return jnp.where(scale < 1 / dimension, low, medium)

    # The exact hyp1f1 norm equals the medium form for integer D; the
    # switched form is the numerically robust equivalent.
    log_norm_1f1 = log_norm_tran_vu

    def log_norm(self):
        return self.log_norm_tran_vu(
            self.concentration, self.mode.shape[-1])


def _hypergeometric_ratio_grid(dimension, max_concentration,
                               spline_markers):
    """Host-side table of kappa -> E[|<y, mode>|^2] = M(2, D+1, k) /
    (D M(1, D, k)) for the device-resident inverse lookup
    (reference :237-274)."""
    from scipy.special import hyp1f1
    x = np.logspace(
        -3, np.log10(max_concentration), spline_markers)
    y = hyp1f1(2, dimension + 1, x) / (dimension * hyp1f1(1, dimension, x))
    # Prepend the kappa -> 0 limit (ratio -> 1/D) so eigenvalues below
    # the grid map to concentration 0 like the reference's fill_value.
    x = np.concatenate([[0.0], x])
    y = np.concatenate([[1.0 / dimension], y])
    return jnp.asarray(y), jnp.asarray(x)


class ComplexWatsonTrainer:
    def __init__(self, dimension=None, max_concentration=500,
                 spline_markers=1000):
        """
        Args:
            dimension: feature dimension (inferred at ``fit`` if None).
            max_concentration: clip for numerical stability.
            spline_markers: lookup-table resolution.
        """
        self.dimension = dimension
        self.max_concentration = max_concentration
        self.spline_markers = spline_markers
        self._grid = None

    @property
    def grid(self):
        if self._grid is None:
            assert self.dimension is not None, (
                'You need to specify dimension. This can be done at '
                'object instantiation or it can be inferred when using '
                'the fit function.'
            )
            self._grid = _hypergeometric_ratio_grid(
                self.dimension, self.max_concentration,
                self.spline_markers)
        return self._grid

    def hypergeometric_ratio(self, concentration):
        from scipy.special import hyp1f1
        return hyp1f1(2, self.dimension + 1, concentration) / (
            self.dimension * hyp1f1(1, self.dimension, concentration))

    def hypergeometric_ratio_inverse(self, eigenvalues):
        """Eigenvalue ratio -> concentration via the device lookup
        table (monotone, linearly interpolated; clamps to
        [0, max_concentration]). The result follows the input dtype
        (the f64 table must not upcast f32 EM states under x64 —
        scan carries must be dtype-stable)."""
        eigenvalues = jnp.asarray(eigenvalues)
        ratio_grid, kappa_grid = self.grid
        return jnp.interp(
            eigenvalues, ratio_grid, kappa_grid
        ).astype(eigenvalues.dtype)

    def fit(self, y, saliency=None) -> ComplexWatson:
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

    def _fit(self, y, saliency) -> ComplexWatson:
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
        eigenvalues, eigenvecs = eigh(covariance)
        mode = eigenvecs[..., -1]
        concentration = self.hypergeometric_ratio_inverse(
            eigenvalues[..., -1])
        return ComplexWatson(mode=mode, concentration=concentration)
