"""Block-online (streaming) cACGMM — beyond-reference capability.

The reference (fgnt/pb_bss) fits its spatial mixture models strictly
offline: the full (F, T, D) observation is in memory and every EM
iteration sweeps all T frames (pb_bss/distribution/cacgmm.py:82-200).
Production separation/serving wants the opposite: audio arrives in
blocks, the model must track slowly moving spatial statistics, and
latency is bounded by the block length.

This module implements recursive (stepwise) EM over time blocks with
exponential forgetting of the sufficient statistics — the cACGMM
analog of Cappé & Moulines' online EM: the cACG M-step is a function
of the affiliation-weighted, quadratic-form-normalized scatter
``S_k = sum_t gamma_kt y_t y_t^H / q_kt`` and the affiliation counts
``N_k = sum_t gamma_kt``, so a decayed running (S, N) pair is a
sufficient state. Per block:

    gamma, q  <- E-step of the incoming block under the current model
    S <- rho * S + S_block,   N <- rho * N + N_block
    model <- M-step from (S, N)      (x inner_iterations)

``rho = forgetting ** t_block`` discounts per *frame*, so quality is
block-size-invariant; ``forgetting=1`` is exact incremental EM (the
whole-stream solution for stationary scenes), ``< 1`` tracks moving
sources. Everything is one jitted program per block; the offline
simulator ``fit_predict_stream`` runs the whole stream as a single
``lax.scan`` (one compile, one device program).

Class order stays consistent across blocks for free — every block is
warm-started from the previous model, so no inline permutation
alignment is needed within a stream (the usual DHTV pass still aligns
across frequency).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .base import Model, force_hermitian, modelclass, static_field
from .complex_angular_central_gaussian import (
    ComplexAngularCentralGaussian,
    normalize_observation,
)
from .cacgmm import CACGMM, CACGMMTrainer
from .._dtypes import real_dtype as _real_dtype, tiny as _tiny
from ._precision import em_matmul_precision

__all__ = ['StreamingCACGMM', 'StreamingCACGMMState']


@modelclass
class StreamingCACGMMState(Model):
    """Carry of the streaming fit: current model + decayed statistics.

    Attributes:
        model: the current :class:`CACGMM`.
        scatter: (..., K, D, D) decayed weighted scatter
            ``sum rho^age * gamma / q * y y^H``.
        count: (..., K) decayed affiliation counts.
        frames: (...,) decayed total frame count (the weight
            normalizer; scalar-per-batch, kept as an array so the
            state stays a uniform pytree under vmap/scan).
    """
    model: CACGMM = None
    scatter: jnp.ndarray = None
    count: jnp.ndarray = None
    frames: jnp.ndarray = None


def _block_stats(model, y_block, *, affiliation_eps):
    """E-step + M-statistics of one (..., D, Tb) block."""
    affiliation, quadratic_form, _ = model._predict(
        y_block, affiliation_eps=affiliation_eps)
    w = affiliation / jnp.maximum(
        quadratic_form, 10 * _tiny(quadratic_form))
    scatter = jnp.einsum(
        '...kt,...dt,...et->...kde',
        w.astype(y_block.dtype), y_block, y_block.conj(),
        precision=em_matmul_precision())
    return affiliation, scatter, jnp.sum(affiliation, axis=-1)


def _model_from_stats(scatter, count, frames, *, eigenvalue_floor,
                      eigh_sweeps):
    D = scatter.shape[-1]
    covariance = D * scatter / jnp.maximum(
        count, _tiny(count))[..., None, None].astype(scatter.dtype)
    covariance = force_hermitian(covariance)
    cacg = ComplexAngularCentralGaussian.from_covariance(
        covariance,
        eigenvalue_floor=eigenvalue_floor,
        covariance_norm='eigenvalue',
        eigh_sweeps=eigh_sweeps,
    )
    weight = (count / jnp.maximum(
        frames, _tiny(count))[..., None])[..., None]
    return CACGMM(weight=weight, cacg=cacg)


@functools.partial(
    jax.jit,
    static_argnames=('inner_iterations', 'forgetting', 'affiliation_eps',
                     'eigenvalue_floor', 'eigh_sweeps'))
def _update_block(state, y_block, *, inner_iterations, forgetting,
                  affiliation_eps, eigenvalue_floor, eigh_sweeps):
    """One streaming step: blend the block into the decayed statistics.

    Inner iterations re-run the E-step of the SAME block under the
    refined model, re-blending against the pre-block statistics each
    time (the block is never double-counted).
    """
    t_block = y_block.shape[-1]
    rho = forgetting ** t_block  # per-frame discount, block-invariant
    rdtype = _real_dtype(y_block)
    prev_scatter, prev_count = state.scatter, state.count
    prev_frames = state.frames

    model = state.model
    affiliation = None
    scatter, count, frames = prev_scatter, prev_count, prev_frames
    for _ in range(inner_iterations):
        affiliation, s_b, n_b = _block_stats(
            model, y_block, affiliation_eps=affiliation_eps)
        scatter = rho * prev_scatter + s_b
        count = rho * prev_count + n_b
        frames = rho * prev_frames + jnp.asarray(t_block, rdtype)
        model = _model_from_stats(
            scatter, count, frames,
            eigenvalue_floor=eigenvalue_floor, eigh_sweeps=eigh_sweeps)

    new_state = StreamingCACGMMState(
        model=model, scatter=scatter, count=count, frames=frames)
    return new_state, affiliation


class StreamingCACGMM:
    """Block-online cACGMM for serving.

    Usage (true streaming)::

        stream = StreamingCACGMM(num_classes=3, forgetting=0.9995)
        state = None
        for block in audio_stft_blocks:       # (F, T_block, D) each
            state, affiliation = stream.update(state, block)
            ...                               # masks from affiliation

    or offline simulation in ONE device program::

        model, affiliation = stream.fit_predict_stream(y, t_block=64)

    Args:
        num_classes: K mixture components.
        forgetting: per-FRAME statistics discount in (0, 1]; 1.0 is
            exact incremental EM (stationary scenes), smaller values
            track moving sources. The effective memory is
            ``1 / (1 - forgetting)`` frames (e.g. 0.999 ~ 1000 frames
            ~ 16 s at 16 kHz / 256 hop).
        inner_iterations: EM refinements per block (statistics are
            re-blended, never double-counted). Default 1: on real
            TPU hardware every extra refinement re-runs the
            eigendecomposition whose f32 rounding noise enters the
            exponentially-sensitive posterior, and the drift
            accumulates over a stream (measured on the 2-speaker
            scene: [1.6, 8.9] dB SDR at 1 inner iteration vs
            [-0.2, 6.4] at 2; CPU f64/f32 shows no difference).
        init_iterations: offline EM iterations on the FIRST block
            (warm start of the stream).
        affiliation_eps / eigenvalue_floor / eigh_sweeps: the numeric
            guards of :class:`CACGMMTrainer`, same semantics.
    """

    def __init__(self, num_classes, *, forgetting=1.0,
                 inner_iterations=1, init_iterations=10,
                 affiliation_eps=1e-10, eigenvalue_floor=1e-10,
                 eigh_sweeps=None):
        assert 0.0 < forgetting <= 1.0, forgetting
        self.num_classes = num_classes
        self.forgetting = float(forgetting)
        self.inner_iterations = int(inner_iterations)
        self.init_iterations = int(init_iterations)
        self.affiliation_eps = affiliation_eps
        self.eigenvalue_floor = eigenvalue_floor
        self.eigh_sweeps = eigh_sweeps

    # -- state management ------------------------------------------------

    def init_state(self, y_block, *, key=None):
        """Warm-start the stream: offline EM on the first block, then
        its statistics become the initial decayed statistics.

        Args:
            y_block: (..., T_block, D) complex first block
                (time-second layout, like ``CACGMMTrainer.fit``).
        Returns:
            (state, affiliation (..., K, T_block)).
        """
        y_block = jnp.asarray(y_block)
        model, affiliation = CACGMMTrainer().fit_predict_model(
            y_block, num_classes=self.num_classes,
            iterations=self.init_iterations, key=key,
            affiliation_eps=self.affiliation_eps,
            eigenvalue_floor=self.eigenvalue_floor,
            eigh_sweeps=self.eigh_sweeps)
        y_tl = normalize_observation(y_block)  # (..., D, T)
        state = self._state_from_first_block(model, y_tl)
        return state, affiliation

    @functools.partial(jax.jit, static_argnames=('self',))
    def _state_from_first_block(self, model, y_tl):
        _, scatter, count = _block_stats(
            model, y_tl, affiliation_eps=self.affiliation_eps)
        frames = jnp.asarray(
            y_tl.shape[-1], _real_dtype(y_tl)) * jnp.ones(
                y_tl.shape[:-2], _real_dtype(y_tl))
        return StreamingCACGMMState(
            model=model, scatter=scatter, count=count, frames=frames)

    def update(self, state, y_block, *, key=None):
        """Consume one (..., T_block, D) block; returns
        ``(state, affiliation)`` with affiliation (..., K, T_block).

        ``state=None`` starts the stream (offline warm start on this
        first block).
        """
        if state is None:
            return self.init_state(y_block, key=key)
        y_tl = normalize_observation(jnp.asarray(y_block))
        return _update_block(
            state, y_tl,
            inner_iterations=self.inner_iterations,
            forgetting=self.forgetting,
            affiliation_eps=self.affiliation_eps,
            eigenvalue_floor=self.eigenvalue_floor,
            eigh_sweeps=self.eigh_sweeps)

    # -- offline simulation ---------------------------------------------

    def fit_predict_stream(self, y, *, t_block=64, key=None):
        """Run the whole stream as ONE device program.

        The first block is fit offline (``init_iterations``), the
        remaining blocks stream through ``lax.scan`` with the
        recursive update; per-block affiliations are concatenated.

        Args:
            y: (..., T, D) complex observations; T is truncated to a
                multiple of ``t_block`` (streaming has no lookahead —
                a final partial block would change shapes).
        Returns:
            (final model, affiliation (..., K, T_used)).
        """
        y = jnp.asarray(y)
        *lead, T, D = y.shape
        nb = T // t_block
        assert nb >= 1, (T, t_block)
        y = y[..., :nb * t_block, :]

        state, aff0 = self.init_state(
            y[..., :t_block, :], key=key)
        if nb == 1:
            return state.model, aff0

        y_tl = normalize_observation(y)  # (..., D, T')
        rest = y_tl[..., t_block:]
        blocks = rest.reshape(
            *rest.shape[:-1], nb - 1, t_block)       # (..., D, nb-1, tb)
        blocks = jnp.moveaxis(blocks, -2, 0)         # (nb-1, ..., D, tb)

        update = functools.partial(
            _update_block,
            inner_iterations=self.inner_iterations,
            forgetting=self.forgetting,
            affiliation_eps=self.affiliation_eps,
            eigenvalue_floor=self.eigenvalue_floor,
            eigh_sweeps=self.eigh_sweeps)

        state, affs = lax.scan(update, state, blocks)
        affs = jnp.moveaxis(affs, 0, -2)             # (..., K, nb-1, tb)
        affs = affs.reshape(*affs.shape[:-2], -1)    # (..., K, T'-tb)
        affiliation = jnp.concatenate([aff0, affs], axis=-1)
        return state.model, affiliation
