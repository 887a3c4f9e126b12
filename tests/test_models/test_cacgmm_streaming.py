"""Block-online (streaming) cACGMM: quality vs the offline fit,
tracking of nonstationary scenes, and scan-vs-loop API parity.

Beyond-reference capability (the reference has no online EM); the
quality yardstick is the per-frequency oracle MSE against the planted
labels, as in the fused-kernel tiers.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pb_bss_tpu.models.cacgmm import CACGMMTrainer
from pb_bss_tpu.models.cacgmm_streaming import StreamingCACGMM

F, D, K, T = 16, 3, 2, 400


def _sample(seed=0, cov=None):
    rng = np.random.default_rng(seed)
    if cov is None:
        a = rng.standard_normal((F, K, D, 2)) + 1j * rng.standard_normal(
            (F, K, D, 2))
        cov = np.einsum('fkdr,fker->fkde', a, a.conj()) + 0.1 * np.eye(D)
    labels = rng.integers(0, K, size=(F, T))
    chol = np.linalg.cholesky(cov)
    g = rng.standard_normal((F, T, D)) + 1j * rng.standard_normal(
        (F, T, D))
    y = np.einsum('ftde,fte->ftd', chol[np.arange(F)[:, None], labels], g)
    y /= np.maximum(np.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
    return jnp.asarray(y, jnp.complex64), labels, cov


def _oracle_mse(affiliation, labels):
    one_hot = np.einsum('ftk->fkt', np.eye(K)[labels])
    aff = np.asarray(affiliation)
    best = np.full(aff.shape[0], np.inf)
    for perm in itertools.permutations(range(K)):
        best = np.minimum(
            best, np.mean((aff[:, perm, :] - one_hot) ** 2, axis=(1, 2)))
    return float(np.mean(best))


def test_stationary_matches_offline():
    """Pure incremental EM (forgetting=1) on a stationary scene ends
    near the offline EM solution."""
    y, labels, _ = _sample(seed=0)
    offline = CACGMMTrainer().fit(
        y, num_classes=K, iterations=20, key=jax.random.key(1))
    mse_off = _oracle_mse(
        offline.predict(y), labels)

    stream = StreamingCACGMM(K, forgetting=1.0, inner_iterations=2,
                             init_iterations=10)
    model, _ = stream.fit_predict_stream(
        y, t_block=50, key=jax.random.key(1))
    mse_stream = _oracle_mse(model.predict(y), labels)

    assert mse_off < 0.15, mse_off  # sanity: the scene is separable
    assert mse_stream < mse_off + 0.03, (mse_stream, mse_off)


def test_block_size_invariance():
    """The per-frame forgetting parameterization makes quality
    insensitive to the block length."""
    y, labels, _ = _sample(seed=1)
    mses = []
    for t_block in (25, 50, 100):
        stream = StreamingCACGMM(K, forgetting=0.999,
                                 inner_iterations=2, init_iterations=10)
        model, _ = stream.fit_predict_stream(
            y, t_block=t_block, key=jax.random.key(2))
        mses.append(_oracle_mse(model.predict(y), labels))
    assert max(mses) - min(mses) < 0.05, mses


def test_tracks_switching_scene():
    """When the spatial scene switches halfway, forgetting < 1 tracks
    the new covariances; the offline single model averages both and
    does worse on the second half."""
    y1, lab1, _ = _sample(seed=2)
    y2, lab2, _ = _sample(seed=7)  # different covariances
    y = jnp.concatenate([y1, y2], axis=-2)        # (F, 2T, D)

    offline = CACGMMTrainer().fit(
        y, num_classes=K, iterations=20, key=jax.random.key(3))
    mse_off_2nd = _oracle_mse(offline.predict(y2), lab2)

    stream = StreamingCACGMM(K, forgetting=0.97, inner_iterations=2,
                             init_iterations=10)
    model, _ = stream.fit_predict_stream(
        y, t_block=50, key=jax.random.key(3))
    mse_stream_2nd = _oracle_mse(model.predict(y2), lab2)

    assert mse_stream_2nd < mse_off_2nd - 0.02, (
        mse_stream_2nd, mse_off_2nd)


def test_update_loop_matches_scan():
    """The stateful update() API and the one-program lax.scan
    simulator produce the same stream."""
    y, _, _ = _sample(seed=3)
    t_block = 50
    stream = StreamingCACGMM(K, forgetting=0.999, inner_iterations=1,
                             init_iterations=5)

    model_scan, aff_scan = stream.fit_predict_stream(
        y, t_block=t_block, key=jax.random.key(4))

    state = None
    affs = []
    for i in range(T // t_block):
        block = y[:, i * t_block:(i + 1) * t_block, :]
        state, aff = stream.update(state, block, key=jax.random.key(4))
        affs.append(aff)
    aff_loop = jnp.concatenate(affs, axis=-1)

    np.testing.assert_allclose(
        np.asarray(aff_loop), np.asarray(aff_scan), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(model_scan.cacg.covariance_eigenvalues),
        np.asarray(state.model.cacg.covariance_eigenvalues), rtol=1e-3,
        atol=1e-5)


def test_state_is_a_pytree():
    """The stream state serializes/flows through jax transforms."""
    y, _, _ = _sample(seed=4)
    stream = StreamingCACGMM(K, init_iterations=3)
    state, _ = stream.update(None, y[:, :50, :])
    leaves = jax.tree.leaves(state)
    assert len(leaves) > 0
    rebuilt = jax.tree.unflatten(jax.tree.structure(state), leaves)
    assert rebuilt.model.weight.shape == state.model.weight.shape


def test_partial_trailing_block_is_truncated():
    y, _, _ = _sample(seed=5)
    stream = StreamingCACGMM(K, init_iterations=3)
    model, aff = stream.fit_predict_stream(y[:, :130, :], t_block=50)
    assert aff.shape == (F, K, 100), aff.shape
