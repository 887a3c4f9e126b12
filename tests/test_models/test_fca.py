"""Jointly-diagonalizable full-rank spatial covariance analysis.

Beyond-reference capability (docs/DESIGN.md future work; FastFCA,
PAPERS.md). Invariants tested: likelihood monotonicity of the MU/IP
updates, unity partition of the Wiener masks/images, per-frequency
separation quality vs the mixture baseline, serialization round trip.
"""
import itertools
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pb_bss_tpu.models import FCA, FCATrainer


def _scenario(seed=0, F=8, T=160, D=3, K=2, snr_scale=0.01):
    """Random full-rank instantaneous mixture of two sources with
    partly disjoint temporal activity."""
    rng = np.random.default_rng(seed)
    mixing = (
        rng.standard_normal((F, D, K))
        + 1j * rng.standard_normal((F, D, K))
    )
    activity = np.zeros((K, T))
    activity[0, : 2 * T // 3] = 1.0
    activity[1, T // 3:] = 1.0
    s = (
        rng.standard_normal((F, K, T))
        + 1j * rng.standard_normal((F, K, T))
    ) * activity[None]
    # per-source spatial images (F, K, T, D)
    images = mixing.transpose(0, 2, 1)[:, :, None, :] * s[..., None]
    noise = snr_scale * (
        rng.standard_normal((F, T, D))
        + 1j * rng.standard_normal((F, T, D))
    )
    y = images.sum(axis=1) + noise
    return jnp.asarray(y), images, activity


@pytest.fixture(scope='module')
def fitted():
    y, images, activity = _scenario()
    model = FCATrainer().fit(
        y, num_classes=2, iterations=100, key=jax.random.PRNGKey(0))
    return y, images, activity, model


def _best_perm_mse(estimate, images):
    """Per-frequency best-permutation image MSE."""
    K = images.shape[1]
    per_f = [
        min(
            np.mean(np.abs(estimate[f, list(p)] - images[f]) ** 2)
            for p in itertools.permutations(range(K))
        )
        for f in range(images.shape[0])
    ]
    return float(np.mean(per_f))


@pytest.mark.slow
def test_log_likelihood_monotone():
    y, _, _ = _scenario(seed=1)
    lls = [
        float(
            FCATrainer()
            .fit(y, num_classes=2, iterations=it,
                 key=jax.random.PRNGKey(0))
            .log_likelihood(y)
        )
        for it in [1, 3, 8, 20, 40]
    ]
    diffs = np.diff(lls)
    assert (diffs > -1e-8).all(), lls
    assert lls[-1] > lls[0] + 1.0, lls  # actually converges somewhere


def test_masks_partition_unity(fitted):
    _, _, _, model = fitted
    masks = model.predict()
    np.testing.assert_allclose(np.asarray(masks.sum(-2)), 1.0, atol=1e-9)
    assert (np.asarray(masks) >= 0).all()


def test_images_partition_mixture(fitted):
    y, _, _, model = fitted
    separated = model.separate(y)
    np.testing.assert_allclose(
        np.asarray(separated.sum(1)), np.asarray(y), atol=1e-8)


def test_separation_beats_mixture_baseline(fitted):
    """Per-frequency best-permutation Wiener images must be much
    closer to the true source images than using the mixture itself as
    the estimate for every source (the no-separation baseline)."""
    y, images, _, model = fitted
    separated = np.asarray(model.separate(y))  # (F, K, T, D)
    mse = _best_perm_mse(separated, images)
    baseline = _best_perm_mse(
        np.broadcast_to(np.asarray(y)[:, None], images.shape), images)
    assert mse < 0.25 * baseline, (mse, baseline)


def test_mask_initialized_fit_near_oracle(fitted):
    """Initialized from activity masks (the cACGMM-fit_predict
    workflow) the refinement reaches near-oracle Wiener quality."""
    y, images, activity, _ = fitted
    F, K, T = images.shape[0], images.shape[1], images.shape[2]
    masks = np.broadcast_to(activity[None], (F, K, T)) + 1e-3
    masks = jnp.asarray(masks / masks.sum(1, keepdims=True))
    model = FCATrainer().fit(y, initialization=masks, iterations=40)
    mse = _best_perm_mse(np.asarray(model.separate(y)), images)
    baseline = _best_perm_mse(
        np.broadcast_to(np.asarray(y)[:, None], images.shape), images)
    assert mse < 0.02 * baseline, (mse, baseline)


def test_mask_initialization_and_warm_start(fitted):
    """Warm starts from (F, K, T) masks and from a fitted model."""
    y, _, _, model = fitted
    masks = model.predict()
    from_masks = FCATrainer().fit(y, initialization=masks, iterations=5)
    assert from_masks.eigenvalue.shape == model.eigenvalue.shape
    warm = FCATrainer().fit(y, initialization=model, iterations=5)
    assert float(warm.log_likelihood(y)) >= (
        float(model.log_likelihood(y)) - 1e-8)


def test_serialization_round_trip(fitted):
    _, _, _, model = fitted
    restored = FCA.from_dict(model.to_dict())
    np.testing.assert_array_equal(
        np.asarray(restored.diagonalizer),
        np.asarray(model.diagonalizer))
    leaves = jax.tree_util.tree_leaves(restored)
    assert len(leaves) == 3


def test_blind_fit_warns():
    """A blind fit (no mask warm-start) must point the user at the
    measured ~5x quality gap (docs/DESIGN.md)."""
    y, _, _ = _scenario(seed=2, F=2, T=32)
    with pytest.warns(UserWarning, match='Blind FCA fit'):
        FCATrainer().fit(
            y, num_classes=2, iterations=1, key=jax.random.PRNGKey(0))
    # No warning when warm-started from masks.
    masks = jnp.full((2, 2, 32), 0.5)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        FCATrainer().fit(y, initialization=masks, iterations=1)


def test_input_validation():
    y = jnp.ones((4, 10, 3), jnp.complex64)
    with pytest.raises(AssertionError):
        FCATrainer().fit(y, num_classes=2, initialization=jnp.ones(3))
    with pytest.raises(AssertionError):
        FCATrainer().fit(jnp.ones((4, 10, 3)), num_classes=2,
                         key=jax.random.PRNGKey(0))
