import itertools

import jax
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.distribution import (
    CACGMM,
    CACGMMTrainer,
    ComplexAngularCentralGaussian,
    sample_cacgmm,
)
from pb_bss_tpu.utils import labels_to_one_hot


def solve_permutation(estimated_covariance, covariance):
    K = estimated_covariance.shape[0]
    best_permutation, best_cost = None, np.inf
    for p in itertools.permutations(range(K)):
        cost = np.linalg.norm(estimated_covariance[p, :, :] - covariance)
        if cost < best_cost:
            best_permutation, best_cost = p, cost
    return list(best_permutation)


COVARIANCE = np.array([
    [[10, 1 + 1j, 1 + 1j], [1 - 1j, 5, 1], [1 - 1j, 1, 2]],
    [[2, 0, 0], [0, 3, 0], [0, 0, 2]],
])
COVARIANCE = COVARIANCE / np.trace(
    COVARIANCE, axis1=-2, axis2=-1)[..., None, None]
WEIGHT = np.array([0.3, 0.7])


@pytest.mark.slow
def test_cacgmm_parameter_recovery():
    x = np.asarray(sample_cacgmm(
        10000, WEIGHT, COVARIANCE, key=jax.random.key(5)))

    model = CACGMMTrainer().fit(
        x, num_classes=2, covariance_norm='trace', key=jax.random.key(1),
    )
    cov_est = np.asarray(model.cacg.covariance)
    perm = solve_permutation(cov_est, COVARIANCE)
    assert_allclose(cov_est[perm], COVARIANCE, atol=0.1)
    weight_est = np.asarray(model.weight)[perm]
    assert weight_est[0] < weight_est[1], weight_est
    assert_allclose(weight_est[:, 0], WEIGHT, atol=0.15)


@pytest.mark.slow
def test_cacgmm_independent_dims():
    x = np.asarray(sample_cacgmm(
        10000, WEIGHT, COVARIANCE, key=jax.random.key(6)))

    model = CACGMMTrainer().fit(
        x[None], num_classes=2, covariance_norm='trace',
        key=jax.random.key(2),
    )
    cov_est = np.asarray(model.cacg.covariance)
    perm = solve_permutation(cov_est[0], COVARIANCE)
    assert_allclose(cov_est[0][perm], COVARIANCE, atol=0.1)
    assert_allclose(
        np.asarray(model.weight)[0, perm, 0], WEIGHT, atol=0.15)

    model = CACGMMTrainer().fit(
        np.array([x, x]), num_classes=2, covariance_norm='trace',
        key=jax.random.key(3),
    )
    cov_est = np.asarray(model.cacg.covariance)
    for f in range(2):
        perm = solve_permutation(cov_est[f], COVARIANCE)
        assert_allclose(cov_est[f][perm], COVARIANCE, atol=0.1)
        assert_allclose(
            np.asarray(model.weight)[f, perm, 0], WEIGHT, atol=0.15)


def test_cacgmm_affiliation_init():
    x, labels = sample_cacgmm(
        10000, WEIGHT, COVARIANCE, return_label=True, key=jax.random.key(7))
    x = np.asarray(x)
    affiliations = labels_to_one_hot(np.asarray(labels), 2, axis=-2)

    model = CACGMMTrainer().fit(
        x, initialization=affiliations, covariance_norm='trace',
        iterations=10,
    )
    cov_est = np.asarray(model.cacg.covariance)
    perm = solve_permutation(cov_est, COVARIANCE)
    assert_allclose(cov_est[perm], COVARIANCE, atol=0.1)

    # independent + broadcasted initialization
    CACGMMTrainer().fit(
        np.array([x]), initialization=np.array([affiliations]),
        covariance_norm='trace', iterations=2)
    CACGMMTrainer().fit(
        np.array([x, x, x]), initialization=np.array([affiliations]),
        covariance_norm='trace', iterations=2)


@pytest.mark.slow
def test_cacgmm_model_init_resume():
    x = np.asarray(sample_cacgmm(
        4000, WEIGHT, COVARIANCE, key=jax.random.key(8)))
    model1 = CACGMMTrainer().fit(
        x, num_classes=2, iterations=2, key=jax.random.key(4))
    ll1 = float(model1.log_likelihood(x))
    model2 = CACGMMTrainer().fit(x, initialization=model1, iterations=1)
    ll2 = float(model2.log_likelihood(x))
    assert ll2 > ll1, (ll1, ll2)


@pytest.mark.slow
def test_cacgmm_weight_constant_axis():
    x = np.asarray(sample_cacgmm(
        500, WEIGHT, COVARIANCE, key=jax.random.key(9)))
    # frequency/class-constant weight: fixed to 1/K with shape (K, 1)
    model = CACGMMTrainer().fit(
        x, num_classes=2, iterations=3, weight_constant_axis=-2,
        key=jax.random.key(1))
    assert model.weight.shape == (2, 1)
    assert_allclose(np.asarray(model.weight), 0.5)

    y = np.array([x, x])
    model = CACGMMTrainer().fit(
        y, num_classes=2, iterations=3, weight_constant_axis=(-3, -1),
        key=jax.random.key(1))
    assert model.weight.shape == (1, 2, 1)


def test_cacgmm_source_activity_mask():
    x = np.asarray(sample_cacgmm(
        1000, WEIGHT, COVARIANCE, key=jax.random.key(10)))
    mask = np.ones((2, 1000), bool)
    mask[0, :20] = False
    model = CACGMMTrainer().fit(
        x, num_classes=2, iterations=3, source_activity_mask=mask,
        key=jax.random.key(1))
    affiliation = np.asarray(model.predict(x, source_activity_mask=mask))
    np.testing.assert_allclose(affiliation[0, :20], 0.0)


def test_cacgmm_serialization_roundtrip():
    x = np.asarray(sample_cacgmm(
        500, WEIGHT, COVARIANCE, key=jax.random.key(11)))
    model = CACGMMTrainer().fit(
        x, num_classes=2, iterations=2, key=jax.random.key(1))
    d = model.to_dict()
    assert set(d.keys()) == {'weight', 'cacg'}
    assert set(d['cacg'].keys()) == {
        'covariance_eigenvectors', 'covariance_eigenvalues'}
    model2 = CACGMM.from_dict(d)
    assert_allclose(
        np.asarray(model2.cacg.covariance_eigenvalues),
        np.asarray(model.cacg.covariance_eigenvalues))
    a1 = np.asarray(model.predict(x))
    a2 = np.asarray(model2.predict(x))
    assert_allclose(a1, a2)


@pytest.mark.slow
def test_cacgmm_log_likelihood_increases():
    x = np.asarray(sample_cacgmm(
        2000, WEIGHT, COVARIANCE, key=jax.random.key(12)))
    lls = []
    model = None
    for it in [1, 2, 5, 10]:
        model = CACGMMTrainer().fit(
            x, num_classes=2, iterations=it, key=jax.random.key(0))
        lls.append(float(model.log_likelihood(x)))
    assert lls == sorted(lls), lls


def test_sample_cacgmm_labels_match():
    x, labels = sample_cacgmm(
        1000, WEIGHT, COVARIANCE, return_label=True, key=jax.random.key(13))
    labels = np.asarray(labels)
    frac = labels.mean()
    assert 0.6 < frac < 0.8, frac  # ~0.7 of samples from class 1
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), 1.0, rtol=1e-6)


@pytest.mark.slow
def test_eigh_sweeps_quality_equivalent():
    """The eigh_sweeps speed knob (reduced Jacobi sweeps inside the
    self-correcting EM) does not change separation quality."""
    import jax
    import numpy as np
    from pb_bss_tpu.models.cacgmm import CACGMMTrainer

    rng = np.random.RandomState(0)
    F, T, D = 65, 120, 4
    atf = rng.randn(F, D, 2) + 1j * rng.randn(F, D, 2)
    active = np.arange(T) % 2 == 0
    y = np.where(active[None, :, None], atf[:, None, :, 0],
                 atf[:, None, :, 1])
    y = (y * np.exp(2j * np.pi * rng.rand(F, T, 1))
         + 0.1 * (rng.randn(F, T, D) + 1j * rng.randn(F, T, D))
         ).astype(np.complex64)
    accs = {}
    for sweeps in [None, 4]:
        m = CACGMMTrainer().fit(
            y, num_classes=2, iterations=30, key=jax.random.key(0),
            eigh_sweeps=sweeps)
        a = np.asarray(m.predict(y))
        acc = np.mean(a.argmax(1) == active[None, :], axis=-1)
        accs[sweeps] = float(np.maximum(acc, 1 - acc).mean())
    assert accs[None] > 0.95
    assert abs(accs[None] - accs[4]) < 0.02, accs
