"""Initializer tests (reference: pb_bss/initializer/)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.initializer.iid import (
    dirichlet,
    dirichlet_uniform,
    one_hot,
    uniform_normalized,
)
from pb_bss_tpu.initializer.deterministic import flag
from pb_bss_tpu.initializer.deflation import deflationSeed


Y = np.ones([4, 5, 3])


@pytest.mark.parametrize('fn', [
    uniform_normalized, dirichlet_uniform, one_hot,
])
def test_iid_shapes_and_normalization(fn):
    affiliation = np.asarray(fn(Y, 2))
    assert affiliation.shape == (4, 2, 5)
    assert_allclose(affiliation.sum(axis=-2), 1.0, rtol=1e-6)


@pytest.mark.parametrize('fn', [
    uniform_normalized, dirichlet_uniform, one_hot,
])
def test_iid_permutation_free_broadcasts(fn):
    affiliation = np.asarray(fn(Y, 2, permutation_free=True))
    assert affiliation.shape == (4, 2, 5)
    for f in range(1, 4):
        np.testing.assert_array_equal(affiliation[f], affiliation[0])


def test_dirichlet_alpha():
    affiliation = np.asarray(dirichlet(Y, 3, alpha=10))
    assert affiliation.shape == (4, 3, 5)
    assert_allclose(affiliation.sum(axis=-2), 1.0, rtol=1e-6)


def test_one_hot_is_hard():
    affiliation = np.asarray(one_hot(Y, 2))
    assert set(np.unique(affiliation)) <= {0.0, 1.0}


class TestFlag:
    def test_reference_doctest_values(self):
        init = np.asarray(flag(np.ones([4, 5, 3]), 2,
                               permutation_free=True))
        expected = np.broadcast_to(
            np.array([[1, 1, 1, 0, 0], [0, 0, 0, 1, 1]], float),
            (4, 2, 5))
        np.testing.assert_array_equal(init, expected)

    def test_minimum(self):
        init = np.asarray(flag(np.ones([1, 5, 3]), 2, minimum=0.1,
                               permutation_free=True))
        assert_allclose(init, [[[0.9, 0.9, 0.9, 0.1, 0.1],
                                [0.1, 0.1, 0.1, 0.9, 0.9]]])

    def test_minimum_4_classes(self):
        init = np.asarray(flag(np.ones([1, 5, 3]), 4, minimum=0.1,
                               permutation_free=True))
        assert_allclose(init[0, :, 0], [0.7, 0.1, 0.1, 0.1])
        assert_allclose(init.sum(-2), 1.0)

    def test_not_permutation_free_raises(self):
        with pytest.raises(NotImplementedError):
            flag(np.ones([4, 5, 3]), 2, permutation_free=False)


@pytest.mark.slow
def test_deflation_seed():
    rng = np.random.RandomState(0)
    F, T, D = 257, 50, 3
    atf = rng.randn(F, D, 2) + 1j * rng.randn(F, D, 2)
    active = np.arange(T) % 2 == 0
    Y = np.where(active[None, :, None], atf[:, None, :, 0],
                 atf[:, None, :, 1])
    Y = Y + 0.01 * (rng.randn(F, T, D) + 1j * rng.randn(F, T, D))
    posterior = np.asarray(deflationSeed(Y, sources=2))
    assert posterior.shape == (2, F, T)
    assert_allclose(posterior.sum(0), 1.0, rtol=1e-6)
    assert posterior.min() >= 0
