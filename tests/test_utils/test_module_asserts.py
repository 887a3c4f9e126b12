"""Reference-namespace compatibility of the testing asserts
(reference pb_bss/testing/module_asserts.py:6-115; the dead
``assert_cosine_similarity`` is deliberately not reproduced)."""
import numpy as np
import pytest

from pb_bss_tpu.testing.module_asserts import (
    assert_array_greater,
    assert_array_greater_equal,
    assert_array_less,
    assert_array_less_equal,
    assert_array_not_equal,
    assert_hermitian,
    assert_isreal,
    assert_positive_semidefinite,
)


def test_ordering_asserts():
    assert_array_greater([2, 3], [1, 2])
    assert_array_greater_equal([2, 2], [1, 2])
    assert_array_less([1, 2], [2, 3])
    assert_array_less_equal([1, 2], [1, 2])
    with pytest.raises(AssertionError):
        assert_array_greater([2, 2], [1, 2])
    with pytest.raises(AssertionError):
        assert_array_less_equal([2, 2], [1, 2])


def test_not_equal():
    assert_array_not_equal([1, 2], [3, 4])
    with pytest.raises(AssertionError):
        assert_array_not_equal([1, 2], [1, 4])


def test_isreal():
    assert_isreal(np.array([1.0, 2.0]))
    assert_isreal(np.array([1.0 + 0j]))  # zero imaginary part is real
    with pytest.raises(AssertionError):
        assert_isreal(np.array([1.0 + 1j]))


def test_matrix_asserts():
    a = np.array([[2.0, 1j], [-1j, 2.0]])
    assert_hermitian(a)
    assert_positive_semidefinite(a)
    with pytest.raises(AssertionError):
        assert_hermitian(np.array([[0.0, 1.0], [2.0, 0.0]]))
    with pytest.raises(AssertionError):
        assert_positive_semidefinite(np.array([[-1.0, 0], [0, 1.0]]))
