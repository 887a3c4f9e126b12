"""Array assertions for tests (capability of reference
pb_bss/testing/module_asserts.py:6-115)."""
import numpy as np

__all__ = [
    'assert_hermitian',
    'assert_positive_semidefinite',
    'assert_array_greater',
    'assert_array_greater_equal',
    'assert_array_less',
    'assert_array_less_equal',
    'assert_array_not_equal',
    'assert_isreal',
]

# re-exported for reference-namespace compatibility
from numpy.testing import assert_array_less  # noqa: F401


def assert_hermitian(matrix, atol=1e-6):
    np.testing.assert_allclose(
        matrix, np.swapaxes(np.conj(matrix), -1, -2), atol=atol,
    )


def assert_positive_semidefinite(matrix, atol=1e-6):
    assert_hermitian(matrix, atol=atol)
    eigenvalues = np.linalg.eigvalsh(matrix)
    assert np.all(eigenvalues >= -atol), eigenvalues.min()


def assert_array_greater_equal(x, y, err_msg='', verbose=True):
    np.testing.assert_array_compare(
        lambda a, b: np.asarray(a) >= np.asarray(b), x, y,
        err_msg=err_msg, verbose=verbose,
        header='Arrays are not greater-or-equal-ordered',
    )


def assert_array_less_equal(x, y, err_msg='', verbose=True):
    np.testing.assert_array_compare(
        lambda a, b: np.asarray(a) <= np.asarray(b), x, y,
        err_msg=err_msg, verbose=verbose,
        header='Arrays are not less-or-equal-ordered',
    )


def assert_array_greater(x, y, err_msg='', verbose=True):
    np.testing.assert_array_compare(
        lambda a, b: np.asarray(a) > np.asarray(b), x, y,
        err_msg=err_msg, verbose=verbose,
        header='Arrays are not greater-ordered',
    )


def assert_isreal(actual, err_msg='', verbose=True):
    """Assert every element has zero imaginary part
    (``np.isreal``-style; reference module_asserts.py:24-50)."""
    np.testing.assert_equal(np.isreal(actual), True, err_msg, verbose)


def assert_array_not_equal(x, y, err_msg='', verbose=True):
    """Assert the arrays are NOT elementwise equal (shape mismatch
    also raises; reference module_asserts.py:53-88)."""
    np.testing.assert_array_compare(
        lambda a, b: np.asarray(a) != np.asarray(b), x, y,
        err_msg=err_msg, verbose=verbose,
        header='Arrays are equal',
    )
