"""Independent and identically distributed affiliation initializers.

Capability parity with ``pb_bss/initializer/iid.py`` (uniform_normalized
:12, dirichlet(_uniform) :73, one_hot :155) with explicit ``jax.random``
keys replacing the reference's hidden global NumPy seed — the
reproducibility model of the TPU framework.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .._dtypes import real_dtype as _real_dtype

__all__ = [
    'uniform_normalized',
    'dirichlet_uniform',
    'dirichlet',
    'one_hot',
]


def _default_key(key):
    return jax.random.key(0) if key is None else key


def uniform_normalized(Y, num_classes: int, permutation_free: bool = False,
                       *, key=None):
    """Uniform random affiliations normalized over classes.

    Args:
        Y: (..., N, D) observations (only the shape is used).
        num_classes: K.
        permutation_free: broadcast one (K, N) draw over all independent
            dims so every frequency starts with the same permutation.
    Returns:
        (..., K, N) affiliations.

    >>> import numpy as np, jax, jax.numpy as jnp
    >>> Y = jnp.zeros((5, 100, 3))  # (F, N, D): only the shape is used
    >>> a = uniform_normalized(Y, 2, key=jax.random.key(0))
    >>> a.shape
    (5, 2, 100)
    >>> bool(jnp.allclose(a.sum(-2), 1.0))  # normalized over classes
    True
    >>> pf = uniform_normalized(
    ...     Y, 2, permutation_free=True, key=jax.random.key(0))
    >>> bool((pf[0] == pf[4]).all())  # same draw in every frequency
    True
    """
    Y = jnp.asarray(Y)
    independent = Y.shape[:-2]
    num_observations = Y.shape[-2]
    key = _default_key(key)
    affiliation_shape = (*independent, num_classes, num_observations)

    if permutation_free:
        affiliation = jax.random.uniform(
            key, affiliation_shape[-2:], _real_dtype(Y))
        affiliation = affiliation / jnp.einsum(
            '...kn->...n', affiliation)[..., None, :]
        affiliation = jnp.broadcast_to(affiliation, affiliation_shape)
    else:
        affiliation = jax.random.uniform(
            key, affiliation_shape, _real_dtype(Y))
        affiliation = affiliation / jnp.einsum(
            '...kn->...n', affiliation)[..., None, :]
    return affiliation


def dirichlet_uniform(Y, num_classes, permutation_free=False, *, key=None):
    """Dirichlet(alpha=1) initializer (reference iid.py:73)."""
    return dirichlet(Y, num_classes, permutation_free, alpha=1, key=key)


def dirichlet(Y, num_classes: int, permutation_free: bool = False,
              alpha=1, *, key=None):
    """Dirichlet-distributed affiliations (reference iid.py:88-152)."""
    Y = jnp.asarray(Y)
    independent = Y.shape[:-2]
    num_observations = Y.shape[-2]
    key = _default_key(key)
    assert jnp.isscalar(alpha) or isinstance(alpha, (int, float)), alpha
    alpha_vec = jnp.full((num_classes,), float(alpha), _real_dtype(Y))

    if permutation_free:
        affiliation_shape = (*independent, num_classes, num_observations)
        affiliation = jax.random.dirichlet(
            key, alpha_vec, shape=(num_observations,)).T
        affiliation = jnp.broadcast_to(affiliation, affiliation_shape)
    else:
        affiliation = jnp.swapaxes(
            jax.random.dirichlet(
                key, alpha_vec, shape=(*independent, num_observations)),
            -1, -2)
    return affiliation


def one_hot(Y, num_classes: int, permutation_free: bool = False,
            *, key=None):
    """Random hard-assignment affiliations (reference iid.py:155-218)."""
    Y = jnp.asarray(Y)
    independent = Y.shape[:-2]
    num_observations = Y.shape[-2]
    key = _default_key(key)

    if permutation_free:
        labels = jax.random.randint(
            key, (num_observations,), 0, num_classes)
        affiliation = jnp.eye(num_classes, dtype=_real_dtype(Y))[labels].T
        affiliation = jnp.broadcast_to(
            affiliation, (*independent, num_classes, num_observations))
    else:
        labels = jax.random.randint(
            key, (*independent, num_observations), 0, num_classes)
        affiliation = jnp.swapaxes(
            jnp.eye(num_classes, dtype=_real_dtype(Y))[labels], -1, -2)
    return affiliation
