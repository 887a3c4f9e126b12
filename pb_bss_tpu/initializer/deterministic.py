"""Deterministic affiliation initializers.

Capability parity with ``pb_bss/initializer/deterministic.py``: the
``flag`` time-segment one-hot initializer with ``minimum`` flooring
(reference :4-85, [Drude PhD thesis]).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .._dtypes import real_dtype as _real_dtype

__all__ = ['flag']


def flag(Y, num_classes: int, permutation_free: bool = False,
         minimum: float = 0):
    """Split the time axis into ``num_classes`` segments, assigning each
    segment fully to one class; ``minimum`` floors the inactive classes
    to avoid exact zeros (reference deterministic.py:4-85).

    Args:
        Y: (..., N, D) observations (only the shape is used).
    Returns:
        (..., K, N) affiliations.
    """
    if not permutation_free:
        raise NotImplementedError(permutation_free)

    Y = jnp.asarray(Y)
    *ind, N, D = Y.shape

    labels = np.linspace(0, num_classes, N, dtype=int, endpoint=False)
    init = jnp.broadcast_to(
        jnp.eye(num_classes, dtype=_real_dtype(Y))[labels].T,
        (*ind, num_classes, N))
    if minimum != 0:
        assert 0 < minimum < (1 / num_classes), (minimum, num_classes)
        init = jnp.maximum(
            init, minimum / (1 - (num_classes - 1) * minimum))
        init = init / jnp.sum(init, keepdims=True, axis=-2)
    return init
