"""Host-side dtype helpers.

``array.real.dtype`` on a concrete jax array launches a device
computation just to read a dtype; these helpers derive the real
counterpart and its ``tiny`` purely on the host (works for tracers,
jax arrays, numpy arrays and dtypes alike).
"""
from __future__ import annotations

import numpy as np

__all__ = ['real_dtype', 'tiny']

_REAL_OF = {
    np.dtype('complex64'): np.dtype('float32'),
    np.dtype('complex128'): np.dtype('float64'),
}


def real_dtype(x):
    """Real counterpart of an array's/dtype's dtype, host-side only."""
    dtype = np.dtype(getattr(x, 'dtype', x))
    return _REAL_OF.get(dtype, dtype)


def tiny(x):
    """``finfo.tiny`` of the real counterpart dtype, host-side only."""
    return np.finfo(real_dtype(x)).tiny
