"""PESQ (ITU-T P.862) wrapper.

Capability parity with ``pb_bss/evaluation/module_pesq.py``: PESQ is an
ITU standard implemented by the C library behind the ``pesq`` PyPI
package; like the reference (module_pesq.py:36-44) this module wraps
that optional dependency with independent-axis recursion and the
nb/wb-mode-from-sample-rate convention, and raises a clear installation
hint when the library is absent.

Note (reference module_pesq.py:36-37): the pesq C code does not release
the GIL and is not thread safe — keep calls single-threaded.
"""
from __future__ import annotations

import numpy as np

__all__ = ['pesq']


def pesq(reference, estimation, sample_rate, mode=None):
    """PESQ MOS-LQO per signal; leading axes loop on the host.

    Args:
        reference / estimation: (..., num_samples).
        sample_rate: 8000 ('nb') or 16000 ('wb' default, 'nb' allowed).
    """
    try:
        import pesq as pesq_module
    except ImportError:
        raise AssertionError(
            'To use this pesq implementation, install pesq from\n'
            'https://github.com/ludlows/python-pesq\n'
            'or install it with `pip install pesq`'
        )

    estimation, reference = np.broadcast_arrays(estimation, reference)

    if mode is None:
        mode = {8000: 'nb', 16000: 'wb'}[sample_rate]
    else:
        if sample_rate == 16000:
            assert mode in ['nb', 'wb'], (mode, sample_rate)
        elif sample_rate == 8000:
            assert mode == 'nb', (mode, sample_rate)
        else:
            raise ValueError(sample_rate)

    assert reference.shape == estimation.shape, (
        reference.shape, estimation.shape)

    if reference.ndim >= 2:
        for i in range(reference.ndim - 1):
            assert reference.shape[i] < 30, (
                i, reference.shape, estimation.shape)
        return np.array([
            pesq_module.pesq(
                ref=reference[i], deg=estimation[i],
                fs=sample_rate, mode=mode)
            for i in np.ndindex(*reference.shape[:-1])
        ]).reshape(reference.shape[:-1])
    elif reference.ndim == 1:
        return pesq_module.pesq(
            ref=reference, deg=estimation, fs=sample_rate, mode=mode)
    raise NotImplementedError(reference.ndim)
