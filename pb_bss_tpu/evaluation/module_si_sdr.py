"""Scale-Invariant Signal-to-Distortion Ratio (SI-SDR).

Capability parity with ``pb_bss/evaluation/module_si_sdr.py``
([LeRoux2019] "SDR - Half-Baked or Well Done?"); jit-compatible and
broadcast over leading dims.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ['si_sdr', 'si_sdr_allow_float32']


def si_sdr_allow_float32(*arrays):
    """The facades' auto-opt-in policy for :func:`si_sdr`'s
    ``allow_float32``: True exactly when every input is floating AND
    at least one is float32 (the device-first evaluation mode).
    Integer inputs keep raising the reference's f64 assert — treating
    any non-f64 dtype as an opt-in would let int16 PCM silently
    compute garbage (integer sums overflow in the energy terms)."""
    dts = [a.dtype if hasattr(a, 'dtype') else np.asarray(a).dtype
           for a in arrays]
    return (all(np.issubdtype(dt, np.floating) for dt in dts)
            and any(dt == np.float32 for dt in dts))


def si_sdr(reference, estimation, *, allow_float32=False):
    """SI-SDR in dB.

    Args:
        reference: (..., T) float64.
        estimation: (..., T) float64, broadcastable.
        allow_float32: accept f32 inputs (for fully on-device
            evaluation on TPU, where x64 is unavailable; the
            reference asserts f64 because the projection suffers
            cancellation — expect ~0.01 dB noise at f32 on typical
            signals, worse at very high SI-SDR).

    >>> import numpy as np
    >>> rng = np.random.RandomState(0)
    >>> reference = rng.randn(100)
    >>> float(si_sdr(reference, reference)) == float('inf')
    True
    >>> float(si_sdr(reference, reference * 2)) == float('inf')
    True
    >>> round(float(si_sdr(reference, reference + 0.5)), 6)
    6.370461
    >>> round(float(si_sdr(reference, reference * 2 + 1)), 6)
    6.370461
    """
    if not allow_float32:
        # Check the dtype contract on the INPUTS, before jnp.asarray:
        # under x64-disabled JAX (any production process; only the
        # test conftest enables x64) the conversion silently downcasts
        # f64 -> f32, so a post-conversion assert could never pass
        # there even though the caller held up the reference's f64
        # input contract. The math then runs at the runtime's
        # precision; the contract is about the data provided.
        for name, x in (('reference', reference),
                        ('estimation', estimation)):
            dt = (x.dtype if hasattr(x, 'dtype')
                  else np.asarray(x).dtype)
            assert dt == np.float64, (
                f'The reference requires float64 inputs for a '
                f'meaningful SI-SDR ({name} has {dt}); pass '
                f'allow_float32=True for on-device f32 evaluation.'
            )
    estimation, reference = jnp.broadcast_arrays(
        jnp.asarray(estimation), jnp.asarray(reference))

    reference_energy = jnp.sum(
        reference ** 2, axis=-1, keepdims=True)
    # alpha after Equation (3) in [LeRoux2019]
    optimal_scaling = jnp.sum(
        reference * estimation, axis=-1, keepdims=True) / reference_energy
    # e_target / e_res of Equation (4)
    projection = optimal_scaling * reference
    noise = estimation - projection

    ratio = jnp.sum(projection ** 2, axis=-1) \
        / jnp.sum(noise ** 2, axis=-1)
    return 10 * jnp.log10(ratio)
