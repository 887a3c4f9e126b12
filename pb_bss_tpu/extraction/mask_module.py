"""Time-frequency mask functions, TPU-native.

Capability parity with the reference ``pb_bss/extraction/mask_module.py``
(ideal_binary_mask :90, wiener_like_mask :139, ideal_ratio_mask :182,
ideal_amplitude_mask :235, phase_sensitive_mask :290, ideal_complex_mask
:325, lorenz_mask :350, quantile_mask :420, biased_binary_mask :496,
voiced_unvoiced_split_characteristic :53).

All masking functions take the complex STFT signal and broadcast over
arbitrary independent dimensions. Axis conventions follow the reference:
``source_axis`` default 0, optional ``sensor_axis`` for power pooling,
frequency/time on the trailing axes.

TPU-first changes: the reference's per-row Python loops in
``lorenz_mask`` (:399-407) and ``quantile_mask`` (:481-487) are replaced
by batched sort/cumsum and batched quantiles, so every mask is a single
jit-compatible XLA program.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..utils import abs_square
from .._dtypes import real_dtype as _real_dtype

EPS = 1e-18

__all__ = [
    'voiced_unvoiced_split_characteristic',
    'ideal_binary_mask',
    'wiener_like_mask',
    'ideal_ratio_mask',
    'ideal_amplitude_mask',
    'phase_sensitive_mask',
    'ideal_complex_mask',
    'lorenz_mask',
    'quantile_mask',
    'biased_binary_mask',
]

_SENSOR_AXIS_MESSAGE = (
    'This mask has no meaningful way to pool a sensor axis: every '
    'candidate reduction (summing magnitudes, summing the complex '
    'values, root-sum-square) either discards the phase or changes '
    'the quantity the mask is defined on, so a complex per-sensor '
    'signal cannot be collapsed here. Pick one sensor (or pool '
    'outside) before calling; sensor_axis is only supported by the '
    'power-based masks, which pool |.|^2.'
)


def _pool_sensor_power(power, sensor_axis):
    """Sum a power-like quantity over the sensor axis (keepdims, so
    downstream axis arithmetic is unchanged); no-op without one."""
    if sensor_axis is None:
        return power
    return power.sum(sensor_axis, keepdims=True)


def _drop_pooled_axis(mask, sensor_axis, keepdims):
    """Remove the kept singleton sensor axis unless asked to keep it."""
    if sensor_axis is not None and not keepdims:
        return jnp.squeeze(mask, sensor_axis)
    return mask


def _soften(mask, weight):
    """Map hard {0, 1} decisions to {0.5 - w/2, 0.5 + w/2} (the
    reference's softening of its threshold masks)."""
    return 0.5 + weight * (mask - 0.5)


def _flatten_rows(x, axis):
    """Collapse ``axis`` (int or tuple) into one trailing dim:
    returns (rows (R, N), restore) where ``restore`` undoes the
    moveaxis+reshape on a same-shaped result."""
    if not isinstance(axis, (tuple, list)):
        axis = (axis,)
    tmp_axis = tuple(-i - 1 for i in range(len(axis)))
    moved = jnp.moveaxis(x, axis, tmp_axis)
    shape = moved.shape
    lead = shape[:len(shape) - len(tmp_axis)]
    rows = jnp.reshape(moved, (
        int(np.prod(lead, dtype=np.int64)),
        int(np.prod(shape[len(lead):], dtype=np.int64)),
    ))

    def restore(result):
        return jnp.moveaxis(result.reshape(shape), tmp_axis, axis)

    return rows, restore


def voiced_unvoiced_split_characteristic(
        frequency_bins: int,
        split_bin: Optional[int] = None,
        width: Optional[int] = None,
):
    """Voiced/unvoiced frequency weighting (reference :53-87).

    Returns (voiced, unvoiced) masks over frequency with a raised-cosine
    transition of ``width`` bins centered near ``split_bin``.
    """
    if split_bin is None:
        split_bin = frequency_bins // 2
    if width is None:
        width = frequency_bins // 5

    transition = 0.5 * (
        1 + np.cos(np.pi / (width - 1) * np.arange(0, width)))
    start = int(split_bin - width / 2)

    voiced = np.ones(frequency_bins)
    voiced[start - 1:(start + width - 1)] = transition
    voiced[start - 1 + width:] = 0
    unvoiced = 1 - voiced
    return voiced, unvoiced


def ideal_binary_mask(
        signal,
        source_axis: int = 0,
        sensor_axis: Optional[int] = None,
        keepdims: bool = False,
):
    """Binary mask: 1 for the strongest source per T-F bin [Erdogan2015]
    (reference :90-136). Masks sum to one over sources.

    >>> import numpy as np, jax.numpy as jnp
    >>> signal = jnp.array([[3 + 0j, 1j], [1 + 0j, 2j]])  # (K=2, T=2)
    >>> np.asarray(ideal_binary_mask(signal), np.float64)
    array([[1., 0.],
           [0., 1.]])
    """
    signal = jnp.asarray(signal)
    components = signal.shape[source_axis]
    dtype = _real_dtype(signal)
    mask = _pool_sensor_power(abs_square(signal), sensor_axis)

    range_dimensions = signal.ndim * [1]
    range_dimensions[source_axis] = components
    mask = jnp.expand_dims(jnp.argmax(mask, axis=source_axis), source_axis)
    mask = mask == jnp.reshape(jnp.arange(components), range_dimensions)
    return _drop_pooled_axis(mask, sensor_axis, keepdims).astype(dtype)


def wiener_like_mask(
        signal,
        source_axis: int = 0,
        sensor_axis: Optional[int] = None,
        eps: float = EPS,
        keepdims: bool = False,
):
    """Soft mask: source power / total power [Erdogan2015]
    (reference :139-179).

    >>> import numpy as np, jax.numpy as jnp
    >>> signal = jnp.array([[2 + 0j, 0j], [0j, 1 + 0j]])  # (K=2, T=2)
    >>> np.asarray(wiener_like_mask(signal), np.float64).round(6)
    array([[1., 0.],
           [0., 1.]])
    """
    signal = jnp.asarray(signal)
    mask = _pool_sensor_power(abs_square(signal), sensor_axis)
    mask = mask / (mask.sum(source_axis, keepdims=True) + eps)
    return _drop_pooled_axis(mask, sensor_axis, keepdims)


def ideal_ratio_mask(
        signal,
        source_axis: int = 0,
        sensor_axis: Optional[int] = None,
        eps: float = EPS,
):
    """Soft mask: source magnitude / summed magnitudes
    (reference :182-232)."""
    signal = jnp.asarray(signal)
    assert sensor_axis is None, _SENSOR_AXIS_MESSAGE
    mask = jnp.abs(signal)
    mask = mask / (mask.sum(source_axis, keepdims=True) + eps)
    return mask


def ideal_amplitude_mask(
        signal,
        source_axis: int = 0,
        sensor_axis: Optional[int] = None,
        eps: float = EPS,
):
    """Source magnitude / magnitude of the mixture (reference :235-287)."""
    signal = jnp.asarray(signal)
    assert sensor_axis is None, _SENSOR_AXIS_MESSAGE
    amplitude = jnp.abs(signal)
    amplitude_of_sum = jnp.abs(
        jnp.sum(signal, source_axis, keepdims=True))
    return amplitude / (amplitude_of_sum + eps)


def phase_sensitive_mask(
        signal,
        source_axis: int = 0,
        sensor_axis: Optional[int] = None,
        eps: float = EPS,
):
    """|S|/|Y| * cos(angle(S) - angle(Y)) [Erdogan2015]
    (reference :290-322)."""
    signal = jnp.asarray(signal)
    assert sensor_axis is None, _SENSOR_AXIS_MESSAGE
    observed = jnp.sum(signal, axis=source_axis, keepdims=True)
    theta = jnp.angle(signal) - jnp.angle(observed)
    mask = jnp.abs(signal) / (jnp.abs(observed) + eps)
    return mask * jnp.cos(theta)


def ideal_complex_mask(
        signal,
        source_axis: int = 0,
        sensor_axis: Optional[int] = None,
):
    """Complex mask S / Y [Erdogan2015] (reference :325-347)."""
    signal = jnp.asarray(signal)
    assert sensor_axis is None, _SENSOR_AXIS_MESSAGE
    observed = jnp.sum(signal, axis=source_axis, keepdims=True)
    return signal / observed


def lorenz_mask(
        signal,
        *,
        sensor_axis=None,
        axis=(-2, -1),
        lorenz_fraction: float = 0.98,
        weight: float = 0.999,
        keepdims: bool = False,
):
    """Softened mask by the Lorenz-function energy criterion
    (reference :350-417).

    A T-F bin is active when its power exceeds the smallest power still
    inside the top ``lorenz_fraction`` of the cumulative (sorted
    descending) power distribution over ``axis``.

    TPU realization: the per-row ``get_mask`` loop of the reference
    (:399-407) is one batched descending sort + cumsum + masked min.
    """
    signal = jnp.asarray(signal)
    power = _pool_sensor_power(abs_square(signal), sensor_axis)
    power, restore = _flatten_rows(power, axis)

    sorted_power = jnp.sort(power, axis=-1)[:, ::-1]
    lorenz_function = jnp.cumsum(sorted_power, axis=-1) / jnp.maximum(
        jnp.sum(sorted_power, axis=-1, keepdims=True),
        jnp.finfo(power.dtype).tiny,
    )
    below = lorenz_function < lorenz_fraction
    threshold = jnp.min(
        jnp.where(below, sorted_power, jnp.inf), axis=-1, keepdims=True)
    mask = restore(_soften(
        (power > threshold).astype(power.dtype), weight))
    return _drop_pooled_axis(mask, sensor_axis, keepdims)


def quantile_mask(
        signal,
        quantile=(0.1, -0.9),
        *,
        sensor_axis=None,
        axis=-2,
        weight: float = 0.999,
):
    """Threshold mask at a magnitude quantile (reference :420-493).

    Positive quantile selects the loudest fraction (speech), negative
    the quietest (noise). A tuple of quantiles returns stacked masks
    with a new leading axis.

    TPU realization: batched ``jnp.quantile`` (linear interpolation,
    matching ``np.percentile``) instead of the per-row loop (:481-487).

    >>> import numpy as np, jax.numpy as jnp
    >>> signal = jnp.arange(10.0) + 0j  # one row of magnitudes 0..9
    >>> speech, noise = quantile_mask(signal[None, :], axis=-1)
    >>> np.asarray(speech > 0.5, np.int64)  # loudest 10%
    array([[0, 0, 0, 0, 0, 0, 0, 0, 0, 1]])
    >>> np.asarray(noise > 0.5, np.int64)   # quietest 90%
    array([[1, 1, 1, 1, 1, 1, 1, 1, 1, 0]])
    """
    signal = jnp.abs(jnp.asarray(signal))
    assert sensor_axis is None, _SENSOR_AXIS_MESSAGE

    if isinstance(quantile, (tuple, list)):
        return jnp.stack([
            quantile_mask(
                signal=signal, sensor_axis=sensor_axis, axis=axis,
                quantile=q, weight=weight)
            for q in quantile
        ])

    signal, restore = _flatten_rows(signal, axis)

    if quantile >= 0:
        threshold = jnp.quantile(signal, 1 - quantile, axis=-1)
        mask = signal > threshold[:, None]
    else:
        threshold = jnp.quantile(signal, abs(quantile), axis=-1)
        mask = signal < threshold[:, None]
    return restore(_soften(mask.astype(signal.dtype), weight))


def biased_binary_mask(
        signal,
        component_axis: int = 0,
        sensor_axis: Optional[int] = None,
        frequency_axis: int = -1,
        threshold_unvoiced_speech: int = 5,
        threshold_voiced_speech: int = 0,
        threshold_unvoiced_noise: int = -10,
        threshold_voiced_noise: int = -10,
        low_cut: int = 5,
        high_cut: int = 500,
):
    """Thresholded speech/noise masks with a voiced/unvoiced frequency
    split (reference :496-550). ``signal``: (2, ..., F) stacked
    (speech_image, noise_image)."""
    signal = jnp.asarray(signal)
    components = signal.shape[component_axis]
    assert components == 2, 'Only works for one speaker and noise.'
    if sensor_axis is not None:
        raise NotImplementedError()

    voiced, unvoiced = voiced_unvoiced_split_characteristic(
        signal.shape[frequency_axis])
    threshold_speech = (
        threshold_voiced_speech * voiced
        + threshold_unvoiced_speech * unvoiced
    )
    threshold_noise = (
        threshold_unvoiced_noise * voiced
        + threshold_voiced_noise * unvoiced
    )

    power = abs_square(signal)
    speech_power, noise_power = jnp.split(power, 2, axis=component_axis)

    power_threshold_speech = speech_power / 10 ** (threshold_speech / 10)
    power_threshold_noise = speech_power / 10 ** (threshold_noise / 10)

    speech_mask = power_threshold_speech > noise_power
    noise_mask = power_threshold_noise < noise_power

    speech_mask = jnp.logical_and(
        speech_mask, power_threshold_speech > 0.005)
    noise_mask = jnp.logical_or(
        noise_mask, power_threshold_noise < 0.005)

    # frequency band gating (frequency on the trailing axis)
    f = signal.shape[frequency_axis]
    fidx = jnp.arange(f)
    in_band = (fidx >= low_cut - 1) & (fidx < high_cut)
    speech_mask = jnp.where(in_band, speech_mask, False)
    noise_mask = jnp.where(in_band, noise_mask, True)

    return jnp.concatenate([speech_mask, noise_mask], axis=component_axis)
