"""Device-mesh parallelism for the BSS pipeline.

The reference is single-process NumPy; its only parallel structure is
the "independent dims" broadcast over frequency bins and utterances
(SURVEY.md §2.4). Here those axes become *mesh axes*:

* ``'f'`` — frequency bins (513 for a 512-pt STFT): embarrassingly
  parallel through the whole EM/extraction pipeline. Sharding over
  ``'f'`` is the sequence-parallel axis of BSS.
* ``'b'`` — utterance batch: the data-parallel axis (DCN for
  multi-host, ICI within a slice).

Every op in the framework broadcasts over leading dims, so GSPMD
propagates these shardings through the jitted EM loop untouched; the
only cross-shard communication is a ``psum`` over ``'f'`` when
``weight_constant_axis`` spans the frequency axis (frequency-constant
mixture weights), which XLA inserts automatically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    'make_mesh',
    'shard_frequencies',
    'shard_batch_and_frequencies',
    'fit_cacgmm_sharded',
    'fit_integration_sharded',
]


def make_mesh(mesh_shape=None, axis_names=None, devices=None):
    """Build a device mesh.

    Args:
        mesh_shape: tuple of ints, e.g. ``(2, 4)``; default: all devices
            on one ``'f'`` axis.
        axis_names: tuple of axis names matching ``mesh_shape``;
            default ``('f',)`` for 1D, ``('b', 'f')`` for 2D.
        devices: optional explicit device list.
    """
    if devices is None:
        devices = jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    if axis_names is None:
        axis_names = ('f',) if len(mesh_shape) == 1 else ('b', 'f')
    assert len(mesh_shape) == len(axis_names), (mesh_shape, axis_names)
    n = int(np.prod(mesh_shape))
    mesh_devices = np.asarray(devices[:n]).reshape(mesh_shape)
    return Mesh(mesh_devices, axis_names)


def shard_frequencies(y, mesh, *, frequency_axis=0):
    """Place an array so its frequency axis is split over the ``'f'``
    mesh axis; all other axes replicated."""
    spec = [None] * jnp.asarray(y).ndim
    spec[frequency_axis] = 'f'
    return jax.device_put(y, NamedSharding(mesh, P(*spec)))


def shard_batch_and_frequencies(y, mesh, *, batch_axis=0, frequency_axis=1):
    """Shard (batch, frequency, ...) arrays over a 2D ('b', 'f') mesh."""
    spec = [None] * jnp.asarray(y).ndim
    spec[batch_axis] = 'b'
    spec[frequency_axis] = 'f'
    return jax.device_put(y, NamedSharding(mesh, P(*spec)))


def fit_cacgmm_sharded(
        y,
        mesh,
        *,
        num_classes=None,
        initialization=None,
        iterations=100,
        frequency_axis=0,
        **fit_kwargs,
):
    """Run the cACGMM EM with the frequency axis sharded over ``mesh``.

    The trainer itself is unchanged — one jitted ``lax.scan`` program.
    GSPMD partitions every E/M-step op along the sharded frequency axis;
    per-device work is F/n_devices bins. Returns the fitted model with
    sharded parameters (frequency axis of the cACG covariances).

    Args:
        y: (..., F, T, D) complex observations; ``frequency_axis``
            indexes F among the leading (independent) dims.
    """
    from ..models.cacgmm import CACGMMTrainer

    y = shard_frequencies(jnp.asarray(y), mesh,
                          frequency_axis=frequency_axis)
    return CACGMMTrainer().fit(
        y,
        initialization=initialization,
        num_classes=num_classes,
        iterations=iterations,
        **fit_kwargs,
    )


def fit_integration_sharded(
        observation,
        embedding,
        mesh,
        *,
        model='vmfcacgmm',
        num_classes=None,
        initialization=None,
        iterations=100,
        frequency_axis=0,
        **fit_kwargs,
):
    """Run an integration-model EM (vMF x cACG or Gaussian x cACG)
    with the frequency axis sharded over ``mesh``.

    Unlike the spatial-only mixtures, the spectral M-step reduces
    over ALL frequencies (global vMF resultants / Gaussian moments,
    reference vmfcacgmm.py:280-284) — under an ``'f'``-sharded mesh
    that reduction is a cross-shard ``psum`` over ICI, which GSPMD
    inserts automatically from the unchanged trainer program; the
    per-frequency cACG M-step stays shard-local.

    Args:
        observation: (F, T, D) complex; embedding: (F, T, E) real.
        model: 'vmfcacgmm' | 'gcacgmm'.
    """
    if model == 'vmfcacgmm':
        from ..models.vmfcacgmm import VMFCACGMMTrainer as Trainer
    elif model == 'gcacgmm':
        from ..models.gcacgmm import GCACGMMTrainer as Trainer
    else:
        raise ValueError(model)
    observation = shard_frequencies(
        jnp.asarray(observation), mesh, frequency_axis=frequency_axis)
    embedding = shard_frequencies(
        jnp.asarray(embedding), mesh, frequency_axis=frequency_axis)
    return Trainer().fit(
        observation,
        embedding,
        initialization=initialization,
        num_classes=num_classes,
        iterations=iterations,
        **fit_kwargs,
    )
