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
    'initialize_distributed',
    'make_mesh',
    'shard_frequencies',
    'shard_batch_and_frequencies',
    'shard_batch_from_process_local',
    'fit_cacgmm_sharded',
    'fit_integration_sharded',
]


def initialize_distributed(
        coordinator_address=None,
        num_processes=None,
        process_id=None,
        *,
        local_device_count=None,
        platform=None,
):
    """Multi-host (DCN) entry point: join this process to a
    multi-controller JAX job, after which ``jax.devices()`` is GLOBAL
    and :func:`make_mesh` builds meshes spanning all hosts.

    The intended layout follows SURVEY §2.4/§5: the utterance batch
    axis ``'b'`` spans hosts (DCN — the EM is data-parallel over
    utterances, so no per-iteration traffic crosses hosts except the
    tiny frequency-constant-weight psum), and ``'f'`` spans the
    devices within each host/slice (ICI). Place per-host utterances
    with :func:`shard_batch_from_process_local`.

    On TPU pods the three arguments are usually discovered from the
    environment — call with no arguments. For an explicit job (or the
    two-process CPU simulation in ``scripts/dcn_dryrun.py``):

    Args:
        coordinator_address: ``'host:port'`` of process 0.
        num_processes / process_id: job size and this process's rank.
        local_device_count: for CPU simulation, the number of virtual
            devices this process contributes (sets
            ``jax_num_cpu_devices``; must run before the backend
            initializes).
        platform: optionally pin ``jax_platforms`` (e.g. ``'cpu'``)
            before initialization — environment variables may already
            be snapshotted by the time user code runs, so the config
            update here is the reliable route.
    """
    if platform is not None:
        jax.config.update('jax_platforms', platform)
    if local_device_count is not None:
        jax.config.update('jax_num_cpu_devices', int(local_device_count))
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def shard_batch_from_process_local(local_batch, mesh, *,
                                   batch_axis=0, frequency_axis=1):
    """Assemble a GLOBAL ('b', 'f')-sharded array from this process's
    local utterances (multi-controller: each host passes only its own
    batch slice; the 'b' axis concatenates across processes in rank
    order)."""
    local_batch = np.asarray(local_batch)
    spec = [None] * local_batch.ndim
    spec[batch_axis] = 'b'
    spec[frequency_axis] = 'f'
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(*spec)), local_batch)


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
