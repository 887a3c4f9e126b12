"""High-level separation pipeline.

The reference leaves pipeline assembly to the user (notebook
examples/mixture_model_example.ipynb); this module packages the
standard recipe — STFT -> cACGMM EM -> DHTV permutation alignment ->
mask-based extraction or beamforming -> iSTFT — as one jittable
function, so a whole utterance (or a vmapped batch) runs as a single
compiled TPU program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .extraction.beamformer import (
    apply_beamforming_vector,
    get_power_spectral_density_matrix,
    phase_correction,
)
from .extraction.beamformer_wrapper import get_bf_vector
from .models.cacgmm import CACGMMTrainer
from .permutation_alignment import DHTVPermutationAlignment
from .transform import istft, stft

__all__ = ['separate', 'separate_batch']


@functools.partial(
    jax.jit,
    static_argnames=(
        'num_classes', 'iterations', 'stft_size', 'stft_shift',
        'beamformer', 'reference_channel', 'eigh_sweeps', 'model',
        'mesh', 'refine', 'refine_iterations',
    ),
)
def separate(
        observation,
        *,
        num_classes=3,
        iterations=80,
        stft_size=512,
        stft_shift=128,
        beamformer=None,
        reference_channel=0,
        key=None,
        eigh_sweeps=None,
        model='cacgmm',
        mesh=None,
        refine=None,
        refine_iterations=20,
):
    """Blind source separation of a multichannel recording.

    Args:
        observation: (D, num_samples) real multichannel time signal.
        num_classes: number of mixture components (speakers + noise).
        iterations: EM iterations.
        beamformer: None for mask-based extraction at
            ``reference_channel``, or a ``get_bf_vector`` name (e.g.
            ``'gev+ban'``, ``'mvdr_souden'``) applied per class with
            the summed other classes as noise.
        key: jax PRNG key for the EM initialization.
        eigh_sweeps: optional speed knob for the EM eigendecomposition.
        model: spatial mixture model family: ``'cacgmm'`` (default),
            ``'cwmm'`` (complex Watson) or ``'cbmm'`` (complex
            Bingham) — the three spatial models of the reference's
            end-to-end tests (test_spatial_mm.py).
        mesh: optional ``jax.sharding.Mesh`` with an ``'f'`` axis:
            the STFT output is sharding-constrained so GSPMD
            partitions the whole EM/PA/beamforming pipeline over
            frequency bins (sequence parallelism; under
            ``vmap(spmd_axis_name='b')`` the batch axis composes).
        refine: ``'fca'`` replaces the mask/beamformer extraction
            with a full-rank Wiener stage: the aligned EM masks
            warm-start a jointly-diagonalizable full-rank spatial
            covariance fit (:class:`~pb_bss_tpu.models.fca.FCA`) and
            the output is its Wiener source image at
            ``reference_channel`` — the production
            guided-source-separation recipe. Mutually exclusive with
            ``beamformer``.
        refine_iterations: MU/IP iterations of the refinement fit.
    Returns:
        (num_classes, num_samples) separated time signals (mask-based
        signals are aligned across frequency; global class order is
        arbitrary).
    """
    observation = jnp.asarray(observation)
    assert observation.ndim == 2, observation.shape
    # Validate the static-arg combination up front (before any EM
    # work is traced) so an invalid call fails immediately.
    if refine is not None:
        if refine != 'fca':
            raise ValueError(f'Unknown refine stage: {refine!r}')
        if beamformer is not None:
            raise ValueError(
                'refine and beamformer are mutually exclusive, got '
                f'refine={refine!r}, beamformer={beamformer!r}')
    num_samples = observation.shape[-1]
    if key is None:
        key = jax.random.key(0)

    Observation = stft(observation, stft_size, stft_shift)  # (D, T, F)
    Y = jnp.einsum('dtf->ftd', Observation)
    if mesh is not None and 'f' in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P
        # One constraint suffices: every downstream op (EM scan, PA
        # score matmuls, PSD/GEV) broadcasts over the frequency axis,
        # so GSPMD propagates the 'f' partitioning end to end.
        Y = jax.lax.with_sharding_constraint(
            Y, NamedSharding(mesh, P('f', None, None)))

    # one call: on the fused-kernel paths (auto on TPU) the
    # affiliations come from the kernel's final E-step for free
    if model == 'cacgmm':
        _, affiliation = CACGMMTrainer().fit_predict_model(
            Y, num_classes=num_classes, iterations=iterations, key=key,
            eigh_sweeps=eigh_sweeps)  # (F, K, T)
    elif model == 'cwmm':
        from .models.cwmm import CWMMTrainer
        affiliation = CWMMTrainer().fit_predict(
            Y, num_classes=num_classes, iterations=iterations, key=key)
    elif model == 'cbmm':
        from .models.cbmm import CBMMTrainer
        affiliation = CBMMTrainer().fit_predict(
            Y, num_classes=num_classes, iterations=iterations, key=key)
    else:
        raise ValueError(model)

    pa = DHTVPermutationAlignment.from_stft_size(stft_size)
    features = jnp.einsum('fkt->kft', affiliation)  # (K, F, T)
    if mesh is not None and 'f' in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P
        # DHTV's alignment plan is a sequential walk over *overlapping*
        # frequency segments, so an 'f'-partitioned input would be
        # resharded once per segment (dozens of small allgathers) for
        # no compute win — the features are only (K, F, T) floats.
        # Replicate them across the 'f' axis for the alignment and
        # hand the masks back to the 'f' partitioning afterwards, so
        # the (heavy) extraction stage stays sharded. Measured on the
        # 8-device CPU mesh: identical results, and the sharded
        # pipeline keeps a single collective here instead of one per
        # plan segment (docs/DESIGN.md, "DHTV under frequency
        # sharding").
        features = jax.lax.with_sharding_constraint(
            features, NamedSharding(mesh, P()))
        masks = pa(features)
        masks = jax.lax.with_sharding_constraint(
            masks, NamedSharding(mesh, P(None, 'f', None)))
    else:
        masks = pa(features)

    if refine is not None:
        from .models.fca import FCATrainer
        fca = FCATrainer().fit(
            Y, initialization=jnp.einsum('kft->fkt', masks),
            iterations=refine_iterations)
        images = fca.separate(Y)  # (F, K, T, D)
        estimates = istft(
            jnp.einsum('fkt->ktf', images[..., reference_channel]),
            stft_size, stft_shift, num_samples=num_samples)
    elif beamformer is None:
        masked = jnp.einsum('kft->ktf', masks) \
            * Observation[reference_channel]
        estimates = istft(
            masked, stft_size, stft_shift, num_samples=num_samples)
    else:
        Y_fdt = jnp.einsum('dtf->fdt', Observation)
        psds = get_power_spectral_density_matrix(
            Y_fdt, jnp.einsum('kft->fkt', masks))  # (F, K, D, D)
        outs = []
        for k in range(num_classes):
            phi_xx = psds[:, k]
            phi_nn = psds.sum(1) - phi_xx
            w = get_bf_vector(beamformer, phi_xx, phi_nn)
            # eigenvector-based beamformers carry an arbitrary phase
            # per frequency; align phases across bins before the
            # synthesis (reference beamformer.py:517 phase_correction)
            w = phase_correction(w)
            # (F, T) -> time-major (T, F) for the synthesis
            outs.append(apply_beamforming_vector(w, Y_fdt).T)
        estimates = istft(
            jnp.stack(outs), stft_size, stft_shift,
            num_samples=num_samples)
    return estimates


@functools.partial(
    jax.jit,
    static_argnames=(
        'num_classes', 'iterations', 'stft_size', 'stft_shift',
        'beamformer', 'reference_channel', 'eigh_sweeps', 'model',
        'mesh', 'spmd_axis_name', 'refine', 'refine_iterations',
    ),
)
def _separate_batch_jit(observations, keys, *, mesh=None,
                        spmd_axis_name=None, **kwargs):
    return jax.vmap(
        lambda o, k: separate(o, key=k, mesh=mesh, **kwargs),
        spmd_axis_name=spmd_axis_name,
    )(observations, keys)


def separate_batch(
        observations,
        *,
        num_classes=3,
        iterations=80,
        stft_size=512,
        stft_shift=128,
        beamformer=None,
        reference_channel=0,
        key=None,
        eigh_sweeps=None,
        model='cacgmm',
        mesh=None,
        refine=None,
        refine_iterations=20,
):
    """Batched :func:`separate`: one fused device program for a whole
    batch of utterances (vmap over the batch axis).

    Batching amortizes per-program dispatch and keeps the TPU busy
    across the small per-utterance kernels; with ``mesh`` the batch is
    additionally sharded over the mesh's ``'b'`` axis (data parallel —
    utterances are independent, so GSPMD partitions the entire pipeline
    with zero cross-device communication). A mesh with an ``'f'`` axis
    additionally shards the per-utterance pipeline over frequency bins
    (``vmap(spmd_axis_name='b')`` composes the two): full 2D
    ('b', 'f') partitioning of stft -> EM -> PA -> beamform -> istft.

    Args:
        observations: (B, D, num_samples) real multichannel signals.
        mesh: optional ``jax.sharding.Mesh`` with a ``'b'`` axis.
        (other args as in :func:`separate`)
    Returns:
        (B, num_classes, num_samples) separated signals.
    """
    observations = jnp.asarray(observations)
    assert observations.ndim == 3, observations.shape
    batch = observations.shape[0]
    if key is None:
        key = jax.random.key(0)
    keys = jax.random.split(key, batch)
    spmd_axis_name = None
    if mesh is not None and 'b' in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P
        observations = jax.device_put(
            observations, NamedSharding(mesh, P('b', None, None)))
        keys = jax.device_put(keys, NamedSharding(mesh, P('b')))
        spmd_axis_name = 'b'
    return _separate_batch_jit(
        observations, keys,
        num_classes=num_classes, iterations=iterations,
        stft_size=stft_size, stft_shift=stft_shift,
        beamformer=beamformer, reference_channel=reference_channel,
        eigh_sweeps=eigh_sweeps, model=model,
        refine=refine, refine_iterations=refine_iterations,
        mesh=mesh if (mesh is not None
                      and 'f' in mesh.axis_names) else None,
        spmd_axis_name=spmd_axis_name)
