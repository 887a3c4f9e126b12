"""End-to-end separation example (script version of the reference's
examples/mixture_model_example.ipynb).

Pipeline: synthetic 2-speaker 6-channel mixture -> STFT -> cACGMM EM ->
DHTV permutation alignment -> (a) mask-based extraction and
(b) GEV beamforming -> metrics.

Device stages run through :func:`pb_bss_tpu.utils.run_on_device`, which
compiles each stage as one program with a transfer-safe (real-pair)
host boundary — required on TPU backends that cannot move complex
buffers across the host boundary.

Run: python examples/mixture_model_example.py [--reverb]
"""
import argparse
import pathlib
import sys

# allow running the script directly from a repo checkout
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pb_bss_tpu.utils import run_on_device
from pb_bss_tpu.distribution import CACGMMTrainer
from pb_bss_tpu.evaluation import InputMetrics, OutputMetrics
from pb_bss_tpu.extraction import (
    apply_beamforming_vector,
    get_bf_vector,
    get_power_spectral_density_matrix,
)
from pb_bss_tpu.permutation_alignment import DHTVPermutationAlignment
from pb_bss_tpu.testing.dummy_data import (
    low_reverberation_data,
    reverberation_data,
)
from pb_bss_tpu.transform import istft, stft


def main(reverb=False, iterations=80):
    ex = reverberation_data() if reverb else low_reverberation_data()
    observation = ex['observation'].astype(np.float32)   # (D, N)
    speech_source = ex['speech_source']                  # (K, N)
    sample_rate = ex['sample_rate']
    num_samples = observation.shape[-1]

    # --- stage 1: STFT + EM + posterior (one compiled program) ---------
    def em_stage(observation):
        Observation = stft(observation, 512, 128)        # (D, T, F)
        Y = jnp.einsum('dtf->ftd', Observation)          # (F, T, D)
        model = CACGMMTrainer().fit(
            Y, num_classes=3, iterations=iterations,
            key=jax.random.key(0))
        return Observation, model.predict(Y)             # ..., (F, K, T)

    Observation, affiliation = run_on_device(em_stage, observation)

    # --- stage 2: frequency permutation alignment (real masks) ---------
    pa = DHTVPermutationAlignment.from_stft_size(512)
    masks = run_on_device(
        lambda a: pa(a), np.einsum('fkt->kft', affiliation))  # (K, F, T)

    # --- stage 3a: mask-based extraction --------------------------------
    def mask_stage(Observation, masks):
        masked = jnp.einsum('kft->ktf', masks) * Observation[0]
        return istft(masked, 512, 128)

    estimates = run_on_device(
        mask_stage, Observation, masks)[..., :num_samples]

    metrics = OutputMetrics(
        speech_prediction=estimates,
        speech_source=speech_source,
        sample_rate=sample_rate,
    )
    print('mask-based extraction:')
    print('  mir_eval SDR:', np.round(metrics.mir_eval_sdr, 2), 'dB')
    print('  selection:   ', metrics.mir_eval_selection)

    # --- stage 3b: beamforming -------------------------------------------
    def beamform_stage(Observation, masks):
        Y_fdt = jnp.einsum('dtf->fdt', Observation)
        psds = get_power_spectral_density_matrix(
            Y_fdt, jnp.einsum('kft->fkt', masks))        # (F, K, D, D)
        outs = []
        for k in range(3):
            phi_xx = psds[:, k]
            phi_nn = psds.sum(1) - phi_xx
            w = get_bf_vector('gev+ban', phi_xx, phi_nn)
            x_hat = apply_beamforming_vector(w, Y_fdt)
            outs.append(istft(x_hat.T, 512, 128))
        return jnp.stack(outs)

    beamformed = run_on_device(
        beamform_stage, Observation, masks)[..., :num_samples]

    metrics_bf = OutputMetrics(
        speech_prediction=beamformed,
        speech_source=speech_source,
        sample_rate=sample_rate,
    )
    print('GEV+BAN beamforming:')
    print('  mir_eval SDR:', np.round(metrics_bf.mir_eval_sdr, 2), 'dB')

    # --- input metrics for reference -------------------------------------
    input_metrics = InputMetrics(
        observation=observation,
        speech_source=speech_source,
        sample_rate=sample_rate,
    )
    print('unprocessed observation (channel mean):')
    print('  mir_eval SDR:',
          np.round(input_metrics.mir_eval_sdr.mean(-1), 2), 'dB')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--reverb', action='store_true')
    parser.add_argument('--iterations', type=int, default=80)
    args = parser.parse_args()
    main(reverb=args.reverb, iterations=args.iterations)
