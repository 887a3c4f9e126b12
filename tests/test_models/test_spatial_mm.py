"""Golden end-to-end regression: STFT -> EM -> DHTV PA -> mask ->
iSTFT -> metrics on deterministic synthetic speech data.

Mirrors /root/reference/tests/test_distribution/test_spatial_mm.py.
The reference pins exact SDR gains on downloaded real audio; this
framework generates its audio synthetically (pb_bss_tpu.testing.
dummy_data).  The absolute thresholds here are a fast random-init
smoke tier; the *quality-parity proof* is test_head_to_head.py, which
runs the reference's own NumPy pipeline on the same audio with the
same initialization and asserts repo Delta-SDR >= reference - 0.5 dB
(the cACGMM masks agree to ~1e-11).
"""
import jax
import numpy as np
import pytest

from pb_bss_tpu.evaluation.wrapper import InputMetrics, OutputMetrics
from pb_bss_tpu.models import CACGMMTrainer, CBMMTrainer, CWMMTrainer
from pb_bss_tpu.permutation_alignment import DHTVPermutationAlignment
from pb_bss_tpu.testing.dummy_data import (
    low_reverberation_data,
    reverberation_data,
)
from pb_bss_tpu.transform import stft as _stft, istft as _istft


def stft(signal):
    return np.asarray(_stft(signal, 512, 128))


def istft(signal, num_samples):
    return np.asarray(
        _istft(np.asarray(signal), 512, 128))[..., :num_samples]


def trainer_on_simulated_speech_data(
        Trainer=CACGMMTrainer,
        iterations=40,
        reverberation=False,
):
    reference_channel = 0
    sample_rate = 8000

    ex = reverberation_data() if reverberation \
        else low_reverberation_data()
    observation = ex['audio_data']['observation']
    Observation = stft(observation)
    num_samples = observation.shape[-1]

    Y_mm = np.ascontiguousarray(
        np.einsum('dtf->ftd', Observation))

    t = Trainer()
    affiliation = np.asarray(t.fit(
        Y_mm,
        num_classes=3,
        iterations=iterations * 2,
        weight_constant_axis=-1,
        key=jax.random.key(0),
    ).predict(Y_mm))

    pa = DHTVPermutationAlignment.from_stft_size(512)
    affiliation_pa = np.asarray(pa(
        np.einsum('fkt->kft', affiliation)))
    affiliation_pa = np.einsum('kft->ktf', affiliation_pa)

    estimated_images = Observation[reference_channel] * affiliation_pa
    speech_image_0_est = istft(estimated_images[0], num_samples)
    speech_image_1_est = istft(estimated_images[1], num_samples)
    noise_image_est = istft(estimated_images[2], num_samples)

    speech_image = ex['audio_data']['speech_image']
    noise_image = ex['audio_data']['noise_image']
    speech_source = ex['audio_data']['speech_source']

    Speech_image = stft(speech_image)
    Noise_image = stft(noise_image)

    Speech_contribution = \
        Speech_image[:, reference_channel, None] * affiliation_pa
    Noise_contribution = Noise_image[reference_channel] * affiliation_pa

    speech_contribution = istft(Speech_contribution, num_samples)
    noise_contribution = istft(Noise_contribution, num_samples)

    input_metric = InputMetrics(
        observation=observation,
        speech_source=speech_source,
        speech_image=speech_image,
        noise_image=noise_image,
        sample_rate=sample_rate,
    )
    output_metric = OutputMetrics(
        speech_prediction=np.array(
            [speech_image_0_est, speech_image_1_est, noise_image_est]),
        speech_source=speech_source,
        speech_contribution=speech_contribution,
        noise_contribution=noise_contribution,
        sample_rate=sample_rate,
    )
    return {
        'invasive_sxr_sdr':
            output_metric.invasive_sxr['sdr']
            - input_metric.invasive_sxr['sdr'][:, reference_channel],
        'mir_eval_sxr_sdr':
            output_metric.mir_eval['sdr']
            - input_metric.mir_eval['sdr'][:, reference_channel],
    }


def test_cacgmm():
    scores = trainer_on_simulated_speech_data(CACGMMTrainer)
    assert np.all(scores['invasive_sxr_sdr'] > 8), scores
    assert np.all(scores['mir_eval_sxr_sdr'] > 5), scores

    scores = trainer_on_simulated_speech_data(
        CACGMMTrainer, reverberation=True)
    assert np.all(scores['invasive_sxr_sdr'] > 4), scores
    assert np.all(scores['mir_eval_sxr_sdr'] > 2), scores


def test_cwmm():
    scores = trainer_on_simulated_speech_data(CWMMTrainer)
    assert np.all(scores['invasive_sxr_sdr'] > 8), scores
    assert np.all(scores['mir_eval_sxr_sdr'] > 2), scores


def test_cbmm_smoke():
    """Bingham is slow -> 2 iterations, executable check
    (reference test_spatial_mm.py:140-149 does the same)."""
    scores = trainer_on_simulated_speech_data(CBMMTrainer, iterations=1)
    assert np.all(np.isfinite(scores['invasive_sxr_sdr'])), scores
    assert np.all(np.isfinite(scores['mir_eval_sxr_sdr'])), scores


@pytest.mark.slow
def test_beamforming_pipeline():
    """EM masks -> PSD -> GEV+BAN / MVDR-Souden beamforming must beat
    the raw observation (extraction-path integration test,
    reference notebook pipeline)."""
    from pb_bss_tpu.extraction import (
        apply_beamforming_vector,
        get_bf_vector,
        get_power_spectral_density_matrix,
    )

    ex = low_reverberation_data()
    observation = ex['audio_data']['observation']
    speech_source = ex['audio_data']['speech_source']
    Observation = stft(observation)
    num_samples = observation.shape[-1]
    Y_mm = np.ascontiguousarray(np.einsum('dtf->ftd', Observation))

    affiliation = np.asarray(CACGMMTrainer().fit(
        Y_mm, num_classes=3, iterations=40,
        key=jax.random.key(0),
    ).predict(Y_mm))
    pa = DHTVPermutationAlignment.from_stft_size(512)
    affiliation_pa = np.asarray(pa(np.einsum('fkt->kft', affiliation)))

    Y_fdt = np.einsum('dtf->fdt', Observation)
    psds = np.asarray(get_power_spectral_density_matrix(
        Y_fdt, np.einsum('kft->fkt', affiliation_pa)))  # (F, K, D, D)

    # class labels are arbitrary (the noise class may be any index) ->
    # beamform every class and match speakers afterwards
    predictions = []
    for k in range(psds.shape[1]):
        phi_xx = psds[:, k]
        phi_nn = psds.sum(1) - phi_xx
        for bf in ['gev+ban', 'mvdr_souden']:
            w = np.asarray(get_bf_vector(bf, phi_xx, phi_nn))
            x_hat = np.asarray(apply_beamforming_vector(w, Y_fdt))
            predictions.append(istft(x_hat.T, num_samples))

    # Each speaker must be recovered well by at least one beamformer.
    # BSS-Eval SDR (512-tap projection) absorbs the propagation
    # delay/filtering that would dominate a time-aligned metric.
    from pb_bss_tpu.evaluation import bss_eval_sources
    best = []
    for k in range(2):
        scores = []
        for pred in predictions:
            sdr, *_ = bss_eval_sources(
                speech_source, np.stack([pred, pred]),
                compute_permutation=False)
            scores.append(sdr[k])
        best.append(max(scores))
    assert np.all(np.asarray(best) > 5), best
