"""Head-to-head quality parity against the reference's own NumPy
pipeline on identical audio and identical initialization.

The reference pins exact SDR gains on downloaded real audio
(/root/reference/tests/test_distribution/test_spatial_mm.py:100-137);
no network here, so instead both pipelines — this framework's jitted
trainers and the reference's NumPy trainers (imported directly from
/root/reference via tests/_reference_loader.py) — run on the *same*
synthetic scenario with the *same* explicit initialization:

    fit (80 EM iterations) -> DHTV alignment -> mask -> metrics

and the repo's per-speaker Delta-SDR must match or beat the
reference's minus the measured run-to-run noise: every head-to-head
fits 5 extra seeds of this framework's pipeline, takes 2x the
per-speaker standard deviation of the Delta-SDR across those seeds
(floored at 0.05 dB of metric wiggle), and requires

    ours(shared init) >= reference(shared init) - 2 sigma.

Every trainer family is covered: cACGMM (where the aligned masks
additionally agree to ~1e-11, so the score bound is a formality),
CWMM (concentration interpolation differs slightly — linear vs
quadratic grid — so only the score bound holds), CBMM (the reference
smoke-tests 4 iterations because its per-bin scipy solver is slow;
same recipe here), and the GCACGMM / VMFCACGMM integration models on
a shared oracle-informed embedding standing in for a deep-clustering
network output.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, str(__import__('pathlib').Path(__file__).parents[1]))
from _reference_loader import load_reference, reference_available

from pb_bss_tpu.evaluation.wrapper import InputMetrics, OutputMetrics
from pb_bss_tpu.models import (
    CACGMMTrainer,
    CBMMTrainer,
    CWMMTrainer,
    GCACGMMTrainer,
    VMFCACGMMTrainer,
)
from pb_bss_tpu.permutation_alignment import DHTVPermutationAlignment
from pb_bss_tpu.testing.dummy_data import (
    low_reverberation_data,
    reverberation_data,
)
from pb_bss_tpu.transform import stft as _stft, istft as _istft

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason='reference checkout not available')

SIZE, SHIFT = 512, 128


@pytest.fixture(scope='module')
def ref():
    return load_reference([
        'pb_bss.distribution.cacgmm',
        'pb_bss.distribution.cwmm',
        'pb_bss.permutation_alignment',
    ])


@pytest.fixture(scope='module')
def ref2():
    return load_reference([
        'pb_bss.distribution.cbmm',
        'pb_bss.distribution.gcacgmm',
        'pb_bss.distribution.vmfcacgmm',
        'pb_bss.permutation_alignment',
    ])


def _stft_np(signal):
    return np.asarray(_stft(signal, SIZE, SHIFT))


def _istft_np(signal, num_samples):
    return np.asarray(
        _istft(np.asarray(signal), SIZE, SHIFT))[..., :num_samples]


class _Scenario:
    """One synthetic example + the mask->metric tail shared by both
    pipelines (identical metric code, so only fit+PA quality is
    compared)."""

    def __init__(self, reverberation):
        ex = (reverberation_data() if reverberation
              else low_reverberation_data())
        self.observation = ex['audio_data']['observation']
        self.num_samples = self.observation.shape[-1]
        self.Observation = _stft_np(self.observation)  # (D, T, F)
        self.Y_mm = np.ascontiguousarray(
            np.einsum('dtf->ftd', self.Observation))
        self.speech_image = ex['audio_data']['speech_image']
        self.noise_image = ex['audio_data']['noise_image']
        self.speech_source = ex['audio_data']['speech_source']
        self.Speech_image = _stft_np(self.speech_image)
        self.Noise_image = _stft_np(self.noise_image)
        self.input_metric = InputMetrics(
            observation=self.observation,
            speech_source=self.speech_source,
            speech_image=self.speech_image,
            noise_image=self.noise_image,
            sample_rate=8000,
        )
        F, T, _ = self.Y_mm.shape
        self.initialization = self.make_initialization(0)

    def make_initialization(self, seed):
        F, T, _ = self.Y_mm.shape
        rng = np.random.RandomState(seed)
        init = rng.uniform(size=(F, 3, T))
        init /= init.sum(-2, keepdims=True)
        return init

    def embedding(self, E=20, seed=11):
        """Oracle-informed (F, T, E) embedding shared by both
        pipelines — a stand-in for the deep-clustering network output
        the integration models were designed around (reference:
        gcacgmm.py:10-16): a random projection of the oracle power
        ratios plus noise, unit-normalized."""
        speech_power = np.abs(self.Speech_image[:, 0]) ** 2  # (K, T, F)
        noise_power = np.abs(self.Noise_image[0]) ** 2       # (T, F)
        power = np.concatenate(
            [speech_power, noise_power[None]])               # (3, T, F)
        ratio = power / np.maximum(power.sum(0), 1e-12)
        rng = np.random.RandomState(seed)
        emb = np.einsum('ktf,ke->fte', ratio, rng.randn(3, E))
        emb += 0.3 * rng.randn(*emb.shape)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        return emb

    def delta_sdr(self, affiliation_pa_kft):
        """Mask the reference channel, resynthesize, and return the
        per-speaker SDR gain over the observation."""
        a = np.einsum('kft->ktf', affiliation_pa_kft)
        estimated = self.Observation[0] * a
        prediction = np.array([
            _istft_np(estimated[k], self.num_samples) for k in range(3)
        ])
        Speech_contribution = self.Speech_image[:, 0, None] * a
        Noise_contribution = self.Noise_image[0] * a
        output_metric = OutputMetrics(
            speech_prediction=prediction,
            speech_source=self.speech_source,
            speech_contribution=_istft_np(
                Speech_contribution, self.num_samples),
            noise_contribution=_istft_np(
                Noise_contribution, self.num_samples),
            sample_rate=8000,
        )
        return {
            'invasive': (
                output_metric.invasive_sxr['sdr']
                - self.input_metric.invasive_sxr['sdr'][:, 0]),
            'mir_eval': (
                output_metric.mir_eval['sdr']
                - self.input_metric.mir_eval['sdr'][:, 0]),
        }


def _measure_sigma(sc, run_from_init, n_seeds=5):
    """Run-to-run spread of this framework's pipeline: per-speaker
    standard deviation of the Delta-SDR across ``n_seeds`` random
    initializations.  Returns {metric: 2 sigma} tolerances, floored at
    0.05 dB (metric-level wiggle)."""
    per_seed = [
        sc.delta_sdr(run_from_init(sc.make_initialization(1000 + seed)))
        for seed in range(n_seeds)
    ]
    return {
        key: np.maximum(
            2.0 * np.std([s[key] for s in per_seed], axis=0), 0.05)
        for key in ('invasive', 'mir_eval')
    }


def _assert_matches_or_beats(scores_ours, scores_ref, tol_db):
    """tol_db: scalar or {metric: per-speaker array} from
    ``_measure_sigma``."""
    for key in ('invasive', 'mir_eval'):
        ours, theirs = scores_ours[key], scores_ref[key]
        tol = tol_db[key] if isinstance(tol_db, dict) else tol_db
        assert np.all(ours >= theirs - tol), (
            f'{key}: ours={ours} vs reference={theirs} (tol={tol})')


def _run_ours(Trainer, sc, iterations=80, initialization=None):
    model = Trainer().fit(
        sc.Y_mm,
        initialization=(sc.initialization if initialization is None
                        else initialization),
        iterations=iterations,
        weight_constant_axis=-1,
    )
    affiliation = np.asarray(model.predict(sc.Y_mm))
    pa = DHTVPermutationAlignment.from_stft_size(SIZE)
    return np.asarray(pa(np.einsum('fkt->kft', affiliation)))


def _run_reference(trainer, pa_module, sc, iterations=80):
    model = trainer.fit(
        sc.Y_mm,
        initialization=sc.initialization.copy(),
        iterations=iterations,
        weight_constant_axis=-1,
    )
    affiliation = model.predict(sc.Y_mm)
    pa = pa_module.DHTVPermutationAlignment.from_stft_size(SIZE)
    return pa(np.einsum('fkt->kft', affiliation))


@pytest.mark.slow
@pytest.mark.parametrize('reverberation', [False, True])
def test_cacgmm_head_to_head(ref, reverberation):
    sc = _Scenario(reverberation)
    masks_ours = _run_ours(CACGMMTrainer, sc)
    masks_ref = _run_reference(
        ref['pb_bss.distribution.cacgmm'].CACGMMTrainer(),
        ref['pb_bss.permutation_alignment'], sc)
    # Identical init -> the whole fit+PA pipeline agrees numerically.
    np.testing.assert_allclose(masks_ours, masks_ref, atol=1e-6)
    tol = _measure_sigma(
        sc, lambda init: _run_ours(CACGMMTrainer, sc,
                                   initialization=init))
    _assert_matches_or_beats(
        sc.delta_sdr(masks_ours), sc.delta_sdr(masks_ref), tol)


@pytest.mark.slow
def test_cwmm_head_to_head(ref):
    sc = _Scenario(reverberation=False)
    masks_ours = _run_ours(CWMMTrainer, sc)
    masks_ref = _run_reference(
        ref['pb_bss.distribution.cwmm'].CWMMTrainer(),
        ref['pb_bss.permutation_alignment'], sc)
    tol = _measure_sigma(
        sc, lambda init: _run_ours(CWMMTrainer, sc, initialization=init))
    _assert_matches_or_beats(
        sc.delta_sdr(masks_ours), sc.delta_sdr(masks_ref), tol)


@pytest.mark.slow
def test_cbmm_head_to_head(ref2):
    # The reference smoke-tests 4 Bingham EM iterations because its
    # per-bin scipy solver is slow (reference test_spatial_mm.py:
    # 139-149); the head-to-head replays the same short recipe.
    sc = _Scenario(reverberation=False)
    masks_ours = _run_ours(CBMMTrainer, sc, iterations=4)
    masks_ref = _run_reference(
        ref2['pb_bss.distribution.cbmm'].CBMMTrainer(),
        ref2['pb_bss.permutation_alignment'], sc, iterations=4)
    tol = _measure_sigma(
        sc, lambda init: _run_ours(CBMMTrainer, sc, iterations=4,
                                   initialization=init))
    _assert_matches_or_beats(
        sc.delta_sdr(masks_ours), sc.delta_sdr(masks_ref), tol)


@pytest.mark.slow
def test_cbmm_long_fit_beats_short_fit():
    """What the reference cannot afford to test: 20 Bingham EM
    iterations (16 ms on TPU via the whole-fit kernel; the reference's
    per-bin scipy solver makes this impractical, hence its 4-iteration
    smoke). Measured on this scenario: the longer fit improves the
    MEAN Delta-SDR on both metrics (invasive -2.49 -> -1.11 dB,
    mir_eval -6.02 -> -4.22 dB) but is NOT per-speaker monotone
    (speaker 1 gains ~3 dB while speaker 0 loses ~0.4/3.9 dB) — the
    per-frequency Bingham EM reallocates ambiguous bins between
    classes as concentrations sharpen. The assertion pins the mean
    improvement; the per-speaker fix is the warm-start recipe pinned
    by ``test_cbmm_warm_start_per_speaker`` below."""
    sc = _Scenario(reverberation=False)
    short = sc.delta_sdr(_run_ours(CBMMTrainer, sc, iterations=4))
    long = sc.delta_sdr(_run_ours(CBMMTrainer, sc, iterations=20))
    for key in ('invasive', 'mir_eval'):
        assert np.mean(long[key]) > np.mean(short[key]), (
            key, long[key], short[key])


@pytest.mark.slow
def test_cbmm_warm_start_per_speaker():
    """Round-5 fix for the per-speaker non-monotonicity above: warm
    start the CBMM from cACGMM posterior masks (the models/fca.py
    recipe). Measured (scripts/cbmm_warmstart_experiment.py): random
    init gives [-2.6, -2.4] dB invasive at 4 iterations and loses
    speaker 0 at 20; warm start gives ~[14.5, 11.9] at ANY iteration
    count, and 20 vs 4 warm iterations moves each speaker <= ~0.3 dB
    — no per-speaker collapse. Pinned: (a) warm start beats random
    init for EVERY speaker on both metrics by > 5 dB, (b) the long
    warm fit stays within 0.5 dB of the short one per speaker."""
    sc = _Scenario(reverberation=False)
    cacg = CACGMMTrainer().fit(
        sc.Y_mm, initialization=sc.initialization, iterations=20,
        weight_constant_axis=-1)
    aff_cacg = np.asarray(cacg.predict(sc.Y_mm))
    random4 = sc.delta_sdr(_run_ours(CBMMTrainer, sc, iterations=4))
    warm4 = sc.delta_sdr(_run_ours(
        CBMMTrainer, sc, iterations=4, initialization=aff_cacg))
    warm20 = sc.delta_sdr(_run_ours(
        CBMMTrainer, sc, iterations=20, initialization=aff_cacg))
    for key in ('invasive', 'mir_eval'):
        assert np.all(warm4[key] > random4[key] + 5.0), (
            key, warm4[key], random4[key])
        assert np.all(np.abs(warm20[key] - warm4[key]) < 0.5), (
            key, warm20[key], warm4[key])


def _run_integration_ours(Trainer, sc, emb, init, iterations=40):
    affiliation = np.asarray(Trainer().fit_predict(
        sc.Y_mm, emb,
        initialization=init,
        iterations=iterations,
        weight_constant_axis=(-1,),
    ))
    return np.einsum('fkt->kft', affiliation)


@pytest.mark.slow
@pytest.mark.parametrize('family', ['gcacgmm', 'vmfcacgmm'])
def test_integration_head_to_head(ref2, family):
    """GCACGMM / VMFCACGMM on a shared oracle-informed embedding.
    The spectral model couples classes across frequency, so no
    post-hoc permutation alignment is applied (matching the
    integration models' intended use, reference gcacgmm.py:10-16)."""
    Trainer = {'gcacgmm': GCACGMMTrainer,
               'vmfcacgmm': VMFCACGMMTrainer}[family]
    ref_trainer = getattr(
        ref2[f'pb_bss.distribution.{family}'],
        {'gcacgmm': 'GCACGMMTrainer',
         'vmfcacgmm': 'VMFCACGMMTrainer'}[family])()
    sc = _Scenario(reverberation=False)
    emb = sc.embedding()
    masks_ours = _run_integration_ours(
        Trainer, sc, emb, sc.initialization)
    affiliation_ref = ref_trainer.fit_predict(
        sc.Y_mm, emb,
        initialization=sc.initialization.copy(),
        iterations=40,
        weight_constant_axis=(-1,),
    )
    masks_ref = np.einsum('fkt->kft', affiliation_ref)
    tol = _measure_sigma(
        sc, lambda init: _run_integration_ours(Trainer, sc, emb, init))
    _assert_matches_or_beats(
        sc.delta_sdr(masks_ours), sc.delta_sdr(masks_ref), tol)
