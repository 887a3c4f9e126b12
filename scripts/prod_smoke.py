"""Production-mode smoke: x64 DISABLED, as in any non-test process
(the test suite always enables x64 via tests/conftest.py, which hides
dtype-contract bugs like the si_sdr f64 assert that could never pass
after jnp.asarray downcast f64 inputs to f32 — fixed in r5).

Exercises every main package surface: the six mixture trainers,
beamformers, permutation alignment, STFT/iSTFT, both evaluation
facades (f64 and f32 inputs), the pipeline, streaming, and the
checkpoint roundtrip. Runs on CPU by default; delete the
jax_platforms line to run against the default (TPU) backend.

Run from anywhere: python scripts/prod_smoke.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

rng = np.random.default_rng(0)
F, T, D, K = 17, 60, 3, 2
y = (rng.standard_normal((F, T, D))
     + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
yj = jnp.asarray(y)

ok = []
def step(name, fn):
    try:
        fn(); ok.append(name); print(f'OK   {name}', flush=True)
    except Exception as e:
        print(f'FAIL {name}: {type(e).__name__}: {e}', flush=True)

from pb_bss_tpu.models.cacgmm import CACGMMTrainer
from pb_bss_tpu.models.cwmm import CWMMTrainer
from pb_bss_tpu.models.cbmm import CBMMTrainer
from pb_bss_tpu.models.vmfmm import VMFMMTrainer
from pb_bss_tpu.models.gmm import GMMTrainer

step('cacgmm fit+predict', lambda: np.asarray(
    CACGMMTrainer().fit(yj, num_classes=K, iterations=3).predict(yj)))
from pb_bss_tpu.permutation_alignment import GreedyPermutationAlignment
step('cacgmm fc+aligner', lambda: np.asarray(CACGMMTrainer().fit(
    yj, num_classes=K, iterations=3,
    weight_constant_axis=(-3, -1),
    inline_permutation_aligner=GreedyPermutationAlignment()).weight))
aff0 = jnp.asarray((rng.uniform(size=(F, K, T)) /
                    1).astype(np.float32))
aff0 = aff0 / aff0.sum(-2, keepdims=True)
yn = y / np.abs(np.linalg.norm(y, axis=-1, keepdims=True))
ynj = jnp.asarray(yn.astype(np.complex64))
step('cwmm fit', lambda: np.asarray(
    CWMMTrainer().fit(ynj, initialization=aff0, iterations=2).weight))
step('cbmm fit', lambda: np.asarray(
    CBMMTrainer().fit(ynj, initialization=aff0, iterations=2).weight))
emb = jnp.asarray(rng.standard_normal((F, T, 8)).astype(np.float32))
from pb_bss_tpu.models.vmfcacgmm import VMFCACGMMTrainer
from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer
step('vmfcacgmm fit', lambda: np.asarray(VMFCACGMMTrainer().fit(
    yj, emb, num_classes=K, iterations=2).weight))
step('gcacgmm fit', lambda: np.asarray(GCACGMMTrainer().fit(
    yj, emb, num_classes=K, iterations=2).weight))
step('gmm fit', lambda: np.asarray(GMMTrainer().fit(
    jnp.asarray(rng.standard_normal((200, 2)).astype(np.float32)),
    num_classes=2, iterations=3).gaussian.mean))
step('vmfmm fit', lambda: np.asarray(VMFMMTrainer().fit(
    jnp.asarray((rng.standard_normal((200, 3)) /
                 np.linalg.norm(rng.standard_normal((200, 3)),
                                axis=-1, keepdims=True)
                 ).astype(np.float32)),
    num_classes=2, iterations=3).vmf.concentration))

# extraction
from pb_bss_tpu.extraction import (
    get_power_spectral_density_matrix, get_bf_vector, apply_beamforming_vector)
mask = np.asarray(CACGMMTrainer().fit_predict(yj, num_classes=K, iterations=3))
ytl = jnp.swapaxes(yj, -2, -1)  # (F, D, T)
psd = get_power_spectral_density_matrix(ytl[:, None], jnp.asarray(mask)[:, :, None])
step('gev+ban', lambda: np.abs(np.asarray(apply_beamforming_vector(
    get_bf_vector('gev+ban', psd[:, 0], psd[:, 1]), ytl))).sum())
step('mvdr_souden', lambda: np.abs(np.asarray(apply_beamforming_vector(
    get_bf_vector('mvdr_souden', psd[:, 0], psd[:, 1], ref_channel=0), ytl))).sum())

# PA
from pb_bss_tpu.permutation_alignment import DHTVPermutationAlignment
step('dhtv pa', lambda: np.asarray(
    DHTVPermutationAlignment.from_stft_size(512)(
        jnp.asarray(rng.uniform(size=(K, 257, 40)).astype(np.float32)))))

# transforms
from pb_bss_tpu.transform import stft, istft
sig = rng.standard_normal((D, 4000)).astype(np.float32)
step('stft/istft', lambda: np.asarray(istft(stft(jnp.asarray(sig)), num_samples=4000)))

# evaluation facades, f32 and f64
from pb_bss_tpu.evaluation.wrapper import OutputMetrics, InputMetrics
ref = rng.standard_normal((2, 4000))
est = ref + 0.2 * rng.standard_normal((2, 4000))
step('OutputMetrics f64+si_sdr', lambda: OutputMetrics(
    speech_prediction=est, speech_source=ref, sample_rate=8000,
    enable_si_sdr=True).as_dict())
step('OutputMetrics f32', lambda: OutputMetrics(
    speech_prediction=est.astype(np.float32),
    speech_source=ref.astype(np.float32), sample_rate=8000,
    enable_si_sdr=True).as_dict())
step('InputMetrics f64', lambda: InputMetrics(
    observation=np.stack([ref[0], ref[0], ref[0]]),
    speech_source=ref, sample_rate=8000, enable_si_sdr=True).as_dict())

# pipeline + streaming
from pb_bss_tpu.pipeline import separate
step('pipeline separate', lambda: np.asarray(separate(
    jnp.asarray(rng.standard_normal((3, 6000)).astype(np.float32)),
    num_classes=2, iterations=3, beamformer='gev+ban')))
from pb_bss_tpu.streaming import StreamingSeparator
def _stream():
    s = StreamingSeparator(num_classes=2, block_frames=16, init_frames=32)
    out = [s.process(rng.standard_normal((3, 2048)).astype(np.float32)) for _ in range(4)]
    return out
step('streaming', _stream)

# checkpoint roundtrip
from pb_bss_tpu.utils.checkpoint import save_model_npz, load_model_npz
from pb_bss_tpu.models.cacgmm import CACGMM
import tempfile, os
def _ckpt():
    m = CACGMMTrainer().fit(yj, num_classes=K, iterations=2)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'ck.npz')
        save_model_npz(p, m)
        m2 = load_model_npz(p, CACGMM)
    return m2
step('checkpoint roundtrip', _ckpt)

print(f'\n{len(ok)} surfaces OK', flush=True)

import sys as _sys
_sys.exit(0 if len(ok) == 18 else 1)
