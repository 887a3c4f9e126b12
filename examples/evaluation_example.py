"""Device-first evaluation example.

Separates a batch of synthetic mixtures with ``separate_batch`` and
scores them three ways:

1. the single-utterance ``OutputMetrics`` facade (on accelerators its
   BSS-Eval + STOI run as ONE fused device program with one packed
   fetch; ``device_metrics=False`` restores the host f64 oracles),
2. the batched ``OutputMetricsBatch`` (whole-batch BSS-Eval + STOI in
   one fetch, device SRMR), and
3. the batched ``InputMetricsBatch`` for the unprocessed mixtures,
   giving the improvement per metric.

Run: python examples/evaluation_example.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

from pb_bss_tpu.evaluation import (
    InputMetricsBatch,
    OutputMetrics,
    OutputMetricsBatch,
)
from pb_bss_tpu.pipeline import separate_batch
from pb_bss_tpu.testing.dummy_data import low_reverberation_data


def main(iterations=20, batch=4):
    # a small batch of copies of the synthetic reverberant 2-speaker
    # scene with different noise (stand-in for a dataset shard)
    rng = np.random.default_rng(0)
    base = low_reverberation_data(seed=0)
    obs0 = base['audio_data']['observation']
    sources = base['audio_data']['speech_source']
    B = batch
    observations = np.stack([
        obs0 + 0.01 * rng.standard_normal(obs0.shape)
        for _ in range(B)
    ]).astype(np.float32)

    waves = np.asarray(separate_batch(
        observations, num_classes=3, iterations=iterations,
        beamformer='gev+ban'))
    print('separated:', waves.shape)           # (B, K, N)

    # --- input metrics of the raw mixtures (batched) ----------------
    input_metrics = InputMetricsBatch(
        observation=observations,
        speech_source=np.broadcast_to(
            sources, (B,) + sources.shape),
        sample_rate=8000,
    )
    in_sdr = input_metrics['mir_eval_sdr']     # (B, K, D)

    # --- output metrics (batched, one fused device program) ---------
    output_metrics = OutputMetricsBatch(
        speech_prediction=waves,
        speech_source=np.broadcast_to(
            sources, (B,) + sources.shape),
        sample_rate=8000,
    )
    scores = output_metrics.as_dict()
    gain = scores['mir_eval_sdr'] - in_sdr[..., 0]
    print('SDR gain over channel 0 (dB, per utterance x speaker):')
    print(np.round(gain, 2))
    print('STOI:', np.round(scores['stoi'], 3))
    print('SRMR:', np.round(scores['srmr'], 2))

    # --- the same numbers through the single-utterance facade -------
    single = OutputMetrics(
        speech_prediction=waves[0],
        speech_source=sources,
        sample_rate=8000,
    )
    print('utterance 0 via OutputMetrics:',
          np.round(single.mir_eval_sdr, 2))


if __name__ == '__main__':
    main()
