"""CBMM long-fit per-speaker monotonicity experiment (VERDICT r4 #5).

Round-4 finding: 20 Bingham EM iterations beat the 4-iteration smoke
on MEAN Delta-SDR but speaker 0 LOSES 0.4-3.9 dB — the per-frequency
EM reallocates ambiguous bins as concentrations sharpen. This script
measures whether warm-starting the CBMM from cACGMM posterior masks
(the models/fca.py recipe) fixes the per-speaker regression.

Run: JAX_PLATFORMS=cpu python scripts/cbmm_warmstart_experiment.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests'))

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np


def main():
    from test_models.test_head_to_head import _Scenario, _run_ours
    from pb_bss_tpu.models import CACGMMTrainer, CBMMTrainer
    from pb_bss_tpu.permutation_alignment import (
        DHTVPermutationAlignment,
    )

    sc = _Scenario(reverberation=False)

    def report(name, masks):
        d = sc.delta_sdr(masks)
        print(f'{name:34s} invasive={np.round(d["invasive"], 2)} '
              f'mir_eval={np.round(d["mir_eval"], 2)}', flush=True)
        return d

    # baselines: random init, 4 vs 20 iterations
    report('random init, 4 it', _run_ours(CBMMTrainer, sc, iterations=4))
    report('random init, 20 it', _run_ours(CBMMTrainer, sc, iterations=20))

    # warm start: cACGMM posterior as the CBMM initialization
    cacg = CACGMMTrainer().fit(
        sc.Y_mm, initialization=sc.initialization, iterations=20,
        weight_constant_axis=-1)
    aff_cacg = np.asarray(cacg.predict(sc.Y_mm))  # (F, K, T)
    pa = DHTVPermutationAlignment.from_stft_size(512)

    def run_cbmm_from(init, iterations):
        model = CBMMTrainer().fit(
            sc.Y_mm, initialization=init, iterations=iterations,
            weight_constant_axis=-1)
        affiliation = np.asarray(model.predict(sc.Y_mm))
        return np.asarray(pa(np.einsum('fkt->kft', affiliation)))

    report('cacgmm masks alone (no CBMM)',
           np.asarray(pa(np.einsum('fkt->kft', aff_cacg))))
    for iters in (1, 4, 20):
        report(f'cacgmm warm start, {iters} it',
               run_cbmm_from(aff_cacg, iters))

    # aligned warm start: run the PA on the cACGMM masks FIRST so the
    # CBMM starts from frequency-consistent classes
    aff_aligned = np.einsum('kft->fkt', np.asarray(
        pa(np.einsum('fkt->kft', aff_cacg))))
    for iters in (4, 20):
        report(f'ALIGNED cacgmm warm start, {iters} it',
               run_cbmm_from(aff_aligned, iters))


if __name__ == '__main__':
    main()
