"""Inline permutation alignment inside the compiled EM loop
(reference: cacgmm.py:260-267, cwmm.py:168-173,
mixture_model_utils.py:264-306).
"""
import jax
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models import CACGMMTrainer, CWMMTrainer
from pb_bss_tpu.permutation_alignment import (
    DHTVPermutationAlignment,
    GreedyPermutationAlignment,
)


def _two_source_stft(seed=0, F=257, T=60, D=3):
    rng = np.random.RandomState(seed)
    atf = rng.randn(F, D, 2) + 1j * rng.randn(F, D, 2)
    active = np.arange(T) % 2 == 0
    y = np.where(active[None, :, None], atf[:, None, :, 0],
                 atf[:, None, :, 1])
    y = y * np.exp(2j * np.pi * rng.rand(F, T, 1))
    return y + 0.05 * (rng.randn(F, T, D) + 1j * rng.randn(F, T, D))


@pytest.mark.parametrize('aligner', [
    GreedyPermutationAlignment('cos'),
    DHTVPermutationAlignment.from_stft_size(512),
], ids=['greedy', 'dhtv'])
def test_cacgmm_inline_pa(aligner):
    y = _two_source_stft()
    model = CACGMMTrainer().fit(
        y, num_classes=2, iterations=10,
        weight_constant_axis=(-3, -1),
        inline_permutation_aligner=aligner,
        key=jax.random.key(0),
    )
    affiliation = np.asarray(model.predict(y))
    assert affiliation.shape == (257, 2, 60)
    assert_allclose(affiliation.sum(-2), 1.0, rtol=1e-4)
    # With inline PA the class identities should be consistent across
    # frequency: the decision pattern at each frequency matches the
    # global majority pattern (up to one global flip).
    decision = affiliation.argmax(-2)  # (F, T)
    majority = (decision.mean(0) > 0.5).astype(int)  # (T,)
    agreement = (decision == majority[None, :]).mean(-1)
    agreement = np.maximum(agreement, 1 - agreement)
    assert agreement.mean() > 0.85, agreement.mean()


def test_cwmm_inline_pa_smoke():
    y = _two_source_stft(seed=1)
    model = CWMMTrainer().fit(
        y, num_classes=2, iterations=5,
        weight_constant_axis=(-3, -1),
        inline_permutation_aligner=GreedyPermutationAlignment('cos'),
        key=jax.random.key(0),
    )
    affiliation = np.asarray(model.predict(y))
    assert affiliation.shape == (257, 2, 60)
    assert_allclose(affiliation.sum(-2), 1.0, rtol=1e-4)
