"""Behavioral parity tests for permutation alignment.

Mirrors the reference's doctest examples
(/root/reference/pb_bss/permutation_alignment.py) plus recovery tests:
a smooth mask randomly permuted per frequency must be recovered by the
aligners.
"""
import numpy as np
import pytest

from pb_bss_tpu.permutation_alignment import (
    DHTVPermutationAlignment,
    GreedyPermutationAlignment,
    OraclePermutationAlignment,
    apply_mapping,
    sample_random_mapping,
    _mapping_from_score_matrix,
    _greedy_mapping,
    _ScoreMatrix,
)


def test_mapping_from_score_matrix_doctest_values():
    score = np.array([[11, 10, 0], [4, 5, 10], [6, 0, 5]])
    optimal = np.asarray(_mapping_from_score_matrix(score, 'optimal'))
    np.testing.assert_array_equal(optimal, [1, 2, 0])
    greedy = np.asarray(_mapping_from_score_matrix(score, 'greedy'))
    np.testing.assert_array_equal(greedy, [0, 2, 1])
    # batched
    np.testing.assert_array_equal(
        np.asarray(_mapping_from_score_matrix([score, score], 'greedy')),
        [[0, 0], [2, 2], [1, 1]])
    np.testing.assert_array_equal(
        np.asarray(_mapping_from_score_matrix([score, score], 'optimal')),
        [[1, 1], [2, 2], [0, 0]])


def test_mapping_from_score_matrix_infeasible():
    with pytest.raises(ValueError, match='infeasible'):
        _mapping_from_score_matrix([[np.inf, 0], [1, 2]])


def test_optimal_matches_scipy_linear_sum_assignment():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(0)
    for K in [2, 3, 4, 5]:
        score = rng.randn(7, K, K)
        ours = np.asarray(_mapping_from_score_matrix(score, 'optimal'))
        for f in range(7):
            expected = linear_sum_assignment(-score[f])[1]
            total_ours = score[f][range(K), ours[:, f]].sum()
            total_scipy = score[f][range(K), expected].sum()
            np.testing.assert_allclose(total_ours, total_scipy, rtol=1e-12)


def test_greedy_matches_reference_loop():
    """Vectorized greedy == the reference's per-bin argmax elimination."""
    rng = np.random.RandomState(1)
    K = 4
    score = rng.randn(11, K, K)
    ours = np.asarray(_greedy_mapping(score))  # (11, K)
    for f in range(11):
        s = score[f].copy()
        expected = np.zeros(K, int)
        for _ in range(K):
            i, j = np.unravel_index(np.argmax(s), s.shape)
            s[i, :] = -np.inf
            s[:, j] = -np.inf
            expected[i] = j
        np.testing.assert_array_equal(ours[f], expected)


def _block_mask(K, F, T):
    """Mask where class k is active in its own time block."""
    mask = np.zeros((K, F, T), dtype=np.float64)
    block = T // K
    for k in range(K):
        mask[k, :, k * block:(k + 1) * block] = 1
    return mask


def test_apply_mapping_matches_loopy():
    K, F, T = 3, 5, 6
    mask = _block_mask(K, F, T)
    mapping = np.asarray(sample_random_mapping(K, F))
    ours = np.asarray(apply_mapping(mask, mapping))
    expected = np.zeros_like(mask)
    for f in range(F):
        expected[:, f, :] = mask[mapping[:, f], f, :]
    np.testing.assert_array_equal(ours, expected)


@pytest.mark.parametrize('metric', ['cos', 'euclidean'])
def test_greedy_permutation_alignment_recovers(metric):
    K, F, T = 3, 5, 6
    reference_mask = _block_mask(K, F, T)
    mapping = np.asarray(sample_random_mapping(K, F))
    mask = np.asarray(apply_mapping(reference_mask, mapping))
    aligned = np.asarray(GreedyPermutationAlignment(metric)(mask))
    # Every frequency consistent with the first one
    for f in range(F):
        np.testing.assert_array_equal(aligned[:, f, :], aligned[:, 0, :])


@pytest.mark.parametrize('metric', ['cos', 'euclidean'])
def test_oracle_permutation_alignment_recovers(metric):
    K, F, T = 3, 5, 6
    reference_mask = _block_mask(K, F, T)
    mapping = np.asarray(sample_random_mapping(K, F))
    mask = np.asarray(apply_mapping(reference_mask, mapping))
    aligned = np.asarray(
        OraclePermutationAlignment(metric)(mask, reference_mask))
    np.testing.assert_array_equal(aligned, reference_mask)


def test_dhtv_alignment_plan_512():
    plan = DHTVPermutationAlignment.from_stft_size(512).alignment_plan
    assert plan == [
        [20, 70, 170], [2, 90, 190], [2, 50, 150], [2, 110, 210],
        [2, 30, 130], [2, 130, 230], [2, 0, 110], [2, 150, 257],
    ]


def test_dhtv_alignment_plan_errors():
    with pytest.raises(ValueError):
        DHTVPermutationAlignment(
            stft_size=512, segment_start=70, segment_width=300,
            segment_shift=20, main_iterations=20, sub_iterations=2,
        ).alignment_plan
    plan = DHTVPermutationAlignment(
        stft_size=512, segment_start=0, segment_width=257,
        segment_shift=20, main_iterations=20, sub_iterations=2,
    ).alignment_plan
    assert plan == [[20, 0, 257]]


def test_dhtv_recovers_smooth_masks():
    """DHTV must undo a random per-frequency permutation of masks whose
    time activity varies smoothly with frequency."""
    rng = np.random.RandomState(0)
    K, F, T = 3, 257, 40
    base = rng.uniform(0.1, 1.0, size=(K, 1, T))
    # smooth frequency modulation keeps adjacent/segment bins similar
    modulation = 1 + 0.3 * np.sin(
        np.linspace(0, 4 * np.pi, F)[None, :, None]
        + np.arange(K)[:, None, None])
    reference_mask = base * modulation
    mapping = np.asarray(sample_random_mapping(K, F))
    mask = np.asarray(apply_mapping(reference_mask, mapping))

    pa = DHTVPermutationAlignment.from_stft_size(512)
    aligned = np.asarray(pa(mask))

    # Global permutation is unresolved by design: find it via one
    # whole-spectrum oracle step, then require exact recovery.
    global_map = np.asarray(OraclePermutationAlignment('cos').calculate_mapping(
        aligned.reshape(K, 1, F * T),
        reference_mask.reshape(K, 1, F * T),
    ))[:, 0]
    np.testing.assert_allclose(
        aligned[global_map], reference_mask, atol=1e-12)


def test_dhtv_identity_on_aligned_mask():
    rng = np.random.RandomState(3)
    K, F, T = 2, 257, 30
    base = rng.uniform(0.1, 1.0, size=(K, 1, T))
    mask = np.broadcast_to(base, (K, F, T)).copy()
    pa = DHTVPermutationAlignment.from_stft_size(512)
    mapping = np.asarray(pa.calculate_mapping(mask))
    np.testing.assert_array_equal(
        mapping, np.broadcast_to(np.arange(K)[:, None], (K, F)))
