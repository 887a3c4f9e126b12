"""Single-kernel CBMM EM loop: parity with the scan path.

Interpret mode on CPU; compiled and timed on TPU by bench/dev runs.
The kernel body unrolls the chord solver's divided-difference cascades,
so interpret-mode tracing costs minutes per distinct shape/config on
the CI box — this file keeps ONE fused configuration (tiny shape) and
derives every assertion from it (later identical calls hit the jit
cache).

Affiliations are exponentially sensitive to small differences in the
fitted Bingham eigenvalues (same story as the cACGMM kernel, see
CLAUDE.md gotcha 8), so parity tolerances are loose on the raw
posteriors and tight on the model parameters / quality.
"""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models.cbmm import CBMMTrainer

F, D, T, K, ITERS = 4, 3, 24, 2, 2


def _mixture(seed=0, noise=0.2):
    """Unit-norm complex observations around K planted axes (Bingham
    data is axially symmetric: y and -y are the same point)."""
    rng = np.random.default_rng(seed)
    modes = rng.standard_normal((F, K, D)) + 1j * rng.standard_normal(
        (F, K, D))
    modes /= np.linalg.norm(modes, axis=-1, keepdims=True)
    lab = np.arange(T) % K
    y = modes[:, lab] + noise * (
        rng.standard_normal((F, T, D))
        + 1j * rng.standard_normal((F, T, D)))
    # random global phase per frame: irrelevant to the Bingham model
    y *= np.exp(2j * np.pi * rng.uniform(size=(F, T, 1)))
    y /= np.linalg.norm(y, axis=-1, keepdims=True)
    aff0 = rng.uniform(size=(F, K, T))
    aff0 /= aff0.sum(1, keepdims=True)
    return (jnp.asarray(y, jnp.complex64),
            jnp.asarray(aff0, jnp.float32), lab)


def _best_perm_accuracy(aff, lab):
    pred = np.asarray(aff).argmax(axis=1)  # (F, T)
    k = np.asarray(aff).shape[1]
    return max(
        np.mean(np.asarray(p)[pred] == lab[None])
        for p in itertools.permutations(range(k)))


@pytest.mark.slow
def test_fused_matches_scan_path():
    y, aff0, lab = _mixture()
    trainer = CBMMTrainer(eigenvalue_eps=1e-3)

    m_scan = trainer.fit(
        y, initialization=aff0, iterations=ITERS, use_fused_em=False)
    a_scan = m_scan.predict(y)
    m_fused, a_fused = trainer.fit(
        y, initialization=aff0, iterations=ITERS, use_fused_em=True,
        _return_affiliation=True)

    assert_allclose(
        np.asarray(m_fused.weight), np.asarray(m_scan.weight),
        atol=5e-3)
    # fitted Bingham eigenvalues (ascending, max pinned to 0)
    ev_f = np.asarray(m_fused.complex_bingham.covariance_eigenvalues)
    ev_s = np.asarray(m_scan.complex_bingham.covariance_eigenvalues)
    assert_allclose(ev_f, ev_s, rtol=5e-2, atol=0.5)
    # posteriors: loose elementwise, tight on average
    d = np.abs(np.asarray(a_fused) - np.asarray(a_scan))
    assert d.mean() < 5e-3
    assert d.max() < 0.2
    # quality: same planted-label recovery (2 EM iterations at T=24
    # only partially converge — equality with the scan path is the
    # assertion, not absolute accuracy)
    acc_s = _best_perm_accuracy(a_scan, lab)
    acc_f = _best_perm_accuracy(a_fused, lab)
    assert acc_s > 0.6
    assert acc_f > acc_s - 0.05

    # the kernel's final unclipped E-step == model.predict
    a_pred = m_fused.predict(y)
    assert_allclose(np.asarray(a_fused), np.asarray(a_pred), atol=5e-3)

    # fit_predict routes through the same path (jit-cache hit: same
    # shapes/config as the fused fit above)
    aff_fp = trainer.fit_predict(
        y, initialization=aff0, iterations=ITERS, use_fused_em=True)
    assert_allclose(np.asarray(aff_fp), np.asarray(a_fused), atol=1e-6)


def test_auto_gate_off_on_cpu():
    y, aff0, _ = _mixture(seed=5)
    trainer = CBMMTrainer()
    m_auto = trainer.fit(y, initialization=aff0, iterations=ITERS)
    m_scan = trainer.fit(
        y, initialization=aff0, iterations=ITERS, use_fused_em=False)
    assert_allclose(
        np.asarray(m_auto.complex_bingham.covariance_eigenvalues),
        np.asarray(m_scan.complex_bingham.covariance_eigenvalues))


@pytest.mark.slow
def test_fused_saliency_matches_scan():
    """Saliency-weighted scatter statistics and the L1-normalized
    mixture weight must match the scan path in-kernel."""
    y, aff0, _ = _mixture(seed=6)
    rng = np.random.default_rng(6)
    saliency = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(F, T)), jnp.float32)
    trainer = CBMMTrainer(eigenvalue_eps=1e-3)
    m_fused = trainer.fit(
        y, initialization=aff0, iterations=ITERS,
        saliency=saliency, use_fused_em=True)
    m_scan = trainer.fit(
        y, initialization=aff0, iterations=ITERS,
        saliency=saliency, use_fused_em=False)
    assert_allclose(
        np.asarray(m_fused.weight), np.asarray(m_scan.weight),
        atol=5e-3)
    assert_allclose(
        np.asarray(m_fused.complex_bingham.covariance_eigenvalues),
        np.asarray(m_scan.complex_bingham.covariance_eigenvalues),
        rtol=5e-2, atol=0.5)


@pytest.mark.slow
def test_fused_max_concentration_matches_scan():
    """A finite max_concentration bounds the chord diffs and floors
    the fitted eigenvalues at -mc with re-spacing in-kernel
    (find_eigenvalues semantics)."""
    y, aff0, _ = _mixture(seed=7, noise=0.02)  # low noise -> clip binds
    mc = 20.0
    trainer = CBMMTrainer(max_concentration=mc, eigenvalue_eps=1e-3)
    m_fused = trainer.fit(
        y, initialization=aff0, iterations=ITERS, use_fused_em=True)
    m_scan = trainer.fit(
        y, initialization=aff0, iterations=ITERS, use_fused_em=False)
    ev_f = np.asarray(m_fused.complex_bingham.covariance_eigenvalues)
    ev_s = np.asarray(m_scan.complex_bingham.covariance_eigenvalues)
    # the clip must actually bind for this assertion to mean anything
    assert ev_s.min() <= -mc + 1.0, ev_s.min()
    assert ev_f.min() >= -mc - 1e-4
    assert_allclose(ev_f, ev_s, rtol=5e-2, atol=0.5)
    assert_allclose(
        np.asarray(m_fused.weight), np.asarray(m_scan.weight),
        atol=5e-3)


def test_forced_fused_rejects_unsupported_knobs():
    """use_fused_em=True must not silently drop inline permutation
    alignment (the kernel does not implement it)."""
    import pytest

    from pb_bss_tpu.permutation_alignment import DHTVPermutationAlignment

    y, aff0, _ = _mixture(seed=6)
    aligner = DHTVPermutationAlignment.from_stft_size(512)
    with pytest.raises(AssertionError, match='use_fused_em'):
        CBMMTrainer().fit(
            y, initialization=aff0, iterations=2,
            inline_permutation_aligner=aligner, use_fused_em=True)
